"""CI output lane: annotations, step summary, JSON results, fail-on policy.

Mirrors the reference's CI command semantics (datacontract/command_ci.py:
31-139 and datacontract/output/ci_output.py:15-160): GitHub Actions
`::error/::warning file=...::` annotations when GITHUB_ACTIONS=true, Azure
DevOps `##vso[task.logissue ...]` when TF_BUILD=True, an aggregated markdown
step summary appended to $GITHUB_STEP_SUMMARY (multi-contract header table
plus per-contract check tables sorted by (result, model, field)), `--json`
results on stdout, and a `--fail-on {warning,error,never}` exit-code policy.

Everything here is driver-side string formatting over an already-computed
Run — no Spark involvement.
"""

from __future__ import annotations

import json
import os
import sys
from typing import List, Optional, TextIO, Tuple

from datacontract_cli_spark.model.run import Check, ResultEnum, Run

# check results that flip the exit code, per --fail-on level
# (reference command_ci.py:117-121)
FAIL_RESULTS = {
    "warning": {ResultEnum.warning, ResultEnum.failed, ResultEnum.error},
    "error": {ResultEnum.failed, ResultEnum.error},
    "never": set(),
}

RESULT_EMOJI = {
    ResultEnum.passed: "\U0001f7e2 passed",
    ResultEnum.warning: "\U0001f7e0 warning",
    ResultEnum.failed: "\U0001f534 failed",
    ResultEnum.error: "\U0001f534 error",
}


def _sanitize_annotation(text: Optional[str]) -> str:
    """Collapse newlines and %-escape for single-line CI annotations."""
    if not text:
        return ""
    return (text.replace("%", "%25").replace("\r\n", " ")
                .replace("\r", " ").replace("\n", " ").strip())


def _sanitize_md_cell(text: Optional[str]) -> str:
    if not text:
        return ""
    return (text.replace("|", "\\|").replace("\r\n", " ")
                .replace("\r", " ").replace("\n", " ").strip())


def to_field(run: Run, check: Check) -> Optional[str]:
    """Field display: qualify with the model name only when the run spans
    more than one model (reference test_results_writer.py:117-124)."""
    models = {c.model for c in run.checks}
    if len(models) > 1:
        if check.field is None:
            return check.model
        return f"{check.model}.{check.field}"
    return check.field


def write_annotations(run: Run, contract_file: str,
                      out: Optional[TextIO] = None) -> None:
    """Emit CI-host annotations for failed/warning checks. GitHub Actions
    and Azure DevOps are auto-detected from the environment; on any other
    host this is a no-op (the step summary still covers it)."""
    out = out if out is not None else sys.stdout
    if os.environ.get("GITHUB_ACTIONS") == "true":
        _github_annotations(run, contract_file, out)
    elif os.environ.get("TF_BUILD") == "True":
        _azure_annotations(run, contract_file, out)


def _github_annotations(run: Run, contract_file: str, out: TextIO) -> None:
    for c in run.checks:
        name = _sanitize_annotation(c.name)
        reason = _sanitize_annotation(c.reason)
        if c.result in (ResultEnum.failed, ResultEnum.error):
            print(f"::error file={contract_file}::{name}: {reason}", file=out)
        elif c.result == ResultEnum.warning:
            print(f"::warning file={contract_file}::{name}: {reason}", file=out)


def _azure_annotations(run: Run, contract_file: str, out: TextIO) -> None:
    for c in run.checks:
        name = _sanitize_annotation(c.name)
        reason = _sanitize_annotation(c.reason)
        if c.result in (ResultEnum.failed, ResultEnum.error):
            print(f"##vso[task.logissue type=error;sourcepath={contract_file}]"
                  f"{name}: {reason}", file=out)
        elif c.result == ResultEnum.warning:
            print(f"##vso[task.logissue type=warning;sourcepath={contract_file}]"
                  f"{name}: {reason}", file=out)


def render_summary(results: List[Tuple[str, Run]]) -> str:
    """The markdown step summary (reference ci_output.py:69-137): an
    aggregate header table when multiple contracts ran, then a per-contract
    section with counts and a check table sorted by (result, model, field)."""
    lines: List[str] = []

    if len(results) > 1:
        values = [run.result for _, run in results]
        if any(r in (ResultEnum.failed, ResultEnum.error) for r in values):
            overall = RESULT_EMOJI[ResultEnum.failed]
        elif any(r == ResultEnum.warning for r in values):
            overall = RESULT_EMOJI[ResultEnum.warning]
        else:
            overall = RESULT_EMOJI[ResultEnum.passed]
        n_passed = sum(1 for r in values if r == ResultEnum.passed)
        lines += ["## Data Contract CI", "",
                  f"**{overall}** \u2014 {n_passed}/{len(results)} contracts passed",
                  "", "| Result | Contract |", "|--------|----------|"]
        for contract_file, run in results:
            result = RESULT_EMOJI.get(run.result, run.result.value)
            lines.append(f"| {result} | {contract_file} |")
        lines.append("")

    heading = "###" if len(results) > 1 else "##"
    for contract_file, run in results:
        result_display = RESULT_EMOJI.get(run.result, run.result.value)
        checks = run.checks or []
        n_passed = sum(1 for c in checks if c.result == ResultEnum.passed)
        n_failed = sum(1 for c in checks if c.result == ResultEnum.failed)
        n_warn = sum(1 for c in checks if c.result == ResultEnum.warning)
        n_err = sum(1 for c in checks if c.result == ResultEnum.error)
        duration = 0.0
        if run.timestampStart and run.timestampEnd:
            duration = (run.timestampEnd - run.timestampStart).total_seconds()
        lines += [f"{heading} Data Contract CI: {contract_file}", "",
                  f"**Result: {result_display}** | {len(checks)} checks | "
                  f"{n_passed} passed | {n_failed} failed | {n_warn} warnings | "
                  f"{n_err} errors | {duration:.1f}s", ""]
        if checks:
            lines += ["| Result | Check | Field | Details |",
                      "|--------|-------|-------|---------|"]
            # ALPHABETICAL by result string, matching the reference's step
            # summary exactly (ci_output.py:121-128) — deliberately NOT the
            # severity order writers._sorted_checks uses for the console
            for c in sorted(checks, key=lambda c: (c.result.value, c.model or "",
                                                   c.field or "")):
                lines.append(
                    f"| {c.result.value} | {_sanitize_md_cell(c.name)} | "
                    f"{_sanitize_md_cell(to_field(run, c))} | "
                    f"{_sanitize_md_cell(c.reason)} |")
            lines.append("")
    return "\n".join(lines) + "\n"


def write_summary(results: List[Tuple[str, Run]]) -> None:
    """Append the summary to $GITHUB_STEP_SUMMARY if set (no-op otherwise)."""
    path = os.environ.get("GITHUB_STEP_SUMMARY")
    if not path:
        return
    with open(path, "a", encoding="utf-8") as f:
        f.write(render_summary(results))


def json_results(results: List[Tuple[str, Run]]) -> str:
    """`--json` stdout payload: one object for a single contract, a list for
    several; each tagged with its `location` (reference ci_output.py:140-156)."""
    objs = []
    for location, run in results:
        obj = json.loads(run.to_json())
        obj["location"] = location
        objs.append(obj)
    return json.dumps(objs[0] if len(objs) == 1 else objs, indent=2)


def should_fail(results: List[Tuple[str, Run]], fail_on: str = "error") -> bool:
    fail_set = FAIL_RESULTS[fail_on]
    return any(run.result in fail_set for _, run in results)
