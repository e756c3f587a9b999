"""`datacontract ci` command + output/ci.py lane.

Mirrors the reference's CI semantics (datacontract/command_ci.py,
output/ci_output.py): GitHub annotations, step summary markdown, --json
stdout payload, --fail-on exit policy.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

from datacontract_cli_spark.model.run import Check, ResultEnum, Run
from datacontract_cli_spark.output import ci as ci_out

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)
FIXTURE = os.path.join(HERE, "fixtures", "orders_diag")


def _run(checks):
    return Run(checks=checks).finish()


def _check(result, name="chk", reason="why", model="orders", field=None):
    return Check(type="t", key=f"orders__{name}", category="schema",
                 name=name, model=model, field=field, result=result,
                 reason=reason)


# --- unit: annotations -------------------------------------------------------

def test_github_annotations_emitted(monkeypatch, capsys):
    monkeypatch.setenv("GITHUB_ACTIONS", "true")
    run = _run([_check(ResultEnum.failed, name="nope", reason="bad\nline"),
                _check(ResultEnum.warning, name="warnish"),
                _check(ResultEnum.passed, name="fine")])
    ci_out.write_annotations(run, "dc.yaml")
    out = capsys.readouterr().out
    assert "::error file=dc.yaml::nope: bad line" in out  # newline collapsed
    assert "::warning file=dc.yaml::warnish: why" in out
    assert "fine" not in out  # passed checks are not annotated


def test_azure_annotations_emitted(monkeypatch, capsys):
    monkeypatch.delenv("GITHUB_ACTIONS", raising=False)
    monkeypatch.setenv("TF_BUILD", "True")
    run = _run([_check(ResultEnum.error, name="boom", reason="100% wrong")])
    ci_out.write_annotations(run, "dc.yaml")
    out = capsys.readouterr().out
    assert "##vso[task.logissue type=error;sourcepath=dc.yaml]boom:" in out
    # %-escape for annotation safety
    assert "100%25 wrong" in out


def test_no_annotations_outside_ci(monkeypatch, capsys):
    monkeypatch.delenv("GITHUB_ACTIONS", raising=False)
    monkeypatch.delenv("TF_BUILD", raising=False)
    ci_out.write_annotations(_run([_check(ResultEnum.failed)]), "dc.yaml")
    assert capsys.readouterr().out == ""


# --- unit: step summary ------------------------------------------------------

def test_summary_single_contract():
    run = _run([_check(ResultEnum.passed, name="a"),
                _check(ResultEnum.failed, name="b", reason="cell|pipe")])
    md = ci_out.render_summary([("dc.yaml", run)])
    assert "## Data Contract CI: dc.yaml" in md
    assert "2 checks | 1 passed | 1 failed | 0 warnings | 0 errors" in md
    assert "| Result | Check | Field | Details |" in md
    assert "cell\\|pipe" in md  # markdown cell pipes escaped
    # single contract: no aggregate header table
    assert "contracts passed" not in md


def test_summary_multi_contract_header_and_overall():
    ok = _run([_check(ResultEnum.passed)])
    bad = _run([_check(ResultEnum.failed)])
    md = ci_out.render_summary([("a.yaml", ok), ("b.yaml", bad)])
    assert "## Data Contract CI" in md
    assert "1/2 contracts passed" in md
    assert "| Result | Contract |" in md
    assert "### Data Contract CI: a.yaml" in md
    assert "### Data Contract CI: b.yaml" in md


def test_summary_written_to_github_step_summary(monkeypatch, tmp_path):
    path = tmp_path / "summary.md"
    monkeypatch.setenv("GITHUB_STEP_SUMMARY", str(path))
    ci_out.write_summary([("dc.yaml", _run([_check(ResultEnum.passed)]))])
    assert "Data Contract CI: dc.yaml" in path.read_text()


def test_to_field_qualifies_only_across_models():
    one = _run([_check(ResultEnum.passed, field="x"),
                _check(ResultEnum.passed, field="y")])
    assert ci_out.to_field(one, one.checks[0]) == "x"
    two = _run([_check(ResultEnum.passed, model="a", field="x"),
                _check(ResultEnum.passed, model="b", field=None)])
    assert ci_out.to_field(two, two.checks[0]) == "a.x"
    assert ci_out.to_field(two, two.checks[1]) == "b"


# --- unit: fail-on + json ----------------------------------------------------

@pytest.mark.parametrize("result,fail_on,expected", [
    (ResultEnum.warning, "warning", True),
    (ResultEnum.warning, "error", False),
    (ResultEnum.failed, "error", True),
    (ResultEnum.failed, "never", False),
    (ResultEnum.passed, "warning", False),
])
def test_should_fail_policy(result, fail_on, expected):
    assert ci_out.should_fail([("dc.yaml", _run([_check(result)]))],
                              fail_on) is expected


def test_json_results_single_vs_list():
    one = json.loads(ci_out.json_results([("a.yaml", _run([_check(ResultEnum.passed)]))]))
    assert isinstance(one, dict) and one["location"] == "a.yaml"
    many = json.loads(ci_out.json_results(
        [("a.yaml", _run([])), ("b.yaml", _run([]))]))
    assert [o["location"] for o in many] == ["a.yaml", "b.yaml"]


# --- e2e: the subcommand -----------------------------------------------------

def _prepare(tmp_path):
    shutil.copy(os.path.join(FIXTURE, "orders.csv"), tmp_path / "orders.csv")
    contract = open(os.path.join(FIXTURE, "datacontract.yaml")).read().replace(
        "{dir}", str(tmp_path)).replace("orders.csv", "{model}.csv")
    path = tmp_path / "contract.yaml"
    path.write_text(contract)
    return str(path)


def test_cli_ci_end_to_end(tmp_path):
    contract = _prepare(tmp_path)
    summary = tmp_path / "summary.md"
    env = dict(os.environ, GITHUB_ACTIONS="true",
               GITHUB_STEP_SUMMARY=str(summary))
    proc = subprocess.run(
        [sys.executable, "-m", "datacontract_cli_spark", "ci", contract,
         "--master", "local[2]", "--json"],
        capture_output=True, text=True, cwd=REPO, timeout=300, env=env,
    )
    # fixture data has violations -> default --fail-on error trips
    assert proc.returncode == 1, proc.stdout + proc.stderr
    # --json: stdout is pure JSON, annotations + progress went to stderr
    payload = json.loads(proc.stdout)
    assert payload["location"] == contract
    assert payload["result"] == "failed"
    assert "::error file=" in proc.stderr
    assert "Testing " in proc.stderr
    md = summary.read_text()
    assert f"## Data Contract CI: {contract}" in md


def test_cli_ci_fail_on_never(tmp_path):
    contract = _prepare(tmp_path)
    proc = subprocess.run(
        [sys.executable, "-m", "datacontract_cli_spark", "ci", contract,
         "--master", "local[2]", "--fail-on", "never"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "Testing " in proc.stdout


def test_cli_ci_missing_contract_is_error_run(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-m", "datacontract_cli_spark", "ci",
         str(tmp_path / "nope.yaml"), "--master", "local[2]", "--json"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert proc.returncode == 1
    payload = json.loads(proc.stdout)
    assert payload["result"] == "error"


def test_cli_ci_breaking_against(tmp_path):
    contract = _prepare(tmp_path)
    # a previous version whose field type differs -> breaking
    prev = tmp_path / "prev.yaml"
    prev.write_text(open(contract).read().replace(
        "logicalType: string", "logicalType: integer", 1))
    proc = subprocess.run(
        [sys.executable, "-m", "datacontract_cli_spark", "ci", contract,
         "--master", "local[2]", "--fail-on", "never",
         "--breaking-against", str(prev)],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    # data checks are waived (--fail-on never) so the exit code isolates
    # the contract-evolution gate
    assert proc.returncode == 1, proc.stdout + proc.stderr
    assert "breaking change" in proc.stdout
    # identical previous version -> passes
    proc = subprocess.run(
        [sys.executable, "-m", "datacontract_cli_spark", "ci", contract,
         "--master", "local[2]", "--fail-on", "never",
         "--breaking-against", contract],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
