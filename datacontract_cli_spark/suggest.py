"""Contract bootstrapping: profile a table once and SUGGEST constraints.

The reference's importers (and this repo's) reflect a schema — names and
types. But a contract whose value comes from `test` needs constraints:
required flags, enums, ranges, patterns, a primary key. Writing those by
hand against an unfamiliar table is the slowest step of contract
adoption, and every fact needed to draft them is already in the data.

``suggest_contract`` turns one profiling pass + two bounded follow-ups
into a draft contract:

  pass 1 (one ``df.agg``, the `operators/profile.py` single-scan batch):
      null counts, HLL distinct, min/max, max string length
  pass 2 (one ``df.agg``): enum value sets for HLL-small string columns
      (bounded ``collect_set``) + a pattern battery — per (column,
      candidate-regex) violation counts as count-ifs, all in the same
      aggregate
  pass 3 (per PK candidate, exact): HLL says a column MIGHT be unique;
      ``count_distinct`` confirms before the draft claims a primaryKey

Suggestions are deliberately conservative: a constraint is proposed only
when the evidence is total (zero nulls → required; zero regex misses →
pattern; exact distinct == rows → primaryKey). Observed min/max/length
bounds are suggestions to tighten, not truths — they ship in the draft
with the evidence in the rationale so a human can widen them.

At 100 TB: pass 1/2 are single-scan batched aggregates (scalars to the
driver; enum collect_set is capped); pass 3 is one two-phase distinct per
surviving candidate. Nothing quadratic, nothing row-collecting.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datacontract_cli_spark.model.contract import DataContract
from datacontract_cli_spark.operators.profile import profile

# (name, regex) — first total match wins; ordered specific → general
PATTERN_BATTERY: List[Tuple[str, str]] = [
    ("uuid", r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
             r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"),
    ("email", r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"),
    ("iso_date", r"^\d{4}-\d{2}-\d{2}$"),
    ("prefixed_id", r"^[A-Za-z]+-[0-9]+$"),
    ("digits", r"^-?[0-9]+$"),
]


def _yaml_scalar(v: Any) -> Any:
    """Observed bounds come back as whatever Spark collected — a decimal
    column yields decimal.Decimal, which yaml.safe_dump cannot represent.
    Coerce to a plain int/float for the drafted YAML."""
    from decimal import Decimal

    if isinstance(v, Decimal):
        return int(v) if v == v.to_integral_value() else float(v)
    return v


def suggest_contract(spark: SparkSession, df: DataFrame, name: str,
                     contract_id: Optional[str] = None,
                     fmt: str = "parquet", path: Optional[str] = None,
                     enum_max: int = 20,
                     detect_patterns: bool = True,
                     drift_baselines: bool = False,
                     ) -> Tuple[DataContract, Dict[str, dict]]:
    """Draft a contract with data-derived constraint suggestions.

    Returns (contract, rationale) where rationale maps column →
    {suggestion: evidence} for everything proposed (and for PK candidates
    that exact verification rejected).
    """
    from datacontract_cli_spark.sources.importers import _from_df_schema

    contract = _from_df_schema(df.schema, name, contract_id, fmt, path or "")
    obj = contract.schema_objects[0]
    stats = profile(df, quantiles=())
    n = next(iter(stats.values()))["count"] if stats else 0
    dtypes = dict(df.dtypes)
    rationale: Dict[str, dict] = {c: {} for c in df.columns}

    # ---- pass 2: enum sets + pattern battery, ONE aggregate ------------
    enum_candidates = [
        c for c in df.columns
        if dtypes.get(c) == "string" and n > 0
        # HLL relative error ~2.3%; 1.5x headroom so a true enum is never
        # missed — the exact set is capped below anyway
        and 0 < stats[c]["distinct"] <= int(enum_max * 1.5)
        and stats[c]["null_count"] < n
    ]
    pattern_candidates = ([c for c in df.columns
                           if dtypes.get(c) == "string"
                           and stats[c]["null_count"] < n]
                          if detect_patterns else [])
    exprs = []
    for c in enum_candidates:
        qc = F.col(f"`{c}`")
        exprs.append(F.slice(F.array_sort(F.collect_set(qc)),
                             1, enum_max + 1).alias(f"{c}::enum"))
    for c in pattern_candidates:
        qc = F.col(f"`{c}`")
        for pname, rx in PATTERN_BATTERY:
            exprs.append(
                F.sum(F.when(qc.isNotNull() & ~qc.rlike(rx), 1).otherwise(0))
                .alias(f"{c}::miss::{pname}"))
    row: Dict[str, Any] = df.agg(*exprs).collect()[0].asDict() if exprs else {}

    # ---- pass 3: exact uniqueness for PK candidates ---------------------
    pk_candidates = [
        c for c in df.columns
        if n > 0 and stats[c]["null_count"] == 0
        # HLL default rsd is 5% and can undercount further on small inputs;
        # a loose 0.9 screen + exact verification never false-positives
        and stats[c]["distinct"] >= 0.9 * n
    ]
    # floats make terrible keys — try exact-typed candidates first
    pk_candidates.sort(key=lambda c: dtypes.get(c, "") in ("float", "double"))
    pk_col = None
    for c in pk_candidates:
        exact = df.agg(F.count_distinct(F.col(f"`{c}`")).alias("d")
                       ).collect()[0]["d"]
        if exact == n:
            pk_col = c
            rationale[c]["primaryKey"] = f"exact distinct == {n} rows"
            break
        rationale[c]["primaryKey_rejected"] = (
            f"HLL suggested unique but exact distinct {exact} != {n}")

    # ---- fold the evidence into properties ------------------------------
    for prop in obj.properties:
        c = prop.column
        st = stats.get(c)
        if st is None or n == 0:
            continue
        if st["null_count"] == 0:
            prop.required = True
            rationale[c]["required"] = "0 nulls observed"
        if c == pk_col:
            prop.primary_key = True
            prop.primary_key_position = 1
        dtype = dtypes.get(c, "")
        if c in enum_candidates:
            values = row.get(f"{c}::enum") or []
            if 0 < len(values) <= enum_max:
                prop.options["enum"] = list(values)
                rationale[c]["enum"] = (
                    f"{len(values)} distinct values (exact, sorted)")
        if "enum" not in prop.options and c in pattern_candidates:
            for pname, rx in PATTERN_BATTERY:
                if row.get(f"{c}::miss::{pname}") == 0:
                    prop.options["pattern"] = rx
                    rationale[c]["pattern"] = (
                        f"all non-null values match {pname}")
                    break
        if dtype == "string" and "enum" not in prop.options \
                and st.get("max_len") is not None:
            prop.options["maxLength"] = int(st["max_len"])
            rationale[c]["maxLength"] = f"observed max length {st['max_len']}"
        if st.get("min") is not None and dtype not in ("timestamp", "date") \
                and dtype != "string":
            prop.options["minimum"] = _yaml_scalar(st["min"])
            prop.options["maximum"] = _yaml_scalar(st["max"])
            rationale[c]["range"] = (
                f"observed [{st['min']}, {st['max']}] — widen before "
                "enforcing")
    # ---- optional drift baselines from the observed distributions -------
    if drift_baselines and n > 0:
        from datacontract_cli_spark.model.contract import QualityRule
        from datacontract_cli_spark.operators.baselines import (
            categorical_baseline, cdf_baseline)

        for prop in obj.properties:
            c = prop.column
            dtype = dtypes.get(c, "")
            if "enum" in prop.options:
                base = {k: round(v, 6)
                        for k, v in categorical_baseline(df, c).items()}
                prop.quality.append(QualityRule(
                    type="library", metric="freqDriftPsi",
                    arguments={"baseline": base}, must_be_lt=0.25,
                    id=f"{c}-psi-baseline"))
                rationale.setdefault(c, {})["freqDriftPsi"] = (
                    f"observed frequency baseline over {len(base)} categories")
            elif dtype in ("double", "float") \
                    and stats[c]["null_count"] < n:
                # round_to inside cdf_baseline: the probes round BEFORE
                # the empirical-CDF pass, so the recorded p is F̂ at the
                # exact stored probe (rounding afterwards shifts the
                # probe below the point mass that defined its rank)
                base = cdf_baseline(df, c, round_to=6)
                prop.quality.append(QualityRule(
                    type="library", metric="quantileDriftKs",
                    arguments={"baseline": base}, must_be_lt=0.15,
                    id=f"{c}-ks-baseline"))
                rationale.setdefault(c, {})["quantileDriftKs"] = (
                    f"CDF probe points at {len(base['cdf'])} observed quantiles")

    rationale = {c: r for c, r in rationale.items() if r}
    return contract, rationale
