"""Differential testing: the engine vs DuckDB on randomized contracts.

Seeded (deterministic) random tables + random constraint sets; the engine's
missing/invalid/duplicate/row-count diagnostics must equal counts computed
independently by DuckDB SQL implementing the same soda semantics. This is
the generalized version of the per-query oracle gate."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from datacontract_cli_spark.engine.executor import SparkContractEngine
from datacontract_cli_spark.model.contract import load_contract_str


def _random_frame(rng: np.random.Generator, n: int = 500) -> pd.DataFrame:
    words = ["aa", "bb", "cc", "dd", "ee", None, ""]
    return pd.DataFrame({
        "id": rng.integers(0, n // 2, size=n),           # guaranteed duplicates
        "cat": rng.choice(np.array(words, dtype=object), size=n),
        "num": np.where(rng.random(n) < 0.1, np.nan,
                        rng.normal(50, 30, size=n).round(3)),
        "txt": [None if rng.random() < 0.05 else
                "".join(rng.choice(list("abcxyz@. "), size=rng.integers(1, 25)))
                for _ in range(n)],
    })


CONTRACT = """
id: fuzz
version: 0.1.0
schema:
  - name: fuzz
    properties:
      - name: id
        logicalType: integer
        required: true
        unique: true
      - name: cat
        logicalType: string
        required: true
        logicalTypeOptions:
          enum: [aa, bb, cc]
      - name: num
        logicalType: number
        logicalTypeOptions:
          minimum: 10
          maximum: 90
      - name: txt
        logicalType: string
        logicalTypeOptions:
          minLength: 3
          maxLength: 15
          pattern: "^[a-z@. ]+$"
    quality:
      - type: library
        metric: rowCount
        mustBeGreaterThan: 0
"""

ORACLE = {
    "fuzz__id__field_required": "SELECT count(*) FROM t WHERE id IS NULL",
    "fuzz__id__field_unique":
        "SELECT count(*) FROM (SELECT id FROM t GROUP BY id HAVING count(*) > 1)",
    "fuzz__cat__field_required": "SELECT count(*) FROM t WHERE cat IS NULL",
    "fuzz__cat__field_enum":
        "SELECT count(*) FROM t WHERE cat IS NOT NULL AND cat NOT IN ('aa','bb','cc')",
    "fuzz__num__field_minimum":
        "SELECT count(*) FROM t WHERE num IS NOT NULL AND isfinite(num) AND NOT (num >= 10)",
    "fuzz__num__field_maximum":
        "SELECT count(*) FROM t WHERE num IS NOT NULL AND isfinite(num) AND NOT (num <= 90)",
    "fuzz__txt__field_min_length":
        "SELECT count(*) FROM t WHERE txt IS NOT NULL AND length(txt) < 3",
    "fuzz__txt__field_max_length":
        "SELECT count(*) FROM t WHERE txt IS NOT NULL AND length(txt) > 15",
    "fuzz__txt__field_regex":
        "SELECT count(*) FROM t WHERE txt IS NOT NULL AND NOT regexp_matches(txt, '^[a-z@. ]+$')",
    "fuzz__row_count": "SELECT count(*) FROM t",
}


@pytest.mark.parametrize("seed", [1, 7, 42, 1234])
def test_engine_matches_duckdb_on_random_data(spark, seed):
    rng = np.random.default_rng(seed)
    pdf = _random_frame(rng)
    # NaN in pandas floats → NULL in both engines for comparability
    df = spark.createDataFrame(pdf.where(pd.notnull(pdf), None))

    contract = load_contract_str(CONTRACT)
    run = SparkContractEngine(spark).test(contract, tables={"fuzz": df})

    con = duckdb.connect()
    con.register("t", pdf)
    for key, sql in ORACLE.items():
        check = run.check(key)
        assert check is not None, key
        expected = con.execute(sql).fetchone()[0]
        got = check.diagnostics["value"]
        assert got == expected, (seed, key, got, expected)


@pytest.mark.parametrize("seed", [3, 11, 99])
def test_randomized_constraints_match_duckdb(spark, seed):
    """Constraint VALUES drawn from the seed too: thresholds, ranges,
    lengths, enums all randomized; engine counts must equal DuckDB's."""
    rng = np.random.default_rng(seed)
    pdf = _random_frame(rng, n=400)
    df = spark.createDataFrame(pdf.where(pd.notnull(pdf), None))

    lo = round(float(rng.uniform(0, 40)), 2)
    hi = round(float(rng.uniform(60, 120)), 2)
    min_len = int(rng.integers(1, 5))
    max_len = int(rng.integers(8, 20))
    enum = sorted(rng.choice(["aa", "bb", "cc", "dd", "ee"], size=2, replace=False))

    contract = load_contract_str(f"""
id: fuzz2
version: 0.1.0
schema:
  - name: fuzz
    properties:
      - name: cat
        logicalType: string
        logicalTypeOptions:
          enum: [{enum[0]}, {enum[1]}]
      - name: num
        logicalType: number
        logicalTypeOptions:
          minimum: {lo}
          maximum: {hi}
      - name: txt
        logicalType: string
        logicalTypeOptions:
          minLength: {min_len}
          maxLength: {max_len}
""")
    run = SparkContractEngine(spark).test(contract, tables={"fuzz": df})

    con = duckdb.connect()
    con.register("t", pdf)
    cases = {
        "fuzz__cat__field_enum":
            f"SELECT count(*) FROM t WHERE cat IS NOT NULL AND cat NOT IN ('{enum[0]}','{enum[1]}')",
        "fuzz__num__field_minimum":
            f"SELECT count(*) FROM t WHERE num IS NOT NULL AND NOT isnan(num) AND NOT (num >= {lo})",
        "fuzz__num__field_maximum":
            f"SELECT count(*) FROM t WHERE num IS NOT NULL AND NOT isnan(num) AND NOT (num <= {hi})",
        "fuzz__txt__field_min_length":
            f"SELECT count(*) FROM t WHERE txt IS NOT NULL AND length(txt) < {min_len}",
        "fuzz__txt__field_max_length":
            f"SELECT count(*) FROM t WHERE txt IS NOT NULL AND length(txt) > {max_len}",
    }
    for key, sql in cases.items():
        check = run.check(key)
        expected = con.execute(sql).fetchone()[0]
        got = check.diagnostics["value"]
        assert got == expected, (seed, key, got, expected,
                                 {"lo": lo, "hi": hi, "min_len": min_len,
                                  "max_len": max_len, "enum": enum})
