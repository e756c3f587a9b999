"""Quality-rule machinery: percent thresholds, severity downgrade, custom
SQL with placeholders + window functions, library metrics, check filtering
(reference: tests/fixtures/quality/datacontract.yaml semantics)."""

import pytest

from datacontract_cli_spark.engine.executor import SparkContractEngine
from datacontract_cli_spark.model.contract import load_contract_str
from datacontract_cli_spark.model.run import ResultEnum
from datacontract_cli_spark.sources.transcripts import synthesize_transcripts

CONTRACT = """
id: quality-rules
version: 0.1.0
schema:
  - name: transcripts
    properties:
      - name: conv_id
        logicalType: string
      - name: turn_idx
        logicalType: integer
      - name: role
        logicalType: string
        quality:
          - metric: nullValues
            mustBeLessOrEqualTo: 30
            unit: percent
            id: role-null-pct
          - metric: invalidValues
            arguments:
              validValues: [system, user, assistant, tool]
            mustBe: 0
            severity: warning
            id: role-enum-soft
            tags: [drift]
      - name: text
        logicalType: string
    quality:
      - type: library
        metric: rowCount
        mustBeGreaterThan: 10
      - type: sql
        description: p95 turn_idx via window function
        query: >
          SELECT percentile(turn_idx, 0.95) FROM {model}
        mustBeLessThan: 100
      - type: sql
        description: max gap between consecutive turns per conv
        query: >
          SELECT max(gap) FROM (
            SELECT turn_idx - LAG(turn_idx) OVER
              (PARTITION BY conv_id ORDER BY turn_idx) AS gap
            FROM {model})
        mustBeLessOrEqualTo: 1
      - type: custom
        engine: soda
        implementation: "legacy sodacl"
"""


@pytest.fixture(scope="module")
def run(spark):
    contract = load_contract_str(CONTRACT)
    df = synthesize_transcripts(spark, n_convs=100, turns_per_conv=6, defect_rate=0.2)
    return SparkContractEngine(spark).test(contract, tables={"transcripts": df})


def test_percent_threshold(run):
    c = run.check("transcripts__role__field_null_values")
    assert c.result is ResultEnum.passed  # ~5% nulls <= 30%
    assert c.diagnostics["unit"] == "percent"
    assert 0 < c.diagnostics["percent"] < 30
    assert c.diagnostics["row_count"] == 600


def test_severity_downgrades_to_warning(run):
    c = run.check("transcripts__role__field_invalid_values")
    assert c.result is ResultEnum.warning  # violations exist but severity=warning
    assert c.diagnostics["value"] > 0
    assert c.qualityId == "role-enum-soft"
    assert c.tags == ["drift"]


def test_custom_sql_percentile(run):
    c = run.check("transcripts__quality_sql_1")
    assert c.result is ResultEnum.passed
    assert c.diagnostics["value"] < 100


def test_custom_sql_window_function(run):
    c = run.check("transcripts__quality_sql_2")
    # defect data collapses some turn_idx to 1 → gaps can exceed 1
    assert c.result in (ResultEnum.passed, ResultEnum.failed)
    assert c.diagnostics["value"] is not None
    assert c.implementation and "LAG" in c.implementation


def test_legacy_soda_custom_is_warned(run):
    c = run.check("transcripts__quality_custom_3")
    assert c.result is ResultEnum.warning
    assert "no longer supported" in c.reason


def test_run_not_failed_by_warnings_alone(spark):
    contract = load_contract_str("""
id: softonly
version: 0.1.0
schema:
  - name: transcripts
    properties:
      - name: role
        logicalType: string
        quality:
          - metric: nullValues
            mustBe: 0
            severity: info
""")
    df = synthesize_transcripts(spark, n_convs=50, turns_per_conv=4, defect_rate=0.3)
    run = SparkContractEngine(spark).test(contract, tables={"transcripts": df})
    assert run.check("transcripts__role__field_null_values").result is ResultEnum.warning
    assert run.result is ResultEnum.warning


def test_quality_id_filter(spark):
    contract = load_contract_str(CONTRACT)
    df = synthesize_transcripts(spark, n_convs=20, turns_per_conv=4)
    engine = SparkContractEngine(spark)
    run = engine.test(contract, tables={"transcripts": df}, quality_id="role-null-pct")
    assert len(run.checks) == 1
    assert run.checks[0].qualityId == "role-null-pct"
    run2 = engine.test(contract, tables={"transcripts": df}, tag="drift")
    assert len(run2.checks) == 1
    assert run2.checks[0].key == "transcripts__role__field_invalid_values"


def test_dimension_filter(spark):
    contract = load_contract_str(CONTRACT)
    df = synthesize_transcripts(spark, n_convs=20, turns_per_conv=4)
    run = SparkContractEngine(spark).test(contract, tables={"transcripts": df},
                                          dimension="completeness")
    assert run.checks == []  # none of these checks default to completeness


def test_dialect_rewrites_execute_on_spark(spark):
    """Round-2 dialect shim constructs must both rewrite AND execute."""
    from datacontract_cli_spark.checks.dialect import to_spark_sql

    df = spark.createDataFrame(
        [("a", 5, "2024-01-01 00:00:00", "2024-01-03 06:00:00")],
        "name string, x int, a string, b string")
    df.selectExpr("name", "x", "cast(a as timestamp) a",
                  "cast(b as timestamp) b").createOrReplaceTempView("dlt")

    cases = [
        ("SELECT TOP 1 LEN(name) AS l FROM dlt WHERE ISNULL(x, 0) > 1", "tsql",
         lambda r: r[0]["l"] == 1),
        ("SELECT DATEDIFF(day, a, b) AS d, DATEDIFF(hh, a, b) AS h, "
         "CHARINDEX('a', name) AS i FROM dlt", "tsql",
         lambda r: (r[0]["d"], r[0]["h"], r[0]["i"]) == (2, 54, 1)),
        ("SELECT SAFE_DIVIDE(x, 0) AS s, SAFE_DIVIDE(x, 5) AS t FROM dlt", "bigquery",
         lambda r: r[0]["s"] is None and r[0]["t"] == 1.0),
        ("SELECT IFF(x > 1, 'y', 'n') AS v FROM dlt", "snowflake",
         lambda r: r[0]["v"] == "y"),
        ("SELECT count(*) AS n FROM dlt WHERE a < SYSDATE - 1", "oracle",
         lambda r: r[0]["n"] == 1),
    ]
    for q, dialect, check in cases:
        rewritten = to_spark_sql(q, dialect)
        rows = spark.sql(rewritten).collect()
        assert check(rows), (q, rewritten, rows)


def test_dialect_literal_masking_and_grouped_casts(spark):
    """Round-5 dialect fixes (literal masking + paren-group/function
    ``::type`` casts) must both rewrite AND execute on Spark:

    - no rewrite may fire INSIDE a string literal (hyphenated dates must
      not be split by the EXTRACT/minus scanner, ``now()``/``LEN(`` inside a
      compared string must survive, '' escapes stay intact);
    - ``sum(x)::int``, ``(a+b)::bigint`` and ``count(*)::numeric / 2``
      must become CAST(...) over the whole group, not just the last token.
    """
    from datacontract_cli_spark.checks.dialect import to_spark_sql

    df = spark.createDataFrame(
        [("2024-06-01", 5), ("now()", 7)], "s string, x int")
    df.createOrReplaceTempView("dlt_lit")

    cases = [
        # literals survive: hyphenated date compared as a string
        ("SELECT count(*) AS n FROM dlt_lit WHERE s = '2024-06-01'",
         "postgres", lambda r: r[0]["n"] == 1),
        # literal containing now() / LEN( is not rewritten
        ("SELECT count(*) AS n FROM dlt_lit WHERE s = 'now()'",
         "tsql", lambda r: r[0]["n"] == 1),
        # doubled-quote escape inside a literal survives masking
        ("SELECT count(*) AS n FROM dlt_lit WHERE s <> 'it''s-a-test'",
         "postgres", lambda r: r[0]["n"] == 2),
        # function-call cast: whole call is the cast operand
        ("SELECT sum(x)::int AS v FROM dlt_lit",
         "postgres", lambda r: r[0]["v"] == 12),
        # paren-group cast
        ("SELECT (x + 1)::bigint AS v FROM dlt_lit WHERE s = 'now()'",
         "postgres", lambda r: r[0]["v"] == 8),
        # cast binds tighter than the following division
        ("SELECT count(*)::numeric / 2 AS v FROM dlt_lit",
         "postgres", lambda r: float(r[0]["v"]) == 1.0),
    ]
    for q, dialect, check in cases:
        rewritten = to_spark_sql(q, dialect)
        rows = spark.sql(rewritten).collect()
        assert check(rows), (q, rewritten, rows)


QUANTILE_CONTRACT = """
id: quantile-rules
version: 0.1.0
schema:
  - name: ev
    properties:
      - name: k
        logicalType: integer
        primaryKey: true
        primaryKeyPosition: 1
      - name: v
        logicalType: number
        quality:
          - metric: quantile
            arguments: {quantile: 0.5, exact: true}
            mustBeLessThan: 60
            id: v-median
          - metric: quantile
            arguments: {quantile: 0.99, exact: true}
            mustBeLessThan: 60
            id: v-p99
          - metric: quantile
            arguments: {quantile: 0.9}
            mustBeGreaterThan: 0
            id: v-p90-approx
"""


def test_quantile_metric_exact_and_approx(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(k=i, v=float(i)) for i in range(101)])  # v: 0..100
    contract = load_contract_str(QUANTILE_CONTRACT)
    run = SparkContractEngine(spark).test(contract, tables={"ev": df})
    by_id = {c.qualityId: c for c in run.checks if c.qualityId}
    med = by_id["v-median"]
    assert med.result is ResultEnum.passed
    assert med.diagnostics["value"] == 50.0  # exact interpolated median
    p99 = by_id["v-p99"]
    assert p99.result is ResultEnum.failed  # p99 = 99.0, not < 60
    assert p99.diagnostics["value"] == 99.0
    approx = by_id["v-p90-approx"]
    assert approx.result is ResultEnum.passed
    assert 80.0 <= approx.diagnostics["value"] <= 100.0
    # the PK uniqueness check still ran via the merged lane
    assert run.check("ev__k__field_primary_key_unique").result is ResultEnum.passed


def test_quantile_metric_rejects_bad_arguments(spark):
    from pyspark.sql import Row

    bad = QUANTILE_CONTRACT.replace("{quantile: 0.5, exact: true}",
                                    "{quantile: 1.5}")
    contract = load_contract_str(bad)
    df = spark.createDataFrame([Row(k=1, v=1.0)])
    run = SparkContractEngine(spark).test(contract, tables={"ev": df})
    # the out-of-range rule is skipped at compile time, the others survive
    ids = {c.qualityId for c in run.checks if c.qualityId}
    assert "v-median" not in ids and "v-p99" in ids


def test_numeric_string_threshold_compares_numerically():
    """PyYAML parses `mustBeLessThan: 1e12` as a STRING (YAML 1.1 needs a
    dot for scientific floats); the threshold must still compare
    numerically instead of silently failing the check."""
    from datacontract_cli_spark.checks.spec import Op, Threshold

    assert Threshold(Op.LT, "1e12").passes(35.62)
    assert not Threshold(Op.GT, "1e12").passes(35.62)
    assert Threshold(Op.BETWEEN, "1e1", "1e3").passes(100)
    # non-numeric strings still fail closed
    assert not Threshold(Op.LT, "not-a-number").passes(1.0)


_RUN_CONTRACT = """
id: loop-gate
version: 0.1.0
schema:
  - name: transcripts
    properties:
      - name: conv_id
        logicalType: string
        quality:
          - metric: maxRunLength
            mustBeLessThan: 3
            arguments:
              orderBy: [turn_idx]
              actionColumns: [role, tool]
      - name: turn_idx
        logicalType: integer
      - name: role
        logicalType: string
      - name: tool
        logicalType: string
"""


def test_max_run_length_metric(spark):
    from pyspark.sql import functions as F

    contract = load_contract_str(_RUN_CONTRACT)
    healthy = synthesize_transcripts(spark, n_convs=20, turns_per_conv=6,
                                     defect_rate=0.0)
    # synthesized role/tool alternate per turn -> runs of 1-2 at most
    run = SparkContractEngine(spark).test(contract,
                                          tables={"transcripts": healthy})
    chk = run.check("transcripts__conv_id__max_run_length")
    assert chk is not None and chk.result is ResultEnum.passed
    assert chk.diagnostics["value"] < 3

    # inject a retry storm: one conversation repeats the same (role, tool)
    # for 5 consecutive turns
    storm = spark.createDataFrame(
        [("conv-loop", i, "assistant", "search", f"retry {i}")
         for i in range(5)],
        ["conv_id", "turn_idx", "role", "tool", "text"])
    bad = healthy.select("conv_id", "turn_idx", "role", "tool", "text") \
                 .unionByName(storm)
    run2 = SparkContractEngine(spark).test(contract,
                                           tables={"transcripts": bad})
    chk2 = run2.check("transcripts__conv_id__max_run_length")
    assert chk2.result is ResultEnum.failed
    assert chk2.diagnostics["value"] == 5

    # misconfigured action column -> failed with a reason, not a crash
    broken = _RUN_CONTRACT.replace("actionColumns: [role, tool]",
                                   "actionColumns: [no_such_col]")
    run3 = SparkContractEngine(spark).test(load_contract_str(broken),
                                           tables={"transcripts": healthy})
    chk3 = run3.check("transcripts__conv_id__max_run_length")
    assert chk3.result is ResultEnum.failed and "no_such_col" in chk3.reason
