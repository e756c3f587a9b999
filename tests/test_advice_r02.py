"""Regression tests for the round-2 ADVICE findings.

1. Variant paths with non-identifier keys (covered in
   test_jsonschema_validation.py::test_non_identifier_property_names_resolve).
2. _is_multiline_json must default to LINE mode for unprobeable paths
   (remote schemes) and probe inside local directories.
3. T-SQL rewrites: TOP guard must key on a trailing LIMIT clause, not the
   substring "limit"; CHARINDEX/DATEDIFF must survive nested function calls.
4. compile_errors_column must reject non-object roots (also covered in
   test_jsonschema_validation.py::test_scalar_root_document_is_invalid).
"""

import json

from datacontract_cli_spark.checks.dialect import to_spark_sql
from datacontract_cli_spark.sources import readers


# ---------------------------------------------------------------------------
# multiline-JSON detection
# ---------------------------------------------------------------------------

def test_remote_json_path_defaults_to_line_mode():
    assert readers._is_multiline_json("s3a://bucket/prefix/data.json") is False
    assert readers._is_multiline_json("gs://bucket/data.json") is False
    assert readers._looks_like_array("abfss://c@a.dfs.core.windows.net/d.json") is False


def test_missing_local_path_defaults_to_line_mode(tmp_path):
    assert readers._is_multiline_json(str(tmp_path / "nope.json")) is False


def test_directory_of_ndjson_probes_inner_file(tmp_path):
    d = tmp_path / "nd"
    d.mkdir()
    (d / "part-0.json").write_text('{"a": 1}\n{"a": 2}\n')
    assert readers._is_multiline_json(str(d)) is False


def test_directory_of_array_files_probes_inner_file(tmp_path):
    d = tmp_path / "arr"
    d.mkdir()
    (d / "part-0.json").write_text('[{"a": 1}, {"a": 2}]')
    assert readers._is_multiline_json(str(d)) is True


def test_directory_of_pretty_objects_probes_inner_file(tmp_path):
    d = tmp_path / "pretty"
    d.mkdir()
    (d / "doc.json").write_text(json.dumps({"a": {"b": 1}}, indent=2))
    assert readers._is_multiline_json(str(d)) is True


def test_remote_ndjson_reads_line_mode(spark, tmp_path):
    """file:// URI exercises the scheme-stripping probe end-to-end."""
    p = tmp_path / "data.json"
    p.write_text('{"a": 1}\n{"a": 2}\n{"a": 3}\n')
    df = readers.read_json_lines_df(spark, f"file://{p}", "json")
    assert df.count() == 3


# ---------------------------------------------------------------------------
# T-SQL rewrites
# ---------------------------------------------------------------------------

def test_top_rewrite_ignores_column_named_limit():
    q = "SELECT TOP 3 limit_value FROM t ORDER BY limit_value"
    out = to_spark_sql(q, dialect="tsql")
    assert out.endswith("LIMIT 3")
    assert "TOP" not in out.upper().replace("LIMIT", "")


def test_top_rewrite_skipped_when_limit_clause_present():
    q = "SELECT TOP 3 x FROM t LIMIT 5"
    assert "TOP 3" in to_spark_sql(q, dialect="tsql")


def test_charindex_with_nested_call():
    out = to_spark_sql("SELECT CHARINDEX(upper(sub), coalesce(s, 'a,b')) FROM t",
                       dialect="tsql")
    assert "instr(coalesce(s, 'a,b'), upper(sub))" in out


def test_datediff_with_nested_calls():
    out = to_spark_sql(
        "SELECT DATEDIFF(day, coalesce(a, b), GETDATE()) FROM t", dialect="tsql")
    assert "datediff(current_timestamp(), coalesce(a, b))" in out


def test_datediff_hour_nested():
    out = to_spark_sql("SELECT DATEDIFF(hh, date_trunc('day', a), b) FROM t",
                       dialect="tsql")
    assert "timestampdiff(HOUR, date_trunc('day', a), b)" in out


def test_tsql_rewrites_execute_on_spark(spark):
    spark.sql("SELECT 1 AS limit_value, 'hello,world' AS s, "
              "CAST('2024-01-01 00:00:00' AS TIMESTAMP) AS a, "
              "CAST('2024-01-03 12:00:00' AS TIMESTAMP) AS b"
              ).createOrReplaceTempView("advice_t")
    q = ("SELECT TOP 1 limit_value, CHARINDEX(upper('world'), upper(s)) AS pos, "
         "DATEDIFF(day, coalesce(a, b), b) AS dd FROM advice_t")
    row = spark.sql(to_spark_sql(q, dialect="tsql")).first()
    assert (row["limit_value"], row["pos"], row["dd"]) == (1, 7, 2)
