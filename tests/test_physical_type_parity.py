"""Reference parity for dialect-aware physical type comparison — the same
assertion matrix as the reference's tests/test_physical_type_match.py,
against our sqlglot-free comparator (checks/physical.py)."""

from datacontract_cli_spark.checks.physical import (
    oracle_char_length,
    physical_type_matches,
    reconstruct_native_type,
)


def test_uniqueidentifier_matches_on_sqlserver():
    ok, reason = physical_type_matches("uniqueidentifier", "uniqueidentifier", "tsql")
    assert ok is True and reason == ""


def test_case_insensitive():
    assert physical_type_matches("UNIQUEIDENTIFIER", "uniqueidentifier", "tsql")[0] is True


def test_dialect_aliases_match():
    assert physical_type_matches("int", "integer", "postgres")[0] is True
    assert physical_type_matches("decimal(10,2)", "numeric(10,2)", "postgres")[0] is True


def test_length_enforced_only_when_declared():
    ok, reason = physical_type_matches("varchar(255)", "varchar(100)", "tsql")
    assert ok is False
    assert "varchar(255)" in reason and "varchar(100)" in reason
    assert physical_type_matches("varchar", "varchar(255)", "tsql")[0] is True


def test_timestamp_matches_timestamptz():
    assert physical_type_matches("timestamp", "timestamp with time zone", "postgres")[0] is True
    assert physical_type_matches("timestamp", "timestamptz", "postgres")[0] is True


def test_distinct_native_types_do_not_match():
    assert physical_type_matches("varchar(255)", "nvarchar(255)", "tsql")[0] is False


def test_snowflake_text_and_varchar_are_the_same_type():
    assert physical_type_matches("VARCHAR", "TEXT(16777216)", "snowflake")[0] is True
    assert physical_type_matches("TEXT", "TEXT(16777216)", "snowflake")[0] is True
    assert physical_type_matches("VARCHAR(10)", "TEXT(16777216)", "snowflake")[0] is False
    assert physical_type_matches("VARCHAR(255)", "TEXT", "tsql")[0] is False


def test_snowflake_numeric_aliases_are_the_same_type():
    assert physical_type_matches("BIGINT", "NUMBER(38,0)", "snowflake")[0] is True
    assert physical_type_matches("INTEGER", "NUMBER(38,0)", "snowflake")[0] is True
    assert physical_type_matches("REAL", "FLOAT", "snowflake")[0] is True
    assert physical_type_matches("DOUBLE", "FLOAT", "snowflake")[0] is True
    assert physical_type_matches("NUMBER", "FLOAT", "snowflake")[0] is False
    assert physical_type_matches("FLOAT", "NUMBER(12,2)", "snowflake")[0] is False


def test_precision_is_only_enforced_when_the_contract_declares_it():
    assert physical_type_matches("NUMBER", "NUMBER(12,2)", "snowflake")[0] is True
    assert physical_type_matches("DECIMAL", "NUMBER(12,2)", "snowflake")[0] is True
    assert physical_type_matches("NUMERIC", "NUMBER(12,2)", "postgres")[0] is True
    assert physical_type_matches("NUMBER(5,0)", "NUMBER(12,2)", "snowflake")[0] is False


def test_bigquery_legacy_type_names_match_googlesql_names():
    assert physical_type_matches("INTEGER", "INT64", "bigquery")[0] is True
    assert physical_type_matches("FLOAT", "FLOAT64", "bigquery")[0] is True
    assert physical_type_matches("BOOLEAN", "BOOL", "bigquery")[0] is True
    assert physical_type_matches("RECORD", "STRUCT<field1 INT64>", "bigquery")[0] is True
    assert physical_type_matches("SMALLINT", "INT64", "bigquery")[0] is True
    assert physical_type_matches("BYTEINT", "INT64", "bigquery")[0] is True


def test_integer_widths_stay_distinct_outside_bigquery():
    assert physical_type_matches("INTEGER", "BIGINT", "postgres")[0] is False


def test_non_numeric_types_never_alias():
    assert physical_type_matches("TIME", "TIMESTAMP", "databricks")[0] is False
    assert physical_type_matches("TIMESTAMP", "TIME", "databricks")[0] is False
    assert physical_type_matches("TEXT", "VARCHAR(255)", "mysql")[0] is False
    assert physical_type_matches("STRING", "VARCHAR(10)", "databricks")[0] is False


def test_wrong_base_type_fails():
    ok, reason = physical_type_matches("uniqueidentifier", "int", "tsql")
    assert ok is False
    assert "uniqueidentifier" in reason


def test_cross_dialect_physicaltype_is_skipped():
    result, reason = physical_type_matches("uniqueidentifier", "varchar", "snowflake")
    assert result is None
    assert "snowflake" in reason.lower() or "not a valid type" in reason.lower()


def test_exotic_oracle_types_match_via_string_fallback():
    assert physical_type_matches("ROWID", "ROWID", "oracle")[0] is True
    assert physical_type_matches("RAW", "RAW(2000)", "oracle")[0] is True
    assert physical_type_matches("INTERVAL DAY(2) TO SECOND(6)",
                                 "INTERVAL DAY(2) TO SECOND(6)", "oracle")[0] is True


def test_exotic_oracle_types_mismatch_when_different():
    assert physical_type_matches("ROWID", "UROWID", "oracle")[0] is False


def test_empty_expected_is_skipped():
    assert physical_type_matches("", "varchar", "tsql")[0] is None
    assert physical_type_matches(None, "varchar", "tsql")[0] is None


def test_bigquery_types_match():
    assert physical_type_matches("STRING", "STRING", "bigquery")[0] is True
    assert physical_type_matches("NUMERIC", "NUMERIC(10, 2)", "bigquery")[0] is True
    assert physical_type_matches("STRING", "INT64", "bigquery")[0] is False


def test_athena_types_match():
    assert physical_type_matches("varchar", "varchar(255)", "athena")[0] is True
    assert physical_type_matches("varchar(255)", "varchar(100)", "athena")[0] is False


def test_athena_hive_spellings_match_trino_reports():
    assert physical_type_matches("string", "varchar", "athena")[0] is True
    assert physical_type_matches("array<string>", "array(varchar)", "athena")[0] is True
    assert physical_type_matches("string", "varchar", "postgres")[0] is False


def test_snowflake_declared_scale_zero_matches_reconstructed_column():
    reconstructed = reconstruct_native_type("NUMBER", num_precision=38, num_scale=0)
    assert physical_type_matches("NUMBER(38,0)", reconstructed, "snowflake")[0] is True
    assert physical_type_matches("NUMBER(38)", reconstructed, "snowflake")[0] is True
    assert physical_type_matches("NUMBER(12,2)", reconstructed, "snowflake")[0] is False


def test_declared_fractional_seconds_precision_matches_its_own_column():
    reconstructed = reconstruct_native_type("TIMESTAMP_NTZ", datetime_precision=9)
    assert reconstructed == "TIMESTAMP_NTZ(9)"
    assert physical_type_matches("TIMESTAMP_NTZ(9)", reconstructed, "snowflake")[0] is True
    assert physical_type_matches("TIMESTAMP_NTZ", reconstructed, "snowflake")[0] is True
    assert physical_type_matches("TIMESTAMP_NTZ(3)", reconstructed, "snowflake")[0] is False
    assert physical_type_matches(
        "datetime2(7)", reconstruct_native_type("datetime2", datetime_precision=7), "tsql")[0] is True
    assert physical_type_matches(
        "time(3)", reconstruct_native_type("time", datetime_precision=3), "tsql")[0] is True


def test_postgres_precision_goes_on_the_leading_word():
    reconstructed = reconstruct_native_type("timestamp without time zone", datetime_precision=6)
    assert reconstructed == "timestamp(6) without time zone"
    assert physical_type_matches("timestamp(6)", reconstructed, "postgres")[0] is True
    assert physical_type_matches("timestamp", reconstructed, "postgres")[0] is True
    assert physical_type_matches("timestamp(3)", reconstructed, "postgres")[0] is False
    with_tz = reconstruct_native_type("timestamp with time zone", datetime_precision=6)
    assert with_tz == "timestamp(6) with time zone"
    assert physical_type_matches("timestamptz", with_tz, "postgres")[0] is True


def test_datetime_precision_is_only_added_to_types_that_declare_one():
    assert reconstruct_native_type("date", datetime_precision=0) == "date"
    assert reconstruct_native_type("datetime", datetime_precision=3) == "datetime"
    assert reconstruct_native_type("smalldatetime", datetime_precision=0) == "smalldatetime"
    assert reconstruct_native_type("TIMESTAMP(6)", datetime_precision=6) == "TIMESTAMP(6)"
    assert reconstruct_native_type("varchar", char_len=10, datetime_precision=6) == "varchar(10)"


def test_oracle_length_is_read_in_characters_not_bytes():
    assert oracle_char_length("NVARCHAR2", 100, 50) == 50
    assert oracle_char_length("VARCHAR2", 200, 50) == 50
    assert oracle_char_length("CHAR", 4, 1) == 1
    assert oracle_char_length("RAW", 2000, 0) == 2000
    assert oracle_char_length("DATE", 7, 0) is None
    assert oracle_char_length("NUMBER", 22, 0) is None
    assert oracle_char_length("VARCHAR2", 50) == 50
    assert physical_type_matches("NVARCHAR2(50)",
                                 reconstruct_native_type("NVARCHAR2", 50), "oracle")[0] is True


def test_decimal_missing_scale_means_scale_zero():
    assert physical_type_matches("NUMERIC(10)", "numeric(10,0)", "postgres")[0] is True
    assert physical_type_matches("decimal(10,0)", "decimal(10)", "tsql")[0] is True
    assert physical_type_matches("decimal(10,2)", "decimal(10)", "tsql")[0] is False


def test_snowflake_structured_object_matches_show_columns_rendering():
    assert physical_type_matches(
        "OBJECT(a INT, b TEXT)", "OBJECT(a NUMBER(38,0), b VARCHAR(16777216))",
        "snowflake")[0] is True
    assert physical_type_matches("OBJECT(b TEXT, a INT)", "OBJECT(a INT, b TEXT)",
                                 "snowflake")[0] is True
    assert physical_type_matches(
        "OBJECT(a ARRAY(NUMBER), b OBJECT(c TEXT))",
        "OBJECT(a ARRAY(NUMBER(38,0)), b OBJECT(c VARCHAR(99)))", "snowflake")[0] is True
    assert physical_type_matches("OBJECT(a INT, b TEXT)", "OBJECT(a INT, c TEXT)",
                                 "snowflake")[0] is False
    assert physical_type_matches("ARRAY(NUMBER)", "ARRAY(VARCHAR(5))", "snowflake")[0] is False
    assert physical_type_matches("OBJECT(a NUMBER(5,2))", "OBJECT(a NUMBER(38,0))",
                                 "snowflake")[0] is False


def test_snowflake_structured_object_matches_stripped_catalog_token():
    assert physical_type_matches("OBJECT(a INT, b TEXT)", "OBJECT", "snowflake")[0] is True
    assert physical_type_matches("ARRAY(NUMBER)", "ARRAY", "snowflake")[0] is True
    assert physical_type_matches("OBJECT(a INT)", "ARRAY", "snowflake")[0] is False


def test_snowflake_array_element_parameters():
    assert physical_type_matches("ARRAY(NUMBER)", "ARRAY(NUMBER(38,0))", "snowflake")[0] is True
    assert physical_type_matches("ARRAY(VARCHAR)", "ARRAY(VARCHAR(16777216))", "snowflake")[0] is True
    assert physical_type_matches("MAP(VARCHAR, NUMBER)",
                                 "MAP(VARCHAR(16777216), NUMBER(38,0))", "snowflake")[0] is True


def test_reconstruct_plain_type():
    assert reconstruct_native_type("uniqueidentifier") == "uniqueidentifier"
    assert reconstruct_native_type("varchar", char_len=255) == "varchar(255)"
    assert reconstruct_native_type("varchar", char_len=-1) == "varchar(max)"
    assert reconstruct_native_type("decimal", num_precision=10, num_scale=2) == "decimal(10,2)"
    assert reconstruct_native_type("decimal", num_precision=10, num_scale=0) == "decimal(10)"
    assert reconstruct_native_type("int", num_precision=10, num_scale=0) == "int"
    assert reconstruct_native_type(None) is None
