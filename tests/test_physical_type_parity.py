"""Reference parity for dialect-aware physical type comparison.

The assertion MATRIX is the reference's tests/test_physical_type_match.py
(the round-1 verdict item #8 asked for exactly that coverage), re-expressed
as a parametrized decision table over our sqlglot-free comparator
(checks/physical.py). Each row: (declared, actual, dialect, expected
tri-state verdict)."""

import pytest

from datacontract_cli_spark.checks.physical import (
    oracle_char_length,
    physical_type_matches,
    reconstruct_native_type,
)

# (declared physicalType, actual native type, dialect, expected verdict)
MATRIX = [
    # exact + case-insensitivity
    ("uniqueidentifier", "uniqueidentifier", "tsql", True),
    ("UNIQUEIDENTIFIER", "uniqueidentifier", "tsql", True),
    # dialect aliases
    ("int", "integer", "postgres", True),
    ("decimal(10,2)", "numeric(10,2)", "postgres", True),
    # length enforced only when declared
    ("varchar(255)", "varchar(100)", "tsql", False),
    ("varchar", "varchar(255)", "tsql", True),
    # timestamp family collapses timezone variance
    ("timestamp", "timestamp with time zone", "postgres", True),
    ("timestamp", "timestamptz", "postgres", True),
    # genuinely distinct native types
    ("varchar(255)", "nvarchar(255)", "tsql", False),
    # snowflake text family
    ("VARCHAR", "TEXT(16777216)", "snowflake", True),
    ("TEXT", "TEXT(16777216)", "snowflake", True),
    ("VARCHAR(10)", "TEXT(16777216)", "snowflake", False),
    ("VARCHAR(255)", "TEXT", "tsql", False),
    # snowflake numeric families (exact vs approximate stay apart)
    ("BIGINT", "NUMBER(38,0)", "snowflake", True),
    ("INTEGER", "NUMBER(38,0)", "snowflake", True),
    ("REAL", "FLOAT", "snowflake", True),
    ("DOUBLE", "FLOAT", "snowflake", True),
    ("NUMBER", "FLOAT", "snowflake", False),
    ("FLOAT", "NUMBER(12,2)", "snowflake", False),
    # precision enforced only when declared
    ("NUMBER", "NUMBER(12,2)", "snowflake", True),
    ("DECIMAL", "NUMBER(12,2)", "snowflake", True),
    ("NUMERIC", "NUMBER(12,2)", "postgres", True),
    ("NUMBER(5,0)", "NUMBER(12,2)", "snowflake", False),
    # bigquery legacy names == GoogleSQL names
    ("INTEGER", "INT64", "bigquery", True),
    ("FLOAT", "FLOAT64", "bigquery", True),
    ("BOOLEAN", "BOOL", "bigquery", True),
    ("RECORD", "STRUCT<field1 INT64>", "bigquery", True),
    ("SMALLINT", "INT64", "bigquery", True),
    ("BYTEINT", "INT64", "bigquery", True),
    ("STRING", "STRING", "bigquery", True),
    ("NUMERIC", "NUMERIC(10, 2)", "bigquery", True),
    ("STRING", "INT64", "bigquery", False),
    # integer widths stay distinct elsewhere
    ("INTEGER", "BIGINT", "postgres", False),
    # non-numeric types never alias
    ("TIME", "TIMESTAMP", "databricks", False),
    ("TIMESTAMP", "TIME", "databricks", False),
    ("TEXT", "VARCHAR(255)", "mysql", False),
    ("STRING", "VARCHAR(10)", "databricks", False),
    # wrong base type
    ("uniqueidentifier", "int", "tsql", False),
    # cross-dialect declared type -> skip
    ("uniqueidentifier", "varchar", "snowflake", None),
    # exotic oracle types: raw string fallback
    ("ROWID", "ROWID", "oracle", True),
    ("RAW", "RAW(2000)", "oracle", True),
    ("INTERVAL DAY(2) TO SECOND(6)", "INTERVAL DAY(2) TO SECOND(6)", "oracle", True),
    ("ROWID", "UROWID", "oracle", False),
    # empty declared -> skip
    ("", "varchar", "tsql", None),
    (None, "varchar", "tsql", None),
    # athena / trino: hive spellings match the trino reports
    ("varchar", "varchar(255)", "athena", True),
    ("varchar(255)", "varchar(100)", "athena", False),
    ("string", "varchar", "athena", True),
    ("array<string>", "array(varchar)", "athena", True),
    ("string", "varchar", "postgres", False),
    # DECIMAL(p) means DECIMAL(p, 0)
    ("NUMERIC(10)", "numeric(10,0)", "postgres", True),
    ("decimal(10,0)", "decimal(10)", "tsql", True),
    ("decimal(10,2)", "decimal(10)", "tsql", False),
    # snowflake structured types: canonical SHOW COLUMNS renderings,
    # order-insensitive fields, recursion, stripped catalog tokens
    ("OBJECT(a INT, b TEXT)", "OBJECT(a NUMBER(38,0), b VARCHAR(16777216))",
     "snowflake", True),
    ("OBJECT(b TEXT, a INT)", "OBJECT(a INT, b TEXT)", "snowflake", True),
    ("OBJECT(a ARRAY(NUMBER), b OBJECT(c TEXT))",
     "OBJECT(a ARRAY(NUMBER(38,0)), b OBJECT(c VARCHAR(99)))", "snowflake", True),
    ("OBJECT(a INT, b TEXT)", "OBJECT(a INT, c TEXT)", "snowflake", False),
    ("ARRAY(NUMBER)", "ARRAY(VARCHAR(5))", "snowflake", False),
    ("OBJECT(a NUMBER(5,2))", "OBJECT(a NUMBER(38,0))", "snowflake", False),
    ("OBJECT(a INT, b TEXT)", "OBJECT", "snowflake", True),
    ("ARRAY(NUMBER)", "ARRAY", "snowflake", True),
    ("OBJECT(a INT)", "ARRAY", "snowflake", False),
    ("ARRAY(NUMBER)", "ARRAY(NUMBER(38,0))", "snowflake", True),
    ("ARRAY(VARCHAR)", "ARRAY(VARCHAR(16777216))", "snowflake", True),
    ("MAP(VARCHAR, NUMBER)", "MAP(VARCHAR(16777216), NUMBER(38,0))",
     "snowflake", True),
]


@pytest.mark.parametrize("declared,actual,dialect,expected", MATRIX)
def test_matrix(declared, actual, dialect, expected):
    verdict, reason = physical_type_matches(declared, actual, dialect)
    assert verdict is expected, (declared, actual, dialect, verdict, reason)
    if expected is False and declared:
        assert declared in reason or "expected" in reason


def test_reason_quotes_both_sides():
    ok, reason = physical_type_matches("varchar(255)", "varchar(100)", "tsql")
    assert ok is False and "varchar(255)" in reason and "varchar(100)" in reason
    ok2, reason2 = physical_type_matches("uniqueidentifier", "varchar", "snowflake")
    assert ok2 is None and "snowflake" in reason2.lower()


# --- reconstruct_native_type: catalog columns -> parameterized type --------

RECONSTRUCT = [
    # (kwargs, expected)
    (dict(data_type="uniqueidentifier"), "uniqueidentifier"),
    (dict(data_type="varchar", char_len=255), "varchar(255)"),
    (dict(data_type="varchar", char_len=-1), "varchar(max)"),  # SQL Server MAX
    (dict(data_type="decimal", num_precision=10, num_scale=2), "decimal(10,2)"),
    (dict(data_type="decimal", num_precision=10, num_scale=0), "decimal(10)"),
    (dict(data_type="int", num_precision=10, num_scale=0), "int"),
    (dict(data_type=None), None),
    # datetime precision only attaches to types that declare one
    (dict(data_type="date", datetime_precision=0), "date"),
    (dict(data_type="datetime", datetime_precision=3), "datetime"),
    (dict(data_type="smalldatetime", datetime_precision=0), "smalldatetime"),
    (dict(data_type="TIMESTAMP(6)", datetime_precision=6), "TIMESTAMP(6)"),
    (dict(data_type="varchar", char_len=10, datetime_precision=6), "varchar(10)"),
    (dict(data_type="TIMESTAMP_NTZ", datetime_precision=9), "TIMESTAMP_NTZ(9)"),
    # postgres puts precision on the leading word
    (dict(data_type="timestamp without time zone", datetime_precision=6),
     "timestamp(6) without time zone"),
    (dict(data_type="timestamp with time zone", datetime_precision=6),
     "timestamp(6) with time zone"),
]


@pytest.mark.parametrize("kwargs,expected", RECONSTRUCT)
def test_reconstruct(kwargs, expected):
    assert reconstruct_native_type(**kwargs) == expected


RECONSTRUCT_MATCHES = [
    (("NUMBER(38,0)", dict(data_type="NUMBER", num_precision=38, num_scale=0),
      "snowflake"), True),
    (("NUMBER(38)", dict(data_type="NUMBER", num_precision=38, num_scale=0),
      "snowflake"), True),
    (("NUMBER(12,2)", dict(data_type="NUMBER", num_precision=38, num_scale=0),
      "snowflake"), False),
    (("TIMESTAMP_NTZ(9)", dict(data_type="TIMESTAMP_NTZ", datetime_precision=9),
      "snowflake"), True),
    (("TIMESTAMP_NTZ", dict(data_type="TIMESTAMP_NTZ", datetime_precision=9),
      "snowflake"), True),
    (("TIMESTAMP_NTZ(3)", dict(data_type="TIMESTAMP_NTZ", datetime_precision=9),
      "snowflake"), False),
    (("datetime2(7)", dict(data_type="datetime2", datetime_precision=7), "tsql"), True),
    (("time(3)", dict(data_type="time", datetime_precision=3), "tsql"), True),
    (("timestamp(6)", dict(data_type="timestamp without time zone",
                           datetime_precision=6), "postgres"), True),
    (("timestamp", dict(data_type="timestamp without time zone",
                        datetime_precision=6), "postgres"), True),
    (("timestamp(3)", dict(data_type="timestamp without time zone",
                           datetime_precision=6), "postgres"), False),
    (("timestamptz", dict(data_type="timestamp with time zone",
                          datetime_precision=6), "postgres"), True),
    (("NVARCHAR2(50)", dict(data_type="NVARCHAR2", char_len=50), "oracle"), True),
]


@pytest.mark.parametrize("case,expected", RECONSTRUCT_MATCHES)
def test_declared_matches_reconstructed_column(case, expected):
    declared, kwargs, dialect = case
    actual = reconstruct_native_type(**kwargs)
    assert physical_type_matches(declared, actual, dialect)[0] is expected


ORACLE_CHAR_LEN = [
    # ALL_TAB_COLUMNS.DATA_LENGTH is bytes; CHAR_LENGTH is declared chars
    (("NVARCHAR2", 100, 50), 50),
    (("VARCHAR2", 200, 50), 50),
    (("CHAR", 4, 1), 1),
    (("RAW", 2000, 0), 2000),  # RAW declared in bytes, CHAR_LENGTH 0
    (("DATE", 7, 0), None),    # carries no length
    (("NUMBER", 22, 0), None),
    (("VARCHAR2", 50), 50),    # no CHAR_LENGTH column reported
]


@pytest.mark.parametrize("args,expected", ORACLE_CHAR_LEN)
def test_oracle_char_length(args, expected):
    assert oracle_char_length(*args) == expected
