"""SQL-DDL importer tests.

Mirrors the reference's tests/test_import_sql_{postgres,sqlserver,oracle,
snowflake}.py expectations (datacontract/imports/sql_importer.py) — same
logical types, maxLength, precision/scale, primary-key positions, NOT NULL
semantics, server stubs — then goes one step further: a contract imported
from DDL validates real parquet green through the Spark engine.
"""

import textwrap

import pytest

from datacontract_cli_spark.sources import sql_ddl


POSTGRES_SQL = textwrap.dedent("""
    -- Create the table
    CREATE TABLE public.my_table (
        field_one VARCHAR(10) primary key,
        field_two INT not null,
        field_three TIMESTAMPTZ
    );

    INSERT INTO public.my_table (field_one) VALUES ('CX-263-DU');
""")


def test_postgres_import_matches_reference_expectation():
    c = sql_ddl.import_sql_ddl(POSTGRES_SQL, dialect="postgres")
    assert c.id == "my-data-contract"
    assert c.version == "1.0.0"
    [obj] = c.schema_objects
    assert obj.name == "my_table"
    one, two, three = obj.properties
    assert (one.name, one.logical_type, one.physical_type) == \
        ("field_one", "string", "VARCHAR(10)")
    assert one.primary_key and one.primary_key_position == 1 and one.required
    assert one.options["maxLength"] == 10
    assert (two.logical_type, two.physical_type, two.required) == ("integer", "INT", True)
    assert not two.primary_key
    assert (three.logical_type, three.physical_type, three.required) == \
        ("timestamp", "TIMESTAMPTZ", False)
    [srv] = c.servers
    assert srv.type == "postgres"
    assert srv.schema_ == "public"
    assert srv.options == {"host": "my_host", "database": "my_database", "port": 5432}


def test_sqlserver_bracket_identifiers_and_trailing_comments():
    sql = textwrap.dedent("""
        CREATE TABLE [dbo].[my_table]
        (
          field_pk        INT PRIMARY KEY,  -- Primary key
          field_text      VARCHAR(MAX),     -- Large variable-length string
          field_decimal   DECIMAL(10, 2),
          field_bit       BIT,
          field_guid      UNIQUEIDENTIFIER,
          field_varbinary VARBINARY(100),
          field_dto       DATETIMEOFFSET
        );
    """)
    [obj] = sql_ddl.import_sql_ddl(sql, dialect="sqlserver").schema_objects
    assert obj.name == "my_table"
    by = {p.name: p for p in obj.properties}
    assert by["field_pk"].primary_key and by["field_pk"].primary_key_position == 1
    assert by["field_pk"].options["customProperties"]["description"] == "Primary key"
    assert by["field_text"].logical_type == "string"
    assert "maxLength" not in by["field_text"].options  # MAX is not a digit
    cp = by["field_decimal"].options["customProperties"]
    assert (cp["precision"], cp["scale"]) == (10, 2)
    assert by["field_bit"].logical_type == "boolean"
    assert by["field_guid"].options["format"] == "uuid"
    assert by["field_varbinary"].options["format"] == "binary"
    assert by["field_dto"].logical_type == "timestamp"


def test_oracle_multiword_and_unmapped_types():
    sql = textwrap.dedent("""
        CREATE TABLE field_showcase (
          field_varchar2  VARCHAR2,
          field_number    NUMBER,
          field_ts_tz     TIMESTAMP WITH TIME ZONE,
          field_interval  INTERVAL YEAR TO MONTH,
          field_rowid     ROWID,
          field_raw       RAW
        )
    """)
    [obj] = sql_ddl.import_sql_ddl(sql, dialect="oracle").schema_objects
    by = {p.name: p for p in obj.properties}
    assert by["field_varchar2"].logical_type == "string"        # varchar prefix
    assert by["field_number"].logical_type == "number"
    assert by["field_ts_tz"].logical_type == "timestamp"
    assert by["field_ts_tz"].physical_type == "TIMESTAMP WITH TIME ZONE"
    assert by["field_interval"].logical_type is None            # unmapped
    assert by["field_interval"].physical_type == "INTERVAL YEAR TO MONTH"
    assert by["field_rowid"].logical_type is None
    assert by["field_raw"].options["format"] == "binary"
    assert c_server_count(sql_ddl.import_sql_ddl(sql, dialect="oracle")) == 1


def c_server_count(c):
    return len(c.servers)


def test_snowflake_templating_comments_and_inline_constraints():
    sql = textwrap.dedent("""
        CREATE TABLE IF NOT EXISTS ${database_name}.PUBLIC.my_table (
          field_pk   NUMBER(38,0) NOT NULL autoincrement COMMENT 'Primary key',
          field_str  STRING COMMENT 'It''s quoted',
          field_uni  INT UNIQUE,
          UNIQUE(field_uni)
        );
    """)
    [obj] = sql_ddl.import_sql_ddl(sql, dialect="snowflake").schema_objects
    assert obj.name == "my_table"
    by = {p.name: p for p in obj.properties}
    assert by["field_pk"].required
    cp = by["field_pk"].options["customProperties"]
    assert cp["description"] == "Primary key"
    assert (cp["precision"], cp["scale"]) == (38, 0)
    assert by["field_str"].options["customProperties"]["description"] == "It's quoted"
    assert by["field_uni"].unique


def test_table_level_composite_primary_key_positions():
    sql = """
    CREATE TABLE t (
      b INT,
      a VARCHAR(5),
      c DATE,
      CONSTRAINT pk_t PRIMARY KEY (a, b)
    );
    """
    [obj] = sql_ddl.import_sql_ddl(sql).schema_objects
    by = {p.name: p for p in obj.properties}
    assert by["a"].primary_key and by["a"].primary_key_position == 1
    assert by["b"].primary_key and by["b"].primary_key_position == 2
    assert by["a"].required and by["b"].required
    assert not by["c"].primary_key


def test_multiple_tables_and_no_server_without_dialect():
    sql = "CREATE TABLE t1 (x INT); CREATE TABLE s.t2 (y TEXT);"
    c = sql_ddl.import_sql_ddl(sql)
    assert [o.name for o in c.schema_objects] == ["t1", "t2"]
    assert c.servers == []


def test_nested_generic_types():
    sql = "CREATE TABLE t (a ARRAY<STRING>, s STRUCT<x: INT, y: STRING>, m MAP<STRING, INT>)"
    [obj] = sql_ddl.import_sql_ddl(sql, dialect="databricks").schema_objects
    by = {p.name: p for p in obj.properties}
    assert by["a"].logical_type == "array"
    assert by["s"].logical_type == "object"
    assert by["m"].logical_type is None  # ODCS v3.1 has no map logical type


def test_no_create_table_raises():
    with pytest.raises(ValueError):
        sql_ddl.import_sql_ddl("SELECT 1")


def test_imported_contract_validates_parquet_green(spark):
    """End-to-end: DDL -> contract -> engine.test() over real parquet."""
    from datacontract_cli_spark.engine.executor import SparkContractEngine
    from datacontract_cli_spark.model.run import ResultEnum

    sql = textwrap.dedent("""
        CREATE TABLE nation (
          n_nationkey INT PRIMARY KEY,
          n_name      VARCHAR(25) NOT NULL,
          n_regionkey INT NOT NULL
        );
    """)
    contract = sql_ddl.import_sql_ddl(sql, contract_id="nation-ddl")
    df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    run = SparkContractEngine(spark).test(contract, tables={"nation": df})
    assert run.result is ResultEnum.passed
    keys = {c.key for c in run.checks}
    assert "nation__n_name__field_required" in keys
    assert any("primary_key" in k or "unique" in k for k in keys)


def test_cli_import_sql(tmp_path, capsys):
    from datacontract_cli_spark.cli import main

    p = tmp_path / "ddl.sql"
    p.write_text(POSTGRES_SQL)
    rc = main(["import", "--format", "sql", "--source", str(p),
               "--dialect", "postgres"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "field_one" in out and "maxLength: 10" in out
    rc = main(["import", "--format", "sql", "--source", str(tmp_path / "missing.sql")])
    assert rc == 1


# ---------------------------------------------------------------------------
# shape fuzzing: arbitrary text must raise ValueError or produce a contract —
# never crash with an unexpected exception type
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.text(max_size=400))
def test_sql_importer_never_crashes_on_garbage(text):
    try:
        c = sql_ddl.import_sql_ddl(text)
        assert c.schema_objects  # non-error result must carry tables
    except ValueError:
        pass


_SQL_TOKENS = st.sampled_from([
    "CREATE", "TABLE", "(", ")", ",", ";", "NOT", "NULL", "PRIMARY", "KEY",
    "VARCHAR(10)", "INT", "t", '"q t"', "[b t]", "`x`", "DEFAULT", "'a,b'",
    "COMMENT", "'it''s'", "--", "\n", "${var}", "{{v}}", "$(v)", "<", ">",
    "STRUCT<a: INT>", "CONSTRAINT", "UNIQUE", "TIMESTAMP", "WITH", "TIME",
    "ZONE", "DECIMAL(10,2)", "0xFF",
])


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_SQL_TOKENS, max_size=40))
def test_sql_importer_never_crashes_on_sql_shaped_garbage(tokens):
    try:
        c = sql_ddl.import_sql_ddl(" ".join(tokens))
        assert c.schema_objects
    except ValueError:
        pass
