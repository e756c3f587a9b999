"""Live-session Spark importer (reference imports/spark_importer.py:33-90):
reflect a DataFrame / temp view visible in the shared session into a
contract, and validate the reflected contract green against the same data.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datacontract_cli_spark.engine.executor import SparkContractEngine
from datacontract_cli_spark.export import to_odcs_yaml
from datacontract_cli_spark.model.contract import load_contract_str
from datacontract_cli_spark.sources.importers import import_spark


def _df(spark):
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True,
                      metadata={"comment": "display name"}),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField("meta", T.StructType([
            T.StructField("k", T.StringType(), True)]), True),
    ])
    return spark.createDataFrame(
        [(1, "a", 0.5, ["x"], ("v",)), (2, "b", 1.5, [], None)], schema)


def test_import_dataframe_schema(spark):
    contract = import_spark(spark, source="things", dataframe=_df(spark))
    [obj] = contract.schema_objects
    assert obj.name == "things"
    props = {p.name: p for p in obj.properties}
    assert props["id"].logical_type == "integer" and props["id"].required
    assert not props["name"].required
    assert props["name"].description == "display name"  # field comment
    assert props["score"].logical_type == "number"
    assert props["tags"].logical_type == "array"
    assert props["tags"].items.logical_type == "string"
    assert props["meta"].logical_type == "object"
    assert [c.name for c in props["meta"].properties] == ["k"]
    assert contract.servers[0].type == "dataframe"


def test_import_temp_views_by_name(spark):
    _df(spark).createOrReplaceTempView("spark_import_a")
    _df(spark).select("id", "name").createOrReplaceTempView("spark_import_b")
    contract = import_spark(spark, source="spark_import_a, spark_import_b")
    assert [o.name for o in contract.schema_objects] == \
        ["spark_import_a", "spark_import_b"]
    assert len(contract.schema_objects[1].properties) == 2


def test_import_requires_source_or_dataframe(spark):
    with pytest.raises(ValueError, match="dataframe"):
        import_spark(spark)
    with pytest.raises(TypeError, match="DataFrame"):
        import_spark(spark, source="x", dataframe="not a df")


def test_reflected_contract_validates_green_roundtrip(spark):
    """The full loop: temp view -> import -> ODCS YAML -> load -> test
    against the same view must pass (the reflected schema IS the data's)."""
    df = _df(spark)
    df.createOrReplaceTempView("spark_import_roundtrip")
    contract = import_spark(spark, source="spark_import_roundtrip")
    reloaded = load_contract_str(to_odcs_yaml(contract))
    run = SparkContractEngine(spark).test(
        reloaded, tables={"spark_import_roundtrip": df})
    assert run.result.value == "passed", [
        (c.key, c.result.value, c.reason) for c in run.checks
        if c.result.value != "passed"]


def test_import_catalog_table_description(spark):
    spark.sql("DROP TABLE IF EXISTS spark_import_cat")
    spark.sql("CREATE TABLE spark_import_cat (id BIGINT, v STRING) "
              "USING parquet COMMENT 'catalog comment'")
    try:
        contract = import_spark(spark, source="spark_import_cat")
        assert contract.schema_objects[0].description == "catalog comment"
    finally:
        spark.sql("DROP TABLE IF EXISTS spark_import_cat")
