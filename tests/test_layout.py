"""Bucketed-layout tests: uniqueness checks without a shuffle."""

import pytest
from pyspark.sql import functions as F

from datacontract_cli_spark.sources.layout import is_shuffle_free_groupby, write_bucketed
from datacontract_cli_spark.sources.transcripts import synthesize_transcripts


@pytest.fixture(scope="module")
def bucketed_table(spark, tmp_path_factory):
    df = synthesize_transcripts(spark, n_convs=500, turns_per_conv=4,
                                defect_rate=0.1)
    write_bucketed(df, "t_bucketed", bucket_col="conv_id", n_buckets=8,
                   sort_cols=["conv_id", "turn_idx"])
    yield "t_bucketed"
    spark.sql("DROP TABLE IF EXISTS t_bucketed")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_table):
    assert is_shuffle_free_groupby(spark, bucketed_table, "conv_id")
    assert is_shuffle_free_groupby(spark, bucketed_table, "conv_id", "turn_idx")


def test_bucketed_duplicate_count_matches_plain(spark, bucketed_table):
    bt = spark.table(bucketed_table)
    dup_bucketed = bt.groupBy("conv_id", "turn_idx").count().filter("count>1").count()
    plain = synthesize_transcripts(spark, n_convs=500, turns_per_conv=4,
                                   defect_rate=0.1)
    dup_plain = plain.groupBy("conv_id", "turn_idx").count().filter("count>1").count()
    assert dup_bucketed == dup_plain > 0
