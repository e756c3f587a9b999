from pyspark.sql import functions as F

from datacontract_cli_spark.sources.transcripts import synthesize_transcripts
from datacontract_cli_spark.streaming.stateful import conversation_state_stream


def test_stateful_conversation_stats(spark, tmp_path):
    path = str(tmp_path / "stream")
    df = synthesize_transcripts(spark, n_convs=60, turns_per_conv=5,
                                defect_rate=0.2, partitions=4)
    df.write.parquet(path)

    stream = (spark.readStream.schema(spark.read.parquet(path).schema)
              .option("maxFilesPerTrigger", "1").parquet(path))
    out = conversation_state_stream(stream)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("conv_state").start())
    # processAllAvailable never returns under ProcessingTimeTimeout (timeout
    # sweeps keep the query busy) — poll until every conversation's running
    # total matches the batch truth, then stop.
    import time
    batch = spark.read.parquet(path)
    expected = {r["conv_id"]: r["n"] for r in
                batch.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    deadline = time.time() + 120
    while time.time() < deadline:
        got = {r["conv_id"]: r["n_turns"] for r in spark.sql(
            """SELECT conv_id, max(n_turns) AS n_turns FROM conv_state
               GROUP BY conv_id""").collect()}
        if got == expected:
            break
        if q.exception():
            raise AssertionError(q.exception())
        time.sleep(2)
    q.stop()

    # latest state row per conversation
    result = spark.sql("""
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY conv_id ORDER BY n_turns DESC) rn
          FROM conv_state) WHERE rn = 1
    """)
    rows = {r["conv_id"]: r for r in result.collect()}
    # every conversation's turn count is tracked exactly
    assert {k: v["n_turns"] for k, v in rows.items()} == expected
    # duplicate turn_idx injected by defects is detected in at least one conv
    assert any(v["dup_turns"] > 0 for v in rows.values())
    # synthesized timestamps are monotone per conv
    assert all(v["ts_regressions"] == 0 for v in rows.values())


def test_transform_with_state_variant_gated(spark):
    """The modern transformWithStateInPandas formulation exists and builds a
    plan; executing it needs the python protobuf package (absent from this
    image), so execution is skipped unless protobuf is importable."""
    import pytest as _pytest

    from datacontract_cli_spark.sources.transcripts import synthesize_transcripts
    from datacontract_cli_spark.streaming.stateful import conversation_state_stream_tws

    assert conversation_state_stream_tws is not None  # API present in Spark 4
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        _pytest.skip("python protobuf absent: transformWithState runner cannot start")
    import tempfile
    src = tempfile.mkdtemp() + "/t"
    synthesize_transcripts(spark, n_convs=20, turns_per_conv=4,
                           defect_rate=0.2, partitions=2).write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = conversation_state_stream_tws(
        stream.withColumn("ts", stream["ts"].cast("timestamp")))
    q = out.writeStream.outputMode("update").format("memory") \
        .queryName("tws_test").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.table("tws_test").count() > 0
