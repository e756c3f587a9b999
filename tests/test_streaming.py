"""Structured-Streaming checks driven to completion via a memory sink."""

import pytest
from pyspark.sql import functions as F

from datacontract_cli_spark.checks.spec import CheckSpec, MetricType, Op, Threshold
from datacontract_cli_spark.sources.transcripts import synthesize_transcripts
from datacontract_cli_spark.streaming import checks as sc


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "transcripts")
    synthesize_transcripts(spark, n_convs=200, turns_per_conv=6,
                           defect_rate=0.1, partitions=8).write.parquet(path)
    return path


def test_streaming_check_counts(spark, stream_dir):
    specs = [
        CheckSpec(key="role_missing", category="schema", type="field_required",
                  name="r", model="t", field="role", metric=MetricType.MISSING_COUNT,
                  threshold=Threshold(Op.EQ, 0)),
        CheckSpec(key="role_enum", category="schema", type="field_enum",
                  name="e", model="t", field="role", metric=MetricType.INVALID_COUNT,
                  threshold=Threshold(Op.EQ, 0),
                  valid_values=["system", "user", "assistant", "tool"]),
    ]
    result = sc.run_batch_smoke(
        spark, stream_dir,
        lambda s: sc.streaming_check_counts(s, specs, ts_col="ts", window="1 hour"),
        name="counts_out",
    )
    rows = result.collect()
    assert len(rows) > 1  # multiple event-time windows
    total = sum(r["row_count"] for r in rows)
    assert total == 1200
    # streaming totals equal the batch engine's counts
    batch = spark.read.parquet(stream_dir)
    missing = batch.filter(F.col("role").isNull()).count()
    assert sum(r["role_missing"] for r in rows) == missing


def test_streaming_psi_windows(spark, tmp_path):
    import datetime as dt
    base_t = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # hour 0: exactly the baseline distribution -> psi ~ 0
    for i in range(100):
        role = ["a", "b"][i % 2]
        rows.append((role, base_t + dt.timedelta(seconds=i)))
    # hour 1: heavy drift -> psi >> 0
    for i in range(100):
        role = "a" if i < 90 else "b"
        rows.append((role, base_t + dt.timedelta(hours=1, seconds=i)))
    # hour 2: a NEW category outside the baseline must RAISE the score
    for i in range(100):
        role = ["a", "b"][i % 2] if i < 50 else "zz_new"
        rows.append((role, base_t + dt.timedelta(hours=2, seconds=i)))
    path = str(tmp_path / "psi_stream")
    spark.createDataFrame(rows, "role string, ts timestamp") \
        .repartition(4).write.parquet(path)

    out = sc.run_batch_smoke(
        spark, path,
        lambda s: sc.streaming_psi(s, "role", {"a": 0.5, "b": 0.5},
                                   ts_col="ts", window="1 hour",
                                   watermark="0 seconds"),
        name="psi_out",
    ).orderBy("window_start").collect()
    assert len(out) == 3
    assert all(r["row_count"] == 100 for r in out)
    assert out[0]["psi"] == pytest.approx(0.0, abs=1e-9)
    assert out[1]["psi"] > 0.5            # 90/10 vs 50/50 is severe drift
    assert out[2]["psi"] > out[0]["psi"]  # unseen category alarms
    # window-1 psi equals the scalar formula on the same fractions
    from datacontract_cli_spark.operators.drift import psi_from_fractions
    expect = psi_from_fractions({"a": 0.9, "b": 0.1}, {"a": 0.5, "b": 0.5})
    assert out[1]["psi"] == pytest.approx(expect, abs=1e-6)


def test_streaming_freshness(spark, stream_dir):
    result = sc.run_batch_smoke(
        spark, stream_dir,
        lambda s: sc.streaming_freshness(s, ts_col="ts", window="1 hour"),
        name="fresh_out",
    )
    batch_max = spark.read.parquet(stream_dir).agg(F.max("ts")).first()[0]
    assert max(r["max_ts"] for r in result.collect()) == batch_max


def test_streaming_sessionization(spark, stream_dir):
    result = sc.run_batch_smoke(
        spark, stream_dir,
        lambda s: sc.sessionize_stateful(s, key_col="conv_id", ts_col="ts",
                                         gap="10 minutes"),
        name="sess_out",
    )
    # every conversation's turns are 30s apart → 1 session per conv_id
    rows = result.collect()
    assert len(rows) == spark.read.parquet(stream_dir).select("conv_id").distinct().count()
    assert all(r["n_events"] >= 1 for r in rows)


def test_streaming_jsonschema_validation(spark, tmp_path):
    """The variant-expression JSON-Schema validator is stateless per row, so
    the SAME compiled errors column runs on a stream: invalid-document
    counts per micro-batch window."""
    import json

    from datacontract_cli_spark.operators.jsonschema import compile_errors_column

    docs = [
        {"id": "12345678", "n": 5},
        {"id": "bad", "n": 5},          # pattern violation
        {"id": "12345678", "n": -1},    # minimum violation
        {"id": "12345678", "n": 2},
    ]
    src = tmp_path / "js"
    src.mkdir()
    (src / "a.txt").write_text("\n".join(json.dumps(d) for d in docs))

    schema = {"type": "object", "required": ["id"],
              "properties": {"id": {"type": "string", "pattern": "^[0-9]{8}$"},
                             "n": {"type": "integer", "minimum": 0}}}
    stream = spark.readStream.format("text").load(str(src))
    errors = compile_errors_column("value", schema)
    agg = (stream.select(errors.alias("errors"))
           .agg(F.count(F.lit(1)).alias("rows"),
                F.sum((F.size("errors") > 0).cast("long")).alias("invalid")))
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("js_stream").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    row = spark.table("js_stream").collect()[0]
    assert row["rows"] == 4 and row["invalid"] == 2


def test_streaming_dedup_drops_redelivered_records(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps the first arrival per key: a
    source with planted re-deliveries must come out exactly-once-by-key."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(50):
        ts = base + dt.timedelta(seconds=30 * i)
        rows.append((f"c{i % 20}", i, ts))          # (conv, idx, ts)
        if i % 5 == 0:                               # re-delivery
            rows.append((f"c{i % 20}", i, ts + dt.timedelta(seconds=1)))
    src = str(tmp_path / "dup_stream")
    spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp") \
        .repartition(4).write.parquet(src)

    def build(stream):
        deduped = sc.streaming_dedup(stream, ["conv_id", "turn_idx"],
                                     watermark="1 hour")
        return deduped.groupBy().agg(F.count(F.lit(1)).alias("n"))

    out = sc.run_batch_smoke(spark, src, build, name="dedup_stream")
    assert out.collect()[0]["n"] == 50              # 60 in, 50 unique out


def test_streaming_dedup_counts_per_window(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(3):
        for i in range(10):
            ts = base + dt.timedelta(hours=h, minutes=i)
            rows.append((f"k{h}_{i}", ts))
            rows.append((f"k{h}_{i}", ts))          # every record duplicated
    src = str(tmp_path / "dupwin_stream")
    spark.createDataFrame(rows, "k string, ts timestamp") \
        .repartition(4).write.parquet(src)

    out = sc.run_batch_smoke(
        spark, src,
        lambda s: sc.streaming_dedup_counts(s, ["k"], watermark="2 hours",
                                            window="1 hour"),
        name="dedupwin_stream")
    counts = {r["window_start"].hour: r["n_unique"] for r in out.collect()}
    assert counts == {0: 10, 1: 10, 2: 10}


def test_streaming_jsd_windows(spark, tmp_path):
    import datetime as dt
    base_t = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(100):  # hour 0: exactly baseline -> 0
        rows.append((["a", "b"][i % 2], base_t + dt.timedelta(seconds=i)))
    for i in range(100):  # hour 1: all mass OUTSIDE the baseline -> 1.0
        rows.append(("zz", base_t + dt.timedelta(hours=1, seconds=i)))
    path = str(tmp_path / "jsd_stream")
    spark.createDataFrame(rows, "role string, ts timestamp") \
        .repartition(4).write.parquet(path)
    out = sc.run_batch_smoke(
        spark, path,
        lambda s: sc.streaming_jsd(s, "role", {"a": 0.5, "b": 0.5},
                                   ts_col="ts", window="1 hour",
                                   watermark="0 seconds"),
        name="jsd_out",
    ).orderBy("window_start").collect()
    assert len(out) == 2
    assert out[0]["jsd"] == pytest.approx(0.0, abs=1e-9)
    assert out[1]["jsd"] == pytest.approx(1.0, abs=1e-9)  # bounded max


def test_validate_stream_full_engine_per_batch(spark, tmp_path):
    """foreachBatch lane: the FULL engine per micro-batch — batch-identical
    check keys/results, one JSONL result line per batch, resumable via
    checkpoint."""
    import json
    import os

    from datacontract_cli_spark.model.contract import load_contract
    from datacontract_cli_spark.model.run import ResultEnum
    from datacontract_cli_spark.streaming.engine import validate_stream

    src = str(tmp_path / "in")
    os.makedirs(src)
    # two files → maxFilesPerTrigger=1 forces two micro-batches
    clean = synthesize_transcripts(spark, n_convs=40, turns_per_conv=5)
    bad = synthesize_transcripts(spark, n_convs=40, turns_per_conv=5,
                                 defect_rate=0.3)
    clean.coalesce(1).write.parquet(src + "/f1")
    bad.coalesce(1).write.parquet(src + "/f2")
    contract = load_contract(
        os.path.join(os.path.dirname(__file__), "fixtures",
                     "transcripts_contract.yaml"))
    stream = (spark.readStream.schema(clean.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/*"))
    results = str(tmp_path / "runs.jsonl")
    _, runs = validate_stream(
        spark, contract, stream, "transcripts",
        results_path=results,
        checkpoint_dir=str(tmp_path / "ckpt"))
    assert len(runs) == 2
    # one clean batch, one defective batch — same check keys as batch mode
    verdicts = sorted(r.result.value for r in runs)
    assert verdicts == ["failed", "passed"]
    keys = {c.key for c in runs[0].checks}
    assert "transcripts__primary_key_unique" in keys
    lines = [json.loads(l) for l in open(results)]
    assert [l["batch_id"] for l in lines] == [0, 1]
    assert sorted(l["result"] for l in lines) == ["failed", "passed"]
    # resume: a new identical query against the same checkpoint has no
    # new batches to process — no new result lines
    stream2 = (spark.readStream.schema(clean.schema)
               .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
    _, runs2 = validate_stream(
        spark, contract, stream2, "transcripts",
        results_path=results,
        checkpoint_dir=str(tmp_path / "ckpt"))
    assert runs2 == [] and len(open(results).readlines()) == 2
