"""engine.test_partitioned: Run-shaped per-partition validation + IVF ANN."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datacontract_cli_spark.engine.executor import SparkContractEngine
from datacontract_cli_spark.model.contract import load_contract
from datacontract_cli_spark.model.run import ResultEnum
from datacontract_cli_spark.sources.transcripts import synthesize_transcripts

import os
HERE = os.path.dirname(__file__)


def test_test_partitioned_matches_global(spark, tmp_path):
    contract = load_contract(os.path.join(HERE, "fixtures", "transcripts_contract.yaml"))
    df = synthesize_transcripts(spark, n_convs=300, turns_per_conv=5, defect_rate=0.2)
    engine = SparkContractEngine(spark)
    prun, verdicts = engine.test_partitioned(
        contract, df, "transcripts", checkpoint_dir=str(tmp_path), n_buckets=8)
    grun = engine.test(contract, tables={"transcripts": df})

    # metric values agree with the global run for every shared check
    for pc in prun.checks:
        gc = grun.check(pc.key)
        if gc is None or gc.diagnostics is None:
            continue
        assert pc.diagnostics["value"] == gc.diagnostics["value"], pc.key
        assert pc.result == gc.result, pc.key

    failed = [c for c in prun.checks if c.result is ResultEnum.failed]
    assert failed, "defect data must fail some checks"
    assert all(c.diagnostics["failed_buckets"] for c in failed
               if c.type in ("field_required",))
    assert prun.result is ResultEnum.failed


def test_ivf_topk(spark):
    from datacontract_cli_spark.operators.similarity import IVFIndex, cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qv = [float(x) for x in emb.filter("vec_id = 7").first()["embedding"]]
    ivf = IVFIndex(n_cells=8, seed=42).fit(emb, "embedding")
    assigned = ivf.assign(emb, "embedding").persist()
    assert assigned.count() == emb.count()
    top = ivf.topk(assigned, qv, k=5, nprobe=2).collect()
    assert top[0]["vec_id"] == 7  # the identical vector is found
    assert top[0]["cosine_sim"] == pytest.approx(1.0, abs=1e-9)
    # recall vs brute force at nprobe=4
    brute = {r["vec_id"] for r in cosine_topk(emb, "embedding", qv, 5).collect()}
    approx = {r["vec_id"] for r in ivf.topk(assigned, qv, k=5, nprobe=4).collect()}
    assert len(brute & approx) >= 3
