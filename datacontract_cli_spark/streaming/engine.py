"""Continuous contract validation: the FULL batch engine per micro-batch.

``streaming_check_counts`` covers the always-on windowed lane (purely
declarative, watermark-aware). This module is the complementary lane for
checks that need the whole engine — uniqueness, custom SQL, referential
integrity against static dimensions, failed samples: ``foreachBatch``
hands each micro-batch to ``SparkContractEngine.test`` unchanged, so a
streaming source gets byte-identical check semantics, keys and
diagnostics to a batch run of the same contract.

Semantics to be explicit about (they follow from micro-batching, not
from this implementation):

- uniqueness / duplicate_count is WITHIN-batch; cross-batch dedup is a
  stateful operator (``streaming_dedup``), not a contract check.
- freshness is evaluated per batch — exactly what a monitor wants.
- referential integrity joins each batch against the STATIC tables
  passed in ``dim_tables`` (broadcast per batch).

Results land as one JSONL line per micro-batch (run summary + per-check
results). foreachBatch is at-least-once — a crash between the result
write and the streaming commit replays the batch — so the sink is made
idempotent by keying on batch_id: ids already present in the results
file (read once at query start, tracked in-memory after) are
re-validated by Spark but not re-appended, and ``on_result`` does not
re-fire for them.

At scale: foreachBatch re-plans per batch (unavoidable — the engine is
plan-per-run); each batch pays one scan of ITS data only. The validation
throughput ceiling is the batch engine's, which is the benched number.
"""

from __future__ import annotations

import json
import threading
from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession

from datacontract_cli_spark.model.contract import DataContract
from datacontract_cli_spark.model.run import Run


def validate_stream(
    spark: SparkSession,
    contract: DataContract,
    stream: DataFrame,
    model: str,
    dim_tables: Optional[Dict[str, DataFrame]] = None,
    results_path: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    include_failed_samples: bool = False,
    on_result: Optional[Callable[[int, Run], None]] = None,
    available_now: bool = True,
    await_termination: bool = True,
):
    """Run the full contract engine on every micro-batch of ``stream``.

    Returns (query, runs) — ``runs`` is the in-order list of per-batch
    Run objects (populated as batches complete; complete when
    ``available_now`` and ``await_termination``).
    """
    from datacontract_cli_spark.engine.executor import SparkContractEngine

    engine = SparkContractEngine(
        spark, include_failed_samples=include_failed_samples)
    runs: List[Run] = []
    lock = threading.Lock()
    seen_batch_ids: set = set()
    if results_path:
        try:
            with open(results_path, encoding="utf-8") as f:
                seen_batch_ids = {json.loads(line)["batch_id"]
                                  for line in f if line.strip()}
        except FileNotFoundError:
            pass

    def _for_each_batch(batch_df: DataFrame, batch_id: int) -> None:
        with lock:
            if batch_id in seen_batch_ids:
                # at-least-once replay of an already-recorded batch: Spark
                # re-runs it, the sink must not double-append
                return
        tables = dict(dim_tables or {})
        tables[model] = batch_df
        run = engine.test(contract, tables=tables)
        with lock:
            runs.append(run)
            # marked seen only now — a batch that THREW above stays
            # unmarked so Spark's retry re-validates it
            seen_batch_ids.add(batch_id)
        if results_path:
            line = json.dumps({
                "batch_id": batch_id,
                "result": run.result.value,
                "checks": [
                    {"key": c.key, "result": c.result.value,
                     "reason": c.reason,
                     "diagnostics": c.diagnostics}
                    for c in run.checks
                ],
            }, default=str)
            # driver-side append: one line per batch, atomic enough for a
            # single writer (the streaming query owns this file)
            with open(results_path, "a", encoding="utf-8") as f:
                f.write(line + "\n")
        if on_result is not None:
            on_result(batch_id, run)

    writer = stream.writeStream.foreachBatch(_for_each_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now and await_termination:
        query.awaitTermination()
    return query, runs
