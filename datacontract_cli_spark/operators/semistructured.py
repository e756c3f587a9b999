"""Semi-structured (JSON string) column operators.

Training-data event/metadata tables routinely carry a JSON-string
column ("props", "metadata", "payload"). These operators validate and
profile such columns without a Python UDF: ``get_json_object`` /
``from_json`` are JVM expressions inside whole-stage codegen, so the
parse cost rides the scan.

The reference validates JSON only at the document level (fastjsonschema
over whole rows); per-field extraction + profiling of an embedded JSON
column is the part a pipeline actually needs when events arrive as
(id, ts, json_blob).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def json_field_stats(df: DataFrame, json_col: str, field: str,
                     group_by: Optional[List[str]] = None,
                     cast: str = "bigint") -> DataFrame:
    """Profile one scalar field of a JSON-string column.

    Per group (or globally): row count, parse failures (malformed JSON or
    missing/uncastable field), and min/avg/max of the extracted value.
    One scan, one (tiny) shuffle keyed by the groups.
    """
    v = F.get_json_object(F.col(json_col), f"$.{field}").cast(cast)
    keys = [F.col(c) for c in (group_by or [])]
    agg = (
        df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(v.isNull(), 1).otherwise(0)).cast("bigint")
            .alias("n_unparsed"),
            F.min(v).alias("min_value"),
            F.round(F.avg(v), 6).alias("avg_value"),
            F.max(v).alias("max_value"),
        )
    )
    return agg.orderBy(*keys) if keys else agg
