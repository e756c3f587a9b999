"""Pure-Python Delta Lake table support (no delta-spark jar).

Delta's transaction log is newline-delimited JSON actions under
``_delta_log/`` plus an optional parquet checkpoint — all metadata-plane,
all readable driver-side, exactly how the delta kernel plans a scan:

``_last_checkpoint`` (if any) → checkpoint parquet + later
``NNN.json`` commits → replay add/remove actions → live file set +
latest ``metaData`` (whose ``schemaString`` IS a Spark StructType JSON)
→ pruned parquet reads.

Delta data files do NOT contain partition columns (Hive-style, unlike
Iceberg): the log's ``partitionValues`` are authoritative. The scan
groups live files by partition tuple and injects the values as typed
literal columns — one ``spark.read.parquet`` per distinct tuple,
``unionByName`` over groups. Pruning happens before any read: partition
values and per-file ``stats`` JSON (minValues/maxValues) filter the file
list with the same predicate algebra the Iceberg lane uses.

Protocol guard: ``minReaderVersion`` > 1 (column mapping, deletion
vectors) raises an honest ``NotImplementedError`` rather than returning
silently-wrong rows.

Scale: replay cost is O(actions since checkpoint) — the same planning
work delta-spark does on the driver. The writer half emits
protocol-shaped commits + checkpoints for fixtures and tests.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datacontract_cli_spark.sources.iceberg_table import (
    _identity_value_matches,
    _range_may_match,
    _strip_scheme,
)

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_CHECKPOINT_RE = re.compile(r"^(\d{20})\.checkpoint\.parquet$")


# ---------------------------------------------------------------------------
# log replay
# ---------------------------------------------------------------------------

def _log_dir(table_path: str) -> str:
    return os.path.join(_strip_scheme(table_path), "_delta_log")


def _read_checkpoint(path: str) -> List[Dict[str, Any]]:
    """Checkpoint rows -> action dicts (add/remove/metaData/protocol)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    actions: List[Dict[str, Any]] = []
    cols = {name: tbl.column(name).to_pylist()
            for name in tbl.schema.names
            if name in ("add", "remove", "metaData", "protocol")}
    n = tbl.num_rows
    for i in range(n):
        for key, vals in cols.items():
            v = vals[i]
            if v is not None:
                actions.append({key: v})
    return actions


def _replay(table_path: str,
            version: Optional[int] = None) -> Dict[str, Any]:
    """Replay the log to ``version`` (default: latest). Returns
    {files: {path: add_action}, metadata, protocol, version}."""
    log = _log_dir(table_path)
    if not os.path.isdir(log):
        raise FileNotFoundError(f"no _delta_log under {table_path!r}")

    commits: Dict[int, str] = {}
    checkpoints: Dict[int, str] = {}
    for name in os.listdir(log):
        m = _COMMIT_RE.match(name)
        if m:
            commits[int(m.group(1))] = os.path.join(log, name)
        m = _CHECKPOINT_RE.match(name)
        if m:
            checkpoints[int(m.group(1))] = os.path.join(log, name)
    if not commits and not checkpoints:
        raise FileNotFoundError(f"empty _delta_log under {table_path!r}")

    latest = max(list(commits) + list(checkpoints))
    target = latest if version is None else version
    if version is not None and version not in commits \
            and version not in checkpoints:
        raise ValueError(f"delta version {version} not in log "
                         f"(have 0..{latest})")

    start = 0
    actions: List[Dict[str, Any]] = []
    usable_cp = [v for v in checkpoints if v <= target]
    if usable_cp:
        cp = max(usable_cp)
        actions.extend(_read_checkpoint(checkpoints[cp]))
        start = cp + 1
    for v in range(start, target + 1):
        if v not in commits:
            if v in checkpoints:  # checkpoint-only version
                continue
            raise FileNotFoundError(
                f"missing delta commit {v:020d}.json (log truncated "
                "without a covering checkpoint)")
        with open(commits[v]) as f:
            for line in f:
                line = line.strip()
                if line:
                    actions.append(json.loads(line))

    files: Dict[str, Dict[str, Any]] = {}
    metadata: Optional[Dict[str, Any]] = None
    protocol: Optional[Dict[str, Any]] = None
    for a in actions:
        if "add" in a and a["add"]:
            add = a["add"]
            files[add["path"]] = add
        elif "remove" in a and a["remove"]:
            files.pop(a["remove"]["path"], None)
        elif "metaData" in a and a["metaData"]:
            metadata = a["metaData"]
        elif "protocol" in a and a["protocol"]:
            protocol = a["protocol"]
    if metadata is None:
        raise ValueError("delta log has no metaData action")
    if protocol and protocol.get("minReaderVersion", 1) > 1:
        raise NotImplementedError(
            f"delta minReaderVersion {protocol['minReaderVersion']} "
            "(column mapping / deletion vectors) unsupported; "
            "this pure-Python reader handles reader protocol 1")
    return {"files": files, "metadata": metadata,
            "protocol": protocol, "version": target}


def delta_schema(metadata: Dict[str, Any]) -> T.StructType:
    return T.StructType.fromJson(json.loads(metadata["schemaString"]))


def _pv_dict(pv: Any) -> Dict[str, Optional[str]]:
    """partitionValues from a checkpoint parquet MAP column surface as
    [(key, value), ...] through pyarrow's to_pylist; JSON commits give a
    dict. Normalize both."""
    if isinstance(pv, list):
        return dict(pv)
    return pv or {}


def _cast_part(value: Optional[str], dt: T.DataType) -> Any:
    """partitionValues are strings in the log; compare typed."""
    if value is None:
        return None
    if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return int(value)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return float(value)
    if isinstance(dt, T.BooleanType):
        return value.lower() == "true"
    return value


# ---------------------------------------------------------------------------
# pruning + scan
# ---------------------------------------------------------------------------

def plan_delta(table_path: str, version: Optional[int] = None,
               filters: Sequence[Tuple[str, str, Any]] = ()
               ) -> Tuple[Dict[str, Any], List[Dict[str, Any]]]:
    """(state, pruned live add-actions). Partition-value pruning plus
    per-file stats-JSON (minValues/maxValues) pruning."""
    state = _replay(table_path, version)
    st = delta_schema(state["metadata"])
    part_cols = state["metadata"].get("partitionColumns") or []
    types = {f.name: f.dataType for f in st.fields}

    live = []
    for add in state["files"].values():
        keep = True
        pv = _pv_dict(add.get("partitionValues"))
        stats = add.get("stats")
        stats = json.loads(stats) if isinstance(stats, str) and stats else \
            (stats or {})
        if stats.get("numRecords") == 0:
            continue  # zero-row file: nothing to scan
        mins = stats.get("minValues") or {}
        maxs = stats.get("maxValues") or {}
        for (col, op, val) in filters:
            if col in part_cols:
                typed = _cast_part(pv.get(col), types.get(col,
                                                          T.StringType()))
                if not _identity_value_matches(typed, op, val):
                    keep = False
                    break
            if col in mins or col in maxs:
                if not _range_may_match(mins.get(col), maxs.get(col),
                                        op, val):
                    keep = False
                    break
        if keep:
            live.append(add)
    return state, live


def read_delta(spark: SparkSession, table_path: str,
               version: Optional[int] = None,
               filters: Sequence[Tuple[str, str, Any]] = ()) -> DataFrame:
    """Scan a Delta table (optionally time-travelled to ``version``).
    Filters prune files, then are re-applied so results are exact."""
    state, live = plan_delta(table_path, version, filters)
    st = delta_schema(state["metadata"])
    part_cols = state["metadata"].get("partitionColumns") or []
    types = {f.name: f.dataType for f in st.fields}
    data_schema = T.StructType(
        [f for f in st.fields if f.name not in part_cols])
    root = _strip_scheme(table_path)

    if not live:
        df = spark.createDataFrame([], st)
    elif not part_cols:
        paths = [os.path.join(root, a["path"]) for a in live]
        df = spark.read.schema(data_schema).parquet(*paths)
    else:
        # group by partition tuple; inject the log's authoritative
        # partitionValues as typed literals (delta data files lack them)
        groups: Dict[Tuple, List[str]] = {}
        for a in live:
            pv = _pv_dict(a.get("partitionValues"))
            key = tuple(pv.get(c) for c in part_cols)
            groups.setdefault(key, []).append(
                os.path.join(root, a["path"]))
        parts = []
        for key, paths in sorted(groups.items(),
                                 key=lambda kv: tuple(map(str, kv[0]))):
            g = spark.read.schema(data_schema).parquet(*paths)
            for c, raw in zip(part_cols, key):
                g = g.withColumn(
                    c, F.lit(_cast_part(raw, types[c])).cast(types[c]))
            parts.append(g.select(*[f.name for f in st.fields]))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)

    for (col, op, val) in filters:
        c = F.col(col)
        if op == "=":
            df = df.filter(c == F.lit(val))
        elif op == "in":
            df = df.filter(c.isin(list(val)))
        elif op == "<":
            df = df.filter(c < F.lit(val))
        elif op == "<=":
            df = df.filter(c <= F.lit(val))
        elif op == ">":
            df = df.filter(c > F.lit(val))
        elif op == ">=":
            df = df.filter(c >= F.lit(val))
        else:
            raise ValueError(f"unsupported filter op {op!r}")
    return df


def delta_versions(table_path: str) -> List[int]:
    log = _log_dir(table_path)
    out = set()
    for name in os.listdir(log):
        m = _COMMIT_RE.match(name) or _CHECKPOINT_RE.match(name)
        if m:
            out.add(int(m.group(1)))
    return sorted(out)


# ---------------------------------------------------------------------------
# writer (fixtures/tests)
# ---------------------------------------------------------------------------

def _file_stats_json(path: str, schema: T.StructType) -> str:
    """Delta-shaped stats JSON from the parquet footer (numRecords +
    min/max for primitive columns) so the reader's pruning has real
    bounds to work with."""
    import pyarrow.parquet as pq

    simple = {f.name for f in schema.fields
              if isinstance(f.dataType,
                            (T.IntegerType, T.LongType, T.DoubleType,
                             T.FloatType, T.StringType, T.BooleanType))}
    md = pq.ParquetFile(path).metadata
    mins: Dict[str, Any] = {}
    maxs: Dict[str, Any] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            s = col.statistics
            if name not in simple or s is None or not s.has_min_max:
                continue
            lo, hi = s.min, s.max
            if isinstance(lo, bytes):
                lo = lo.decode("utf-8", errors="replace")
                hi = hi.decode("utf-8", errors="replace")
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
    return json.dumps({"numRecords": md.num_rows,
                       "minValues": mins, "maxValues": maxs})


def _next_version(table_path: str) -> int:
    try:
        return max(delta_versions(table_path)) + 1
    except FileNotFoundError:
        return 0


def write_delta_table(df: DataFrame, table_path: str,
                      partition_by: Optional[Sequence[str]] = None,
                      mode: str = "create") -> int:
    """Create (version 0) or append (next version) a protocol-1 Delta
    table. Data files are Hive-style — partition columns live only in the
    log's partitionValues. Returns the committed version. Fixture/test
    scale: partition tuples enumerate driver-side, same caveat as the
    Iceberg writer."""
    import time
    import uuid as _uuid

    root = _strip_scheme(table_path)
    log = _log_dir(table_path)
    part_cols = list(partition_by or [])
    if mode == "append" and os.path.isdir(log):
        state = _replay(table_path)
        part_cols = state["metadata"].get("partitionColumns") or []
        version = _next_version(table_path)
        meta_action = None
    else:
        version = 0
        meta_action = {
            "id": str(_uuid.uuid5(_uuid.NAMESPACE_URL,
                                  os.path.abspath(root))),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(df.schema.jsonValue()),
            "partitionColumns": part_cols,
            "configuration": {},
            "createdTime": int(time.time() * 1000)}
    os.makedirs(log, exist_ok=True)

    schema = df.schema
    data_schema = T.StructType(
        [f for f in schema.fields if f.name not in part_cols])
    groups: List[Tuple[Dict[str, Optional[str]], DataFrame, str]] = []
    if part_cols:
        tuples = [r.asDict() for r in
                  df.select(*part_cols).distinct().collect()]
        tuples.sort(key=lambda d: tuple(str(d[c]) for c in part_cols))
        for pv in tuples:
            cond = None
            for c in part_cols:
                e = (F.col(c).isNull() if pv[c] is None
                     else F.col(c) == F.lit(pv[c]))
                cond = e if cond is None else (cond & e)
            sub = df.filter(cond).drop(*part_cols)
            rel = "/".join(f"{c}={'__HIVE_DEFAULT_PARTITION__' if pv[c] is None else pv[c]}"
                           for c in part_cols)
            groups.append(({c: None if pv[c] is None else str(pv[c])
                            for c in part_cols}, sub, rel))
    else:
        groups.append(({}, df, ""))

    adds = []
    for pv, sub, rel in groups:
        outdir = os.path.join(root, rel, f"v{version}") if rel \
            else os.path.join(root, f"v{version}")
        sub.write.mode("overwrite").parquet(outdir)
        for name in sorted(os.listdir(outdir)):
            if not name.endswith(".parquet"):
                continue
            full = os.path.join(outdir, name)
            stats = _file_stats_json(full, data_schema)
            if json.loads(stats)["numRecords"] == 0:
                os.remove(full)  # Spark emits empty part files for
                continue         # empty task partitions; don't log them
            relpath = os.path.relpath(full, root)
            adds.append({"add": {
                "path": relpath, "partitionValues": pv,
                "size": os.path.getsize(full),
                "modificationTime": int(os.path.getmtime(full) * 1000),
                "dataChange": True,
                "stats": stats}})

    commit_path = os.path.join(log, f"{version:020d}.json")
    with open(commit_path, "w") as f:
        if version == 0:
            f.write(json.dumps(
                {"protocol": {"minReaderVersion": 1,
                              "minWriterVersion": 2}}) + "\n")
        if meta_action is not None:
            f.write(json.dumps({"metaData": meta_action}) + "\n")
        f.write(json.dumps({"commitInfo": {
            "operation": "WRITE" if version == 0 else "APPEND",
            "timestamp": int(time.time() * 1000)}}) + "\n")
        for a in adds:
            f.write(json.dumps(a) + "\n")
    return version


def checkpoint_delta(table_path: str) -> int:
    """Write a parquet checkpoint at the current version (reader then
    starts from it instead of replaying every commit)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    state = _replay(table_path)
    v = state["version"]

    # explicit arrow schema with MAP columns, matching real delta
    # checkpoints (and exercising the reader's map-tuple normalization)
    str_map = pa.map_(pa.string(), pa.string())
    add_t = pa.struct([("path", pa.string()),
                       ("partitionValues", str_map),
                       ("size", pa.int64()),
                       ("modificationTime", pa.int64()),
                       ("dataChange", pa.bool_()),
                       ("stats", pa.string())])
    meta_t = pa.struct([("id", pa.string()),
                        ("format", pa.struct([("provider", pa.string()),
                                              ("options", str_map)])),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        ("configuration", str_map),
                        ("createdTime", pa.int64())])
    proto_t = pa.struct([("minReaderVersion", pa.int32()),
                         ("minWriterVersion", pa.int32())])
    schema = pa.schema([("add", add_t), ("metaData", meta_t),
                        ("protocol", proto_t)])

    def _add_row(add):
        return {"path": add["path"],
                "partitionValues": list(
                    _pv_dict(add.get("partitionValues")).items()),
                "size": add.get("size", 0),
                "modificationTime": add.get("modificationTime", 0),
                "dataChange": bool(add.get("dataChange", True)),
                "stats": add.get("stats") or ""}

    md = dict(state["metadata"])
    md_row = {"id": md.get("id", ""),
              "format": {"provider": (md.get("format") or {}).get(
                  "provider", "parquet"),
                  "options": list(((md.get("format") or {}).get("options")
                                   or {}).items())},
              "schemaString": md["schemaString"],
              "partitionColumns": md.get("partitionColumns") or [],
              "configuration": list((md.get("configuration") or {}).items()),
              "createdTime": md.get("createdTime", 0)}
    proto = state["protocol"] or {"minReaderVersion": 1,
                                  "minWriterVersion": 2}
    rows = [{"add": _add_row(a), "metaData": None, "protocol": None}
            for a in state["files"].values()]
    rows.append({"add": None, "metaData": md_row, "protocol": None})
    rows.append({"add": None, "metaData": None,
                 "protocol": {"minReaderVersion":
                              proto.get("minReaderVersion", 1),
                              "minWriterVersion":
                              proto.get("minWriterVersion", 2)}})
    tbl = pa.Table.from_pylist(rows, schema=schema)
    log = _log_dir(table_path)
    pq.write_table(tbl, os.path.join(log, f"{v:020d}.checkpoint.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": v, "size": len(rows)}, f)
    return v
