"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB over
the same parquet, compare row count + order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _type_family(t: str) -> str:
    """Collapse a type name (Spark dtype or Arrow type string) into a family.

    The driver's value hash is TYPE-sensitive: DuckDB's integer sum()
    returns HUGEINT (arrow decimal128(38,0)) which hash-mismatches Spark's
    BIGINT even when values are identical (r04 pii_scan/pii_scrub).  We
    compare families so that class of bug fails locally too.
    """
    t = t.lower()
    if t.startswith(("decimal", "dec")):
        return "decimal"
    if t.startswith(("tinyint", "smallint", "int", "bigint", "uint")):
        return "int"
    if t.startswith(("float", "double", "halffloat")):
        return "float"
    if t.startswith(("string", "large_string", "varchar", "char", "utf8")):
        return "str"
    if t.startswith("bool"):
        return "bool"
    if t.startswith("timestamp"):
        return "ts"
    if t.startswith("date"):
        return "date"
    if t.startswith(("array", "list", "large_list")):
        return "list"
    return t


def type_mismatches(s_dtypes, o_arrow_schema):
    """Return [(col, spark_family, oracle_family)] for differing families."""
    sfam = {c: _type_family(t) for c, t in s_dtypes}
    out = []
    for field in o_arrow_schema:
        ofam = _type_family(str(field.type))
        sf = sfam.get(field.name)
        if sf is not None and sf != ofam:
            out.append((field.name, sf, ofam))
    return out


def normalize(rows, colnames):
    """Sort columns by name, stringify values, sort rows — order-insensitive."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                elif v == int(v) and abs(v) < 1e15:
                    vals.append(str(int(v)))
                else:
                    vals.append(repr(v))
            elif v is None:
                vals.append("")
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main(sf_dir: str = "/root/testdata/sf0.01", *only: str) -> int:
    """Optional extra args: query names — check only those."""
    import duckdb

    import __spark_entry__ as entry_mod
    from datacontract_cli_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            sdtypes = sdf.dtypes
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name:28s} spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name:28s} spark={len(srows)} (no oracle; rows-only)")
            continue
        try:
            otable = con.execute(oracles[name]).arrow()
            ocols = otable.schema.names
            orows = [tuple(r.values()) for r in otable.to_pylist()]
        except Exception as e:
            print(f"FAIL  {name:28s} duckdb error: {e}")
            failures += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name:28s} schema mismatch: {sorted(scols)} vs {sorted(ocols)}")
            failures += 1
            continue
        tmis = type_mismatches(sdtypes, otable.schema)
        if tmis:
            print(f"FAIL  {name:28s} type mismatch (driver hash is type-sensitive): {tmis}")
            failures += 1
            continue
        sn = normalize(srows, scols)
        on = normalize(orows, ocols)
        if len(sn) != len(on):
            print(f"FAIL  {name:28s} rowcount {len(sn)} vs {len(on)}")
            failures += 1
        elif sn != on:
            diff = [(a, b) for a, b in zip(sn, on) if a != b][:3]
            print(f"FAIL  {name:28s} value mismatch, e.g. {diff}")
            failures += 1
        else:
            print(f"ok    {name:28s} rows={len(sn)}")
    print(f"\n{len(qs)} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
