"""Iceberg partition transforms: spec-exact ``bucket[N]`` hashing and
``year``/``month``/``day``/``hour`` temporal transforms.

Iceberg buckets with the 32-bit x86 Murmur3 hash (seed 0) over a
canonical byte form — int/long/date/time/timestamp[tz] as the 8-byte
little-endian long, string as UTF-8, decimal as the minimal big-endian
two's-complement unscaled value — then ``(hash & Int.MaxValue) % N``
(Iceberg spec, "Partition Transforms" + Appendix B). Matching the spec
bit-for-bit is what makes a table written here readable by any Iceberg
engine and vice versa: bucket pruning on a foreign table is only correct
if both sides agree on every hash.

NOTE: Spark's builtin ``F.hash`` is also Murmur3 but with seed 42 and a
different canonicalization — it can NOT be used for Iceberg buckets.

The long-input path is fully vectorized in numpy (the transcripts
use-case buckets conv_id/doc_id-style keys); variable-length strings
hash per element inside the Arrow batch.

Reference parity: datacontract-cli binds Iceberg through pyiceberg,
whose pyiceberg.transforms.BucketTransform implements the same spec
function."""

from __future__ import annotations

import struct
from typing import Any, Optional

import numpy as np
import pandas as pd

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Scalar 32-bit x86 Murmur3 (signed result, matching Iceberg/Guava)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data) & ~3
    for i in range(0, n, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[n:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def _rotl32(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def murmur3_32_longs(vals: np.ndarray) -> np.ndarray:
    """Vectorized Murmur3 of int64 values in their 8-byte little-endian
    form (the Iceberg canonicalization for every integral/temporal type):
    exactly two 4-byte blocks per value, no tail."""
    v = vals.astype(np.int64).view(np.uint64)
    h = np.zeros(len(v), dtype=np.uint32)
    with np.errstate(over="ignore"):
        for blk in ((v & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                    (v >> np.uint64(32)).astype(np.uint32)):
            k = blk * _C1
            k = _rotl32(k, 15)
            k = k * _C2
            h ^= k
            h = _rotl32(h, 13)
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h ^= np.uint32(8)  # byte length
        h ^= h >> np.uint32(16)
        h = h * np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h = h * np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h.view(np.int32)


_LONG_TYPES = ("int", "long", "date", "time", "timestamp", "timestamptz")


def min_twos_complement(unscaled: int) -> bytes:
    """Minimal big-endian two's-complement of an int — byte-identical to
    Java's BigInteger.toByteArray(), which is what the Iceberg spec means
    by 'minimum number of bytes' for decimal hashing and bounds. The naive
    (bit_length+8)//8 sizing over-pads exactly the -2^(8k-1) values
    (-128 → ff80 instead of 80), changing the Murmur3 hash."""
    if unscaled >= 0:
        nb = unscaled.bit_length() // 8 + 1
    else:
        nb = (unscaled + 1).bit_length() // 8 + 1
    return unscaled.to_bytes(nb, "big", signed=True)


def uuid_bytes(value: Any) -> bytes:
    """The 16 raw big-endian bytes of a uuid value (spec Appendix B hashes
    uuids as 16 bytes, NOT as their hyphenated string — vector
    f79c3e09-677c-4bbd-a479-3f349cb785e7 → 1488055340)."""
    import uuid as _uuid
    if isinstance(value, _uuid.UUID):
        return value.bytes
    if isinstance(value, (bytes, bytearray)) and len(value) == 16:
        return bytes(value)
    return _uuid.UUID(str(value)).bytes


def bucket_value(value: Any, n: int, type_str: str) -> Optional[int]:
    """Spec bucket of a single value (None stays None — null rows keep a
    null partition value)."""
    if value is None:
        return None
    s = str(type_str)
    if s in _LONG_TYPES:
        data = struct.pack("<q", int(value))
    elif s == "string":
        data = str(value).encode("utf-8")
    elif s == "uuid":
        data = uuid_bytes(value)
    elif s == "binary" or s.startswith("fixed["):
        data = bytes(value)
    elif s.startswith("decimal("):
        data = min_twos_complement(int(value))
    else:
        raise ValueError(f"bucket transform unsupported for type {s!r}")
    return (murmur3_32(data) & 0x7FFFFFFF) % n


# ---------------------------------------------------------------------------
# temporal transforms (Iceberg spec "Partition Transforms"): year/month/day
# of a date or timestamp[tz], hour of a timestamp[tz]. All are ordinal
# offsets from 1970 (years / months / days / hours since epoch), FLOORED —
# values before 1970 get negative ordinals (1969-12-31T23:59:58Z is day -1,
# hour -1, month -1, year -1). Floor (not truncate-toward-zero) is what
# makes the transforms monotonic, and monotonicity is what lets range
# predicates on the source column prune partition values exactly.
# ---------------------------------------------------------------------------

_MICROS_PER_HOUR = 3_600_000_000
_MICROS_PER_DAY = 86_400_000_000

TEMPORAL_UNITS = ("year", "month", "day", "hour")


def _session_tzinfo():
    """tzinfo of the active Spark session (spark.sql.session.timeZone),
    falling back to UTC when no session is active or the zone is unknown."""
    import datetime as _dt

    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is not None:
            name = spark.conf.get("spark.sql.session.timeZone")
            if name:
                if name.upper() in ("UTC", "GMT", "Z"):
                    return _dt.timezone.utc
                from zoneinfo import ZoneInfo

                return ZoneInfo(name)
    except Exception:
        pass
    return _dt.timezone.utc


def _value_micros(value: Any) -> int:
    """Microseconds since epoch of a filter/row value for a timestamp[tz]
    source: accepts datetime (naive = session time zone, matching how Spark
    resolved the written instants), ISO-8601 string, or a raw micros int."""
    import datetime as _dt

    if isinstance(value, bool):
        raise ValueError("boolean is not a timestamp value")
    if isinstance(value, int):
        return value
    if isinstance(value, str):
        value = _dt.datetime.fromisoformat(value)
    if isinstance(value, _dt.datetime):
        if value.tzinfo is None:
            # naive filter values are interpreted in the SESSION time zone
            # (written timestamptz partition values came from unix_micros of
            # instants Spark resolved in the session tz; assuming UTC here
            # would shift the day/hour ordinal and silently drop files in
            # non-UTC sessions). get_spark() pins UTC, so this only differs
            # for externally-created sessions.
            value = value.replace(tzinfo=_session_tzinfo())
        epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
        return (value - epoch) // _dt.timedelta(microseconds=1)
    if isinstance(value, _dt.date):
        return (value - _dt.date(1970, 1, 1)).days * _MICROS_PER_DAY
    raise ValueError(f"cannot interpret {value!r} as a timestamp")


def _value_days(value: Any) -> int:
    """Days since epoch of a filter/row value for a date source."""
    import datetime as _dt

    if isinstance(value, bool):
        raise ValueError("boolean is not a date value")
    if isinstance(value, int):
        return value
    if isinstance(value, str):
        value = _dt.date.fromisoformat(value)
    if isinstance(value, _dt.datetime):
        value = value.date()
    if isinstance(value, _dt.date):
        return (value - _dt.date(1970, 1, 1)).days
    raise ValueError(f"cannot interpret {value!r} as a date")


def temporal_value(value: Any, unit: str, type_str: str) -> Optional[int]:
    """Spec temporal transform of one value (None stays None). ``unit`` is
    year|month|day|hour; ``type_str`` the Iceberg source type. Spec
    examples: day(2017-11-16) = 17486, month = 574, year = 47,
    hour(2017-11-16T22:31:08) = 419686 (17486*24 + 22)."""
    import datetime as _dt

    if value is None:
        return None
    s = str(type_str)
    if s == "date":
        if unit == "hour":
            raise ValueError("hour transform is invalid for date columns "
                             "(Iceberg spec)")
        days = _value_days(value)
    elif s in ("timestamp", "timestamptz"):
        us = _value_micros(value)
        if unit == "hour":
            return us // _MICROS_PER_HOUR  # Python floordiv floors
        days = us // _MICROS_PER_DAY
    else:
        raise ValueError(f"temporal transform unsupported for type {s!r}")
    if unit == "day":
        return days
    d = _dt.date(1970, 1, 1) + _dt.timedelta(days=days)
    if unit == "year":
        return d.year - 1970
    if unit == "month":
        return (d.year - 1970) * 12 + d.month - 1
    raise ValueError(f"unknown temporal unit {unit!r}")


def temporal_column(col_name: str, unit: str, type_str: str):
    """Spark Column computing the spec temporal transform of ``col_name``
    — pure JVM Column math (codegen'd, no Python workers):

    - timestamptz (TimestampType, an instant): exact long arithmetic over
      ``unix_micros`` — ``pmod``-floored integer division, so the result is
      independent of the session time zone AND exact for the full long
      range (no double rounding at partition boundaries).
    - timestamp (TimestampNTZType) / date: Spark's calendar functions on
      NTZ/date values are time-zone-free, so ``to_date``/``year``/``month``
      /``hour`` apply directly.
    """
    from pyspark.sql import functions as F

    s = str(type_str)
    c = F.col(col_name)
    epoch_date = F.lit("1970-01-01").cast("date")

    def _floordiv(d: int):
        # floor(unix_micros / d) in exact long arithmetic: subtracting
        # pmod makes the numerator an exact multiple of d, and SQL `div`
        # is long integer division — no double rounding at partition
        # boundaries anywhere in the long range.
        um = f"unix_micros(`{col_name}`)"
        return F.expr(
            f"CAST(({um} - pmod({um}, {d}L)) DIV {d}L AS INT)")

    if s == "timestamptz":
        if unit == "hour":
            return _floordiv(_MICROS_PER_HOUR)
        day = _floordiv(_MICROS_PER_DAY)
        if unit == "day":
            return day
        d = F.date_add(epoch_date, day)
        if unit == "year":
            return (F.year(d) - F.lit(1970)).cast("int")
        if unit == "month":
            return ((F.year(d) - F.lit(1970)) * F.lit(12)
                    + F.month(d) - F.lit(1)).cast("int")
    elif s == "timestamp":
        d = F.to_date(c)
        day = F.datediff(d, epoch_date)
        if unit == "hour":
            return (day * F.lit(24) + F.hour(c)).cast("int")
        if unit == "day":
            return day.cast("int")
        if unit == "year":
            return (F.year(d) - F.lit(1970)).cast("int")
        if unit == "month":
            return ((F.year(d) - F.lit(1970)) * F.lit(12)
                    + F.month(d) - F.lit(1)).cast("int")
    elif s == "date":
        if unit == "hour":
            raise ValueError("hour transform is invalid for date columns "
                             "(Iceberg spec)")
        if unit == "day":
            return F.datediff(c, epoch_date).cast("int")
        if unit == "year":
            return (F.year(c) - F.lit(1970)).cast("int")
        if unit == "month":
            return ((F.year(c) - F.lit(1970)) * F.lit(12)
                    + F.month(c) - F.lit(1)).cast("int")
    raise ValueError(
        f"temporal transform {unit}({col_name}) unsupported for type {s!r}")


def bucket_column(col_name: str, n: int, type_str: str):
    """Spark Column computing the spec bucket of ``col_name`` — an
    Arrow-batched pandas UDF (numpy-vectorized for integral/temporal
    types). This is the fixture writer's grouping column; at production
    scale bucketing is the real committer's job, but reads of what we
    write must agree with any engine, hence spec hashing here too."""
    from pyspark.sql import functions as F

    s = str(type_str)
    if s in ("date", "time", "timestamp", "timestamptz"):
        raise NotImplementedError(
            f"bucket({col_name}) over {s}: bucket temporal columns is not "
            "supported by this writer — Iceberg's day/hour transforms are "
            "the idiomatic temporal partitioning")

    if s in ("int", "long"):
        @F.pandas_udf("int")
        def _bucket(v: pd.Series) -> pd.Series:
            mask = v.notna()
            out = pd.Series(np.zeros(len(v), dtype=np.int32), index=v.index,
                            dtype="Int32")
            if mask.any():
                h = murmur3_32_longs(v[mask].to_numpy(dtype=np.int64))
                out[mask] = (h & np.int32(0x7FFFFFFF)) % np.int32(n)
            out[~mask] = None
            return out
    else:
        @F.pandas_udf("int")
        def _bucket(v: pd.Series) -> pd.Series:
            return v.map(lambda x: None if x is None
                         else bucket_value(x, n, s)).astype("Int32")

    return _bucket(F.col(col_name))
