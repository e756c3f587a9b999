"""32-bit Roaring bitmap codec (the official RoaringFormatSpec
interoperability format) plus Delta Lake's 64-bit ``RoaringBitmapArray``
"portable" framing — the serialization inside Delta deletion vectors.

Why hand-rolled: deletion vectors are how Delta protocol-3 tables mark
removed rows without rewriting data files; reading a modern Delta table
without the delta-spark jar requires decoding them bit-exactly. The
formats are small, public, and fully specified:

* RoaringFormatSpec (github.com/RoaringBitmap/RoaringFormatSpec): a
  sorted set of uint32 packed as per-high-16-bit containers — sorted
  uint16 arrays (cardinality <= 4096), 8 KiB bitsets, or run lists.
  Cookie 12346 = no run containers (+ explicit container count +
  mandatory offset header); cookie 12347 = run containers present
  (count packed in the cookie's high 16 bits, run-flag bitset, offsets
  only when container count >= 4).
* Delta's ``RoaringBitmapArray`` portable format (delta-io/delta
  ``RoaringBitmapArray.scala``, mirrored by delta-rs): ``magic int32 LE
  = 1681511377``, ``int64 LE`` bitmap count, then one standard 32-bit
  roaring serialization per 64-bit "high word" index (index implicit,
  empty bitmaps included), covering row indexes up to 2^63.

The writer always emits array/bitset containers under cookie 12346 (the
simplest universally-readable choice); the reader handles all three
container kinds and both cookies, so DVs produced by delta-spark /
delta-rs (which do emit run containers) decode correctly.

Reference parity: datacontract-cli reads Delta through delta-spark /
deltalake, which embed the same two formats.
"""

from __future__ import annotations

import struct
from typing import List

import numpy as np

SERIAL_COOKIE_NO_RUNCONTAINER = 12346
SERIAL_COOKIE = 12347
NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096  # cardinality above this -> bitset container
RBM_ARRAY_PORTABLE_MAGIC = 1681511377


# ---------------------------------------------------------------------------
# 32-bit roaring
# ---------------------------------------------------------------------------

def serialize_roaring32(values: np.ndarray) -> bytes:
    """Standard-format bytes of a sorted, deduplicated uint32 array.
    Emits cookie 12346 (array/bitset containers only)."""
    values = np.asarray(values, dtype=np.uint64)
    if values.size and (values.max() > 0xFFFFFFFF):
        raise ValueError("serialize_roaring32: value exceeds uint32")
    values = np.unique(values.astype(np.uint32))
    highs = (values >> np.uint32(16)).astype(np.uint16)
    lows = (values & np.uint32(0xFFFF)).astype(np.uint16)
    keys, starts = np.unique(highs, return_index=True)
    n = len(keys)
    bounds = list(starts) + [len(values)]

    out = bytearray()
    out += struct.pack("<II", SERIAL_COOKIE_NO_RUNCONTAINER, n)
    # descriptive header
    payloads: List[bytes] = []
    for i in range(n):
        chunk = lows[bounds[i]:bounds[i + 1]]
        card = len(chunk)
        out += struct.pack("<HH", int(keys[i]), card - 1)
        if card <= _ARRAY_MAX:
            payloads.append(chunk.astype("<u2").tobytes())
        else:
            bits = np.zeros(1024, dtype=np.uint64)
            idx = chunk.astype(np.uint64)
            np.bitwise_or.at(bits, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))
            payloads.append(bits.astype("<u8").tobytes())
    # offset header (mandatory for cookie 12346): absolute byte offsets
    base = len(out) + 4 * n
    for p in payloads:
        out += struct.pack("<I", base)
        base += len(p)
    for p in payloads:
        out += p
    return bytes(out)


def deserialize_roaring32(data: bytes, pos: int = 0) -> "tuple[np.ndarray, int]":
    """Decode one standard-format roaring bitmap starting at ``pos``.
    Returns (sorted uint32 values, next position) — streams decode
    back-to-back bitmaps (Delta's portable array framing needs that)."""
    (cookie,) = struct.unpack_from("<I", data, pos)
    run_flags = b""
    if (cookie & 0xFFFF) == SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        pos += 4
        nflag = (n + 7) // 8
        run_flags = data[pos:pos + nflag]
        pos += nflag
        has_offsets = n >= NO_OFFSET_THRESHOLD
    elif cookie == SERIAL_COOKIE_NO_RUNCONTAINER:
        (n,) = struct.unpack_from("<I", data, pos + 4)
        pos += 8
        has_offsets = True
    else:
        raise ValueError(f"not a roaring bitmap (cookie {cookie})")

    keys = np.empty(n, dtype=np.uint32)
    cards = np.empty(n, dtype=np.int64)
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", data, pos)
        keys[i], cards[i] = k, cm1 + 1
        pos += 4
    if has_offsets:
        pos += 4 * n  # trust sequential layout; offsets are redundant

    def _is_run(i: int) -> bool:
        return bool(run_flags and (run_flags[i // 8] >> (i % 8)) & 1)

    chunks: List[np.ndarray] = []
    for i in range(n):
        base = np.uint32(keys[i]) << np.uint32(16)
        if _is_run(i):
            (n_runs,) = struct.unpack_from("<H", data, pos)
            pos += 2
            runs = np.frombuffer(data, dtype="<u2",
                                 count=2 * n_runs, offset=pos)
            pos += 4 * n_runs
            vals = np.concatenate([
                np.arange(runs[2 * j],
                          int(runs[2 * j]) + int(runs[2 * j + 1]) + 1,
                          dtype=np.uint32)
                for j in range(n_runs)]) if n_runs else \
                np.empty(0, dtype=np.uint32)
            chunks.append(vals + base)
        elif cards[i] <= _ARRAY_MAX:
            vals = np.frombuffer(data, dtype="<u2",
                                 count=int(cards[i]), offset=pos)
            pos += 2 * int(cards[i])
            chunks.append(vals.astype(np.uint32) + base)
        else:
            bits = np.frombuffer(data, dtype="<u8", count=1024, offset=pos)
            pos += 8192
            words = np.unpackbits(
                bits.view(np.uint8), bitorder="little")
            chunks.append(np.nonzero(words)[0].astype(np.uint32) + base)
    vals = (np.concatenate(chunks) if chunks
            else np.empty(0, dtype=np.uint32))
    return vals, pos


# ---------------------------------------------------------------------------
# Delta RoaringBitmapArray (64-bit), portable framing
# ---------------------------------------------------------------------------

def serialize_rbm64_portable(values: np.ndarray) -> bytes:
    """Delta deletion-vector blob bytes for a set of uint64 row indexes."""
    values = np.unique(np.asarray(values, dtype=np.uint64))
    if values.size and int(values.max()) >> 32 >= (1 << 31):
        raise ValueError("row index exceeds RoaringBitmapArray range")
    n_maps = (int(values.max()) >> 32) + 1 if values.size else 0
    out = bytearray(struct.pack("<iq", RBM_ARRAY_PORTABLE_MAGIC, n_maps))
    highs = (values >> np.uint64(32)).astype(np.uint32)
    lows = (values & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    for h in range(n_maps):  # empty bitmaps included: index is implicit
        out += serialize_roaring32(lows[highs == h])
    return bytes(out)


def deserialize_rbm64_portable(data: bytes) -> np.ndarray:
    """Deleted row indexes (sorted uint64) from a DV blob."""
    magic, n_maps = struct.unpack_from("<iq", data, 0)
    if magic != RBM_ARRAY_PORTABLE_MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic} "
                         f"(expected {RBM_ARRAY_PORTABLE_MAGIC})")
    pos = 12
    chunks: List[np.ndarray] = []
    for h in range(n_maps):
        vals, pos = deserialize_roaring32(data, pos)
        if vals.size:
            chunks.append(vals.astype(np.uint64)
                          | (np.uint64(h) << np.uint64(32)))
    return (np.concatenate(chunks) if chunks
            else np.empty(0, dtype=np.uint64))
