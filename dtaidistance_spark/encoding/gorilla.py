"""Gorilla time-series block encoding (SURVEY.md §2.9, E1–E3).

Public-paper algorithm (Pelkonen et al., "Gorilla: A Fast, Scalable,
In-Memory Time Series Database", VLDB 2015) — NOT present in the
reference library; mandated by the north rule for retention-tier
storage.

Two bitstreams per block, plus a plain header (count, first_ts,
first_val):

* **timestamps** (§4.1 of the paper): delta-of-delta with bucketed
  control bits — ``0`` (dod==0), ``10``+7b ([-63,64]), ``110``+9b
  ([-255,256]), ``1110``+12b ([-2047,2048]), ``1111``+64b (escape; the
  paper uses 32b — we widen to 64 because our ts axis is int64
  microseconds, documented deviation). The first delta is encoded as a
  dod against an implied previous delta of 0.
* **values** (§4.2): XOR with the previous value's IEEE-754 bits —
  ``0`` (xor==0) or ``11`` + 5b leading-zero-count + 6b
  (significant-bit-count − 1) + the significant bits. The paper's
  ``10`` "reuse previous meaningful window" branch is a compression
  optimization with sequential state; the production encoder here is
  fully **vectorized numpy** (no per-row Python — north rule) and
  always emits the explicit ``11`` form. The decoder implements the
  full three-branch spec, and a slow reference encoder
  (:func:`encode_values_ref`, WITH the ``10`` branch) exists so tests
  prove the decoder against both producers.

Bit packing is vectorized with the repeat/cumsum/packbits trick: every
code word becomes (uint64 value, bit length ≤ 32) fragments;
``np.packbits`` materializes the stream with zero Python per-element
work.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MASK32 = np.uint64(0xFFFFFFFF)


# ---------------------------------------------------------------------------
# fragment packing / unpacking
# ---------------------------------------------------------------------------


def pack_fragments(vals: np.ndarray, lens: np.ndarray) -> bytes:
    """Pack (value, bit-length) code words MSB-first into bytes.

    Each ``lens[i]`` ≤ 32. Fully vectorized: repeat/cumsum to compute
    every output bit's (element, position), one shift, packbits.
    """
    vals = vals.astype(np.uint64)
    lens = lens.astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return b""
    idx = np.repeat(np.arange(len(lens)), lens)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos = np.arange(total) - starts[idx]
    shift = (lens[idx] - 1 - pos).astype(np.uint64)
    bits = ((vals[idx] >> shift) & _U64(1)).astype(np.uint8)
    return np.packbits(bits).tobytes()


class _Reader:
    """Sequential MSB-first bit reader with O(1) field reads.

    Each ``read(n)`` (n ≤ 64) slices a 9-byte window around the cursor
    and shifts — small-int arithmetic only, no per-bit Python loop.
    (72 window bits − 7 max offset = 65 ≥ 64 available.)"""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf + b"\x00" * 9
        self.pos = 0

    def read(self, n: int) -> int:
        p = self.pos
        self.pos = p + n
        chunk = int.from_bytes(self.buf[p >> 3 : (p >> 3) + 9], "big")
        return (chunk >> (72 - (p & 7) - n)) & ((1 << n) - 1)


# ---------------------------------------------------------------------------
# timestamps: delta-of-delta (E2)
# ---------------------------------------------------------------------------

_TS_BUCKETS = (  # (control value, control bits, payload bits, lo, hi)
    (0b10, 2, 7, -63, 64),
    (0b110, 3, 9, -255, 256),
    (0b1110, 4, 12, -2047, 2048),
)


def encode_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode int64 timestamps (sorted); excludes ts[0]
    (stored in the block header). Vectorized bucket selection."""
    ts = np.asarray(ts, dtype=np.int64)
    if len(ts) <= 1:
        return b""
    delta = np.diff(ts)
    dod = np.diff(np.concatenate(([0], delta)))  # first delta vs implied 0
    n = len(dod)
    vals = np.zeros((n, 4), dtype=np.uint64)
    lens = np.zeros((n, 4), dtype=np.int64)
    done = dod == 0  # control '0', 1 bit, value 0
    lens[done, 0] = 1
    for ctrl, cbits, pbits, lo, hi in _TS_BUCKETS:
        m = (~done) & (dod >= lo) & (dod <= hi)
        vals[m, 0] = ctrl
        lens[m, 0] = cbits
        vals[m, 1] = (dod[m] - lo).astype(np.uint64)
        lens[m, 1] = pbits
        done |= m
    rest = ~done
    if rest.any():
        vals[rest, 0] = 0b1111
        lens[rest, 0] = 4
        u = dod[rest].astype(np.int64).view(np.uint64)
        vals[rest, 1] = u >> _U64(32)
        lens[rest, 1] = 32
        vals[rest, 2] = u & _MASK32
        lens[rest, 2] = 32
    return pack_fragments(vals.ravel(), lens.ravel())


def decode_timestamps(buf: bytes, first_ts: int, count: int) -> np.ndarray:
    out = np.empty(count, dtype=np.int64)
    if count == 0:
        return out
    out[0] = first_ts
    if count == 1:
        return out
    r = _Reader(buf)
    read = r.read
    dod = np.zeros(count - 1, dtype=np.int64)
    for i in range(count - 1):
        if read(1) == 0:
            continue
        elif read(1) == 0:  # '10'
            dod[i] = read(7) - 63
        elif read(1) == 0:  # '110'
            dod[i] = read(9) - 255
        elif read(1) == 0:  # '1110'
            dod[i] = read(12) - 2047
        else:  # '1111' + 64
            u = read(64)
            dod[i] = u - (1 << 64) if u >= (1 << 63) else u
    # delta_i = Σ dod, t_i = first + Σ delta — both vectorized
    out[1:] = first_ts + np.cumsum(np.cumsum(dod))
    return out


# ---------------------------------------------------------------------------
# values: XOR float encoding (E1)
# ---------------------------------------------------------------------------


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (x > 0)."""
    # float64 mantissa trick fails above 2^53; use bit_length via log2 on hi/lo
    hi = (x >> _U64(32)).astype(np.uint32)
    lo = (x & _MASK32).astype(np.uint32)
    # 32-bit clz via float32-safe float64 log2
    def clz32(v):
        v = v.astype(np.uint32)
        bl = np.zeros(v.shape, dtype=np.int64)
        nz = v > 0
        bl[nz] = np.floor(np.log2(v[nz].astype(np.float64))).astype(np.int64) + 1
        return 32 - bl
    return np.where(hi > 0, clz32(hi), 32 + clz32(lo))


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (x > 0)."""
    low = (x & (~x + _U64(1)))  # isolate lowest set bit
    return 63 - _clz64(low)


def encode_values(vals: np.ndarray) -> bytes:
    """XOR-encode float64 values; excludes vals[0] (in the header).
    Vectorized; emits '0' or '11'+5b lz +6b (siglen-1)+sig bits."""
    v = np.ascontiguousarray(np.asarray(vals, dtype=np.float64)).view(np.uint64)
    if len(v) <= 1:
        return b""
    x = v[1:] ^ v[:-1]
    n = len(x)
    frag_v = np.zeros((n, 4), dtype=np.uint64)
    frag_l = np.zeros((n, 4), dtype=np.int64)
    zero = x == 0
    frag_l[zero, 0] = 1  # control '0'
    nz = ~zero
    if nz.any():
        xs = x[nz]
        lz = np.minimum(_clz64(xs), 31)  # 5-bit field
        tz = _ctz64(xs)
        siglen = 64 - lz - tz  # 1..64
        sig = xs >> tz.astype(np.uint64)
        # header: '11'(2) + lz(5) + (siglen-1)(6) = 13 bits
        frag_v[nz, 0] = (_U64(0b11) << _U64(11)) | (lz.astype(np.uint64) << _U64(6)) | (siglen - 1).astype(np.uint64)
        frag_l[nz, 0] = 13
        hi_len = np.maximum(siglen - 32, 0)
        lo_len = np.minimum(siglen, 32)
        frag_v[nz, 1] = sig >> np.minimum(lo_len, 63).astype(np.uint64)
        frag_l[nz, 1] = hi_len
        frag_v[nz, 2] = sig & ((_U64(1) << lo_len.astype(np.uint64)) - _U64(1))
        frag_l[nz, 2] = lo_len
    return pack_fragments(frag_v.ravel(), frag_l.ravel())


def encode_values_ref(vals: np.ndarray) -> bytes:
    """Reference (slow, loop) encoder implementing the paper's full
    three-branch scheme INCLUDING the '10' reuse-previous-window branch
    — used in tests to prove the decoder handles all controls."""
    v = np.ascontiguousarray(np.asarray(vals, dtype=np.float64)).view(np.uint64)
    if len(v) <= 1:
        return b""
    frags_v, frags_l = [], []

    def emit(val: int, nbits: int):
        while nbits > 32:
            frags_v.append((val >> (nbits - 32)) & 0xFFFFFFFF)
            frags_l.append(32)
            nbits -= 32
            val &= (1 << nbits) - 1
        frags_v.append(val)
        frags_l.append(nbits)

    prev_lz, prev_tz = -1, -1
    for i in range(1, len(v)):
        x = int(v[i] ^ v[i - 1])
        if x == 0:
            emit(0, 1)
            continue
        lz = min(64 - x.bit_length(), 31)
        tz = (x & -x).bit_length() - 1
        if prev_lz >= 0 and lz >= prev_lz and tz >= prev_tz:
            # '10': reuse previous window
            wlen = 64 - prev_lz - prev_tz
            emit(0b10, 2)
            emit(x >> prev_tz, wlen)
        else:
            siglen = 64 - lz - tz
            emit(0b11, 2)
            emit(lz, 5)
            emit(siglen - 1, 6)
            emit(x >> tz, siglen)
            prev_lz, prev_tz = lz, tz
    return pack_fragments(
        np.asarray(frags_v, dtype=np.uint64), np.asarray(frags_l, dtype=np.int64)
    )


def decode_values(buf: bytes, first_val: float, count: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.float64)
    if count == 1:
        return np.asarray([first_val], dtype=np.float64)
    r = _Reader(buf)
    read = r.read
    xors = np.zeros(count, dtype=np.uint64)
    xors[0] = np.float64(first_val).view(np.uint64)
    lz = tz = 0
    for i in range(1, count):
        if read(1) == 0:
            continue
        elif read(1) == 0:  # '10' reuse window
            xors[i] = read(64 - lz - tz) << tz
        else:  # '11' explicit window
            lz = read(5)
            siglen = read(6) + 1
            tz = 64 - lz - siglen
            xors[i] = read(siglen) << tz
    # prev ^= x chain — vectorized running XOR
    return np.bitwise_xor.accumulate(xors).view(np.float64)


# ---------------------------------------------------------------------------
# block API (E3)
# ---------------------------------------------------------------------------


def encode_block(ts: np.ndarray, vals: np.ndarray) -> dict:
    """Encode one (sorted-by-ts) block -> header fields + bitstreams."""
    ts = np.asarray(ts, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float64)
    assert len(ts) == len(vals)
    n = len(ts)
    return {
        "count": n,
        "first_ts": int(ts[0]) if n else 0,
        "first_val": float(vals[0]) if n else 0.0,
        "ts_block": encode_timestamps(ts),
        "val_block": encode_values(vals),
    }


def decode_block(block: dict) -> tuple[np.ndarray, np.ndarray]:
    n = int(block["count"])
    ts = decode_timestamps(block["ts_block"], int(block["first_ts"]), n)
    vals = decode_values(block["val_block"], float(block["first_val"]), n)
    return ts, vals
