"""E10 — integer-encoding byte accounting over token arrays: the
exact sizes the three standard columnar integer encodings would
produce per series, and which wins — the encoding-selection decision
Parquet/ORC writers make per column chunk (Parquet format spec:
DELTA_BINARY_PACKED, RLE_DICTIONARY; protobuf/Avro varint+zigzag),
priced here relationally so a layout pipeline can A/B encodings
without writing a byte.

Per series, ALL INT64-EXACT:

1. ``varint_bytes`` — delta + zigzag + LEB128 varint: d_i = x_i −
   x_{i−1} (d_0 = x_0), z = 2d (d ≥ 0) / −2d−1 (d < 0), bytes(z) by
   the 7-bit-group ladder.  Deltas are bounded by ±50256 ⇒ z < 2¹⁷ ⇒
   ≤ 3 bytes each; the ladder still carries the full 5 rungs.
2. ``bitpack_bytes`` — frame-of-reference + bit-packing in blocks of
   64: per block, width w = bit length of (max − min) (via the
   engine-shared ``length(bin(range))`` — no float log2 anywhere near
   a power of two), block cost = 5 overhead bytes (4-byte reference +
   width byte) + 8·w payload bytes.
3. ``dict_bytes`` — dictionary encoding: 4·n_distinct dictionary +
   ⌈n·bits(n_distinct−1)/8⌉ index payload.

Plus ``raw_bytes`` = 4n, the winner by argmin (ties broken in the
listed order), and compression ratios floor-1e6.

Scale shape: ZERO exchanges — per-row HOFs inside the scan
projection; a pure map job at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_B = 64  # bitpack block length

_FLOOR6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

# LEB128 byte ladder for a non-negative int64 z
_VARBYTES = (
    "CASE WHEN z < 128 THEN 1 WHEN z < 16384 THEN 2"
    " WHEN z < 2097152 THEN 3 WHEN z < 268435456 THEN 4"
    " ELSE 5 END"
)


class _E:
    def __init__(self, eng: str):
        self.sp = eng == "spark"
        self.tr = "transform" if self.sp else "list_transform"
        self.siz = "size" if self.sp else "len"
        self.div = "DIV" if self.sp else "//"

    def el(self, a: str, i) -> str:
        return f"element_at({a}, {i})" if self.sp else f"{a}[{i}]"

    def seq0(self, n) -> str:
        return f"sequence(0, {n} - 1)" if self.sp else f"range({n})"

    def isum(self, arr_body: str) -> str:
        """Σ of an int64 list expression."""
        if self.sp:
            return (
                f"aggregate({arr_body}, CAST(0 AS BIGINT),"
                f" (a, x) -> a + x)"
            )
        return f"list_reduce(list_prepend(CAST(0 AS BIGINT), {arr_body}), (a, x) -> a + x)"

    def tok(self, i) -> str:
        return f"CAST({self.el('tokens', i)} AS BIGINT)"

    def bits(self, x: str) -> str:
        """Bit length of non-negative int64 ``x`` (0 → 0)."""
        return (
            f"CASE WHEN {x} = 0 THEN CAST(0 AS BIGINT)"
            f" ELSE CAST(length(bin({x})) AS BIGINT) END"
        )


def _varint(e: _E) -> str:
    d = (
        f"CASE WHEN i = 0 THEN {e.tok('1')}"
        f" ELSE {e.tok('i + 1')} - {e.tok('i')} END"
    )
    z = f"CASE WHEN d >= 0 THEN 2 * d ELSE -2 * d - 1 END"
    per = (
        f"{e.tr}({e.tr}({e.seq0('n_tok')}, i -> CAST({d} AS BIGINT)),"
        f" d -> CAST({z} AS BIGINT))"
    )
    bytes_arr = f"{e.tr}({per}, z -> CAST({_VARBYTES} AS BIGINT))"
    return e.isum(bytes_arr)


def _bitpack(e: _E) -> str:
    if e.sp:
        blk = f"slice(tokens, b * {_B} + 1, {_B})"
        mx = f"CAST(array_max({blk}) AS BIGINT)"
        mn = f"CAST(array_min({blk}) AS BIGINT)"
    else:
        blk = f"list_slice(tokens, b * {_B} + 1, b * {_B} + {_B})"
        mx = f"CAST(list_max({blk}) AS BIGINT)"
        mn = f"CAST(list_min({blk}) AS BIGINT)"
    w = e.bits(f"({mx} - {mn})")
    nblk = (
        f"(n_tok + {_B} - 1) {e.div} {_B}"
    )
    per_block = (
        f"{e.tr}({e.seq0(nblk)}, b -> CAST(5 + 8 * {w} AS BIGINT))"
    )
    return e.isum(per_block)


def _dict(e: _E) -> str:
    nd = (
        "CAST(size(array_distinct(tokens)) AS BIGINT)"
        if e.sp
        else "CAST(len(list_distinct(tokens)) AS BIGINT)"
    )
    wbits = e.bits(f"(({nd}) - 1)")
    return (
        f"4 * ({nd}) + (CAST(n_tok AS BIGINT) * ({wbits}) + 7)"
        f" {e.div} 8"
    )


_WINNER = (
    "CASE WHEN varint_bytes <= bitpack_bytes"
    " AND varint_bytes <= dict_bytes THEN 'varint'"
    " WHEN bitpack_bytes <= dict_bytes THEN 'bitpack'"
    " ELSE 'dict' END"
)


@register(
    "int_encoding_bytes",
    oracle=synth_sql(_N)
    + f"""
    , s1 AS (
      SELECT doc_id, n_tok,
             {_varint(_E('duck'))} AS varint_bytes,
             {_bitpack(_E('duck'))} AS bitpack_bytes,
             {_dict(_E('duck'))} AS dict_bytes
      FROM synth
    )
    SELECT doc_id, n_tok,
           CAST(4 AS BIGINT) * n_tok AS raw_bytes,
           varint_bytes, bitpack_bytes, dict_bytes,
           {_WINNER} AS winner,
           {_FLOOR6.format(
               x="CAST(varint_bytes AS DOUBLE)"
               " / (CAST(4 AS DOUBLE) * CAST(n_tok AS DOUBLE))")}
             AS varint_ratio,
           {_FLOOR6.format(
               x="CAST(bitpack_bytes AS DOUBLE)"
               " / (CAST(4 AS DOUBLE) * CAST(n_tok AS DOUBLE))")}
             AS bitpack_ratio,
           {_FLOOR6.format(
               x="CAST(dict_bytes AS DOUBLE)"
               " / (CAST(4 AS DOUBLE) * CAST(n_tok AS DOUBLE))")}
             AS dict_ratio
    FROM s1
    """,
)
def int_encoding_bytes(spark, sf_dir):
    """E10: exact per-series byte pricing of delta+zigzag+varint,
    FOR+bitpack(64), and dictionary encoding (module header) — all
    int64, bit widths via length(bin(range)) so no float log2 near
    powers of two; winner by argmin with declared tie order; ratios
    floor-1e6.  Plan: ZERO exchanges — a pure map job."""
    e = _E("spark")
    docs = synth.sequences_df(spark, _N).select("doc_id", "n_tok", "tokens")
    s1 = docs.select(
        "doc_id",
        "n_tok",
        F.expr(_varint(e)).alias("varint_bytes"),
        F.expr(_bitpack(e)).alias("bitpack_bytes"),
        F.expr(_dict(e)).alias("dict_bytes"),
    )
    ratio = (
        lambda c: _FLOOR6.format(
            x=f"CAST({c} AS DOUBLE)"
            f" / (CAST(4 AS DOUBLE) * CAST(n_tok AS DOUBLE))"
        )
    )
    return s1.select(
        "doc_id",
        "n_tok",
        (F.lit(4).cast("long") * F.col("n_tok")).alias("raw_bytes"),
        "varint_bytes",
        "bitpack_bytes",
        "dict_bytes",
        F.expr(_WINNER).alias("winner"),
        F.expr(ratio("varint_bytes")).alias("varint_ratio"),
        F.expr(ratio("bitpack_bytes")).alias("bitpack_ratio"),
        F.expr(ratio("dict_bytes")).alias("dict_ratio"),
    )
