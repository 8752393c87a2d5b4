"""Bloom-filter membership — the crawl/dedup primitive for "have we
seen this url / document fingerprint before?" at 10^12-row scale.

A Bloom filter with m bits and h hash functions answers membership
with no false negatives and a tunable false-positive rate
(~(1-e^{-hn/m})^h). The canonical deployment: the seen-set (urls
already crawled, fingerprints already emitted) is folded into m bits
ONCE, then shipped to every probe task as a few KB-to-MB broadcast —
replacing a full shuffle join of the probe table against the seen
table. At 10^9 seen keys and m = 8 GB-bits the filter still
broadcasts, while the join would shuffle terabytes.

Determinism: hash_i(v) = int64(first 15 hex chars of
md5('bloom|i|v')) mod m — the same engine-portable md5 draw as
sampling.py, so DuckDB replays bit-identical positions and the
oracle reproduces EXACTLY the same false positives (the FP set is a
pure function of the hash family, not an approximation artifact).

Scale shape:
- build: one codegen projection (h md5s per row) + explode + one
  map-side-combined bit_or aggregate over m/64 words → collect of
  m/64 longs to the driver (the filter itself). No shuffle wider
  than m/64 rows.
- probe: zero shuffle — the filter rides into the task as an array
  literal / broadcast variable; the test is h codegen expressions.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BloomFilter:
    """Immutable built filter: ``words[j]`` holds bits 64j..64j+63."""

    words: tuple[int, ...]
    num_bits: int
    num_hashes: int

    @property
    def set_bits(self) -> int:
        return sum(bin(w & 0xFFFFFFFFFFFFFFFF).count("1") for w in self.words)

    def fp_rate_estimate(self) -> float:
        """Fill-ratio FP estimate (load^h)."""
        return (self.set_bits / float(self.num_bits)) ** self.num_hashes


def _position(col: Column, i: int, num_bits: int) -> Column:
    """Deterministic bit position i for a value — md5-based, portable
    (DuckDB twin: ('0x' || substr(md5('bloom|i|' || v), 1, 15))::BIGINT
    % num_bits)."""
    h = F.md5(F.concat_ws("|", F.lit("bloom"), F.lit(int(i)), col))
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % F.lit(int(num_bits))
    )


def bloom_build(
    df: DataFrame,
    col: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 4,
) -> BloomFilter:
    """Fold ``df[col]`` (cast to string; NULLs skipped) into a Bloom
    filter. ``num_bits`` must be a multiple of 64."""
    if num_bits % 64 != 0 or num_bits <= 0:
        raise ValueError("num_bits must be a positive multiple of 64")
    c = F.col(col).cast("string")
    pos = df.where(c.isNotNull()).select(
        F.explode(
            F.array(*[_position(c, i, num_bits) for i in range(num_hashes)])
        ).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("w"),
            F.expr("shiftleft(1L, cast(pmod(pos, 64) as int))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("bits"))
        .collect()
    )
    arr = [0] * (num_bits // 64)
    for r in words:
        arr[int(r["w"])] = int(r["bits"])
    return BloomFilter(tuple(arr), num_bits, num_hashes)


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: BloomFilter,
    out: str = "maybe_member",
) -> DataFrame:
    """Add boolean ``out``: True iff every hash bit of ``df[col]`` is
    set (possible member — no false negatives); NULL input → False.

    The filter enters the plan as ONE array<long> literal; each test
    is h element_at + bit-mask codegen expressions, no join, no
    shuffle."""
    arr = F.lit(list(bloom.words))
    c = F.col(col).cast("string")
    probed = df
    pcols = []
    for i in range(bloom.num_hashes):
        pc = f"_bloom_p{i}"
        pcols.append(pc)
        probed = probed.withColumn(pc, _position(c, i, bloom.num_bits))
    test = F.lit(True)
    for pc in pcols:
        word = F.element_at(
            arr, ((F.col(pc) / 64).cast("long") + 1).cast("int")
        )
        bit = F.expr(f"shiftleft(1L, cast(pmod({pc}, 64) as int))")
        test = test & (word.bitwiseAND(bit) != 0)
    return probed.withColumn(
        out, F.when(c.isNull(), F.lit(False)).otherwise(test)
    ).drop(*pcols)


def bloom_filter_seen(
    df: DataFrame,
    seen: DataFrame,
    col: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 4,
    out: str = "maybe_seen",
) -> DataFrame:
    """End-to-end: build the filter from ``seen[col]`` and mark each
    ``df`` row whose ``col`` MAY already be in ``seen`` (crawl
    frontier 'already fetched?' / dedup 'fingerprint emitted?'). Rows
    marked False are DEFINITELY new."""
    return bloom_probe(
        df, col, bloom_build(seen, col, num_bits, num_hashes), out=out
    )
