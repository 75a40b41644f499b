"""InBloomFilter scan predicate (≈ KuduBloomFilter / InBloomFilter,
client.h:1763-1806, column_predicate.h:143-149, common.proto:469-478).

Kudu lets an outer engine push a build-side bloom filter into scans so
probe-side rows are dropped at the storage layer (Impala/Spark join
pushdown). Spark's own runtime bloom-filter join rewrite
(spark.sql.optimizer.runtime.bloomFilter.enabled, on in our sessions)
does this automatically inside one query; this class is the parity
surface for the *explicit* API — a bloom built once (possibly from a
different query/cluster) and pushed into ``Table.scan(filters=...)``.

Spark-first design: membership is tested with a pure Column
expression — k xxhash64 probes into a bitset shipped as an
array<bigint> literal — so the predicate runs inside WholeStageCodegen
on executors; no Python UDF, no broadcast variable plumbing. Building
aggregates bit positions distributed (one shuffle of ≤ k·n ints,
deduplicated) and only the bitset (m/64 longs) reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class BloomFilter:
    """Blocked-free classic Bloom filter: k seeded xxhash64 probes mod m."""

    def __init__(self, num_bits: int, num_hashes: int, words: list[int]):
        if num_bits % 64:
            raise ValueError("num_bits must be a multiple of 64")
        self.num_bits = num_bits
        self.num_hashes = num_hashes
        self.words = words  # len == num_bits // 64, signed 64-bit ints

    # -- construction -----------------------------------------------------------

    @staticmethod
    def optimal(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
        import math

        m = max(64, int(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
        m = ((m + 63) // 64) * 64
        k = max(1, round(m / max(1, expected_items) * math.log(2)))
        return m, min(k, 8)

    @classmethod
    def from_df(cls, df: DataFrame, col: str, expected_items: int | None = None,
                fpp: float = 0.01) -> "BloomFilter":
        """Build from a DataFrame column. The heavy work (hashing,
        dedup of bit positions) is distributed; the driver only sets
        bits."""
        if expected_items is None:
            expected_items = df.select(col).distinct().count()
        m, k = cls.optimal(expected_items, fpp)
        # fold bit positions into words executor-side (bit_or is a
        # partial-aggregating built-in): the driver receives at most
        # m/64 (word, bits) rows — O(filter size), never O(k·items)
        rows = (
            df.select(F.explode(F.array(*[
                F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(m)).cast("bigint")
                for i in range(k)
            ])).alias("p"))
            .groupBy((F.col("p") / 64).cast("int").alias("w"))
            .agg(F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT)))"
            ).alias("bits"))
            .collect()
        )
        words = [0] * (m // 64)
        for r in rows:
            words[int(r.w)] = int(r.bits)  # already signed 64-bit longs
        return cls(m, k, words)

    # -- membership expression ---------------------------------------------------

    def might_contain(self, col: str | Column) -> Column:
        """Column expression: True iff all k probe bits are set. Pure
        built-in functions — stays in codegen."""
        c = F.col(col) if isinstance(col, str) else col
        bitset = F.lit(self.words)  # array<bigint> literal
        out = None
        for i in range(self.num_hashes):
            p = F.pmod(F.xxhash64(c, F.lit(i)), F.lit(self.num_bits))
            word = F.element_at(bitset, (p / 64).cast("int") + 1)
            check = F.getbit(word, (p % 64).cast("int")) == 1
            out = check if out is None else (out & check)
        return out

    # -- (de)serialization (scan-token / cross-process parity) -------------------

    def to_json(self) -> dict:
        return {
            "num_bits": self.num_bits,
            "num_hashes": self.num_hashes,
            "words": self.words,
        }

    @staticmethod
    def from_json(d: dict) -> "BloomFilter":
        return BloomFilter(d["num_bits"], d["num_hashes"], list(d["words"]))
