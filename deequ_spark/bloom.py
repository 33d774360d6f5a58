"""Expression-native Bloom-filter join pruning.

The 100 TB problem this solves: a fact-side shuffle is the single most
expensive step of a big join, and most of what it ships are rows that
will never match. When the dimension side is too large to BROADCAST as
rows (Spark then picks a sort-merge join and shuffles BOTH sides), its
KEY SET still compresses into a few megabytes of Bloom bits — small
enough to evaluate map-side on every fact row before the exchange, so
the shuffle carries only probable matches. Spark's own runtime bloom
join (``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects the
same idea opportunistically but only under planner thresholds and only
inside a join; this module makes the filter an explicit, plan-assertable
operator, and the standalone ``bloom_might_contain`` expression also
serves NON-join probes — e.g. classifying a crawl batch against a
persisted dedup index without touching the index rows
(cf. llm/incremental.py, whose classify step is a join today).

Everything is pure Catalyst expressions — no UDF, no Python on the hot
path, ANSI-safe arithmetic:

* build: k hash positions per key (Kirsch-Mitzenmacher double hashing
  off two ``xxhash64`` seeds — position_i = (h1 + i·h2) mod m computed
  in residue space so no intermediate exceeds 2^40), one
  ``groupBy(word)``/``bit_or`` over at most m/64 rows, collected as a
  dense ``array<long>`` (m ≤ 2^24 bits → ≤ 2 MB).
* probe: the bitmap rides the plan as an array literal; membership is
  k O(1) ``element_at`` + bit tests inside whole-stage codegen.

Both joins return EXACT results: the Bloom filter only prunes.
``bloom_semi_join`` verifies bloom-positives with a real left-semi
join; ``bloom_anti_join`` passes bloom-NEGATIVES through directly
(a Bloom no is a certain no) and left-anti-verifies only the positives,
so at high selectivity the expensive join sees a small fraction of the
fact side either way.

No reference-repo counterpart: this is a Spark-first scale utility in
the spirit of deequ's ReferentialIntegrity (comparison.py) — and
composes with it: referential-integrity checking over a 100 TB fact
table is ``bloom_anti_join(fact, dim, key)`` counting survivors.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# residue-space double hashing keeps every intermediate far below 2^62
# (ANSI mode throws on long overflow): terms are < m ≤ 2^24, i ≤ 64
_MAX_BITS_DEFAULT = 1 << 23          # 1 MB of plan literal
_MAX_BITS_HARD = 1 << 24             # 2 MB — beyond this, rethink the dim
_MAX_HASHES = 16


def _positions(key: Column, k: int, m: int) -> list[Column]:
    """k Bloom positions for a key: (h1 + i*h2) mod m, residue space."""
    h1 = F.pmod(F.xxhash64(key), F.lit(m).cast("long"))
    # a distinct second stream: mix a constant into the hash input; the
    # +1 keeps h2 odd-ish and never lets double hashing degenerate to a
    # single stream (h2 = 0 would probe one position k times)
    h2 = F.pmod(F.xxhash64(key, F.lit(0x9E3779B9)),
                F.lit(m - 1).cast("long")) + F.lit(1)
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m).cast("long"))
            for i in range(k)]


def bloom_shape(expected_items: int, fpp: float = 0.01,
                max_bits: int = _MAX_BITS_DEFAULT) -> "tuple[int, int]":
    """(m bits, k hashes) for a target false-positive rate: the classic
    m = -n ln p / ln²2, k = (m/n) ln 2, m rounded up to whole 64-bit
    words and capped (a cap RAISES the effective fpp — callers that
    need the nominal rate at huge n should shard the dim instead)."""
    if max_bits > _MAX_BITS_HARD:
        raise ValueError(f"max_bits {max_bits} exceeds the "
                         f"{_MAX_BITS_HARD}-bit plan-literal bound")
    n = max(int(expected_items), 1)
    p = min(max(fpp, 1e-9), 0.5)
    m = int(math.ceil(-n * math.log(p) / (math.log(2) ** 2)))
    m = max(64, ((m + 63) // 64) * 64)
    if m > max_bits:
        m = max_bits
    k = max(1, min(_MAX_HASHES, round(m / n * math.log(2))))
    return m, k


def build_bloom(df: DataFrame, key_col: str,
                expected_items: Optional[int] = None,
                fpp: float = 0.01,
                max_bits: int = _MAX_BITS_DEFAULT) -> dict:
    """Build a Bloom filter over a key column, DISTRIBUTED: the corpus
    never funnels through the driver — k positions per row explode
    map-side, ONE ``groupBy(word)``/``bit_or`` shuffle of at most m/64
    rows builds the words, and only the ≤ m/64 (word, bits) rows are
    collected and densified. Returns ``{"bits": list[int], "m": int,
    "k": int, "n": int}`` — a plain dict so it pickles into closures
    and serializes into repositories."""
    if expected_items is None:
        expected_items = df.where(F.col(key_col).isNotNull()).count()
    m, k = bloom_shape(expected_items, fpp, max_bits)
    pos = _positions(F.col(key_col), k, m)
    words = (df.where(F.col(key_col).isNotNull())
             .select(F.explode(F.array(*pos)).alias("p"))
             .select((F.col("p") / 64).cast("long").alias("w"),
                     # pyspark's shiftleft() insists on a Python-int
                     # shift; call_function reaches the SQL overload
                     # that shifts by a column
                     F.call_function(
                         "shiftleft", F.lit(1).cast("long"),
                         F.pmod(F.col("p"), F.lit(64)).cast("int"))
                     .alias("b"))
             .groupBy("w").agg(F.bit_or("b").alias("bits"))
             .collect())
    dense = [0] * (m // 64)
    for r in words:
        dense[int(r["w"])] = int(r["bits"])
    return {"bits": dense, "m": m, "k": k, "n": int(expected_items)}


def bloom_might_contain(bloom: dict, key: Column) -> Column:
    """Pure-expression membership probe: true when every one of the k
    positions is set. No false negatives; false positives at the
    built fpp. NULL keys probe NULL (three-valued, like SQL IN)."""
    m, k = bloom["m"], bloom["k"]
    lit_bits = F.lit(bloom["bits"]).cast("array<long>")
    checks = []
    for p in _positions(key, k, m):
        word = F.element_at(lit_bits, ((p / 64).cast("int") + F.lit(1)))
        bit = F.call_function("shiftleft", F.lit(1).cast("long"),
                              F.pmod(p, F.lit(64)).cast("int"))
        checks.append(word.bitwiseAND(bit) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return F.when(key.isNull(), F.lit(None).cast("boolean")).otherwise(out)


def bloom_semi_join(big: DataFrame, small: DataFrame, on: str,
                    small_on: Optional[str] = None,
                    fpp: float = 0.01,
                    expected_items: Optional[int] = None,
                    max_bits: int = _MAX_BITS_DEFAULT) -> DataFrame:
    """EXACT left-semi join with a Bloom pre-filter on the big side:
    rows whose key is bloom-negative are dropped BEFORE the join's
    exchange (the filter is a map-side expression the scan can evaluate
    under whole-stage codegen), and only the surviving sliver pays the
    shuffle + exact semi join. Result rows are identical to
    ``big.join(small, on, "left_semi")`` — the Bloom stage cannot drop
    a true match (no false negatives) and the exact join removes the
    false positives."""
    key = small_on or on
    bloom = build_bloom(small.select(key), key, expected_items=expected_items,
                        fpp=fpp, max_bits=max_bits)
    pre = big.where(bloom_might_contain(bloom, F.col(on)))
    rhs = small.select(F.col(key).alias(on)).distinct()
    return pre.join(rhs, on, "left_semi")


def bloom_anti_join(big: DataFrame, small: DataFrame, on: str,
                    small_on: Optional[str] = None,
                    fpp: float = 0.01,
                    expected_items: Optional[int] = None,
                    max_bits: int = _MAX_BITS_DEFAULT) -> DataFrame:
    """EXACT left-anti join where only bloom-POSITIVE rows pay the join:
    a Bloom no is a certain no, so bloom-negative rows (and NULL keys,
    which never equal anything) bypass the exchange entirely and union
    back in; bloom-positives — the small fraction at high selectivity —
    are verified with a real left-anti join. Row set identical to
    ``big.join(small, on, "left_anti")``. This is the 100 TB shape of a
    referential-integrity scan: survivors are the orphans."""
    key = small_on or on
    bloom = build_bloom(small.select(key), key, expected_items=expected_items,
                        fpp=fpp, max_bits=max_bits)
    probe = bloom_might_contain(bloom, F.col(on))
    certain_miss = big.where(F.col(on).isNull() | ~F.coalesce(probe, F.lit(False)))
    candidates = big.where(F.coalesce(probe, F.lit(False)))
    rhs = small.select(F.col(key).alias(on)).distinct()
    verified = candidates.join(rhs, on, "left_anti")
    return certain_miss.unionByName(verified)
