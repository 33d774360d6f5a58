"""Physical layout — Z-order clustering for multi-column data skipping.

At 100 TB the scan you avoid is worth more than the scan you optimize.
Partitioning prunes on ONE dimension; sorting the files by one column
gives that column tight per-file min/max ranges and every other column
useless ones.  Z-ordering (Morton order — interleaving the bits of
several columns' normalized ranks) gives every participating column
*simultaneously* tight file ranges, so manifest/footer min-max skipping
(``sources.write_manifest`` / ``read_corpus``) prunes multiplicatively:
a range predicate on ANY of the z-columns skips most files.  This is the
same mechanism as Delta Lake's OPTIMIZE ZORDER BY and ClickHouse's
mortonEncode — implemented here as plain Spark expressions, no engine
extension.

Plan shape: one exact min/max aggregate per z-column (a single tiny
job), then a map-only z-key expression (shift/AND/OR codegen — no
Python, no UDF), one ``repartitionByRange`` shuffle on the z-key, and a
task-local sort.  That is exactly one data-shaped shuffle to produce a
layout that pays itself back on every subsequent scan.

All z-key math is engine-portable (double normalization + integer bit
ops, identical in DuckDB/Trino), so the key itself is DuckDB-oracled.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "cluster_by_zorder", "hilbert_key",
           "hilbert_key_nd", "cluster_by_hilbert", "skipping_report"]


def _bucketize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Rank-normalize a numeric column into [0, 2^bits) with fixed
    double arithmetic (floor((x-lo)/(hi-lo) * (2^bits - 1))) — the exact
    same IEEE ops an ANSI-SQL oracle performs.  NULLs and degenerate
    ranges (hi == lo) land in bucket 0 (they sort first, harmlessly)."""
    top = float((1 << bits) - 1)
    span = hi.cast("double") - lo.cast("double")
    frac = (col.cast("double") - lo.cast("double")) / span
    bucket = F.floor(frac * F.lit(top)).cast("long")
    # clamp: x == hi lands exactly on top; rounding can't escape range
    bucket = F.least(F.greatest(bucket, F.lit(0)), F.lit(int(top)))
    return F.when(col.isNull() | (span <= 0), F.lit(0)).otherwise(bucket)


def zorder_key(cols: Sequence[str], mins: Sequence, maxs: Sequence,
               bits: int = 16) -> Column:
    """Morton z-key Column interleaving ``bits`` bits of each column's
    normalized bucket: bit ``i`` of column ``j`` lands at position
    ``i * n_cols + j``.  ``bits * len(cols)`` must stay < 63 (long-safe
    under ANSI).  ``mins``/``maxs`` are the exact column bounds (pass
    literals or pre-computed values — :func:`cluster_by_zorder` computes
    them for you in one aggregate)."""
    n = len(cols)
    if n == 0:
        raise ValueError("need at least one column")
    if bits * n >= 63:
        raise ValueError(f"bits*len(cols) = {bits * n} overflows a long")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        b = _bucketize(F.col(c), F.lit(mins[j]), F.lit(maxs[j]), bits)
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)),
                            i * n + j))
    return z


def hilbert_key(cols: Sequence[str], mins: Sequence, maxs: Sequence,
                bits: int = 16) -> Column:
    """2D Hilbert index Column over two normalized bucket columns — the
    locality-preserving alternative to :func:`zorder_key`: the Hilbert
    curve never takes the Z-curve's long diagonal jumps, so consecutive
    key ranges map to CONTIGUOUS plane regions and a range read touches
    fewer files for the same predicate (measurably tighter per-file
    boxes; see tests/test_layout.py's locality comparison).

    The classic xy2d walk (one reflect/swap per level, d accumulating
    s² per quadrant) runs as ONE ``aggregate`` fold over the bit
    levels — the state struct is evaluated once per level, so the
    expression tree stays LINEAR in ``bits`` (unrolling the loop would
    double the tree per level: x' and y' each reference both x and y —
    the chained-argmax codegen blowup all over again). All values stay
    below 4^bits ≤ 2^32: ANSI-safe. 2D only — Hilbert generalizes to
    d dimensions, but 2 covers the (key, time)/(lat, lon) cases and
    keeps the fold simple; use :func:`zorder_key` beyond that."""
    if len(cols) != 2:
        raise ValueError("hilbert_key is 2D: pass exactly two columns "
                         "(zorder_key handles any arity)")
    if 2 * bits >= 63:
        raise ValueError(f"2*bits = {2 * bits} overflows a long")
    n = 1 << bits
    x0 = _bucketize(F.col(cols[0]), F.lit(mins[0]), F.lit(maxs[0]), bits)
    y0 = _bucketize(F.col(cols[1]), F.lit(mins[1]), F.lit(maxs[1]), bits)

    def step(acc, lvl):
        s = F.call_function("shiftleft", F.lit(1).cast("long"),
                            lvl.cast("int"))
        rx = F.when(acc["x"].bitwiseAND(s) > 0,
                    F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        ry = F.when(acc["y"].bitwiseAND(s) > 0,
                    F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        d2 = acc["d"] + s * s * (rx * 3).bitwiseXOR(ry)
        flip = (ry == 0) & (rx == 1)
        xf = F.when(flip, F.lit(n - 1) - acc["x"]).otherwise(acc["x"])
        yf = F.when(flip, F.lit(n - 1) - acc["y"]).otherwise(acc["y"])
        return F.struct(
            F.when(ry == 0, yf).otherwise(xf).alias("x"),
            F.when(ry == 0, xf).otherwise(yf).alias("y"),
            d2.alias("d"))

    init = F.struct(x0.alias("x"), y0.alias("y"),
                    F.lit(0).cast("long").alias("d"))
    levels = F.sequence(F.lit(bits - 1), F.lit(0), F.lit(-1))
    return F.aggregate(levels, init, step, lambda acc: acc["d"])


def hilbert_key_nd(cols: Sequence[str], mins: Sequence, maxs: Sequence,
                   bits: int = 16) -> Column:
    """d-dimensional Hilbert index Column (d ≥ 2) over normalized
    bucket columns — Skilling's public-domain transpose algorithm
    ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004),
    property-verified in tests/test_layout.py: the induced order is
    bijective and every consecutive pair of indices differs by exactly
    one unit step in ONE coordinate, the defining Hilbert locality
    guarantee Z-order lacks (its diagonal jumps are what loosen
    per-file min/max boxes).

    Plan shape mirrors :func:`hilbert_key`: the inverse-undo loop runs
    as ONE ``aggregate`` fold over the bit levels (state = struct of d
    longs, so the tree stays linear in ``bits``); the Gray-encode,
    rotation-correction and bit-interleave passes run INSIDE the
    fold's finish lambda — they reference the fold state d·bits times,
    and referencing the aggregate RESULT that often would re-evaluate
    the whole fold per reference (the CollapseProject re-inline trap).
    All values stay below 2^(d·bits) < 2^63 — ANSI-safe. For d = 2 the
    xy2d walk in :func:`hilbert_key` produces an equally valid (but
    differently oriented) curve; both are kept because existing 2D
    layouts and their manifests were built on the xy2d key."""
    d = len(cols)
    if d < 2:
        raise ValueError("hilbert_key_nd needs at least two columns")
    if d * bits >= 63:
        raise ValueError(f"bits*len(cols) = {d * bits} overflows a long")
    bucketed = [_bucketize(F.col(c), F.lit(mins[j]), F.lit(maxs[j]), bits)
                for j, c in enumerate(cols)]

    def step(acc, lvl):
        # one inverse-undo level: Q = 2^lvl, P = Q-1; the i-loop is
        # unrolled (d is a Python constant) with the SEQUENTIAL
        # semantics of the original (each i sees i-1's updates)
        q = F.call_function("shiftleft", F.lit(1).cast("long"),
                            lvl.cast("int"))
        p = q - F.lit(1).cast("long")
        xs = [acc[f"x{i}"] for i in range(d)]
        for i in range(d):
            cond = xs[i].bitwiseAND(q) > 0
            t = (xs[0].bitwiseXOR(xs[i])).bitwiseAND(p)
            new_x0 = F.when(cond, xs[0].bitwiseXOR(p)) \
                .otherwise(xs[0].bitwiseXOR(t))
            new_xi = F.when(cond, xs[i]).otherwise(xs[i].bitwiseXOR(t))
            xs = [new_x0 if j == 0 else (new_xi if j == i else xs[j])
                  for j in range(d)]
        return F.struct(*[xs[i].alias(f"x{i}") for i in range(d)])

    def finish(acc):
        # Gray encode: X[i] ^= X[i-1] sequentially = prefix XOR
        xs = [acc[f"x{i}"] for i in range(d)]
        gray = [xs[0]]
        for i in range(1, d):
            gray.append(gray[i - 1].bitwiseXOR(xs[i]))
        # rotation correction: t = XOR of (Q-1) for every level where
        # gray[d-1] has bit Q set (Q = 2^lvl, lvl = bits-1 .. 1)
        t = F.lit(0).cast("long")
        for lvl in range(bits - 1, 0, -1):
            qm1 = F.lit((1 << lvl) - 1).cast("long")
            t = t.bitwiseXOR(
                F.when(gray[d - 1].bitwiseAND(F.lit(1 << lvl)) > 0,
                       qm1).otherwise(F.lit(0).cast("long")))
        fin = [g.bitwiseXOR(t) for g in gray]
        # interleave the transpose: bit q of X[i] lands at position
        # q*d + (d-1-i) — X[0] carries the most significant bit of
        # each level group
        h = F.lit(0).cast("long")
        for qb in range(bits):
            for i in range(d):
                h = h.bitwiseOR(F.shiftleft(
                    F.shiftright(fin[i], qb).bitwiseAND(F.lit(1)),
                    qb * d + (d - 1 - i)))
        return h

    init = F.struct(*[b.alias(f"x{i}") for i, b in enumerate(bucketed)])
    levels = F.sequence(F.lit(bits - 1), F.lit(1), F.lit(-1))
    return F.aggregate(levels, init, step, finish)


def cluster_by_hilbert(df: DataFrame, cols: Sequence[str],
                       bits: int = 16,
                       num_partitions: Optional[int] = None,
                       key_col: str = "_hilbert",
                       keep_key: bool = False,
                       bounds: Optional[Dict[str, Tuple]] = None
                       ) -> DataFrame:
    """:func:`cluster_by_zorder` with the Hilbert curve: same one
    min/max aggregate, one ``repartitionByRange`` + task-local sort —
    only the space-filling curve differs. Two columns use the original
    xy2d walk (:func:`hilbert_key` — existing 2D layouts were built on
    it); three or more use the d-dimensional Skilling transpose
    (:func:`hilbert_key_nd`), so (lat, lon, time) or (host, time,
    length) layouts get Hilbert locality instead of falling back to
    Z-order. Same ``bounds`` append contract: pin the normalization to
    the existing corpus's manifest min/max and appended files land on
    the SAME curve."""
    cols = list(cols)
    if bounds is not None:
        missing = [c for c in cols if c not in bounds]
        if missing:
            raise ValueError(f"bounds missing for columns {missing}")
        mins = [bounds[c][0] for c in cols]
        maxs = [bounds[c][1] for c in cols]
    else:
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
        row = df.agg(*aggs).collect()[0]
        mins = [row[f"mn_{c}"] for c in cols]
        maxs = [row[f"mx_{c}"] for c in cols]
    key_fn = hilbert_key if len(cols) == 2 else hilbert_key_nd
    keyed = df.withColumn(key_col, key_fn(cols, mins, maxs, bits))
    parts = num_partitions or keyed.rdd.getNumPartitions()
    out = (keyed.repartitionByRange(parts, F.col(key_col))
           .sortWithinPartitions(key_col))
    return out if keep_key else out.drop(key_col)


def cluster_by_zorder(df: DataFrame, cols: Sequence[str], bits: int = 16,
                      num_partitions: Optional[int] = None,
                      key_col: str = "_zorder",
                      keep_key: bool = False,
                      bounds: Optional[Dict[str, Tuple]] = None) -> DataFrame:
    """Re-layout ``df`` so rows near each other in the Z-curve over
    ``cols`` land in the same output partition (= same file on write),
    giving every z-column tight per-file min/max ranges.

    One exact min/max aggregate (2·len(cols) scalars to the driver),
    one ``repartitionByRange`` on the z-key, one ``sortWithinPartitions``
    (task-local, no extra shuffle).  Write the result with
    ``sources.write_corpus`` + ``write_manifest(cols)`` and range reads
    through ``read_corpus(prune=...)`` skip files on ANY of the columns.

    ``bounds`` (col -> (min, max)) skips the aggregate and pins the
    normalization — the APPEND path: cluster a new batch with the
    existing corpus's bounds (straight from its manifest min/max) so
    appended files sit on the SAME Z-curve without rescanning anything;
    out-of-range values clamp into the edge buckets, harmlessly.
    """
    cols = list(cols)
    if bounds is not None:
        missing = [c for c in cols if c not in bounds]
        if missing:
            raise ValueError(f"bounds missing for columns {missing}")
        mins = [bounds[c][0] for c in cols]
        maxs = [bounds[c][1] for c in cols]
    else:
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
        row = df.agg(*aggs).collect()[0]
        mins = [row[f"mn_{c}"] for c in cols]
        maxs = [row[f"mx_{c}"] for c in cols]
    keyed = df.withColumn(key_col, zorder_key(cols, mins, maxs, bits))
    parts = num_partitions or keyed.rdd.getNumPartitions()
    out = (keyed.repartitionByRange(parts, F.col(key_col))
           .sortWithinPartitions(key_col))
    return out if keep_key else out.drop(key_col)


def skipping_report(spark, path: str,
                    predicates: Dict[str, Tuple[Optional[float],
                                                Optional[float]]]) -> dict:
    """How much of the corpus at ``path`` a manifest-pruned range read
    would skip: for each predicate column → (lo, hi), the fraction of
    data FILES whose [min, max] misses the range entirely.  Driver-side
    over the (tiny) ``_manifest`` table — this is the before/after meter
    for :func:`cluster_by_zorder` (unclustered data skips ~0%%; clustered
    data skips ~(1 - selectivity) of files on every z-column)."""
    from deequ_spark.sources import MANIFEST_DIR, file_misses_range
    manifest = spark.read.parquet(f"{path}/{MANIFEST_DIR}").collect()
    total = len(manifest)
    out = {"files_total": total}
    for c, (lo, hi) in predicates.items():
        skipped = sum(1 for r in manifest if file_misses_range(r, c, lo, hi))
        out[f"skipped_{c}"] = skipped
        out[f"skip_ratio_{c}"] = skipped / total if total else 0.0
    return out
