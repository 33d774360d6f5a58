"""Source helpers for the driver's parquet tables.

The reference brings no sources of its own (callers pass DataFrames,
SURVEY §2f); these helpers standardize reading the benchmark tables,
including the events table whose parquet stores TIMESTAMP(NANOS) — Spark
only reads it with ``spark.sql.legacy.parquet.nanosAsLong=true``, so we
surface it as a proper timestamp column here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def session_builder_defaults(builder):
    """Apply configs every session reading the benchmark tables needs."""
    return builder.config(NANOS_CONF, "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos-as-long → timestamp; integer div keeps exact micros (a
        # double division of ~1e18 nanos would round the low bits)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str):
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


MANIFEST_DIR = "_manifest"


def write_corpus(df: DataFrame, path: str, partition_by=None,
                 max_records_per_file: int | None = None,
                 sort_within_partitions=None,
                 mode: str = "overwrite",
                 manifest_cols=None) -> None:
    """Write a (possibly huge) corpus to parquet with the three knobs
    that matter at 100 TB baked in:

    * ``partition_by`` — hive-style directory partitioning (e.g. by
      lang or source) so downstream readers partition-prune instead of
      scanning everything;
    * ``max_records_per_file`` — bounds file size so a skewed task
      can't emit a multi-GB file that some later reader must swallow in
      one split;
    * ``sort_within_partitions`` — clusters rows inside each output
      file (better page/dictionary compression and min/max skipping for
      range predicates) WITHOUT a global sort's single-stage barrier;
    * ``manifest_cols`` — after the write, persist a per-FILE summary
      (row count + min/max of these columns) that :func:`read_corpus`
      prunes on — the poor-man's Iceberg metadata (see
      :func:`write_manifest`).
    """
    if sort_within_partitions:
        cols = ([sort_within_partitions]
                if isinstance(sort_within_partitions, str)
                else list(sort_within_partitions))
        df = df.sortWithinPartitions(*cols)
    writer = df.write.mode(mode).format("parquet")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        part = ([partition_by] if isinstance(partition_by, str)
                else list(partition_by))
        writer = writer.partitionBy(*part)
    writer.save(path)
    if manifest_cols:
        write_manifest(df.sparkSession, path, manifest_cols)


def write_manifest(spark: SparkSession, path: str, cols) -> None:
    """Build the per-file stats manifest for a parquet corpus at
    ``path``: one row per data file with its row count and min/max of
    ``cols``, written to ``{path}/_manifest``. One distributed scan of
    the written data (map-side-combined groupBy on input_file_name —
    output is O(files), nothing row-shaped moves); rebuild after
    appends. What this buys at 100 TB: :func:`read_corpus` range
    predicates skip whole FILES from the driver-side (tiny) manifest —
    irrelevant files are never listed into the scan, never even footer-
    read, where parquet's own min/max skipping still opens every
    footer."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    data = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    manifest = (data.groupBy(F.input_file_name().alias("file"))
                .agg(*aggs))
    manifest.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/{MANIFEST_DIR}")


def update_manifest(spark: SparkSession, path: str, cols) -> dict:
    """Incrementally extend the per-file manifest at ``path``: scan ONLY
    data files the manifest does not know yet and append their stats.

    :func:`write_manifest` is a full-corpus scan — fine once, absurd
    after every append at 100 TB.  Appends only ever ADD files (parquet
    files are immutable), so the incremental contract is sound: stats of
    known files cannot change.  Files deleted since the last manifest
    are dropped from it (their stats are stale, and read_corpus would
    otherwise prune on ghosts).  Returns
    ``{"known": n, "scanned": n, "removed": n}``.  Falls back to a full
    :func:`write_manifest` when no manifest exists."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    try:
        manifest_df = spark.read.parquet(f"{path}/{MANIFEST_DIR}")
        existing = manifest_df.collect()
    except Exception:  # noqa: BLE001 — first build
        write_manifest(spark, path, cols)
        n = spark.read.parquet(f"{path}/{MANIFEST_DIR}").count()
        return {"known": 0, "scanned": n, "removed": 0}
    schema = manifest_df.schema
    # the EXISTING manifest's column order is authoritative — merging
    # rows built from a caller-supplied order would positionally
    # transpose min/max stats between same-typed columns
    manifest_cols = [f.name[4:] for f in schema.fields
                     if f.name.startswith("min_")]
    if set(cols) != set(manifest_cols):
        raise ValueError(
            f"manifest at {path} tracks columns {manifest_cols}, "
            f"got {cols}; rebuild with write_manifest to change the "
            f"tracked set")
    current = set(spark.read.parquet(path).inputFiles())
    known_rows = [r for r in existing if r["file"] in current]
    removed = len(existing) - len(known_rows)
    known = {r["file"] for r in known_rows}
    new_files = sorted(current - known)
    if new_files:
        data = spark.read.option("basePath", path).parquet(*new_files)
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c in manifest_cols:
            aggs += [F.min(c).alias(f"min_{c}"),
                     F.max(c).alias(f"max_{c}")]
        scanned = (data.groupBy(F.input_file_name().alias("file"))
                   .agg(*aggs).collect())
        # the manifest may carry extra columns (per-file bloom bits) —
        # new files get NULLs there, positioned by NAME against the
        # authoritative schema; add_bloom_to_manifest fills them in
        # incrementally (it scans only NULL-bloom files)
        names = [f.name for f in schema.fields]
        new_rows = [tuple(r[n] if n in r.__fields__ else None
                          for n in names) for r in scanned]
    else:
        new_rows = []
    # manifest is O(files): materialized on the driver so the overwrite
    # never reads the directory it is replacing
    merged = spark.createDataFrame(known_rows + new_rows, schema)
    merged.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/{MANIFEST_DIR}")
    return {"known": len(known_rows), "scanned": len(new_rows),
            "removed": removed}


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for any scheme via the JVM Hadoop API."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _fs_rename(fs, src, dst) -> bool:
    """Hadoop FileSystem.rename, surfaced for tests: it reports failure
    by RETURNING FALSE (not raising), which callers must check before
    any destructive follow-up."""
    return bool(fs.rename(src, dst))


def _walk_parquet_files(fs, jdir):
    """[(dir, [(file, size)])] per directory, recursively, skipping
    ``_``/``.``-prefixed entries (manifests, temp dirs, markers).
    Maintenance passes never mix files across a directory boundary, so
    hive partition dirs rewrite within themselves and partition values
    stay directory-encoded."""
    out, here = [], []
    for st in fs.listStatus(jdir):
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        if st.isDirectory():
            out += _walk_parquet_files(fs, st.getPath())
        elif st.isFile() and name.endswith(".parquet"):
            here.append((str(st.getPath().toString()), st.getLen()))
    if here:
        out.append((str(jdir.toString()), here))
    return out


def compact_corpus(spark: SparkSession, path: str,
                   target_bytes: int = 128 * 1024 * 1024,
                   small_ratio: float = 0.5,
                   manifest_cols=None) -> dict:
    """Compact the SMALL-FILE tail of a parquet corpus: bin-pack every
    data file under ``small_ratio x target_bytes`` into
    ~``target_bytes`` outputs (first-fit decreasing) and rewrite each
    bin as one file; right-sized files are never touched or re-read.

    The 100 TB problem: every streaming micro-batch, incremental
    append, and skewed task leaves sub-megabyte files behind, and a
    year of appends turns every scan into millions of opens — the
    classic small-file death. Compaction here is proportional to the
    TAIL, not the corpus: one job per bin reading only that bin's
    files, written to a temp dir and MOVED in (write-new then
    delete-old, so a crash can duplicate a bin's rows for a reader in
    the window but never lose them — this is an offline maintenance
    pass, like layout.cluster_by_zorder; run it when no writer is
    live). The manifest is refreshed incrementally afterwards
    (:func:`update_manifest` — only the new bins are scanned) when
    ``manifest_cols`` is given or a manifest exists.

    Returns ``{"files_before", "files_after", "bins",
    "bytes_compacted"}``."""
    fs, root = _hadoop_fs(spark, path)
    jvm = spark._jvm
    by_dir = _walk_parquet_files(fs, root)
    files = [f for _, fl in by_dir for f in fl]
    bins, sizes, bin_dirs = [], [], []
    for dirname, fl in by_dir:
        small = sorted((f for f in fl
                        if f[1] < target_bytes * small_ratio),
                       key=lambda x: -x[1])
        start = len(bins)
        for f, sz in small:                  # first-fit decreasing
            for i in range(start, len(bins)):
                if sizes[i] + sz <= target_bytes:
                    bins[i].append(f)
                    sizes[i] += sz
                    break
            else:
                bins.append([f])
                sizes.append(sz)
                bin_dirs.append(dirname)
    keep = [i for i, b in enumerate(bins) if len(b) > 1]
    bins = [bins[i] for i in keep]           # singletons gain nothing
    bin_dirs = [bin_dirs[i] for i in keep]
    if not bins:
        return {"files_before": len(files), "files_after": len(files),
                "bins": 0, "bytes_compacted": 0}
    tmp = f"{path}/_compact_tmp"
    fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
    moved_bytes = 0
    for i, (bin_files, dirname) in enumerate(zip(bins, bin_dirs)):
        # read the raw files (NO basePath: hive partition values must
        # stay directory-encoded, never baked into the rewritten file)
        (spark.read.parquet(*bin_files)
         .coalesce(1).write.mode("overwrite").parquet(f"{tmp}/bin{i}"))
        # move the one data file in, THEN drop the originals — and only
        # if the move really happened: Hadoop rename() reports failure
        # by returning FALSE, not raising, and deleting the originals
        # after a silently failed rename would lose the whole bin
        for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(
                f"{tmp}/bin{i}")):
            nm = st.getPath().getName()
            if st.isFile() and nm.endswith(".parquet"):
                dest = jvm.org.apache.hadoop.fs.Path(
                    f"{dirname}/compacted-{i:05d}-{nm}")
                if not _fs_rename(fs, st.getPath(), dest):
                    raise IOError(
                        f"compact_corpus: rename {st.getPath()} -> "
                        f"{dest} failed; bin {i}'s original files are "
                        "left intact (earlier bins are complete)")
        for f in bin_files:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f), False)
            moved_bytes += dict(files)[f]
    fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
    n_after = len(files) - sum(len(b) for b in bins) + len(bins)
    # refresh the manifest incrementally: old rows drop as ghosts, only
    # the new bin files are scanned
    cols = manifest_cols
    if cols is None:
        try:
            man = spark.read.parquet(f"{path}/{MANIFEST_DIR}")
            cols = [f.name[4:] for f in man.schema.fields
                    if f.name.startswith("min_")]
        except Exception:  # noqa: BLE001 — no manifest: nothing to do
            cols = None
    if cols:
        update_manifest(spark, path, cols)
    return {"files_before": len(files), "files_after": n_after,
            "bins": len(bins), "bytes_compacted": moved_bytes}


def add_bloom_to_manifest(spark: SparkSession, path: str, col: str,
                          fpp: float = 0.01,
                          max_bits: int = 1 << 20,
                          rebuild: bool = False) -> dict:
    """Attach a PER-FILE split-block Bloom filter of ``col`` to the
    manifest: columns ``bloom_{col}`` (raw bitmap bytes) and
    ``bloom_{col}_k``. This is the point-lookup companion of the
    min/max stats — zone maps prune ranges, but on a high-cardinality
    key whose values hash-scatter across files the [min, max] of every
    file spans everything and prunes nothing; the Bloom bits answer
    "could THIS key be in THIS file" instead. A Bloom "no" is certain,
    so :func:`read_corpus` ``prune_eq`` drops bloom-negative files with
    zero row loss; false positives only cost an extra file read.

    Build is one distributed pass: every row emits k (file, block,
    mask) triples, one groupBy(file, block)/bit_or shuffle of
    O(files x blocks-per-file) rows, assembled driver-side into the
    O(files) manifest. Each file's bitmap is sized to ITS row count
    (via the manifest, so run write_manifest/update_manifest first);
    ``max_bits`` caps huge files (fpp degrades loudly there — the
    right fix is clustering the layout so files hold narrow key sets,
    cf. layout.cluster_by_zorder, which also makes these bitmaps
    sparse and selective). Returns ``{"files": n, "bytes": total}``.

    The column is canonicalized before hashing (integral types cast to
    long — xxhash64 hashes int and long values of the same number
    DIFFERENTLY, and the driver-side probe hashes Python ints as
    longs; an un-canonicalized int column would make every probe a
    false "certain miss" and read_corpus(prune_eq=...) would silently
    drop matching files). The canonical type is recorded as
    ``bloom_{col}_type`` so :func:`file_misses_key` dispatches the
    probe the same way; unsupported column types (float/date/decimal…)
    are rejected HERE, at build time, not mid-read.

    Re-running is INCREMENTAL: parquet files are immutable, so a file
    whose manifest row already carries bits built with the same k and
    canonical type keeps them — only files lacking bits are scanned
    (the append path: update_manifest adds the new files' stats rows
    with NULL bloom columns, this fills just those in). Pass
    ``rebuild=True`` to force a full rebuild (e.g. after changing
    ``fpp``). Returns ``{"files": total, "scanned": built_now,
    "bytes": total_bytes}``.
    """
    from .bloom import _BLOCK_BITS, _canon_key, _word_and_bits, \
        bloom_shape

    corpus = spark.read.parquet(path)
    key_expr, ktype = _canon_key(corpus, col)   # raises on bad types
    manifest_df = spark.read.parquet(f"{path}/{MANIFEST_DIR}")
    shapes_all = {}
    manifest = []
    for r in manifest_df.collect():
        manifest.append(r)
        shapes_all[r["file"]] = bloom_shape(max(int(r["n_rows"]), 1),
                                            fpp, max_bits)
    if not manifest:
        return {"files": 0, "scanned": 0, "bytes": 0}
    # k is fpp-derived and constant across files (m scales with n, so
    # m/n is constant except under the cap, where we keep the same k
    # and let fpp degrade); n_words varies per file
    k = max(shapes_all[f][1] for f in shapes_all)
    have_cols = f"bloom_{col}" in manifest_df.columns
    reuse: dict = {}
    if have_cols and not rebuild:
        for r in manifest:
            if (r[f"bloom_{col}"] is not None
                    and r[f"bloom_{col}_k"] == k
                    and (f"bloom_{col}_type" not in manifest_df.columns
                         or r[f"bloom_{col}_type"] in (None, ktype))):
                reuse[r["file"]] = bytes(r[f"bloom_{col}"])
    build = {f: s for f, s in shapes_all.items() if f not in reuse}
    if build:
        sizes = spark.createDataFrame(
            [(f, m // _BLOCK_BITS) for f, (m, _) in build.items()],
            "file string, n_words long")
        data = (spark.read.option("basePath", path)
                .parquet(*sorted(build))
                .select(F.input_file_name().alias("file"),
                        key_expr.alias(col))
                .where(F.col(col).isNotNull())
                .join(F.broadcast(sizes), "file"))
        w, bits = _word_and_bits(F.col(col), k, F.col("n_words"))
        words = (data.select("file", w.alias("w"),
                             F.explode(F.array(*bits)).alias("b"))
                 .select("file", "w",
                         F.call_function("shiftleft",
                                         F.lit(1).cast("long"),
                                         F.col("b")).alias("mask"))
                 .groupBy("file", "w").agg(F.bit_or("mask")
                                           .alias("bits"))
                 .collect())
        per_file: dict = {f: [0] * (m // _BLOCK_BITS)
                          for f, (m, _) in build.items()}
        for r in words:
            per_file[r["file"]][int(r["w"])] = int(r["bits"])
        built = {f: b"".join(x.to_bytes(7, "big") for x in blocks)
                 for f, blocks in per_file.items()}
    else:
        built = {}
    blobs = {**reuse, **built}
    stale = [c for c in (f"bloom_{col}", f"bloom_{col}_k",
                         f"bloom_{col}_type")
             if c in manifest_df.columns]
    base_fields = [f for f in manifest_df.schema.fields
                   if f.name not in stale]
    base_names = [f.name for f in base_fields]
    from pyspark.sql.types import StructType
    schema = (StructType(base_fields)
              .add(f"bloom_{col}", "binary")
              .add(f"bloom_{col}_k", "integer")
              .add(f"bloom_{col}_type", "string"))
    rows = [tuple(r[n] for n in base_names)
            + (bytearray(blobs[r["file"]]), k, ktype) for r in manifest]
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("overwrite").parquet(f"{path}/{MANIFEST_DIR}")
    return {"files": len(manifest), "scanned": len(built),
            "bytes": sum(len(b) for b in blobs.values())}


def file_misses_key(manifest_row, col: str, value) -> bool:
    """True when a manifest row PROVABLY cannot contain ``value`` in
    ``col`` — by min/max range, or by a Bloom-negative probe when
    :func:`add_bloom_to_manifest` bits are present (driver-side Python
    probe, bit-identical to the executor-built bitmap via the xxhash64
    replica; no job launched). The pruning predicate of ``prune_eq``."""
    if value is None:
        return False
    if file_misses_range(manifest_row, col, value, value):
        return True
    try:
        raw = manifest_row[f"bloom_{col}"]
        k = manifest_row[f"bloom_{col}_k"]
    except ValueError:                  # no bloom columns in manifest
        return False
    if raw is None or k is None:
        return False
    try:
        ktype = manifest_row[f"bloom_{col}_type"]
    except ValueError:                  # pre-r12 manifest: long/str only
        ktype = None
    from .bloom import bloom_contains_py
    # probe returns None (unknown) for values it cannot hash under the
    # build's canonical type — never pruned, never a mid-read TypeError
    return bloom_contains_py({"raw": bytes(raw), "k": int(k),
                              "type": ktype}, value) is False


def file_misses_range(manifest_row, col: str, lo, hi) -> bool:
    """True when a manifest row's ``[min_col, max_col]`` provably misses
    the requested ``[lo, hi]`` range — THE pruning predicate, shared by
    :func:`read_corpus` (which drops such files from the scan) and
    ``layout.skipping_report`` (which merely counts them), so the meter
    always measures exactly what the reader prunes."""
    mn, mx = manifest_row[f"min_{col}"], manifest_row[f"max_{col}"]
    try:
        if lo is not None and mx is not None and mx < lo:
            return True
        if hi is not None and mn is not None and mn > hi:
            return True
    except TypeError:
        # bound/stat types don't compare (e.g. a string probe against a
        # numeric column): nothing is PROVABLY missed — don't prune
        return False
    return False


def read_corpus(spark: SparkSession, path: str,
                prune: dict | None = None,
                prune_eq: dict | None = None) -> DataFrame:
    """Read a corpus written by :func:`write_corpus`, pruning data FILES
    through the manifest. ``prune`` maps column → ``(lo, hi)`` (either
    bound may be None): a file is read only if its [min, max] intersects
    every requested range; the residual row filter is applied on top, so
    results are exact, pruning is purely a scan reduction.

    Hive partition directories still prune via the normal partition
    filters (they are read-side columns here); the manifest adds the
    per-file dimension partitioning can't give (e.g. a timestamp range
    inside every partition). Without ``prune`` (or without a manifest)
    this is a plain parquet read.

    ``prune_eq`` maps column → exact value (point lookups): files are
    dropped via :func:`file_misses_key` — min/max range first, then the
    per-file Bloom bits when :func:`add_bloom_to_manifest` has run —
    and the exact equality filter is applied on top, so results stay
    exact whatever the Bloom false-positive rate."""
    if not prune and not prune_eq:
        return spark.read.parquet(path)
    prune = prune or {}
    prune_eq = prune_eq or {}
    try:
        manifest = spark.read.parquet(f"{path}/{MANIFEST_DIR}").collect()
    except Exception:  # noqa: BLE001 — no manifest written
        manifest = None
    df = None
    if manifest is not None:
        keep = []
        for row in manifest:
            ok = (not any(file_misses_range(row, c, lo, hi)
                          for c, (lo, hi) in prune.items())
                  and not any(file_misses_key(row, c, v)
                              for c, v in prune_eq.items()))
            if ok:
                keep.append(row["file"])
        # files the manifest does not know about (appended AFTER it was
        # written) must always be read — pruning may only drop files the
        # manifest positively excludes, never silently lose rows
        known = {row["file"] for row in manifest}
        all_files = spark.read.parquet(path).inputFiles()
        keep += [f for f in all_files if f not in known]
        if not keep:
            # empty frame with the corpus schema
            return spark.read.parquet(path).where(F.lit(False))
        # basePath keeps hive partition columns alive when reading an
        # explicit file subset
        df = spark.read.option("basePath", path).parquet(*keep)
    else:
        df = spark.read.parquet(path)
    for c, (lo, hi) in prune.items():
        if lo is not None:
            df = df.where(F.col(c) >= F.lit(lo))
        if hi is not None:
            df = df.where(F.col(c) <= F.lit(hi))
    for c, v in prune_eq.items():
        df = df.where(F.col(c) == F.lit(v))
    return df


CLUSTERED_PREFIX = "clustered-"


def optimize_corpus(spark: SparkSession, path: str,
                    cluster_by=None, bloom_cols=None,
                    target_bytes: int = 128 * 1024 * 1024,
                    small_ratio: float = 0.5,
                    bits: int = 16, curve: str = "auto",
                    fpp: float = 0.01,
                    bloom_max_bits: int = 1 << 20) -> dict:
    """ONE incremental maintenance pass over a parquet corpus — the
    entry point a 100 TB table actually runs (nightly, or after each
    append window), instead of wiring compaction, clustering, manifest
    refresh and Bloom attachment as four separate calls:

    1. **Cluster + compact the unoptimized tail.** Files written by
       appends/streaming (any name not starting with ``clustered-``),
       plus accumulated SMALL clustered files (< ``small_ratio x
       target_bytes``, when a directory has at least two — merging
       re-clusters them, so locality is preserved, unlike blind
       bin-packing), are read per directory (hive partition values
       stay directory-encoded), re-keyed on the space-filling curve,
       and rewritten as ~``target_bytes`` ``clustered-*`` files.
       Work is proportional to the UNOPTIMIZED tail: right-sized
       clustered files are never re-read. Without ``cluster_by`` the
       pass degrades to plain :func:`compact_corpus` bin-packing.
    2. **Curve bounds are pinned corpus-wide**: taken from the
       manifest's global min/max when available (no scan), else one
       aggregate — so every pass, and every future append pass, lands
       on the SAME curve and files stay mutually range-disjoint.
       ``curve="auto"`` picks Hilbert for 2+ columns (tighter boxes;
       layout.hilbert_key / hilbert_key_nd) and Z-order for 1;
       ``bits`` auto-shrinks so ``bits x len(cols) < 63``.
    3. **Manifest refresh, incremental** (:func:`update_manifest`):
       only the files this pass wrote are scanned; rewritten files
       drop out as ghosts. Tracked columns = existing manifest set,
       else ``cluster_by`` ∪ ``bloom_cols``.
    4. **Bloom refresh, incremental** (:func:`add_bloom_to_manifest`):
       untouched files keep their bits; only the new files' blooms are
       built.

    Like compact_corpus, this is an offline pass (run when no writer
    is live); a crash between write-in and delete-old can duplicate a
    directory's rows for a concurrent reader but never lose them.

    Returns ``{"files_before", "files_after", "rewritten",
    "clustered_files", "bytes_rewritten", "manifest", "blooms"}``.
    """
    bloom_cols = ([bloom_cols] if isinstance(bloom_cols, str)
                  else list(bloom_cols or []))
    cluster_by = ([cluster_by] if isinstance(cluster_by, str)
                  else list(cluster_by or []))
    jvm = spark._jvm
    fs, root = _hadoop_fs(spark, path)

    manifest_cols = None
    try:
        man = spark.read.parquet(f"{path}/{MANIFEST_DIR}")
        manifest_cols = [f.name[4:] for f in man.schema.fields
                         if f.name.startswith("min_")]
    except Exception:  # noqa: BLE001 — no manifest yet
        man = None
    tracked = manifest_cols or sorted(set(cluster_by) | set(bloom_cols))

    out = {"rewritten": 0, "bytes_rewritten": 0, "clustered_files": 0}
    if not cluster_by:
        res = compact_corpus(spark, path, target_bytes=target_bytes,
                             small_ratio=small_ratio,
                             manifest_cols=tracked or None)
        out.update(files_before=res["files_before"],
                   files_after=res["files_after"],
                   rewritten=res["bins"],
                   bytes_rewritten=res["bytes_compacted"])
    else:
        bits = min(bits, 62 // len(cluster_by))
        from .layout import cluster_by_hilbert, cluster_by_zorder
        if curve == "auto":
            curve = "hilbert" if len(cluster_by) >= 2 else "zorder"
        cluster = (cluster_by_hilbert if curve == "hilbert"
                   else cluster_by_zorder)
        # corpus-wide curve bounds: manifest first, one aggregate else
        if man is not None and all(c in manifest_cols
                                   for c in cluster_by):
            row = man.agg(*[f(f"{p}_{c}").alias(f"{p}_{c}")
                            for c in cluster_by
                            for p, f in (("min", F.min),
                                         ("max", F.max))]).collect()[0]
            bounds = {c: (row[f"min_{c}"], row[f"max_{c}"])
                      for c in cluster_by}
        else:
            row = spark.read.parquet(path).agg(
                *[f(c).alias(f"{p}_{c}") for c in cluster_by
                  for p, f in (("min", F.min), ("max", F.max))]) \
                .collect()[0]
            bounds = {c: (row[f"min_{c}"], row[f"max_{c}"])
                      for c in cluster_by}

        by_dir = _walk_parquet_files(fs, root)
        files_before = sum(len(fl) for _, fl in by_dir)
        tmp = f"{path}/_optimize_tmp"
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
        seq = 0
        for dirname, fl in by_dir:
            fresh = [(f, sz) for f, sz in fl
                     if not f.rsplit("/", 1)[-1]
                     .startswith(CLUSTERED_PREFIX)]
            small_clustered = [
                (f, sz) for f, sz in fl
                if f.rsplit("/", 1)[-1].startswith(CLUSTERED_PREFIX)
                and sz < target_bytes * small_ratio]
            if len(small_clustered) < 2:
                small_clustered = []    # a lone small file gains nothing
            todo = fresh + small_clustered
            if not todo:
                continue
            todo_files = [f for f, _ in todo]
            todo_bytes = sum(sz for _, sz in todo)
            n_parts = max(1, -(-todo_bytes // target_bytes))
            batch = spark.read.parquet(*todo_files)
            (cluster(batch, cluster_by, bits=bits,
                     num_partitions=n_parts, bounds=bounds)
             .write.mode("overwrite").parquet(f"{tmp}/d{seq}"))
            moved = 0
            for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(
                    f"{tmp}/d{seq}")):
                nm = st.getPath().getName()
                if st.isFile() and nm.endswith(".parquet"):
                    dest = jvm.org.apache.hadoop.fs.Path(
                        f"{dirname}/{CLUSTERED_PREFIX}{seq:05d}-{nm}")
                    if not _fs_rename(fs, st.getPath(), dest):
                        raise IOError(
                            f"optimize_corpus: rename {st.getPath()} "
                            f"-> {dest} failed; directory {dirname}'s "
                            "original files are left intact")
                    moved += 1
            for f in todo_files:
                fs.delete(jvm.org.apache.hadoop.fs.Path(f), False)
            out["rewritten"] += len(todo_files)
            out["bytes_rewritten"] += todo_bytes
            out["clustered_files"] += moved
            seq += 1
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
        out["files_before"] = files_before
        out["files_after"] = (files_before - out["rewritten"]
                              + out["clustered_files"])

    if tracked:
        out["manifest"] = update_manifest(spark, path, tracked)
        out["blooms"] = {c: add_bloom_to_manifest(
            spark, path, c, fpp=fpp, max_bits=bloom_max_bits)
            for c in bloom_cols}
    else:
        out["manifest"] = None
        out["blooms"] = {}
    return out


def write_bucketed(df: DataFrame, table_name: str, bucket_cols,
                   n_buckets: int = 32,
                   sort_cols=None, path: str | None = None,
                   mode: str = "overwrite") -> None:
    """Persist a table bucketed (and optionally sorted) by its join/agg
    keys. Joins and aggregations between tables bucketed the SAME way on
    the SAME keys skip their shuffle entirely — the co-location is baked
    into the file layout, which is THE preparation step for repeated
    100 TB fact-to-fact joins (a broadcast can't help when both sides are
    huge). Requires a saveAsTable target (bucket metadata lives in the
    catalog, not the parquet files)."""
    bucket_cols = list(bucket_cols) if not isinstance(bucket_cols, str) \
        else [bucket_cols]
    writer = df.write.mode(mode).format("parquet")
    if path:
        writer = writer.option("path", path)
    writer = writer.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
