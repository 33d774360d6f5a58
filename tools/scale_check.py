"""Reproducible 10× scale-up harness: synthesizes 10× versions of the
sf0.1 tables (documents via per-copy VOCABULARY REMAPPING — every word
maps to md5(word|copy), so each copy's intra-corpus near-dup structure is
preserved isomorphically while cross-copy shingle universes are disjoint;
embeddings fresh seeded gaussian; lineitem self-unioned), runs the heavy
bench workloads at 1× and 10×, and prints ONE JSON line with the time
ratios plus an ASSERTED candidate-growth gate.

Why remapping, not shuffling: the earlier per-doc word shuffle collapsed
different base documents with similar word BAGS into one near-duplicate
soup — at 10× it manufactured 327k cross-copy candidate pairs between
DIFFERENT base docs (measured r7), which read as "quadratic growth" but
was an artifact of the synthesis, not of the plan. Remapped copies are
independent corpora, so candidate growth must be ~linear and the ≤3/doc
bound below is a real regression gate.

Linear-or-better ratios are the scale contract: a workload whose ratio
is far above 10 has a quadratic residue. Current measurements (local[32]):
fused scan ~1× (flat — plan overhead dominates), grouping ~1.7×, minhash
dedup ~2.6×, text ~7×, knn ~1×, embedding near-dup ~4× (with auto-tuned
band shape; the fixed shape is quadratic).

Usage: python tools/scale_check.py [workdir]   (default /tmp/deequ_scale)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def synthesize(workdir: str) -> None:
    import duckdb
    os.makedirs(workdir, exist_ok=True)
    con = duckdb.connect()
    # 10x documents: copy 0 = originals; copies 1..9 remap every word to
    # md5(word|copy) — an intra-copy isomorphism (same shingle structure,
    # same LSH pair structure) with cross-copy-disjoint vocabularies
    con.execute(f"""
COPY (
  WITH base AS (SELECT * FROM '{SF_DIR}/documents.parquet'),
  copies AS (SELECT unnest(range(10)) AS c)
  SELECT c * 1000000 + doc_id AS doc_id,
         CASE WHEN c = 0 THEN text
              ELSE array_to_string(
                     list_transform(string_split(text, ' '),
                       w -> substr(md5(w || '|' || c), 1, 8)), ' ')
         END AS text,
         lang, source, n_chars
  FROM base, copies
) TO '{workdir}/documents.parquet' (FORMAT PARQUET)
""")
    con.execute("SELECT setseed(0.42)")
    con.execute(f"""
COPY (
  SELECT CAST(i AS BIGINT) AS vec_id,
         [CAST(random() * 2 - 1 AS FLOAT) for j in range(64)] AS embedding
  FROM range(20000) t(i)
) TO '{workdir}/embeddings.parquet' (FORMAT PARQUET)
""")
    # 10x customers for the PassJoin gate: copies 1..9 get an 8-hex-char
    # md5 COPY prefix — same-copy edit-distance structure is preserved
    # verbatim, cross-copy names differ in >=2 prefix chars (and
    # original-vs-copy lengths differ by 9 > k), so the true pair count
    # must grow ~10x linearly, never cross-copy-quadratically
    con.execute(f"""
COPY (
  WITH base AS (SELECT * FROM '{SF_DIR}/customer.parquet'),
  copies AS (SELECT unnest(range(10)) AS c)
  SELECT c * 10000000 + c_custkey AS c_custkey,
         CASE WHEN c = 0 THEN c_name
              ELSE substr(md5('copy' || c), 1, 8) || '#' || c_name
         END AS c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM base, copies
) TO '{workdir}/customer.parquet' (FORMAT PARQUET)
""")


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/deequ_scale"
    synthesize(workdir)

    from functools import reduce

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        # local mode shares one JVM across all executor threads — the
        # 1g default heap OOMs 32 concurrent window-building tasks
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .appName("scale-check").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs10 = spark.read.parquet(f"{workdir}/documents.parquet")
    emb1 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    emb10 = spark.read.parquet(f"{workdir}/embeddings.parquet")
    li1 = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    li10 = reduce(lambda a, b: a.union(b), [li1] * 10).repartition(32).cache()
    cust1 = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    cust10 = spark.read.parquet(f"{workdir}/customer.parquet")
    ord1 = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    ord10 = reduce(lambda a, b: a.union(b), [ord1] * 10) \
        .repartition(32).cache()
    for df in (docs1, docs10, emb1, emb10, li1, li10, cust1, cust10,
               ord10):
        df.count()

    def packing_workload(spark_, docs):
        """Sequence packing (llm/packing.py): salt-grouped prefix-sum
        window — output slices must stay ≤ docs + tokens/budget (each
        doc contributes 1 slice + 1 per pack boundary it crosses), and
        wall time ~linear (the window is partitioned, never global)."""
        from deequ_spark.llm import (pack_sequences,
                                     token_count_whitespace)
        packed = pack_sequences(docs, "doc_id",
                                token_count_whitespace(F.col("text")),
                                budget=256, n_groups=32)
        row = packed.agg(F.count(F.lit(1)).alias("slices"),
                         F.sum("slice_tokens").alias("tok")).collect()[0]
        n_docs = docs.count()
        bound = n_docs + row["tok"] // 256 + 1
        assert row["slices"] <= bound, (
            f"packing slice blow-up: {row['slices']} > {bound}")
        return row["slices"]

    def search_workload(spark_, docs):
        """BM25 ranked retrieval (llm/search.py): two map-only corpus
        passes + TakeOrderedAndProject — no shuffle in either pass, so
        wall time must scale ~linearly with corpus size."""
        from deequ_spark.llm import bm25_topk
        return bm25_topk(docs, "doc_id", "text",
                         "hash join merge table", k=10).count()

    def span_dedup_workload(spark_, docs):
        """Exact substring dedup (llm/dedup.py duplicate_span_removal):
        window-keyed hash shuffle + per-doc rebuild — must scale
        ~linearly (no pair expansion exists in this operator; losers
        are per-occurrence rows)."""
        from deequ_spark.llm import duplicate_span_removal
        out = duplicate_span_removal(docs, "doc_id", "text", n=4)
        return out.agg(F.sum("n_removed_tokens")).collect()[0][0]

    def semdedup_workload(spark_, emb):
        """SemDeDup (llm/semdedup.py): one Arrow assignment pass + one
        group exchange into the blocked-matmul pair stage — wall time
        ~linear in rows for a fixed centroid count."""
        from deequ_spark.llm import semantic_duplicate_pairs
        cents = [[1.0 if i == j else 0.0 for i in range(64)]
                 for j in range(8)]
        return semantic_duplicate_pairs(
            emb, "vec_id", "embedding", threshold=0.8,
            centroids=cents).count()

    def asof_workload(spark_, ev):
        """As-of join (joins.py): union + ONE window shuffle on user_id —
        O(1) state per row, so 10× events over 10× users must stay
        ~linear."""
        from deequ_spark import asof_join
        clicks = ev.where(F.col("event_type") == "click") \
            .select("event_id", "user_id", "ts")
        views = ev.where(F.col("event_type") == "view") \
            .select("user_id", "ts", F.col("value").alias("vval"))
        return asof_join(clicks, views, on="ts", by="user_id").count()

    def interval_workload(spark_, ev):
        """Interval join (joins.py): bucketized equi-join on (user, bin) —
        work ∝ output + bin coverage, never the nested-loop cross
        product, so 10× must stay ~linear."""
        from deequ_spark import interval_join
        clicks = ev.where(F.col("event_type") == "click") \
            .select("event_id", "user_id", "ts")
        views = ev.where(F.col("event_type") == "view") \
            .select("user_id", F.col("ts").alias("ws"),
                    (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("we"))
        return interval_join(clicks, views, on="ts", start="ws", end="we",
                             by="user_id").count()

    from deequ_spark.sources import load_table
    ev1 = load_table(spark, SF_DIR, "events").cache()
    # 10x: ten user-shifted copies — per-user event structure preserved,
    # 10x users, 10x rows (key cardinality scales WITH data, the honest
    # shape for a keyed-window scale test)
    ev10 = reduce(lambda a, b: a.union(b), [
        ev1.withColumn("user_id", F.col("user_id") + F.lit(c * 1_000_000))
           .withColumn("event_id", F.col("event_id") + F.lit(c * 10**9))
        for c in range(10)]).repartition(32).cache()
    ev1.count(), ev10.count()

    def rolling_workload(spark_, ev):
        """Rolling trailing-window stats (joins.py): one range-frame
        window per key — 10× events over 10× users must stay ~linear."""
        from deequ_spark.joins import rolling_stats
        rolled = rolling_stats(
            ev.select("event_id", "user_id", "ts", "value"),
            "ts", "value", window_seconds=3600.0, by="user_id",
            stats=("sum", "count"))
        return rolled.agg(F.sum("value_roll_count")).collect()[0][0]

    def incremental_workload(spark_, pair):
        """Incremental dedup classify (llm/incremental.py): a FIXED-size
        new batch vs a persisted index. The banding/aggregation of the
        history happens once at write_dedup_index time (r8 bucket
        layout), so classify cost must be dominated by the NEW batch —
        the 10x-index ratio is expected ~1x, not ~10x."""
        from deequ_spark.llm import dedup_against_index
        batch, idx_path = pair
        fresh, dups = dedup_against_index(batch, "doc_id", "text",
                                          idx_path, threshold=0.5)
        return dups.count()

    def crawl_ingest_workload(spark_, warc_dir):
        """Crawl ingest e2e (llm/warc.py crawl_to_corpus): map-only
        WARC parse + pipeline; the only shuffles are the pipeline's
        own dedup groupBys — 10× files over 10× docs must stay
        ~linear (file = unit of parallelism)."""
        return bench.b24_crawl_ingest(spark_, warc_dir)

    WDS_TARGET = 1 << 20   # 1 MiB target at bench scale

    def webdataset_workload(spark_, docs):
        """Size-targeted WebDataset export (llm/shards.py): n_shards
        derives from corpus bytes / target, so per-task memory (≈ the
        largest shard's bytes) must stay ~TARGET-shaped as the corpus
        grows — the r8 fixed-count writer made it corpus-shaped."""
        import shutil
        import tempfile

        from deequ_spark.llm import write_webdataset
        out_dir = tempfile.mkdtemp(prefix="deequ_scale_wds_")
        try:
            man = write_webdataset(docs, out_dir, "doc_id",
                                   {"text": "txt"},
                                   target_shard_bytes=WDS_TARGET).collect()
            mx = max(r["n_bytes"] for r in man)
            assert mx < 2 * WDS_TARGET, (
                f"per-task shard bytes {mx} exceed 2x target "
                f"{WDS_TARGET} - sharding is corpus-shaped again")
            return len(man), mx
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    def image_phash_workload(spark_, imgs):
        """Perceptual image hashing + Hamming pair join: decode+hash is
        map-only (Arrow batches), pairing one block shuffle — 10× images
        must stay ~linear."""
        from deequ_spark.llm import image_near_duplicates
        return image_near_duplicates(imgs, "img_id", "payload",
                                     max_hamming=3).count()

    def _make_images(n):
        import numpy as np
        from deequ_spark.llm.multimodal import encode_bmp
        rng = np.random.default_rng(12)
        # 64 base patterns, each duplicated n/64 times with 1px tweaks
        bases = [rng.integers(0, 256, (16, 16, 3)).astype("uint8")
                 for _ in range(64)]
        rows = []
        for i in range(n):
            px = bases[i % 64].copy()
            px[0, 0] = (i // 64) % 256
            rows.append((i, bytearray(encode_bmp(px))))
        return spark.createDataFrame(rows, "img_id long, payload binary") \
            .repartition(32).cache()

    img1 = _make_images(2_000)
    img10 = _make_images(20_000)
    img1.count(), img10.count()

    from deequ_spark.llm import write_dedup_index
    idx1 = f"{workdir}/idx1"
    idx10 = f"{workdir}/idx10"
    write_dedup_index(docs1, "doc_id", "text", idx1)
    write_dedup_index(docs10, "doc_id", "text", idx10)
    # fixed-size daily batch (2k docs, half dup-of-history half novel) —
    # the SAME batch classifies against both index sizes
    inc_batch = (docs1.limit(2_000)
                 .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                         "text")
                 .repartition(32).cache())
    inc_batch.count()

    warc1 = bench.prepare_warc_dir(spark, docs1, n_files=16)
    warc10 = bench.prepare_warc_dir(spark, docs10, n_files=160)

    workloads = [
        ("b1_scan_fused", bench.b1_scan_fused, li1, li10),
        ("b24_crawl_ingest", crawl_ingest_workload, warc1, warc10),
        # b25 webdataset is timed inside its flat-memory evidence loop
        # below (one write per scale point, not three)
        ("b19_asof_join", asof_workload, ev1, ev10),
        ("b20_interval_join", interval_workload, ev1, ev10),
        ("b21_rolling_stats", rolling_workload, ev1, ev10),
        ("b22_incremental_dedup", incremental_workload,
         (inc_batch, idx1), (inc_batch, idx10)),
        ("b23_image_phash", image_phash_workload, img1, img10),
        ("b16_bm25_search", search_workload, docs1, docs10),
        ("b17_span_dedup", span_dedup_workload, docs1, docs10),
        ("b18_semantic_dedup", semdedup_workload, emb1, emb10),
        ("b15_sequence_packing", packing_workload, docs1, docs10),
        ("b25_fuzzy_join", bench.b25_fuzzy_join, cust1, cust10),
        ("b26_zorder_cluster", bench.b26_zorder_cluster, ord1, ord10),
        ("b27_pipeline_chain",
         lambda s_, d: bench.b27_pipeline_chain(s_, d[0], d[1]),
         (docs1, emb1), (docs10, emb10)),
        ("b6_dedup_lsh", bench.b6_dedup_lsh, docs1, docs10),
        ("b7_ann", bench.b7_ann, emb1, emb10),
        ("b8_text_analysis", bench.b8_text_analysis, docs1, docs10),
        ("b11_embedding_near_dup", bench.b11_embedding_near_dup, emb1, emb10),
    ]
    out = {}
    # Candidate-growth gate (VERDICT r6 #2): minhash-LSH candidate pairs
    # must stay ~LINEAR in corpus size. On the remapped-copy corpus the
    # 10x pair count is ~10x the 1x count (0.77/doc at sf0.1); the 3/doc
    # bound sits well above noise but far below any quadratic residue
    # (the old shuffle-synthesized corpus hit 7.3/doc). The mega-cluster
    # assertion below separately pins the hot-bucket star expansion —
    # removing the cap fails THAT gate with an O(m^2) explosion.
    from pyspark.sql import functions as F

    from deequ_spark.llm import minhash_lsh_pairs

    CAND_PER_DOC = 3.0
    growth = {}
    for label, d in (("1x", docs1), ("10x", docs10)):
        n_docs = d.count()
        n_cand = minhash_lsh_pairs(d, "doc_id", "text", 0.8,
                                   verify_exact=False).count()
        bound = int(CAND_PER_DOC * n_docs)
        growth[label] = {"docs": n_docs, "candidate_pairs": n_cand,
                         "bound": bound, "ok": n_cand <= bound}
        assert n_cand <= bound, (
            f"minhash candidate growth superlinear at {label}: "
            f"{n_cand} pairs > {bound} (= {CAND_PER_DOC}/doc)")
    # 50k-copy duplicate mega-cluster: must COMPLETE with O(m) star
    # candidates (m−1 = 49,999), never O(m²) (1.25e9 pairs in one task)
    mega = spark.range(50_000).select(
        F.col("id").alias("doc_id"),
        F.lit("identical boilerplate page body on every mirror "
              "of this site, repeated verbatim across the crawl")
        .alias("text"))
    n_mega = minhash_lsh_pairs(mega, "doc_id", "text", 0.8,
                               verify_exact=False).count()
    growth["mega_cluster_50k"] = {"docs": 50_000, "candidate_pairs": n_mega,
                                  "bound": 49_999, "ok": n_mega == 49_999}
    assert n_mega == 49_999, (
        f"mega-cluster star expansion broken: {n_mega} != 49999")
    # SemDeDup mega-cluster: 20k near-identical embeddings land in ONE
    # refined group (identical vectors share every hyperplane signature),
    # which must emit exactly m-1 min-partner edges — O(m), components-
    # exact — never the O(m^2) full expansion (2*10^8 pairs -> JVM OOM,
    # observed before the cap landed).
    import numpy as np

    from deequ_spark.llm import semantic_duplicate_pairs

    rng = np.random.default_rng(9)
    sd_base = rng.standard_normal(16)
    sd_base = sd_base / np.linalg.norm(sd_base)
    m_sd = 20_000
    noise = 1e-5 * rng.standard_normal((m_sd, 16))
    sd_rows = [(i, [float(x) for x in (sd_base + noise[i])])
               for i in range(m_sd)]
    sd_df = spark.createDataFrame(sd_rows, "id long, vec array<double>") \
        .repartition(16)
    n_sd = semantic_duplicate_pairs(
        sd_df, "id", "vec", threshold=0.999,
        centroids=[[float(x) for x in sd_base]],
        max_cluster_rows=1024, hot_group_cap=1024).count()
    growth["semdedup_mega_20k"] = {"docs": m_sd, "candidate_pairs": n_sd,
                                   "bound": m_sd - 1, "ok": n_sd == m_sd - 1}
    assert n_sd == m_sd - 1, (
        f"semdedup min-partner expansion broken: {n_sd} != {m_sd - 1}")
    # PassJoin pair growth: on the copy-disjoint 10x customer corpus the
    # true k=1 pair count must grow ~linearly (same-copy pairs x10 plus
    # nothing cross-copy); a superlinear count means the signature
    # scheme started matching across copies (blocking regression)
    from deequ_spark.linkage import edit_distance_join
    fz = {}
    for label, d in (("1x", cust1), ("10x", cust10)):
        n_rows = d.count()
        n_pairs = edit_distance_join(d, "c_name", 1, "c_custkey").count()
        fz[label] = {"rows": n_rows, "pairs": n_pairs}
    bound = int(fz["1x"]["pairs"] * 10.5) + 1
    fz["ok"] = fz["10x"]["pairs"] <= bound
    assert fz["ok"], (
        f"fuzzy-join pair growth superlinear: {fz['10x']['pairs']} "
        f"> {bound} (10.5x the 1x count)")
    growth["fuzzy_join_pairs"] = fz
    # Containment-join pair growth (VERDICT r9 #5). NOT gated on the sf
    # documents corpus: its 31-word vocabulary makes the TRUE ordered
    # containment pair set quadratic by definition (42k real pairs on
    # 500 docs at sf0.01) — output-bound density, not a plan defect (the
    # same caveat token_jaccard_join documents). The gate corpus instead
    # has DISCRIMINATIVE tokens (the realistic Zipf-tail shape the
    # prefix filter exploits): N base docs of 20 doc-unique tokens, one
    # fragment per 10th doc carrying 60% of its base's tokens (the true
    # pairs), built per disjoint copy — true pairs and candidates must
    # both grow ~linearly in copies.
    from deequ_spark.linkage import token_containment_join

    def containment_corpus(n_copies: int):
        # tokens are CONTIGUOUS alphanumerics (tokenize_set splits on
        # [^a-z0-9]+ — a w{id}_{k} shape would shatter into hot digit
        # tokens shared by every doc and quadratic the join)
        base = spark.range(2_000).selectExpr(
            "id AS doc_id",
            "concat_ws(' ', transform(sequence(0, 19), "
            "k -> concat('w', id, 'x', k))) AS text")
        frag = (base.where("doc_id % 10 = 0")
                .selectExpr(
                    "doc_id + 1000000 AS doc_id",
                    "concat_ws(' ', transform(sequence(0, 11), "
                    "k -> concat('w', doc_id, 'x', k))) AS text"))
        one = base.unionByName(frag)
        return one if n_copies == 1 else \
            spark.range(n_copies).crossJoin(one).selectExpr(
                "id * 10000000 + doc_id AS doc_id",
                "replace(text, 'w', concat('c', id, 'w')) AS text")
    # copy remap: token wNxK -> cCwNxK keeps copies token-disjoint

    cj = {}
    for label, d in (("1x", containment_corpus(1)),
                     ("10x", containment_corpus(10))):
        d = d.repartition(32).cache()
        d.count()
        t0 = time.perf_counter()
        n_pairs = token_containment_join(d, "doc_id", "text", 0.6).count()
        cj[label] = {"pairs": n_pairs,
                     "t": round(time.perf_counter() - t0, 2)}
        d.unpersist()
    cj_bound = int(cj["1x"]["pairs"] * 10.5) + 1
    cj["ok"] = (cj["10x"]["pairs"] <= cj_bound
                and cj["1x"]["pairs"] >= 200)
    assert cj["ok"], (
        f"containment pair growth superlinear or fragments unmatched: "
        f"{cj} bound={cj_bound}")
    growth["containment_pairs"] = cj
    # Exact heavy hitters (VERDICT r9 #5): the MG candidate pass must
    # stay bounded on a cardinality-shaped column — the whole point is
    # NOT keeping hash-agg state per distinct value. Gate: (a) the
    # result equals the brute-force groupBy answer at both scales,
    # (b) a corpus-sized distinct column (o_orderkey: every value
    # unique) returns empty without blowing memory, at ~linear time.
    from deequ_spark.diagnostics import exact_heavy_hitters
    hh = {}
    for label, d in (("1x", ord1), ("10x", ord10)):
        t0 = time.perf_counter()
        got = {(r["value"], r["count"]) for r in exact_heavy_hitters(
            d, "o_orderpriority", 0.15).collect()}
        n_total = d.where(F.col("o_orderpriority").isNotNull()).count()
        want = {(r["o_orderpriority"], r["cnt"]) for r in
                d.groupBy("o_orderpriority")
                .agg(F.count("*").alias("cnt"))
                .where(F.col("cnt") >= 0.15 * n_total).collect()}
        n_empty = exact_heavy_hitters(d, "o_orderkey", 0.2).count()
        hh[label] = {"hitters": len(got), "exact_match": got == want,
                     "distinct_col_hitters": n_empty,
                     "t": round(time.perf_counter() - t0, 2)}
        assert got == want, f"heavy hitters wrong at {label}"
        assert n_empty == 0, (
            f"distinct column produced hitters at {label}: {n_empty}")
    hh["ok"] = True
    growth["exact_heavy_hitters"] = hh
    # Archive indexers (r10): map-only byte walks — wall time must be
    # ~linear in FILE COUNT and row output exactly proportional
    import tempfile

    from deequ_spark.llm import (build_warc_file, build_warc_record,
                                 warc_cdx_index)

    def make_warc_dir(n_files, recs_per_file=200):
        d = tempfile.mkdtemp(prefix="scale_cdx_")
        for f in range(n_files):
            recs = [build_warc_record(
                "conversion", (b"x" * 400),
                target_uri=f"http://h{f}.io/{k}")
                for k in range(recs_per_file)]
            with open(f"{d}/f{f:04d}.warc.gz", "wb") as fh:
                fh.write(build_warc_file(recs, gzip_members=True))
        return d
    cdx = {}
    for label, nf in (("1x", 8), ("10x", 80)):
        d = make_warc_dir(nf)
        t0 = time.perf_counter()
        n = warc_cdx_index(
            spark.read.format("binaryFile").load(f"{d}/*.warc.gz")
            .select("path", "content")).count()
        cdx[label] = {"files": nf, "rows": n,
                      "t": round(time.perf_counter() - t0, 2)}
        import shutil as _sh
        _sh.rmtree(d, ignore_errors=True)
    cdx["ok"] = (cdx["1x"]["rows"] * 10 == cdx["10x"]["rows"])
    assert cdx["ok"], f"cdx row growth not proportional: {cdx}"
    growth["cdx_index"] = cdx
    # Bloom join pruning (r11): the SHUFFLE-ROW REDUCTION — the whole
    # point of the operator at 100 TB — must hold at both scales, and
    # the bloom path must stay row-identical to the plain semi join.
    # Survivors = true matches + ~fpp of non-members, so the reduction
    # ratio is scale-INDEPENDENT by construction; gate it.
    from deequ_spark import bloom_might_contain, bloom_semi_join, build_bloom
    bj = {}
    for label, (li_d, ord_d) in (("1x", (li1, ord1)),
                                 ("10x", (li10, ord10))):
        urgent = ord_d.where(F.col("o_orderpriority") == "1-URGENT") \
            .select("o_orderkey")
        total = li_d.count()
        bl = build_bloom(urgent, "o_orderkey")
        t0 = time.perf_counter()
        survivors = li_d.where(
            bloom_might_contain(bl, F.col("l_orderkey"))).count()
        n_semi = bloom_semi_join(li_d, urgent, "l_orderkey",
                                 small_on="o_orderkey").count()
        n_plain = li_d.join(
            urgent.withColumnRenamed("o_orderkey", "l_orderkey")
            .distinct(), "l_orderkey", "left_semi").count()
        bj[label] = {"fact_rows": total, "survivors": survivors,
                     "reduction": round(total / max(survivors, 1), 2),
                     "rows_match_plain": n_semi == n_plain,
                     "t": round(time.perf_counter() - t0, 2)}
        assert n_semi == n_plain, f"bloom semi diverged at {label}: {bj}"
        assert bj[label]["reduction"] >= 2.0, (
            f"bloom pruned <2x at {label}: {bj}")
    bj["ok"] = abs(bj["1x"]["reduction"] - bj["10x"]["reduction"]) \
        <= 0.5 * bj["1x"]["reduction"]
    assert bj["ok"], f"bloom reduction not scale-stable: {bj}"
    growth["bloom_join_reduction"] = bj
    # r12/r13 conf-knob gates (VERDICT r12 #8): each size-adaptive gate
    # must flip to its DISTRIBUTED/corpus path past the bound with
    # IDENTICAL output — the knobs' 100 TB story, asserted at 1x/10x.
    from deequ_spark.llm import dedup_against_index
    from deequ_spark.llm.dedup import near_duplicate_components
    from deequ_spark.llm.text import remove_boilerplate_lines
    knobs = {}
    # (a) ccLocalMaxEdges: driver union-find vs distributed min-label
    # loop — identical component labels on chain+clique graphs at both
    # edge scales (10x crosses nothing; the flip is forced both ways).
    cc = {}
    for label, n_edges in (("1x", 2_000), ("10x", 20_000)):
        pairs = spark.range(n_edges).selectExpr(
            "CAST(id AS long) AS id_a",
            # chains of 10 + a few cliques: id -> id+1 unless boundary
            "CAST(CASE WHEN id % 10 = 9 THEN id ELSE id + 1 END AS long)"
            " AS id_b")
        local = sorted((r["id"], r["component"]) for r in
                       near_duplicate_components(
                           pairs, local_max_edges=10**9).collect())
        dist = sorted((r["id"], r["component"]) for r in
                      near_duplicate_components(
                          pairs, local_max_edges=0).collect())
        cc[label] = {"edges": n_edges, "ok": local == dist}
        assert local == dist, f"cc paths diverge at {label}"
    knobs["ccLocalMaxEdges_paths_identical"] = cc
    # (b) boilerplateLocalMaxLines: per-row HOF rebuild vs the corpus
    # join rebuild — identical (doc count, removed-line total, cleaned
    # text checksum) at both corpus scales.
    bp = {}
    for label, d in (("1x", docs1), ("10x", docs10)):
        def bp_sig(local_max_lines):
            out_bp = remove_boilerplate_lines(
                d, "doc_id", "text", min_docs=2,
                local_max_lines=local_max_lines)
            row = out_bp.agg(
                F.count(F.lit(1)),
                # bound the per-row hash so the ANSI-mode sum can't
                # overflow (2^40 x 20k rows < 2^55)
                F.sum(F.pmod(F.xxhash64(F.col("cleaned")),
                             F.lit(1 << 40))),
                F.sum("n_removed_lines")).collect()[0]
            return tuple(row)
        hof, join_ = bp_sig(4096), bp_sig(0)
        bp[label] = {"ok": hof == join_}
        assert hof == join_, f"boilerplate paths diverge at {label}: " \
            f"{hof} vs {join_}"
    knobs["boilerplateLocalMaxLines_paths_identical"] = bp
    # (c) bloomMinIndexKeys: the fps-bloom pre-filter is a pure
    # pre-filter — classification identical with the probe forced ON
    # vs forced OFF, against the 1x AND 10x indexes; and the conf
    # floor opens the gate (observable: the probe's temp view).
    import hashlib as _hl
    bl = {}
    for label, idx in (("1x", idx1), ("10x", idx10)):
        def classify(**kw):
            _f, dups = dedup_against_index(inc_batch, "doc_id", "text",
                                           idx, threshold=0.5, **kw)
            return sorted((r["id"], r["match_kind"], r["matched_id"])
                          for r in dups.collect())
        on, off = classify(use_bloom=True), classify(use_bloom=False)
        view = ("dedup_fps_bloom_"
                + _hl.md5(idx.encode("utf-8")).hexdigest()[:12])
        spark.conf.set("spark.deequ.dedup.bloomMinIndexKeys", "1")
        try:
            floor = classify()
            gate_opened = spark.catalog.tableExists(view)
        finally:
            spark.conf.unset("spark.deequ.dedup.bloomMinIndexKeys")
            if spark.catalog.tableExists(view):
                spark.catalog.dropTempView(view)
        bl[label] = {"ok": on == off == floor,
                     "gate_opened_at_floor": gate_opened}
        assert on == off == floor, f"bloom classify diverges at {label}"
        assert gate_opened, f"conf floor did not open the gate at {label}"
    knobs["bloomMinIndexKeys_paths_identical"] = bl
    growth["conf_knob_gates"] = knobs
    out["candidate_growth"] = growth
    # flat-per-task-memory evidence for the size-targeted shard writer:
    # the LARGEST shard (≈ one task's buffered bytes) must stay ~target
    # while the shard COUNT absorbs the 10x corpus growth; doubles as
    # the timed b25 sample (one write per scale point)
    wds, wds_t = {}, {}
    for label, d in (("1x", docs1), ("10x", docs10)):
        t0 = time.perf_counter()
        n_sh, mx = webdataset_workload(spark, d)
        wds_t[label] = time.perf_counter() - t0
        wds[label] = {"n_shards": n_sh, "max_shard_bytes": mx,
                      "target_bytes": WDS_TARGET,
                      "ok": mx < 2 * WDS_TARGET}
    out["webdataset_flat_task_memory"] = wds
    out["b25_webdataset_write"] = {
        "t_1x": round(wds_t["1x"], 2), "t_10x": round(wds_t["10x"], 2),
        "ratio": round(wds_t["10x"] / max(wds_t["1x"], 1e-9), 1)}

    for name, fn, small, big in workloads:
        fn(spark, small)                              # warm the path once
        t0 = time.perf_counter()
        fn(spark, small)
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(spark, big)
        t_big = time.perf_counter() - t0
        out[name] = {"t_1x": round(t_small, 2), "t_10x": round(t_big, 2),
                     "ratio": round(t_big / max(t_small, 1e-9), 1)}
    print(json.dumps({"metric": "scale_10x_ratios", "workloads": out}))
    import shutil
    shutil.rmtree(warc1, ignore_errors=True)
    shutil.rmtree(warc10, ignore_errors=True)


if __name__ == "__main__":
    main()
