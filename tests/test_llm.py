"""Tests for LLM-pipeline operators: dedup, similarity, text, multimodal."""

import pytest
from pyspark.sql import functions as F

from deequ_spark.llm import (attach_binary_payload, brute_force_topk,
                             cosine_similarity_expr, deduplicate_exact,
                             embedding_near_duplicates, exact_duplicates,
                             extract_binary_features, fingerprint,
                             hyperplane_lsh_topk, jaccard_similarity_pairs,
                             knn_join, language_id, minhash_lsh_pairs,
                             minhash_signatures, sample_chunks, simhash,
                             simhash_near_duplicates, text_quality,
                             token_count_regex, token_count_whitespace,
                             word_shingles)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "completely different text about spark engines here"),
        (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (4, "unrelated short document"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestExactDedup:
    def test_exact_duplicates(self, docs):
        dups = exact_duplicates(docs, ["text"]).collect()
        assert len(dups) == 1
        assert dups[0]["dup_count"] == 2

    def test_deduplicate(self, docs):
        assert deduplicate_exact(docs, ["text"]).count() == 4


class TestShingles:
    def test_word_shingles(self, spark):
        df = spark.createDataFrame([("a b c d",)], "t string")
        sh = df.select(word_shingles(F.col("t"), 2).alias("s")).collect()[0]["s"]
        assert sorted(sh) == ["a b", "b c", "c d"]

    def test_short_text(self, spark):
        df = spark.createDataFrame([("one two",)], "t string")
        sh = df.select(word_shingles(F.col("t"), 3).alias("s")).collect()[0]["s"]
        assert sh == ["one two"]


class TestJaccardPairs:
    def test_finds_near_and_exact_dups(self, docs):
        pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
                 for r in jaccard_similarity_pairs(docs, "doc_id", "text",
                                                   0.5, shingle_n=2).collect()}
        assert pairs[(0, 3)] == 1.0            # exact duplicate
        assert 0.5 <= pairs[(0, 1)] < 1.0      # near duplicate
        assert (0, 2) not in pairs

    def test_threshold_excludes(self, docs):
        pairs = jaccard_similarity_pairs(docs, "doc_id", "text", 0.99,
                                         shingle_n=2).collect()
        assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 3)}


class TestMinHashLSH:
    def test_signatures_shape(self, docs):
        sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=16,
                                  shingle_n=2).collect()
        assert all(len(r["signature"]) == 16 for r in sigs)
        by_id = {r["id"]: r["signature"] for r in sigs}
        assert by_id[0] == by_id[3]  # identical docs → identical signatures

    def test_lsh_finds_planted_pairs(self, docs):
        pairs = {(r["id_a"], r["id_b"])
                 for r in minhash_lsh_pairs(docs, "doc_id", "text", 0.5,
                                            num_hashes=32, bands=16,
                                            shingle_n=2).collect()}
        assert (0, 3) in pairs and (0, 1) in pairs
        assert (0, 2) not in pairs

    def test_lsh_agrees_with_exact(self, docs):
        lsh = {(r["id_a"], r["id_b"])
               for r in minhash_lsh_pairs(docs, "doc_id", "text", 0.5,
                                          num_hashes=64, bands=32,
                                          shingle_n=2).collect()}
        exact = {(r["id_a"], r["id_b"])
                 for r in jaccard_similarity_pairs(docs, "doc_id", "text",
                                                   0.5, shingle_n=2).collect()}
        assert lsh == exact


class TestSimHash:
    def test_identical_docs_same_hash(self, docs):
        hashes = {r["id"]: r["simhash"]
                  for r in simhash(docs, "doc_id", "text").collect()}
        assert hashes[0] == hashes[3]

    def test_near_duplicates(self, docs):
        pairs = {(r["id_a"], r["id_b"]): r["hamming"]
                 for r in simhash_near_duplicates(docs, "doc_id", "text",
                                                  max_hamming=16).collect()}
        assert pairs.get((0, 3)) == 0
        assert (0, 1) in pairs


class TestSimilarity:
    @pytest.fixture(scope="class")
    def vectors(self, spark):
        rows = [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [-1.0, 0.0, 0.0]),
            (4, [1.0, 0.01, 0.0]),
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_brute_force_topk(self, vectors):
        top = brute_force_topk(vectors, "vec_id", "embedding",
                               [1.0, 0.0, 0.0], k=3).collect()
        assert [r["id"] for r in top] == [0, 4, 1]
        assert top[0]["cosine"] == pytest.approx(1.0)

    def test_knn_join(self, vectors):
        out = knn_join(vectors.where("vec_id = 0"), vectors,
                       "vec_id", "vec_id", "embedding", k=2).collect()
        assert {r["cid"] for r in out} == {0, 4}

    def test_lsh_topk_contains_best(self, vectors):
        top = hyperplane_lsh_topk(vectors, "vec_id", "embedding",
                                  [1.0, 0.0, 0.0], k=3, planes=2).collect()
        assert 0 in [r["id"] for r in top]

    def test_ivf_topk_exact_when_probing_all(self, vectors):
        from deequ_spark.llm import ivf_topk, kmeans_centroids
        cents = kmeans_centroids(vectors, "embedding", n_centroids=2)
        # nprobe == n_centroids → no pruning → must equal brute force
        top = ivf_topk(vectors, "vec_id", "embedding", [1.0, 0.0, 0.0],
                       k=3, centroids=cents, nprobe=2).collect()
        assert [r["id"] for r in top] == [0, 4, 1]

    def test_ivf_assign_partitions_corpus(self, vectors):
        from deequ_spark.llm import ivf_assign, kmeans_centroids
        cents = kmeans_centroids(vectors, "embedding", n_centroids=2)
        assigned = ivf_assign(vectors, "embedding", cents)
        rows = assigned.collect()
        assert all(0 <= r["ivf_list"] < 2 for r in rows)
        # opposite vectors 0 and 3 must land in different lists
        by_id = {r["vec_id"]: r["ivf_list"] for r in rows}
        assert by_id[0] != by_id[3]

    def test_distributed_kmeans_ivf_recall(self, spark):
        """n_centroids above the threshold routes through pyspark.ml
        KMeans (full-table, no driver sample); the resulting IVF index
        must reach high recall vs brute force on the 10x embeddings
        table — the scale path a √n-list 100 TB index needs."""
        from deequ_spark.llm import (brute_force_topk, ivf_topk,
                                     kmeans_centroids)
        emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        cents = kmeans_centroids(emb, "embedding", n_centroids=300,
                                 iters=5, distributed_threshold=256)
        assert len(cents) == 300
        # unit-norm centroids (spherical k-means contract)
        import math
        for c in cents[:10]:
            assert math.isclose(sum(v * v for v in c), 1.0, rel_tol=1e-6)
        qvec = [float(v) for v in emb.where("vec_id = 7")
                .select("embedding").collect()[0][0]]
        exact = {r["id"] for r in brute_force_topk(
            emb, "vec_id", "embedding", qvec, k=10).collect()}
        approx = {r["id"] for r in ivf_topk(
            emb, "vec_id", "embedding", qvec, k=10,
            centroids=cents, nprobe=60).collect()}
        recall = len(exact & approx) / 10
        assert recall >= 0.7, f"recall@10={recall} with nprobe=60/300"

    def test_small_n_centroids_stays_on_driver_lloyds(self, vectors,
                                                      monkeypatch):
        """Below the threshold the driver Lloyd's path runs — the ML
        path must NOT be invoked (it pays a full-table distributed fit)."""
        import deequ_spark.llm.similarity as sim

        def boom(*a, **k):
            raise AssertionError("ML path used for small n_centroids")

        monkeypatch.setattr(sim, "_kmeans_centroids_ml", boom)
        cents = sim.kmeans_centroids(vectors, "embedding", n_centroids=2)
        assert len(cents) == 2

    def test_embedding_near_duplicates(self, vectors):
        pairs = {(r["id_a"], r["id_b"])
                 for r in embedding_near_duplicates(
                     vectors, "vec_id", "embedding", 0.99,
                     planes=2).collect()}
        assert (0, 4) in pairs
        assert (0, 3) not in pairs


class TestText:
    def test_token_counts(self, spark):
        df = spark.createDataFrame([("hello, world! two",)], "t string")
        r = df.select(token_count_whitespace(F.col("t")).alias("ws"),
                      token_count_regex(F.col("t")).alias("re")).collect()[0]
        assert r["ws"] == 3
        assert r["re"] == 5  # hello , world ! two

    def test_language_id(self, spark):
        rows = [("the cat is on the mat and it is happy",),
                ("der hund ist nicht mit der katze",),
                ("el perro y la gata en la casa",),
                ("xyzzy qwerty",)]
        df = spark.createDataFrame(rows, "text string")
        preds = [r["lang_pred"] for r in language_id(df, "text").collect()]
        assert preds == ["en", "de", "es", "unknown"]

    def test_language_id_trigrams_20_languages(self, spark):
        """Every language's representative sample classifies correctly;
        garbage/empty is unknown; one-projection plan (no shuffle)."""
        from deequ_spark.llm import TRIGRAM_PROFILES, language_id_trigrams
        samples = {
            "en": "the king and the queen were standing in the garden",
            "de": "der alte mann und die junge frau gehen durch den wald",
            "es": "la casa de mis padres que está en la ciudad es grande",
            "fr": "le chien de la voisine est dans le jardin avec les enfants",
            "it": "il libro che ho letto di questo autore non era lungo",
            "pt": "a casa de meus pais não é longe da estação de comboios",
            "nl": "de kinderen van de buren spelen in het park met een bal",
            "sv": "jag tycker om att läsa böcker och att skriva långa brev",
            "da": "det er en god dag at gå en tur og se på byen til aften",
            "fi": "minä olen ollut tässä kaupungissa monta vuotta ja pidän",
            "pl": "nie wiem czy on przyjdzie na spotkanie w tygodniu",
            "cs": "to je velmi dobrý nápad a myslím že se nám to podaří",
            "hu": "az egyetemen sok érdekes előadást hallgattam meg tavaly",
            "tr": "bu şehirde yaşayan insanlar için daha iyi bir gelecek",
            "ro": "în orașul nostru copiii învață multe lucruri despre artă",
            "ru": "мы пошли на прогулку по набережной после рабочего дня",
            "ar": "ذهبنا في الصباح الى السوق لشراء الخضار من المزارعين",
            "zh": "我们在一个很大的城市里生活了很多年是很好的",
            "ja": "わたしは毎日の朝に公園を散歩するのが好きだった",
            "ko": "우리는 주말에 가족과 함께 공원에 가는 것을 좋아한다",
        }
        assert set(samples) == set(TRIGRAM_PROFILES)
        rows = list(samples.items()) + [("??", "012345 9876!"), ("??", "")]
        df = spark.createDataFrame(rows, "lang string, text string")
        out = language_id_trigrams(df, "text")
        got = {r["lang"]: r["lang_pred"] for r in out.collect()
               if r["lang"] != "??"}
        assert got == {k: k for k in samples}
        unknowns = [r["lang_pred"] for r in out.collect() if r["lang"] == "??"]
        assert unknowns == ["unknown", "unknown"]
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan         # map-only projection

    def test_text_quality(self, spark):
        df = spark.createDataFrame([("Hello world hello world!",)], "t string")
        r = text_quality(df, "t").collect()[0]
        assert r["q_n_tokens"] == 4
        assert r["q_n_chars"] == 24
        # tokens: hello, world, hello, "world!" → 3 distinct of 4
        assert r["q_distinct_ratio"] == 0.75
        assert r["q_punct_ratio"] == pytest.approx(1 / 24)

    def test_fingerprint_normalization(self, spark):
        df = spark.createDataFrame(
            [("Hello  World",), ("hello world",), ("different",)], "t string")
        fps = [r["fp"] for r in df.select(
            fingerprint(F.col("t")).alias("fp")).collect()]
        assert fps[0] == fps[1] != fps[2]


class TestMultimodal:
    def test_full_plumbing(self, docs):
        media = attach_binary_payload(docs, "text", "doc_id")
        assert dict(media.dtypes)["payload"] == "binary"
        feats = extract_binary_features(media).collect()
        assert len(feats) == 5
        by_id = {r["media_id"]: r for r in feats}
        assert by_id[0]["n_bytes"] == len(
            "the quick brown fox jumps over the lazy dog".encode())
        # identical payloads → identical digests (deterministic decoder)
        assert by_id[0]["sha256_prefix"] == by_id[3]["sha256_prefix"]

    def test_unsupported_formats_raise(self):
        """Compressed formats still raise at the PIL/soundfile
        integration point (the container has no media libs)."""
        from deequ_spark.llm import decode_audio, decode_image
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
        with pytest.raises(NotImplementedError):
            decode_audio(b"ID3\x03" + b"\x00" * 64)

    def test_bmp_roundtrip_exact(self):
        """Real stdlib BMP codec: encode (h,w,3) uint8 → decode gives the
        identical array back (row padding + bottom-up order handled)."""
        import numpy as np
        from deequ_spark.llm.multimodal import decode_image, encode_bmp
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)  # w*3 pads
        h, w, c, px = decode_image(encode_bmp(img))
        assert (h, w, c) == (5, 7, 3)
        assert np.array_equal(px, img)

    def test_wav_roundtrip_exact(self):
        import numpy as np
        from deequ_spark.llm.multimodal import decode_audio, encode_wav_pcm16
        s = (np.sin(np.arange(100)) * 1000).astype(np.int16)
        rate, back = decode_audio(encode_wav_pcm16(s, 8000))
        assert rate == 8000
        assert back.shape == (100, 1)
        assert np.array_equal(back[:, 0], s)

    def test_real_resize_nearest_neighbor(self):
        """2x upsample keeps every source pixel at even indices; 1x1
        downsample picks pixel (0,0) — the exact integer index map."""
        import numpy as np
        from deequ_spark.llm.multimodal import (decode_image, encode_bmp,
                                                real_resize)
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
        bmp = encode_bmp(img)
        h, w, _, up = decode_image(real_resize(bmp, 12, 8))
        assert (h, w) == (8, 12)
        assert np.array_equal(up[0::2][:, 0::2], img)
        h1, w1, _, one = decode_image(real_resize(bmp, 1, 1))
        assert (h1, w1) == (1, 1) and np.array_equal(one[0, 0], img[0, 0])

    def test_resize_media_real_path(self, spark):
        """resize_media's default resizer is now REAL for BMP payloads —
        mapInPandas round-trip through encode/decode on executors."""
        import numpy as np
        from deequ_spark.llm.multimodal import (decode_image, encode_bmp,
                                                resize_media)
        rows = [(i, encode_bmp(np.full((2 + i, 3 + i, 3), i, dtype=np.uint8)))
                for i in range(4)]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        out = {r["media_id"]: r for r in
               resize_media(df, 4, 3).collect()}
        assert len(out) == 4
        for i in range(4):
            h, w, _, px = decode_image(bytes(out[i]["resized"]))
            assert (h, w) == (3, 4)
            assert int(px[0, 0, 0]) == i  # constant-color source survives

    def test_sample_chunks(self, docs):
        media = attach_binary_payload(docs, "text", "doc_id")
        chunks = sample_chunks(media, chunk_bytes=10, stride=2).collect()
        assert all(len(r["chunk"]) <= 10 for r in chunks)
        doc0 = [r for r in chunks if r["media_id"] == 0]
        # 43 bytes → 5 chunks → sampled indices 0,2,4 → 3 chunks
        assert len(doc0) == 3


class TestKnnJoinScale:
    """knn_join must never shuffle the scored cross product — candidates
    come from per-batch local top-k, the final window sees only them."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        import numpy as np
        rng = np.random.default_rng(7)
        rows = [(i, [float(v) for v in rng.standard_normal(8)])
                for i in range(300)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_matches_brute_force_per_query(self, corpus):
        from deequ_spark.llm import brute_force_topk, knn_join
        queries = corpus.where("vec_id < 3")
        out = knn_join(queries, corpus, "vec_id", "vec_id", "embedding",
                       k=5).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["qid"], []).append((r["rank"], r["cid"],
                                                  r["cosine"]))
        for qrow in queries.collect():
            expected = [(r["id"], r["cosine"]) for r in brute_force_topk(
                corpus, "vec_id", "embedding",
                list(qrow["embedding"]), k=5).collect()]
            got = [(cid, cos) for _, cid, cos in
                   sorted(by_q[qrow["vec_id"]])]
            # ids AND cosines bit-identical with the JVM expression path
            assert got == expected

    def test_empty_queries_raise(self, corpus):
        from deequ_spark.llm import knn_join
        with pytest.raises(ValueError, match="empty"):
            knn_join(corpus.where("vec_id < 0"), corpus, "vec_id",
                     "vec_id", "embedding", k=5)


class TestKmeansSampleUnbiased:
    def test_clustered_sorted_input_recall(self, spark):
        """With limit()-based sampling the centroid sample would contain
        ONLY the first cluster of a sorted input; the seeded random sample
        must cover all clusters so nprobe=1 still finds the right list."""
        import numpy as np
        from deequ_spark.llm import ivf_topk, kmeans_centroids
        rng = np.random.default_rng(11)
        centers = [np.array([10.0, 0, 0, 0]), np.array([0, 10.0, 0, 0]),
                   np.array([0, 0, 10.0, 0])]
        rows = []
        for c_idx, c in enumerate(centers):        # sorted by cluster
            for i in range(200):
                v = c + rng.standard_normal(4) * 0.1
                rows.append((c_idx * 200 + i, [float(x) for x in v]))
        # multiple partitions in input order → limit() would see cluster 0 only
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>").coalesce(3)
        cents = kmeans_centroids(df, "embedding", n_centroids=3,
                                 sample_rows=90, seed=5)
        got = np.array(cents)
        # every true cluster direction must be represented by some centroid
        for c in centers:
            cn = c / np.linalg.norm(c)
            assert (got @ cn).max() > 0.9
        # and nprobe=1 must find the true nearest neighbor of a LAST-cluster query
        q = [0.0, 0.0, 10.0, 0.0]
        top = ivf_topk(df, "vec_id", "embedding", q, k=1,
                       centroids=cents, nprobe=1).collect()
        assert 400 <= top[0]["id"] < 600


class TestJaccardDfCap:
    def test_boilerplate_shingles_capped(self, spark):
        """Docs sharing ONLY a boilerplate header must not pair up when the
        header's shingles exceed the document-frequency cap."""
        from deequ_spark.llm import jaccard_similarity_pairs
        boiler = "all rights reserved license header "
        rows = [(i, boiler + f"unique content number {i} " * 3)
                for i in range(12)]
        rows += [(100, "genuine duplicate text body here"),
                 (101, "genuine duplicate text body here")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        uncapped = jaccard_similarity_pairs(
            docs, "doc_id", "text", threshold=0.15, shingle_n=3)
        capped = jaccard_similarity_pairs(
            docs, "doc_id", "text", threshold=0.15, shingle_n=3,
            max_shingle_df=5)
        capped_pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
        uncapped_pairs = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
        assert (100, 101) in capped_pairs          # real dup survives
        boiler_pairs = {p for p in capped_pairs if p[0] < 100}
        assert not boiler_pairs                    # boilerplate-only pairs gone
        assert {p for p in uncapped_pairs if p[0] < 100}  # …that existed before

    def test_cap_none_is_exact(self, docs):
        from deequ_spark.llm import jaccard_similarity_pairs
        a = jaccard_similarity_pairs(docs, "doc_id", "text", 0.5)
        b = jaccard_similarity_pairs(docs, "doc_id", "text", 0.5,
                                     max_shingle_df=None)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestHyperplaneDeterminism:
    @pytest.fixture(scope="class")
    def vectors(self, spark):
        rows = [(0, [1.0, 0.0, 0.0]), (1, [0.9, 0.1, 0.0]),
                (2, [0.0, 1.0, 0.0]), (3, [-1.0, 0.0, 0.0]),
                (4, [1.0, 0.01, 0.0])]
        return spark.createDataFrame(rows,
                                     "vec_id long, embedding array<float>")

    def test_signature_stable_and_seeded(self, vectors):
        from deequ_spark.llm import hyperplane_lsh_topk
        a = hyperplane_lsh_topk(vectors, "vec_id", "embedding",
                                [1.0, 0.0, 0.0], k=3, planes=4).collect()
        b = hyperplane_lsh_topk(vectors, "vec_id", "embedding",
                                [1.0, 0.0, 0.0], k=3, planes=4).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        assert 0 in [r["id"] for r in a]

    def test_plane_matrix_is_numpy_seeded(self):
        """Planes must come from seeded numpy, not builtin hash() (which is
        randomized per process)."""
        import numpy as np
        from deequ_spark.llm.similarity import _hyperplane_matrix
        expected = np.random.default_rng(42).standard_normal((4, 3))
        assert np.array_equal(_hyperplane_matrix(3, 4, 42), expected)


class TestBandShapeAutoTune:
    def test_planes_grow_with_corpus(self):
        from deequ_spark.llm import tune_band_shape
        p2k, b2k = tune_band_shape(2_000, 0.9)
        p20k, b20k = tune_band_shape(20_000, 0.9)
        p1e9, _ = tune_band_shape(10**9, 0.95)
        assert p20k > p2k            # log2(n)+1 growth
        assert p1e9 <= 26            # capped
        # expected RANDOM candidates stay ~linear: C(n,2)·bands/2^planes / n
        import math
        for n, (p, b) in [(2_000, (p2k, b2k)), (20_000, (p20k, b20k))]:
            per_row = (n - 1) / 2 * b / 2**p
            assert per_row < 50

    def test_recall_budget_respected(self):
        import math
        from deequ_spark.llm import tune_band_shape
        for thr in (0.8, 0.9, 0.95):
            p = 1 - math.acos(thr) / math.pi
            planes, bands = tune_band_shape(100_000, thr, miss_prob=1e-3)
            assert (1 - p**planes) ** bands <= 1e-3 * 1.01

    def test_auto_tune_finds_planted_pairs(self, spark):
        import numpy as np
        from deequ_spark.llm import embedding_near_duplicates
        rng = np.random.default_rng(3)
        rows = []
        for i in range(400):
            v = rng.standard_normal(16)
            rows.append((2 * i, [float(x) for x in v]))
            rows.append((2 * i + 1,                     # planted near-dup
                         [float(x) for x in v + rng.standard_normal(16) * 0.01]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        pairs = {(r["id_a"], r["id_b"]) for r in embedding_near_duplicates(
            df, "vec_id", "embedding", threshold=0.95,
            auto_tune=True).collect()}
        planted = {(2 * i, 2 * i + 1) for i in range(400)}
        assert planted <= pairs      # every planted pair found


class TestPII:
    def test_counts_and_redaction(self, spark):
        from deequ_spark.llm import pii_counts, redact_pii
        rows = [(0, "mail me at a.user+x@site.org or call 555-123-4567"),
                (1, "ssn 123-45-6789 card 4111-1111-1111-1111 ip 10.0.0.1"),
                (2, "no pii here at all")]
        df = spark.createDataFrame(rows, "id long, text string")
        counted = pii_counts(df, "text").collect()
        by_id = {r["id"]: r for r in counted}
        assert by_id[0]["pii_email"] == 1 and by_id[0]["pii_phone"] == 1
        assert by_id[1]["pii_ssn"] == 1 and by_id[1]["pii_credit_card"] == 1
        assert by_id[1]["pii_ipv4"] == 1
        assert all(by_id[2][f"pii_{k}"] == 0
                   for k in ("email", "phone", "ssn", "credit_card", "ipv4"))
        red = {r["id"]: r["r"] for r in df.select(
            "id", redact_pii(F.col("text")).alias("r")).collect()}
        assert red[0] == "mail me at [PII] or call [PII]"
        assert red[1] == "ssn [PII] card [PII] ip [PII]"
        assert red[2] == "no pii here at all"

    def test_redaction_order_email_before_digits(self, spark):
        from deequ_spark.llm import redact_pii
        df = spark.createDataFrame([("reach 123.456.7890@digits.co now",)],
                                   "text string")
        out = df.select(redact_pii(F.col("text")).alias("r")).collect()[0]["r"]
        # the whole email goes first; its digit prefix must not leak a
        # phone match afterwards
        assert out == "reach [PII] now"


class TestIvfIndexOnDisk:
    def test_probe_filter_becomes_partition_pruning(self, spark, tmp_path):
        import numpy as np
        from deequ_spark.llm import (brute_force_topk, ivf_topk,
                                     ivf_write_index)
        rng = np.random.default_rng(9)
        rows = [(i, [float(v) for v in rng.standard_normal(8)])
                for i in range(500)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        path = str(tmp_path / "ivf_index")
        cents = ivf_write_index(df, path, "embedding", n_centroids=4, seed=9)
        index = spark.read.parquet(path)
        q = [float(v) for v in rng.standard_normal(8)]
        top = ivf_topk(index, "vec_id", "embedding", q, k=5,
                       centroids=cents, nprobe=4)        # probe ALL lists
        # nprobe == n_centroids → must equal brute force exactly
        expected = brute_force_topk(df, "vec_id", "embedding", q, k=5)
        assert [r["id"] for r in top.collect()] == \
            [r["id"] for r in expected.collect()]
        # the probe filter must reach the PartitionFilters of the scan —
        # at 100 TB this is what makes a probe touch nprobe/n lists
        pruned = ivf_topk(index, "vec_id", "embedding", q, k=5,
                          centroids=cents, nprobe=1)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [ivf_list" in plan.replace("#", " #") or \
            "ivf_list" in plan.split("PartitionFilters")[1].split("]")[0]


class TestNearDedupComponents:
    @pytest.fixture(scope="class")
    def pairs(self, spark):
        # components: {1,2,3,4} (a chain), {7,9}; 5 and 6 untouched
        rows = [(1, 2), (2, 3), (3, 4), (7, 9)]
        return spark.createDataFrame(rows, "id_a long, id_b long")

    def test_components_min_label(self, spark, pairs):
        from deequ_spark.llm import near_duplicate_components
        comp = {r["id"]: r["component"]
                for r in near_duplicate_components(pairs).collect()}
        assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 9: 7}

    def test_deduplicate_near_keeps_representatives(self, spark, pairs):
        from deequ_spark.llm import deduplicate_near
        df = spark.createDataFrame([(i, f"doc {i}") for i in range(1, 10)],
                                   "doc_id long, text string")
        kept = {r["doc_id"]
                for r in deduplicate_near(df, "doc_id", pairs).collect()}
        # chain collapses to 1, pair collapses to 7, untouched rows stay
        assert kept == {1, 5, 6, 7, 8}

    def test_keep_by_score_policy(self, spark, pairs):
        """r8: keep the component's BEST row by a score column instead
        of the min id (ties break on min id)."""
        from deequ_spark.llm import deduplicate_near
        rows = [(1, 10.0), (2, 40.0), (3, 40.0), (4, 20.0),
                (5, 1.0), (6, 1.0), (7, 5.0), (8, 1.0), (9, 99.0)]
        df = spark.createDataFrame(rows, "doc_id long, score double")
        kept = {r["doc_id"] for r in
                deduplicate_near(df, "doc_id", pairs,
                                 keep_by="score").collect()}
        # chain {1,2,3,4}: max score 40 tie (2,3) -> 2; pair {7,9} -> 9
        assert kept == {2, 5, 6, 8, 9}
        # ascending: keep the LOWEST score
        kept_asc = {r["doc_id"] for r in
                    deduplicate_near(df, "doc_id", pairs, keep_by="score",
                                     descending=False).collect()}
        assert kept_asc == {1, 5, 6, 7, 8}

    def test_keep_by_null_score_never_wins(self, spark, pairs):
        """Review r8: plain asc() is nulls-first — a NULL-scored member
        must never outrank a real score in either direction."""
        from deequ_spark.llm import deduplicate_near
        rows = [(1, None), (2, 40.0), (3, None), (4, 20.0),
                (5, 1.0), (6, 1.0), (7, None), (8, 1.0), (9, 5.0)]
        df = spark.createDataFrame(rows, "doc_id long, score double")
        for desc, chain_win, pair_win in ((True, 2, 9), (False, 4, 9)):
            kept = {r["doc_id"] for r in
                    deduplicate_near(df, "doc_id", pairs, keep_by="score",
                                     descending=desc).collect()}
            assert kept == {chain_win, 5, 6, 8, pair_win}, desc

    def test_long_chain_converges(self, spark):
        from deequ_spark.llm import near_duplicate_components
        chain = spark.createDataFrame([(i, i + 1) for i in range(30)],
                                      "id_a long, id_b long")
        comp = {r["id"]: r["component"]
                for r in near_duplicate_components(chain).collect()}
        assert set(comp.values()) == {0}      # one 31-node component

    def test_local_and_distributed_paths_identical(self, spark, pairs):
        """r12 perf: small graphs take a driver-side union-find fast
        path (gated by local_max_edges); its labeling must be
        IDENTICAL to the distributed min-label loop, schema included."""
        from deequ_spark.llm import near_duplicate_components
        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(30)] + [(100, 90), (90, 80)],
            "id_a long, id_b long")
        for graph in (pairs, chain):
            local = near_duplicate_components(graph)
            dist = near_duplicate_components(graph, local_max_edges=0)
            assert local.schema == dist.schema
            assert sorted(map(tuple, local.collect())) == \
                sorted(map(tuple, dist.collect()))


class TestCharShingleDedup:
    """shingles='char': near-dup for unsegmented scripts where word
    shingles see one giant token."""

    def _docs(self, spark):
        # 'CJK-like': no whitespace; doc 2 is doc 1 with a small edit,
        # doc 3 unrelated
        a = "春眠不覺曉處處聞啼鳥夜來風雨聲花落知多少" * 3
        b = a[:-4] + "花落知幾何"
        c = "國破山河在城春草木深感時花濺淚恨別鳥驚心" * 3
        return spark.createDataFrame(
            [(1, a), (2, b), (3, c)], "doc_id long, text string")

    def test_char_shingles_expr(self, spark):
        from deequ_spark.llm import char_shingles
        df = spark.createDataFrame([("abcd e",), ("ab",), (None,)],
                                   "t string")
        got = [r["s"] for r in
               df.select(char_shingles(F.col("t"), 3).alias("s")).collect()]
        assert got[0] == ["abc", "bcd", "cd ", "d e"]
        assert got[1] == ["ab"]                   # shorter than n
        assert got[2] is None

    def test_word_shingles_blind_char_shingles_see(self, spark):
        from deequ_spark.llm import jaccard_similarity_pairs
        docs = self._docs(spark)
        word_pairs = jaccard_similarity_pairs(
            docs, "doc_id", "text", threshold=0.5).collect()
        assert word_pairs == []                   # one giant token each
        char_pairs = {(r["id_a"], r["id_b"]) for r in
                      jaccard_similarity_pairs(
                          docs, "doc_id", "text", threshold=0.5,
                          shingle_n=5, shingles="char").collect()}
        assert char_pairs == {(1, 2)}

    def test_minhash_char_mode(self, spark):
        from deequ_spark.llm import minhash_lsh_pairs
        docs = self._docs(spark)
        pairs = {(r["id_a"], r["id_b"]) for r in
                 minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5,
                                   shingle_n=5,
                                   shingles="char").collect()}
        assert pairs == {(1, 2)}

    def test_case_insensitive_like_word_mode(self, spark):
        """Review r8: the mode flag must not silently change CASE
        semantics — char shingles lowercase like the word tokenizer."""
        from deequ_spark.llm import jaccard_similarity_pairs
        docs = spark.createDataFrame(
            [(1, "HelloWorldOfShingles" * 3),
             (2, "helloworldofshingles" * 3)], "doc_id long, text string")
        pairs = jaccard_similarity_pairs(docs, "doc_id", "text",
                                         threshold=0.9,
                                         shingles="char").collect()
        assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in pairs] \
            == [(1, 2, 1.0)]

    def test_char_default_n_is_5(self, spark):
        from deequ_spark.llm import char_shingles
        from deequ_spark.llm.dedup import _default_shingle_n
        assert _default_shingle_n(None, "char") == 5
        assert _default_shingle_n(None, "word") == 3
        assert _default_shingle_n(7, "char") == 7

    def test_whitespace_insensitive(self, spark):
        from deequ_spark.llm import char_shingles
        df = spark.createDataFrame([("a  b\tc",), ("a b c",)], "t string")
        got = [tuple(r["s"]) for r in
               df.select(char_shingles(F.col("t"), 3).alias("s")).collect()]
        assert got[0] == got[1]

    def test_blank_text_yields_no_shingles_either_mode(self, spark):
        """r9 review fix: empty / whitespace-only text yields [] in
        BOTH modes — an empty-string shingle made every pair of blank
        documents Jaccard-1.0 'near-duplicates'."""
        from deequ_spark.llm import char_shingles, word_shingles
        df = spark.createDataFrame([("",), ("  \t\n",)], "t string")
        for fn in (word_shingles, char_shingles):
            got = [r["s"] for r in
                   df.select(fn(F.col("t")).alias("s")).collect()]
            assert got == [[], []], fn.__name__

    def test_blank_docs_never_near_duplicates(self, spark):
        """Blank docs get NULL minhash signatures (the all-MAX init
        would LSH-collide them — and xxhash64's null-skipping would
        band NULL signatures to a constant, so banding filters them).
        They may still EXACT-match by fingerprint, which is correct."""
        from deequ_spark.llm import minhash_lsh_pairs, minhash_signatures
        docs = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "the quick brown fox jumps over it"),
             (4, "the quick brown fox jumps over it"), (5, "")],
            "doc_id long, text string")
        for mode in ("word", "char"):
            sigs = minhash_signatures(docs, "doc_id", "text",
                                      shingles=mode).collect()
            assert sorted(r["id"] for r in sigs
                          if r["signature"] is None) == [1, 2, 5]
            pairs = sorted((r["id_a"], r["id_b"]) for r in
                           minhash_lsh_pairs(docs, "doc_id", "text",
                                             threshold=0.8,
                                             shingles=mode).collect())
            assert pairs == [(3, 4)], mode


class TestNearDedupEdgeCases:
    def test_empty_pairs_noop(self, spark):
        from deequ_spark.llm import deduplicate_near, near_duplicate_components
        empty = spark.createDataFrame([], "id_a long, id_b long")
        assert near_duplicate_components(empty).count() == 0
        df = spark.createDataFrame([(i, f"d{i}") for i in range(5)],
                                   "doc_id long, text string")
        assert deduplicate_near(df, "doc_id", empty).count() == 5


class TestNullRobustness:
    """A 100 TB corpus WILL contain NULL text and NULL embeddings; every
    operator must follow SQL semantics (NULL in → NULL/dropped out),
    never crash an Arrow UDF."""

    @pytest.fixture(scope="class")
    def null_docs(self, spark):
        return spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog"),
             (2, None), (3, ""), (4, "   "),
             (5, "the quick brown fox jumps over the lazy dog")],
            "id long, text string")

    @pytest.fixture(scope="class")
    def null_vecs(self, spark):
        return spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0]),
             (4, [1.0, 0.001])],
            "id long, vec array<double>")

    def test_language_id_null_is_unknown(self, null_docs):
        from deequ_spark.llm import language_id, language_id_trigrams
        for fn in (language_id, language_id_trigrams):
            got = {r["id"]: r["lang_pred"]
                   for r in fn(null_docs, "text").collect()}
            assert got[1] == "en" and got[5] == "en"
            assert got[2] == "unknown"        # NULL text
            assert got[3] == "unknown"        # empty text

    def test_text_quality_null_propagates(self, null_docs):
        from deequ_spark.llm import text_quality
        got = {r["id"]: r for r in text_quality(null_docs, "text").collect()}
        assert got[2]["q_n_tokens"] is None   # NULL in → NULL out
        assert got[3]["q_n_tokens"] == 0

    def test_minhash_null_and_empty_docs(self, null_docs):
        from deequ_spark.llm import minhash_lsh_pairs
        pairs = {(r["id_a"], r["id_b"])
                 for r in minhash_lsh_pairs(null_docs, "id", "text",
                                            threshold=0.8).collect()}
        assert (1, 5) in pairs                # the real duplicate
        # r9: blank docs have NO shingles (empty set) — Jaccard with
        # anything is 0/0, so they are NOT near-duplicates of each
        # other (exact fingerprint dedup still merges them, which is
        # where byte-identical trivia belongs)
        assert (3, 4) not in pairs
        # NULL text pairs with nothing
        assert not any(2 in p for p in pairs)

    def test_knn_join_drops_null_corpus_vectors(self, null_vecs):
        from deequ_spark.llm import knn_join
        out = knn_join(null_vecs.where("id = 1"), null_vecs,
                       "id", "id", "vec", k=10).collect()
        assert {r["cid"] for r in out} == {1, 3, 4}   # NULL row dropped

    def test_knn_join_null_query_vector_raises(self, null_vecs):
        from deequ_spark.llm import knn_join
        with pytest.raises(ValueError, match="NULL"):
            knn_join(null_vecs.where("id = 2"), null_vecs,
                     "id", "id", "vec", k=3)

    def test_embedding_near_dup_drops_null_vectors(self, null_vecs):
        from deequ_spark.llm import embedding_near_duplicates
        pairs = {(r["id_a"], r["id_b"])
                 for r in embedding_near_duplicates(
                     null_vecs, "id", "vec", 0.99, planes=2).collect()}
        assert (1, 4) in pairs
        assert not any(2 in p for p in pairs)

    def test_ivf_build_drops_null_vectors(self, null_vecs):
        from deequ_spark.llm import ivf_assign, kmeans_centroids
        cents = kmeans_centroids(null_vecs, "vec", n_centroids=2)
        assert len(cents) == 2
        assigned = ivf_assign(null_vecs, "vec", cents)
        assert {r["id"] for r in assigned.collect()} == {1, 3, 4}

    def test_ragged_dimension_vectors_dropped(self, spark):
        """A corrupt row with a different vector length must be dropped
        scan-side, not crash the Arrow matmul with a ragged batch."""
        from deequ_spark.llm import embedding_near_duplicates, knn_join
        vecs = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.5, 0.5, 0.5]), (3, [1.0, 0.001])],
            "id long, vec array<double>")
        out = knn_join(vecs.where("id = 1"), vecs, "id", "id", "vec",
                       k=10).collect()
        assert {r["cid"] for r in out} == {1, 3}
        pairs = {(r["id_a"], r["id_b"])
                 for r in embedding_near_duplicates(
                     vecs, "id", "vec", 0.99, planes=2).collect()}
        assert (1, 3) in pairs and not any(2 in p for p in pairs)


class TestGopherQuality:
    def test_each_rule_pass_and_fail(self, spark):
        from deequ_spark.llm import gopher_quality_flags
        good = ("the results of the experiment have been consistent with "
                "that theory and we be happy to report the findings along "
                "with a detailed analysis of the method and the data used")
        rows = [
            ("good", good),
            ("short", "the cat and dog have that be with of"),     # word_count
            ("longwords", " ".join(["the", "be", "of"] + ["antidisestablishmentarianism"] * 30)),
            ("symbols", "the be of with " + "# " * 30),            # symbol_ratio
            ("bullets", "\n".join(["- the be of with item"] * 30)),  # bullets + dup
            ("ellipsis", "\n".join(f"the be of with more {i}..." for i in range(30))),
            ("nonalpha", "the be " + " ".join(str(i) for i in range(40))),
            ("nostops", " ".join(f"w{i}" for i in range(60))),     # stopwords
            ("dup", "\n".join(["the be of with repeated line"] * 40)),
            ("null", None),
        ]
        df = spark.createDataFrame(rows, "id string, text string")
        got = {r["id"]: r for r in
               gopher_quality_flags(df, "text", min_words=20).collect()}
        assert got["good"]["gq_keep"]
        assert not got["short"]["gq_word_count"]
        assert not got["longwords"]["gq_mean_word_len"]
        assert not got["symbols"]["gq_symbol_ratio"]
        assert not got["bullets"]["gq_bullet_lines"]
        assert not got["ellipsis"]["gq_ellipsis_lines"]
        assert not got["nonalpha"]["gq_alpha_words"]
        assert not got["nostops"]["gq_stopwords"]
        assert not got["dup"]["gq_dup_lines"]
        assert not got["null"]["gq_keep"]          # NULL text never kept
        for rid in ("short", "longwords", "symbols", "bullets", "ellipsis",
                    "nonalpha", "nostops", "dup", "null"):
            assert not got[rid]["gq_keep"]

    def test_map_only_plan(self, spark):
        from deequ_spark.llm import gopher_quality_flags
        df = spark.createDataFrame([("x", "the be of")], "id string, text string")
        plan = (gopher_quality_flags(df, "text")
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan


class TestRepetition:
    def test_top_ngram_char_fraction(self, spark):
        from deequ_spark.llm import top_ngram_char_fraction
        df = spark.createDataFrame(
            [(1, "spam ham spam ham spam ham spam ham"),
             (2, "all words here are completely distinct tokens now"),
             (3, ""), (4, None), (5, "solo")],
            "id long, text string")
        got = {r["id"]: r["f"] for r in df.select(
            "id", top_ngram_char_fraction(F.col("text"), 2).alias("f"))
            .collect()}
        # "spam ham" occurs 4x, 8 chars each, text is 35 chars
        assert got[1] == pytest.approx(4 * 8 / 35)
        # all-distinct doc: top gram occurs once (lexicographic winner)
        assert got[2] == pytest.approx(len("all words") / 49)
        assert got[3] == 0.0
        assert got[4] is None
        assert got[5] == pytest.approx(4 / 4)   # < n words → joined tokens

    def test_top_ngram_null_text_is_null_for_unigrams(self, spark):
        """r4 advice: for n<=1 the NULL token array made size(sh) NULL and
        the when() fell through to 0.0; the explicit text.isNull() guard
        must return NULL for NULL text at every n."""
        from deequ_spark.llm import top_ngram_char_fraction
        df = spark.createDataFrame([(1, None), (2, "a a")],
                                   "id long, text string")
        for n in (1, 2, 3):
            got = {r["id"]: r["f"] for r in df.select(
                "id", top_ngram_char_fraction(F.col("text"), n).alias("f"))
                .collect()}
            assert got[1] is None, f"n={n}"
            assert got[2] is not None

    def test_word_ngrams_keeps_duplicates(self, spark):
        from deequ_spark.llm import word_ngrams, word_shingles
        df = spark.createDataFrame([("a b a b",)], "t string")
        raw = df.select(word_ngrams(F.col("t"), 2).alias("g")).collect()[0]["g"]
        assert raw == ["a b", "b a", "a b"]
        dedup = df.select(word_shingles(F.col("t"), 2).alias("g")).collect()[0]["g"]
        assert sorted(dedup) == ["a b", "b a"]


class TestChunking:
    def test_windows_cover_and_overlap(self, spark):
        from deequ_spark.llm import chunk_text
        df = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(10))),
             (2, "a b"), (3, ""), (4, None)],
            "id long, text string")
        rows = sorted(chunk_text(df, "id", "text", chunk_tokens=4,
                                 overlap=1).collect(),
                      key=lambda r: (r["id"], r["chunk_id"]))
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["id"], []).append(r)
        # doc 1: stride 3 → windows at 0,3,6 — full coverage, no
        # pure-overlap tail window
        assert [r["chunk"] for r in by_doc[1]] == [
            "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"]
        # short doc → one window with everything
        assert [r["chunk"] for r in by_doc[2]] == ["a b"]
        # empty / NULL docs produce no chunks
        assert 3 not in by_doc and 4 not in by_doc
        # consecutive windows share exactly `overlap` tokens
        w = [r["chunk"].split() for r in by_doc[1]]
        for a, b in zip(w, w[1:]):
            assert a[-1:] == b[:1]

    def test_tail_chunk_keeps_remainder(self, spark):
        from deequ_spark.llm import chunk_text
        df = spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(12)))],
            "id long, text string")
        rows = chunk_text(df, "id", "text", chunk_tokens=4,
                          overlap=1).collect()
        assert [r["n_chunk_tokens"] for r in
                sorted(rows, key=lambda r: r["chunk_id"])] == [4, 4, 4, 3]

    def test_bad_overlap_raises(self, spark):
        from deequ_spark.llm import chunk_text
        df = spark.createDataFrame([(1, "x")], "id long, text string")
        with pytest.raises(ValueError, match="overlap"):
            chunk_text(df, "id", "text", chunk_tokens=4, overlap=4)

    def test_empty_corpus_yields_empty_pairs(self, spark):
        """Empty (or all-NULL) corpus: embedding_near_duplicates returns a
        typed empty result instead of crashing the dims probe."""
        from deequ_spark.llm import embedding_near_duplicates
        empty = spark.createDataFrame([], "id string, vec array<double>")
        out = embedding_near_duplicates(empty, "id", "vec", 0.9)
        assert out.count() == 0
        assert dict(out.dtypes) == {"id_a": "string", "id_b": "string",
                                    "cosine": "double"}
        all_null = spark.createDataFrame([("a", None)],
                                         "id string, vec array<double>")
        assert embedding_near_duplicates(all_null, "id", "vec",
                                         0.9, auto_tune=True).count() == 0


class TestBoilerplate:
    def test_shared_lines_removed_order_preserved(self, spark):
        from deequ_spark.llm import remove_boilerplate_lines
        docs = spark.createDataFrame(
            [(i, f"COMMON HEADER\ncontent body {i}\nfooter text")
             for i in range(5)] + [(9, "unique doc\nno boilerplate here")],
            "id long, text string")
        out = {r["id"]: r for r in remove_boilerplate_lines(
            docs, "id", "text", min_docs=3).collect()}
        for i in range(5):
            assert out[i]["cleaned"] == f"content body {i}"
            assert out[i]["n_removed_lines"] == 2
        assert out[9]["cleaned"] == "unique doc\nno boilerplate here"
        assert out[9]["n_removed_lines"] == 0

    def test_short_lines_never_boilerplate(self, spark):
        from deequ_spark.llm import remove_boilerplate_lines
        docs = spark.createDataFrame(
            [(i, f"---\nbody {i}\n---") for i in range(5)],
            "id long, text string")
        out = remove_boilerplate_lines(docs, "id", "text", min_docs=2,
                                       min_line_chars=4).collect()
        assert all(r["n_removed_lines"] == 0 for r in out)
        assert all(r["cleaned"] == r["text"] for r in out)

    def test_fully_boilerplate_doc_becomes_empty(self, spark):
        from deequ_spark.llm import remove_boilerplate_lines
        docs = spark.createDataFrame(
            [(1, "same text"), (2, "same text"), (3, "same text")],
            "id long, text string")
        out = remove_boilerplate_lines(docs, "id", "text", min_docs=2).collect()
        assert all(r["cleaned"] == "" and r["n_removed_lines"] == 1
                   for r in out)

    def test_hof_and_join_rebuild_paths_identical(self, spark):
        """r12 wave 3: the default map-only filter rebuild (boiler set
        via scalar subquery) and the size-gated fallback join rebuild
        must agree row-for-row, schema included — on shared lines,
        duplicate in-doc occurrences, NULL and empty text."""
        from deequ_spark.llm import remove_boilerplate_lines
        docs = spark.createDataFrame(
            [(1, "HEADER NAV\nbody one\nfooter terms"),
             (2, "HEADER NAV\nbody two\nfooter terms"),
             (3, "HEADER NAV\nHEADER NAV\nmiddle"),
             (4, None), (5, ""), (6, "all unique\nab")],
            "id long, text string")
        hof = remove_boilerplate_lines(docs, "id", "text", min_docs=2)
        join = remove_boilerplate_lines(docs, "id", "text", min_docs=2,
                                        local_max_lines=0)
        assert hof.schema == join.schema
        assert sorted(tuple(r) for r in hof.collect()) == \
            sorted(tuple(r) for r in join.collect())
        # the fast path is a join-free plan; the fallback keeps the join
        assert "Join" not in hof._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Join" in join._jdf.queryExecution() \
            .executedPlan().toString()

    def test_hof_gate_falls_back_when_set_exceeds_cap(self, spark):
        """A boilerplate set larger than the cap must take the join
        path (per-row linear array scans stop being sane) and still
        produce identical values."""
        from deequ_spark.llm import remove_boilerplate_lines
        docs = spark.createDataFrame(
            [(i, "shared line alpha\nshared line beta\nbody %d" % i)
             for i in range(4)],
            "id long, text string")
        capped = remove_boilerplate_lines(docs, "id", "text", min_docs=2,
                                          local_max_lines=1)
        assert "Join" in capped._jdf.queryExecution() \
            .executedPlan().toString()
        rows = {r["id"]: r for r in capped.collect()}
        assert all(rows[i]["cleaned"] == "body %d" % i and
                   rows[i]["n_removed_lines"] == 2 for i in range(4))


class TestParagraphDedup:
    """C4/RefinedWeb-style keep-first duplicate-span removal
    (llm/text.py paragraph_dedup)."""

    def test_keep_first_occurrence(self, spark):
        from deequ_spark.llm import paragraph_dedup
        docs = spark.createDataFrame([
            (1, "alpha beta\n\nshared passage one\n\nunique tail"),
            (2, "shared passage one\n\ngamma delta\n\nshared passage two"),
            (3, "shared passage two\n\nshared passage one\n\nx"),
            (4, "only original content here"),
        ], "id long, text string")
        out = {r["id"]: r for r in paragraph_dedup(
            docs, "id", "text", min_chars=2).collect()}
        # doc 1 holds the min-(id,pos) occurrence of "shared passage one"
        assert out[1]["deduped"] == docs.collect()[0]["text"]
        assert out[2]["deduped"] == "gamma delta\n\nshared passage two"
        assert out[2]["n_removed"] == 1
        # doc 3 loses both shared passages ('x' is under min_chars)
        assert out[3]["deduped"] == "x"
        assert out[3]["n_removed"] == 2
        assert out[4]["deduped"] == out[4]["text"]
        assert out[4]["n_removed"] == 0

    def test_within_doc_repeats_also_dedup(self, spark):
        from deequ_spark.llm import paragraph_dedup
        docs = spark.createDataFrame(
            [(1, "repeat me\n\nmiddle\n\nrepeat me")],
            "id long, text string")
        r = paragraph_dedup(docs, "id", "text").collect()[0]
        assert r["deduped"] == "repeat me\n\nmiddle"
        assert r["n_removed"] == 1

    def test_short_paragraphs_never_candidates(self, spark):
        from deequ_spark.llm import paragraph_dedup
        docs = spark.createDataFrame(
            [(1, "ab\n\nbody one"), (2, "ab\n\nbody two")],
            "id long, text string")
        out = paragraph_dedup(docs, "id", "text", min_chars=3).collect()
        assert all(r["n_removed"] == 0 for r in out)
        assert all(r["deduped"] == r["text"] for r in out)

    def test_fully_duplicate_doc_becomes_empty(self, spark):
        from deequ_spark.llm import paragraph_dedup
        docs = spark.createDataFrame(
            [(1, "same text"), (2, "same text")], "id long, text string")
        out = {r["id"]: r for r in paragraph_dedup(
            docs, "id", "text").collect()}
        assert out[1]["deduped"] == "same text"
        assert out[2]["deduped"] == "" and out[2]["n_removed"] == 1

    def test_metacharacter_separator_is_literal(self, spark):
        """A separator full of regex metachars must split and rejoin
        symmetrically (the split quotes it with \\Q...\\E)."""
        from deequ_spark.llm import paragraph_dedup
        docs = spark.createDataFrame([
            (1, "first part.*+second part"),
            (2, "second part.*+third part"),
        ], "id long, text string")
        out = {r["id"]: r for r in paragraph_dedup(
            docs, "id", "text", sep=".*+").collect()}
        assert out[1]["deduped"] == "first part.*+second part"
        assert out[2]["deduped"] == "third part"
        assert out[2]["n_removed"] == 1

    def test_differs_from_boilerplate_semantics(self, spark):
        """Keep-first retains ONE copy even at high frequency — the
        boilerplate operator would delete every copy."""
        from deequ_spark.llm import paragraph_dedup
        docs = spark.createDataFrame(
            [(i, "everywhere passage") for i in range(10)],
            "id long, text string")
        out = paragraph_dedup(docs, "id", "text")
        assert out.where(F.col("deduped") != "").count() == 1
        assert out.where(F.col("deduped") == "everywhere passage")
        assert {r["id"] for r in out.where(
            F.col("deduped") != "").collect()} == {0}


class TestDuplicateSpanRemoval:
    """Exact substring dedup (llm/dedup.py duplicate_span_removal,
    Lee et al. arXiv:2107.06499 ExactSubstr semantics)."""

    CORPUS = [
        (1, "one two three four five six seven"),
        (2, "alpha two three four five beta gamma"),
        (3, "zz two three four five qq two three four five"),
        (4, "totally different words here only"),
        (5, "short"),
    ]

    def test_keep_first_cut_rest(self, spark):
        from deequ_spark.llm import duplicate_span_removal
        df = spark.createDataFrame(self.CORPUS, "id long, text string")
        out = {r["id"]: r for r in duplicate_span_removal(
            df, "id", "text", n=4).collect()}
        # doc 1 holds the min-(id,pos) occurrence -> untouched
        assert out[1]["deduped"] == self.CORPUS[0][1]
        assert out[2]["deduped"] == "alpha beta gamma"
        assert out[2]["n_removed_tokens"] == 4
        # BOTH of doc 3's occurrences are losers (winner lives in doc 1)
        assert out[3]["deduped"] == "zz qq"
        assert out[3]["n_removed_tokens"] == 8
        assert out[4]["deduped"] == self.CORPUS[3][1]
        # shorter than n -> no windows, untouched
        assert out[5]["deduped"] == "short"

    def test_overlapping_spans_merge(self, spark):
        from deequ_spark.llm import duplicate_span_removal
        # doc 2 repeats a 5-token run; its two duplicated 4-gram windows
        # overlap -> the cut is their union (5 tokens), not 8
        df = spark.createDataFrame([
            (1, "a b c d e x"),
            (2, "y a b c d e z"),
        ], "id long, text string")
        r = {x["id"]: x for x in duplicate_span_removal(
            df, "id", "text", n=4).collect()}
        assert r[2]["deduped"] == "y z"
        assert r[2]["n_removed_tokens"] == 5

    def test_hash_and_text_keys_agree(self, spark):
        from deequ_spark.llm import duplicate_span_removal
        df = spark.createDataFrame(self.CORPUS, "id long, text string")
        a = sorted((r["id"], r["deduped"]) for r in
                   duplicate_span_removal(df, "id", "text", n=4,
                                          key="hash").collect())
        b = sorted((r["id"], r["deduped"]) for r in
                   duplicate_span_removal(df, "id", "text", n=4,
                                          key="text").collect())
        assert a == b

    def test_default_n50_resolves_and_paths_agree(self, spark):
        """r8: the rolling-hash path must survive the DEFAULT n=50 (the
        49-deep lambda chain used to hit the analyzer's Max-iterations
        cliff) and agree with the text-keyed path on a corpus with a
        genuine 50-token duplicated span."""
        from deequ_spark.llm import duplicate_span_removal
        span = " ".join(f"w{i}" for i in range(55))
        rows = [(1, span + " unique tail one"),
                (2, "different head text " + span),
                (3, "no overlap at all " + " ".join(
                    f"z{i}" for i in range(60)))]
        df = spark.createDataFrame(rows, "id long, text string")
        a = {r["id"]: (r["deduped"], r["n_removed_tokens"]) for r in
             duplicate_span_removal(df, "id", "text", n=50,
                                    key="hash").collect()}
        b = {r["id"]: (r["deduped"], r["n_removed_tokens"]) for r in
             duplicate_span_removal(df, "id", "text", n=50,
                                    key="text").collect()}
        assert a == b
        assert a[1][1] == 0                      # first sighting kept
        assert a[2][1] == 55                     # all shifted windows cut
        assert a[3][1] == 0

    def test_doc_exactly_n_tokens(self, spark):
        from deequ_spark.llm import duplicate_span_removal
        df = spark.createDataFrame(
            [(1, "p q r s"), (2, "p q r s")], "id long, text string")
        out = {r["id"]: r for r in duplicate_span_removal(
            df, "id", "text", n=4).collect()}
        assert out[1]["deduped"] == "p q r s"
        assert out[2]["deduped"] == "" and out[2]["n_removed_tokens"] == 4

    def test_sequential_model_property(self, spark):
        """Randomized corpora vs a pure-Python first-sighting scan."""
        import random
        rng = random.Random(77)
        vocab = ["aa", "bb", "cc"]
        n = 2
        docs = [(i, " ".join(rng.choice(vocab) for _ in range(
            rng.randint(1, 12)))) for i in range(12)]
        seen, expected = set(), {}
        for i, text in docs:
            toks = text.split()
            starts = []
            for p in range(len(toks) - n + 1):
                g = " ".join(toks[p:p + n])
                if g in seen:
                    starts.append(p)
                else:
                    seen.add(g)
            kept = [t for j, t in enumerate(toks)
                    if not any(s <= j < s + n for s in starts)]
            expected[i] = " ".join(kept)
        # NOTE: the sequential scan marks a gram seen at its FIRST
        # sighting even when that occurrence is itself later covered by
        # another cut — matching the operator's min-(id,pos) winner rule
        from deequ_spark.llm import duplicate_span_removal
        df = spark.createDataFrame(docs, "id long, text string")
        got = {r["id"]: r["deduped"] for r in duplicate_span_removal(
            df, "id", "text", n=n).collect()}
        assert got == expected


class TestPipeline:
    def test_full_pipeline_stages(self, spark):
        from deequ_spark.llm import prepare_training_corpus
        bodies = [
            ("the results of the experiment have been consistent with "
             "that theory and we be happy to report the findings along "
             "with a detailed analysis of the method and the data"),
            ("we went to the market in the morning and the vendors were "
             "selling fruit and bread and the children played near the "
             "fountain while the band played music to be heard with joy"),
            ("the library of the university holds many books that have "
             "been collected over the years and students come to be "
             "reading them with great interest and care every single day"),
        ]
        rows = (
            # 0-2: genuinely distinct good docs with a shared header
            [(i, f"SHARED SITE HEADER LINE\n{bodies[i]}")
             for i in range(3)]
            # 3: exact duplicate of 0 (after boilerplate removal)
            + [(3, f"SHARED SITE HEADER LINE\n{bodies[0]}")]
            # 4: near-duplicate of 1 (one word changed)
            + [(4, "SHARED SITE HEADER LINE\n"
                   + bodies[1].replace("fountain", "statue"))]
            # 5: fails the quality gate (no stopwords)
            + [(5, " ".join(f"w{i}" for i in range(80)))])
        docs = spark.createDataFrame(rows, "id long, text string")
        out, stats = prepare_training_corpus(
            docs, "id", "text", min_words=20, boilerplate_min_docs=3,
            near_dup_threshold=0.7, chunk_tokens=16, chunk_overlap=2)
        assert stats["input"] == 6
        assert stats["quality"] == 5          # doc 5 dropped
        assert stats["boilerplate"] == 5      # header removed, docs kept
        assert stats["exact_dedup"] == 4      # doc 3 == doc 0
        assert stats["near_dedup"] == 3       # doc 4 folded into doc 1
        assert stats["chunks"] >= 6           # ~30 words / 14-token stride
        # chunks come only from surviving docs
        assert {r["id"] for r in out.select("id").distinct().collect()} \
            == {0, 1, 2}
        # boilerplate header is gone from every chunk
        assert not any("SHARED SITE HEADER" in r["chunk"]
                       for r in out.collect())
        out.unpersist()                    # pipeline returns it persisted

    def test_c4_stages(self, spark):
        """r8: C4 line cleaning runs before the quality gate; page
        flags fold into the quality stage."""
        from deequ_spark.llm import prepare_training_corpus
        good = ("the results of the experiment have been consistent "
                "with the theory and we report the findings here today.")
        rows = [
            (1, good + "\nPlease enable javascript to view this page."),
            (2, good.replace("today", "tomorrow") + "\nshort."),
            (3, "this page is lorem ipsum filler with the usual words "
                "to be seen and the text goes on and on for a while."),
        ]
        docs = spark.createDataFrame(rows, "id long, text string")
        out, stats = prepare_training_corpus(
            docs, "id", "text", min_words=10, boilerplate=False,
            near_dedup=False, chunk=False, c4_clean=True,
            c4_page_filter=True)
        assert stats["input"] == 3
        assert stats["c4_clean"] == 3          # lines removed, docs kept
        assert stats["quality"] == 2           # lorem-ipsum page dropped
        kept = {r["id"]: r["text"] for r in out.collect()}
        assert set(kept) == {1, 2}
        assert "javascript" not in kept[1]
        assert "short." not in kept[2]

    def test_stages_can_be_disabled(self, spark):
        from deequ_spark.llm import prepare_training_corpus
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "alpha beta gamma")],
            "id long, text string")
        out, stats = prepare_training_corpus(
            docs, "id", "text", quality_filter=False, boilerplate=False,
            near_dedup=False, chunk=False)
        assert stats == {"input": 2, "exact_dedup": 1}
        assert out.columns == ["id", "text"]


class TestResize:
    def test_resize_plumbing_with_fake_resizer(self, spark, docs):
        from deequ_spark.llm import (attach_binary_payload, fake_resize,
                                     resize_media)
        media = attach_binary_payload(docs, "text", "doc_id")
        out = resize_media(media, 8, 4, resizer=fake_resize).collect()
        assert len(out) == 5
        assert all(len(r["resized"]) == 32 for r in out)
        assert all(r["target_width"] == 8 and r["target_height"] == 4
                   for r in out)

    def test_default_resizer_is_documented_stub(self, spark, docs):
        from deequ_spark.llm import attach_binary_payload, resize_media
        import pytest as _pytest
        media = attach_binary_payload(docs, "text", "doc_id")
        with _pytest.raises(Exception, match="PIL|opencv|NotImplemented"):
            resize_media(media, 8, 4).collect()


class TestReviewFixes:
    """Round-4 self-review findings, pinned."""

    def test_near_dup_dims_majority_vote(self, spark):
        """A corrupt short row in the FIRST partition must not select the
        wrong corpus dimension (limit(1) probe regression)."""
        from deequ_spark.llm import embedding_near_duplicates
        rows = [("bad", [1.0])] + [(f"v{i}", [float(i), 1.0, 0.5])
                                   for i in range(20)]
        rows += [("dup", [19.0, 1.0, 0.5])]        # near-dup of v19
        vecs = spark.createDataFrame(rows, "id string, vec array<double>") \
            .coalesce(1)                            # corrupt row scans first
        pairs = {(r["id_a"], r["id_b"])
                 for r in embedding_near_duplicates(
                     vecs, "id", "vec", 0.999999, planes=2).collect()}
        assert ("dup", "v19") in pairs or ("v19", "dup") in pairs

    def test_resize_null_payload_propagates(self, spark):
        from deequ_spark.llm import (attach_binary_payload, fake_resize,
                                     resize_media)
        docs = spark.createDataFrame([(1, "text"), (2, None)],
                                     "doc_id long, text string")
        media = attach_binary_payload(docs, "text", "doc_id")
        out = {r["media_id"]: r["resized"]
               for r in resize_media(media, 4, 4,
                                     resizer=fake_resize).collect()}
        assert len(out[1]) == 16
        assert out[2] is None

    def test_embedding_quality_empty_input_is_empty_state(self, spark):
        from deequ_spark import EmbeddingQuality, do_analysis_run
        empty = spark.createDataFrame([], "id long, vec array<double>")
        a = EmbeddingQuality("vec", 2)
        ctx = do_analysis_run(empty, [a])
        m = next(iter(ctx.metric_map.values()))
        assert not m.is_success
        assert "Empty state" in str(m.error)
        assert a.compute_state_from(empty) is None

    def test_vector_rule_skips_non_numeric_arrays(self, spark):
        from deequ_spark import DEFAULT_RULES, ConstraintSuggestionRunner
        df = spark.createDataFrame(
            [(1, ["a", "b", "c"]), (2, ["d", "e", "f"])],
            "id long, tags array<string>")
        result = (ConstraintSuggestionRunner().on_data(df)
                  .add_constraint_rules(list(DEFAULT_RULES)).run())
        assert not any(s.rule_name == "EmbeddingQualityIfVectorRule"
                       for ss in result["suggestions"].values() for s in ss)


class TestWinnowing:
    def test_shared_substring_guarantee(self, spark):
        """Winnowing guarantee: a shared substring of length >= k+window-1
        always yields at least one shared fingerprint."""
        from deequ_spark.llm import winnowing_candidates
        shared = "identical plagiarized passage of text"   # 37 chars >> 11
        docs = spark.createDataFrame(
            [(1, f"aaa bbb ccc {shared} ddd eee"),
             (2, f"zzz yyy {shared} xxx www vvv"),
             (3, "totally different content 0123 without overlap qqqq")],
            "id long, text string")
        cand = {(r["id_a"], r["id_b"]): r["shared_fingerprints"]
                for r in winnowing_candidates(docs, "id", "text",
                                              k=8, window=4).collect()}
        assert (1, 2) in cand and cand[(1, 2)] >= 1
        assert not any(3 in p for p in cand)

    def test_fingerprints_deterministic_and_normalized(self, spark):
        """Whitespace/case normalization: same content, different spacing
        and case -> identical fingerprint sets."""
        from deequ_spark.llm import winnowing_fingerprints
        docs = spark.createDataFrame(
            [(1, "The Quick   Brown\nFox jumps"),
             (2, "the quick brown fox JUMPS")],
            "id long, text string")
        fps = winnowing_fingerprints(docs, "id", "text").collect()
        by_id = {}
        for r in fps:
            by_id.setdefault(r["id"], set()).add(r["fingerprint"])
        assert by_id[1] == by_id[2]

    def test_short_and_null_docs(self, spark):
        from deequ_spark.llm import winnowing_fingerprints
        docs = spark.createDataFrame(
            [(1, "tiny"), (2, None), (3, "")],
            "id long, text string")
        fps = winnowing_fingerprints(docs, "id", "text").collect()
        ids = {r["id"] for r in fps}
        assert 1 in ids            # short doc: one whole-text fingerprint
        assert 2 not in ids        # NULL text dropped
        assert len([r for r in fps if r["id"] == 1]) == 1


class TestDecontamination:
    """Benchmark decontamination: drop training docs sharing any word
    n-gram with an eval set (standard 13-gram rule; n shrunk here for
    fixture size)."""

    def test_contaminated_docs_dropped(self, spark):
        from deequ_spark.llm import decontaminate
        corpus = spark.createDataFrame([
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated text about pyspark aggregation plans"),
            (3, "Thing one. The QUICK   brown fox jumps over pastures."),
            (4, "another clean document with its own unique words here"),
        ], "doc_id long, text string")
        benchmark = spark.createDataFrame(
            [("benchmark says the quick brown fox jumps over things",)],
            "text string")
        clean, contaminated = decontaminate(
            corpus, "doc_id", "text", benchmark, "text", n=5)
        # docs 1 and 3 share the 5-gram "the quick brown fox jumps"
        # (normalization collapses case and repeated whitespace)
        assert sorted(r["doc_id"] for r in contaminated.collect()) == [1, 3]
        assert sorted(r["doc_id"] for r in clean.collect()) == [2, 4]

    def test_no_overlap_keeps_everything(self, spark):
        from deequ_spark.llm import decontaminate
        corpus = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta")],
            "doc_id long, text string")
        benchmark = spark.createDataFrame(
            [("one two three four five six",)], "text string")
        clean, contaminated = decontaminate(
            corpus, "doc_id", "text", benchmark, "text", n=3)
        assert contaminated.count() == 0 and clean.count() == 1

    def test_benchmark_side_broadcasts(self, spark):
        """The benchmark n-gram set must reach the corpus via a broadcast
        join — no corpus-side shuffle for candidate detection."""
        from deequ_spark.llm import decontaminate
        corpus = spark.createDataFrame(
            [(i, f"words {i} unique to document number {i} indeed")
             for i in range(50)], "doc_id long, text string")
        benchmark = spark.createDataFrame([("held out eval text",)],
                                          "text string")
        _, contaminated = decontaminate(corpus, "doc_id", "text",
                                        benchmark, "text", n=3)
        plan = contaminated._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


class TestHotBucketCap:
    """Duplicate mega-clusters must expand O(m) star pairs, not O(m²)
    all-pairs (VERDICT r6 #1: the unbounded in-bucket expansion was the
    one 100 TB scale-killer — a 10⁶-doc duplicate cluster would emit
    5·10¹¹ pairs inside a single task)."""

    def test_minhash_mega_cluster_candidates_linear(self, spark):
        m = 600  # > default hot_bucket_cap of 256
        rows = [(i, "the exact same boilerplate footer text appears here")
                for i in range(m)]
        rows += [(m, "a genuinely unique document about spark internals"),
                 (m + 1, "another distinct text concerning parquet files")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        cands = minhash_lsh_pairs(docs, "doc_id", "text", 0.8,
                                  verify_exact=False)
        n = cands.count()
        # star expansion: exactly m−1 pairs (0,j) for the cluster — the
        # same (min, other) star dedups across all 32 bands. Uncapped
        # this would be C(600,2) = 179,700.
        assert n == m - 1

    def test_minhash_star_pairs_lossless_for_components(self, spark):
        from deequ_spark.llm import deduplicate_near
        m = 300
        rows = [(i, "identical boilerplate page body for every mirror")
                for i in range(m)]
        rows += [(m, "one of a kind article on columnar execution")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = minhash_lsh_pairs(docs, "doc_id", "text", 0.8,
                                  hot_bucket_cap=64)
        kept = deduplicate_near(docs, "doc_id", pairs)
        # one representative (the min id) of the cluster + the unique doc
        assert sorted(r["doc_id"] for r in kept.collect()) == [0, m]

    def test_minhash_below_cap_unchanged(self, docs):
        """Below the cap the pair set is bit-identical to full expansion
        (a huge cap disables star expansion entirely)."""
        capped = {(r["id_a"], r["id_b"])
                  for r in minhash_lsh_pairs(docs, "doc_id", "text", 0.5,
                                             shingle_n=2).collect()}
        uncapped = {(r["id_a"], r["id_b"])
                    for r in minhash_lsh_pairs(docs, "doc_id", "text", 0.5,
                                               shingle_n=2,
                                               hot_bucket_cap=1 << 30)
                    .collect()}
        assert capped == uncapped

    def test_embedding_mega_cluster_candidates_linear(self, spark):
        m = 400
        rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(m)]
        rows += [(m, [0.0, 1.0, 0.0, 0.0]), (m + 1, [0.0, 0.0, 1.0, 0.0])]
        vecs = spark.createDataFrame(rows, "id long, vec array<float>")
        pairs = embedding_near_duplicates(vecs, "id", "vec", 0.95,
                                          hot_bucket_cap=64)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        # star pairs only: (0, j) for every cluster member
        assert got == {(0, j) for j in range(1, m)}

    def test_embedding_components_survive_star(self, spark):
        from deequ_spark.llm import near_duplicate_components
        m = 300
        rows = [(i, [0.6, 0.8, 0.0]) for i in range(m)]
        vecs = spark.createDataFrame(rows, "id long, vec array<float>")
        pairs = embedding_near_duplicates(vecs, "id", "vec", 0.95,
                                          hot_bucket_cap=32)
        comps = near_duplicate_components(pairs)
        assert {r["component"] for r in comps.collect()} == {0}
        assert comps.count() == m


class TestPngCodec:
    """Pure-stdlib PNG codec (VERDICT r6 #3): zlib inflate + the five
    scanline filters of PNG §9, no PIL. Round-trips pin the encoder;
    the hand-filtered fixtures pin each unfilter branch independently."""

    @staticmethod
    def _png_with_filters(pixels, filter_types, color_type):
        """Craft PNG bytes with an EXPLICIT filter type per scanline by
        applying the spec's forward filter (the inverse of decode)."""
        import struct
        import zlib

        import numpy as np
        arr = np.ascontiguousarray(pixels, dtype=np.uint8)
        h, w, c = arr.shape
        flat = arr.reshape(h, w * c).astype(np.int32)
        bpp = c
        raw = bytearray()
        prev = np.zeros(w * c, dtype=np.int32)
        for y in range(h):
            row = flat[y]
            ft = filter_types[y]
            out = row.copy()
            for i in range(w * c):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                if ft == 1:
                    out[i] = row[i] - a
                elif ft == 2:
                    out[i] = row[i] - b
                elif ft == 3:
                    out[i] = row[i] - ((a + b) >> 1)
                elif ft == 4:
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else cc)
                    out[i] = row[i] - pred
            raw += bytes([ft]) + bytes((out & 0xFF).astype(np.uint8))
            prev = row

        def chunk(tag, payload):
            return (struct.pack(">I", len(payload)) + tag + payload
                    + struct.pack(">I", zlib.crc32(tag + payload)))

        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))

    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    def test_roundtrip_exact_all_channel_counts(self, channels):
        import numpy as np
        from deequ_spark.llm.multimodal import decode_image, encode_png
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (5, 9, channels), dtype=np.uint8)
        h, w, c, px = decode_image(encode_png(img))
        assert (h, w, c) == (5, 9, channels)
        assert np.array_equal(px, img)

    @pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
    def test_each_filter_unapplied(self, ftype):
        """Every scanline filter (None/Sub/Up/Average/Paeth) inverts to
        the original pixels."""
        import numpy as np
        from deequ_spark.llm.multimodal import decode_png
        rng = np.random.default_rng(ftype)
        img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
        data = self._png_with_filters(img, [ftype] * 6, color_type=2)
        h, w, c, px = decode_png(data)
        assert (h, w, c) == (6, 5, 3)
        assert np.array_equal(px, img)

    def test_mixed_filters_rgba(self):
        import numpy as np
        from deequ_spark.llm.multimodal import decode_png
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (5, 4, 4), dtype=np.uint8)
        data = self._png_with_filters(img, [0, 1, 2, 3, 4], color_type=6)
        assert np.array_equal(decode_png(data)[3], img)

    def test_palette_expands_via_plte(self):
        """Color type 3: indexed pixels expand through PLTE to RGB."""
        import struct
        import zlib

        import numpy as np
        from deequ_spark.llm.multimodal import decode_png

        def chunk(tag, payload):
            return (struct.pack(">I", len(payload)) + tag + payload
                    + struct.pack(">I", zlib.crc32(tag + payload)))

        palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B
        idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
        raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
        data = (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
                + chunk(b"PLTE", palette)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
        h, w, c, px = decode_png(data)
        assert (h, w, c) == (2, 3, 3)
        assert list(px[0, 0]) == [255, 0, 0] and list(px[1, 0]) == [0, 0, 255]

    def test_interlaced_and_16bit_raise(self):
        import struct
        import zlib

        import numpy as np
        from deequ_spark.llm.multimodal import decode_png

        def chunk(tag, payload):
            return (struct.pack(">I", len(payload)) + tag + payload
                    + struct.pack(">I", zlib.crc32(tag + payload)))

        for depth, interlace in ((8, 1), (16, 0)):
            data = (b"\x89PNG\r\n\x1a\n"
                    + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, depth,
                                                 2, 0, 0, interlace))
                    + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
                    + chunk(b"IEND", b""))
            with pytest.raises(NotImplementedError):
                decode_png(data)

    def test_real_resize_preserves_png_format(self):
        import numpy as np
        from deequ_spark.llm.multimodal import (decode_image, encode_png,
                                                real_resize)
        rng = np.random.default_rng(13)
        img = rng.integers(0, 256, (4, 6, 4), dtype=np.uint8)
        out = real_resize(encode_png(img), 12, 8)
        assert out[:8] == b"\x89PNG\r\n\x1a\n"
        h, w, c, up = decode_image(out)
        assert (h, w, c) == (8, 12, 4)
        assert np.array_equal(up[0::2][:, 0::2], img)

    def test_simhash_mega_cluster_linear(self, spark):
        """Identical docs share identical fingerprints in EVERY pigeonhole
        block — the cap keeps the pair set star-shaped (m−1), and the
        xor verification still sees both fingerprints."""
        m = 400
        rows = [(i, "same footer boilerplate text replicated everywhere")
                for i in range(m)]
        rows += [(m, "completely different unique article body here")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = simhash_near_duplicates(docs, "doc_id", "text",
                                        max_hamming=3, hot_bucket_cap=64)
        got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
        assert set(got) == {(0, j) for j in range(1, m)}
        assert all(h == 0 for h in got.values())


class TestSequencePacking:
    """pack_sequences / pack_statistics (llm/packing.py): GPT-style
    concat-and-chunk with salt-group parallelism."""

    def _docs(self, spark):
        rows = [(i, 10 + (i * 7) % 23) for i in range(40)]
        return spark.createDataFrame(rows, "doc_id long, tokens long")

    def test_token_conservation_and_full_packs(self, spark):
        from deequ_spark.llm import pack_sequences, pack_statistics
        df = self._docs(spark)
        packed = pack_sequences(df, "doc_id", F.col("tokens"),
                                budget=64, n_groups=4)
        total = df.agg(F.sum("tokens")).collect()[0][0]
        stats = pack_statistics(packed, 64).collect()[0]
        assert stats["total_tokens"] == total
        # every pack except possibly the last of each of the 4 groups
        # holds exactly `budget` tokens
        assert stats["n_packs"] - stats["full_packs"] <= 4
        per_pack = (packed.groupBy("group", "pack_id")
                    .agg(F.sum("slice_tokens").alias("fill")).collect())
        assert all(r["fill"] <= 64 for r in per_pack)

    def test_doc_longer_than_budget_spans_packs(self, spark):
        from deequ_spark.llm import pack_sequences
        df = spark.createDataFrame([(0, 150), (4, 10)],
                                   "doc_id long, tokens long")
        packed = pack_sequences(df, "doc_id", F.col("tokens"),
                                budget=64, n_groups=4)
        rows = {(r["id"], r["pack_id"]): r for r in packed.collect()}
        # doc 0 (group 0): offsets [0,150) -> packs 0,1,2 with 64/64/22
        assert rows[(0, 0)]["slice_tokens"] == 64
        assert rows[(0, 1)]["slice_tokens"] == 64
        assert rows[(0, 2)]["slice_tokens"] == 22
        assert rows[(0, 0)]["n_slices"] == 3
        # doc 4 (group 0 too) starts at offset 150 in pack 2
        assert rows[(4, 2)]["slice_tokens"] == 10
        assert rows[(4, 2)]["start_off"] == 150

    def test_groups_pack_independently(self, spark):
        from deequ_spark.llm import pack_sequences
        df = self._docs(spark)
        packed = pack_sequences(df, "doc_id", F.col("tokens"),
                                budget=64, n_groups=4)
        assert (packed.where(F.pmod(F.col("id"), F.lit(4))
                             != F.col("group")).count() == 0)
        # offsets restart at 0 within each group
        firsts = (packed.groupBy("group")
                  .agg(F.min("start_off").alias("m")).collect())
        assert all(r["m"] == 0 for r in firsts)

    def test_window_is_partitioned_no_global_sort(self, spark):
        from deequ_spark.llm import pack_sequences
        df = self._docs(spark)
        plan = pack_sequences(df, "doc_id", F.col("tokens"),
                              budget=64, n_groups=4)._jdf \
            .queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan

    def test_rejects_bad_params(self, spark):
        import pytest as _pytest
        from deequ_spark.llm import pack_sequences
        df = self._docs(spark)
        with _pytest.raises(ValueError, match="budget"):
            pack_sequences(df, "doc_id", F.col("tokens"), budget=0)
        with _pytest.raises(ValueError, match="n_groups"):
            pack_sequences(df, "doc_id", F.col("tokens"), budget=8,
                           n_groups=0)


class TestImportanceSampling:
    """DSIR (llm/packing.py dsir_weights / importance_sample,
    Xie et al. arXiv:2302.03169): trigram importance weights + the
    engine-portable Gumbel top-k draw."""

    FLUENT = ("the results of the experiment were consistent with the "
              "theory and the method ")
    NOISE = "zxqj vwpk qqzz xjvw kjzx wqpv "

    def _corpora(self, spark):
        target = spark.createDataFrame(
            [(i, self.FLUENT * 3) for i in range(10)],
            "doc_id long, text string")
        corpus = spark.createDataFrame(
            [(i, self.FLUENT * 2 + f"extra words {i}") for i in range(20)]
            + [(100 + i, self.NOISE * 5 + f"tag {i}") for i in range(20)],
            "doc_id long, text string")
        return target, corpus

    def test_weights_separate_target_like_docs(self, spark):
        from deequ_spark.llm import char_trigram_model, dsir_weights
        target, corpus = self._corpora(spark)
        tm = char_trigram_model(target, "text")
        rm = char_trigram_model(corpus, "text")
        rows = dsir_weights(corpus, "doc_id", "text", tm, rm).collect()
        fluent = [r["dsir_weight"] for r in rows if r["doc_id"] < 100]
        noise = [r["dsir_weight"] for r in rows if r["doc_id"] >= 100]
        assert min(fluent) > max(noise)

    def test_sample_prefers_target_distribution(self, spark):
        from deequ_spark.llm import importance_sample
        target, corpus = self._corpora(spark)
        picked = {r["doc_id"] for r in importance_sample(
            corpus, "doc_id", "text", target, k=10,
            temperature=5.0).collect()}
        assert all(i < 100 for i in picked)

    def test_deterministic_across_runs(self, spark):
        from deequ_spark.llm import importance_sample
        target, corpus = self._corpora(spark)
        a = sorted(r["doc_id"] for r in importance_sample(
            corpus, "doc_id", "text", target, k=7).collect())
        b = sorted(r["doc_id"] for r in importance_sample(
            corpus, "doc_id", "text", target, k=7).collect())
        assert a == b and len(a) == 7

    def test_gumbel_keys_match_independent_recomputation(self, spark):
        """The draw must equal top-k by w/T + g where g is recomputed
        in pure Python from the same md5 integers — pinning both the
        Gumbel identity and the engine-portable noise derivation."""
        import hashlib
        import math

        from deequ_spark.llm import (char_trigram_model, dsir_weights,
                                     importance_sample)
        target, corpus = self._corpora(spark)
        tm = char_trigram_model(target, "text")
        rm = char_trigram_model(corpus, "text")
        w = dsir_weights(corpus, "doc_id", "text", tm, rm).collect()

        def gumbel(doc_id):
            v = int(hashlib.md5(str(doc_id).encode())
                    .hexdigest()[:13], 16)
            u = (v + 0.5) / 16 ** 13
            return -math.log(-math.log(u))

        temp = 2.0
        expected = sorted(
            w, key=lambda r: (-(r["dsir_weight"] / temp
                               + gumbel(r["doc_id"])), r["doc_id"]))[:5]
        picked = importance_sample(corpus, "doc_id", "text", target,
                                   k=5, temperature=temp).collect()
        assert [r["doc_id"] for r in picked] == \
            [r["doc_id"] for r in expected]
        for got, exp in zip(picked, expected):
            assert got["gumbel_key"] == pytest.approx(
                exp["dsir_weight"] / temp + gumbel(exp["doc_id"]),
                rel=1e-12)

    def test_validation(self, spark):
        from deequ_spark.llm import importance_sample
        target, corpus = self._corpora(spark)
        with pytest.raises(ValueError, match="k must"):
            importance_sample(corpus, "doc_id", "text", target, k=0)
        with pytest.raises(ValueError, match="temperature"):
            importance_sample(corpus, "doc_id", "text", target, k=1,
                              temperature=0.0)

    def test_unscorable_docs_never_drawn(self, spark):
        from deequ_spark.llm import importance_sample
        target, _ = self._corpora(spark)
        corpus = spark.createDataFrame(
            [(1, self.FLUENT), (2, "ab")],   # doc 2: no trigram
            "doc_id long, text string")
        picked = {r["doc_id"] for r in importance_sample(
            corpus, "doc_id", "text", target, k=5).collect()}
        assert picked == {1}


class TestDeterministicSampling:
    """hash_sample / stratified_sample (llm/packing.py)."""

    def _docs(self, spark):
        rows = [(i, "lang%d" % (i % 3)) for i in range(300)]
        return spark.createDataFrame(rows, "doc_id long, lang string")

    def test_hash_sample_deterministic_and_calibrated(self, spark):
        from deequ_spark.llm import hash_sample
        df = self._docs(spark)
        a = sorted(r["doc_id"] for r in
                   hash_sample(df, "doc_id", 0.25).collect())
        b = sorted(r["doc_id"] for r in
                   hash_sample(df, "doc_id", 0.25).collect())
        assert a == b                     # reproducible
        assert 40 <= len(a) <= 110        # ~75 expected, wide tolerance
        # monotone: a smaller fraction keeps a subset
        c = set(r["doc_id"] for r in
                hash_sample(df, "doc_id", 0.10).collect())
        assert c <= set(a)

    def test_hash_sample_edges(self, spark):
        import pytest as _pytest
        from deequ_spark.llm import hash_sample
        df = self._docs(spark)
        assert hash_sample(df, "doc_id", 0.0).count() == 0
        assert hash_sample(df, "doc_id", 1.0).count() == 300
        with _pytest.raises(ValueError, match="fraction"):
            hash_sample(df, "doc_id", 1.5)

    def test_stratified_exact_quota(self, spark):
        from deequ_spark.llm import stratified_sample
        df = self._docs(spark)
        out = stratified_sample(df, "lang", "doc_id", quota=20)
        counts = {r["lang"]: r["n"] for r in
                  out.groupBy("lang").agg(
                      F.count(F.lit(1)).alias("n")).collect()}
        assert counts == {"lang0": 20, "lang1": 20, "lang2": 20}
        # short stratum keeps everything
        small = df.where(F.col("doc_id") < 5)
        out2 = stratified_sample(small, "lang", "doc_id", quota=20)
        assert out2.count() == 5

    def test_stratified_is_md5_topk_and_deterministic(self, spark):
        from deequ_spark.llm import stratified_sample
        import hashlib
        df = self._docs(spark)
        out = {r["doc_id"] for r in
               stratified_sample(df, "lang", "doc_id", quota=7).collect()}
        expect = set()
        for lang_i in range(3):
            ids = [i for i in range(300) if i % 3 == lang_i]
            ids.sort(key=lambda i: (hashlib.md5(
                str(i).encode()).hexdigest()[:8], i))
            expect.update(ids[:7])
        assert out == expect

    def test_prefilter_keeps_quota_subset_semantics(self, spark):
        from deequ_spark.llm import stratified_sample
        df = self._docs(spark)
        full = {r["doc_id"] for r in
                stratified_sample(df, "lang", "doc_id", quota=5).collect()}
        pre = {r["doc_id"] for r in
               stratified_sample(df, "lang", "doc_id", quota=5,
                                 prefilter_fraction=0.5).collect()}
        # the md5 ordering is the same, so with a generous prefilter the
        # winners are identical (all top-5 hashes are < the 0.5 cut here)
        assert pre == full

    def test_apportion_exact_hamilton(self):
        from deequ_spark.llm import apportion_quotas
        q = apportion_quotas({"en": 100, "de": 100, "fr": 100, "zh": 100},
                             {"en": 5, "de": 2, "fr": 2, "zh": 1}, 7)
        assert q == {"en": 4, "de": 1, "fr": 1, "zh": 1}   # 3.5/1.4/1.4/0.7
        # remainder tie (.5/.5) breaks by name ascending
        assert apportion_quotas({"a": 9, "b": 9},
                                {"a": 1, "b": 1}, 3) == {"a": 2, "b": 1}
        # cap at availability, deliberately no redistribution
        assert apportion_quotas({"en": 2, "de": 100},
                                {"en": 0.5, "de": 0.5}, 10) == \
            {"en": 2, "de": 5}
        # weight/data intersection: unweighted and absent domains drop out
        assert apportion_quotas({"en": 10, "es": 10},
                                {"en": 1, "xx": 9}, 4) == {"en": 4}
        assert apportion_quotas({}, {"a": 1}, 5) == {}

    def test_mixture_sample_matches_apportionment(self, spark):
        from deequ_spark.llm import (apportion_quotas, mixture_sample,
                                     stratified_sample)
        df = self._docs(spark)                     # 100 docs per lang0..2
        weights = {"lang0": 3, "lang1": 1}         # lang2 unweighted
        got = mixture_sample(df, "lang", "doc_id", weights, total=40)
        by_lang = {r["lang"]: r["n"] for r in
                   got.groupBy("lang").agg(
                       F.count(F.lit(1)).alias("n")).collect()}
        assert by_lang == {"lang0": 30, "lang1": 10}
        # selection within a domain == the stratified md5 top-k
        strat = {r["doc_id"] for r in
                 stratified_sample(df.where(F.col("lang") == "lang1"),
                                   "lang", "doc_id", quota=10).collect()}
        mine = {r["doc_id"] for r in
                got.where(F.col("lang") == "lang1").collect()}
        assert mine == strat
        # quotas agree with the pure apportionment
        assert apportion_quotas({"lang0": 100, "lang1": 100},
                                weights, 40) == {"lang0": 30, "lang1": 10}

    def test_apportion_invariants_property(self):
        """Hypothesis: for ANY counts/weights/total — quotas sum to
        exactly ``total`` when no domain is availability-capped, never
        exceed ``total`` or any domain's count, and every weighted
        present domain gets within 1 of its ideal share (Hamilton's
        quota rule)."""
        from fractions import Fraction

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from deequ_spark.llm import apportion_quotas

        names = st.text(alphabet="abcdef", min_size=1, max_size=3)

        @settings(max_examples=100, deadline=None)
        @given(st.dictionaries(names, st.integers(0, 10_000),
                               min_size=1, max_size=8),
               st.dictionaries(names, st.integers(1, 100),
                               min_size=1, max_size=8),
               st.integers(0, 5_000))
        def check(counts, weights, total):
            q = apportion_quotas(counts, weights, total)
            domains = sorted(set(weights) & set(counts))
            assert set(q) == set(domains)
            if not domains:
                return
            assert sum(q.values()) <= total
            wsum = sum(weights[d] for d in domains)
            for d in domains:
                ideal = Fraction(weights[d] * total, wsum)
                assert q[d] <= counts[d]
                # quota rule: floor(ideal) <= apportioned <= ceil(ideal),
                # then capped at availability
                assert q[d] <= -(-ideal.numerator // ideal.denominator)
                assert q[d] >= min(int(ideal), counts[d])
            if all(q[d] < counts[d] or counts[d] >= total
                   for d in domains) and \
                    all(counts[d] >= total for d in domains):
                assert sum(q.values()) == total   # uncapped: exact

        check()

    def test_mixture_domain_cardinality_guard(self, spark):
        import pytest as _pytest
        from deequ_spark.llm import mixture_sample
        df = self._docs(spark)
        with _pytest.raises(ValueError, match="distinct"):
            mixture_sample(df, "lang", "doc_id", {"lang0": 1}, 10,
                           max_domains=2)


class TestJpegCodec:
    """Pure stdlib+numpy BASELINE JPEG codec (llm/jpeg.py, ITU-T T.81):
    sequential DCT + Huffman, JFIF color model. The decoder reads all
    tables from the stream (DQT/DHT/SOF0/SOS/DRI), so these round-trips
    exercise the real marker parsing, bit unstuffing, EXTEND/receive,
    dequant + IDCT, chroma upsampling and restart-marker resync paths —
    not a private inverse."""

    @staticmethod
    def _gradient(h, w):
        import numpy as np
        yy, xx = np.mgrid[0:h, 0:w]
        return np.stack([(xx * 4) % 256, (yy * 4) % 256,
                         ((xx + yy) * 2) % 256], axis=2).astype(np.uint8)

    def test_rgb_roundtrip_close(self):
        import numpy as np
        from deequ_spark.llm import decode_jpeg, encode_jpeg
        img = self._gradient(40, 56)
        data = encode_jpeg(img, quality=90)
        assert data[:2] == b"\xFF\xD8" and data[-2:] == b"\xFF\xD9"
        h, w, c, pix = decode_jpeg(data)
        assert (h, w, c) == (40, 56, 3)
        assert np.abs(pix.astype(int) - img.astype(int)).max() <= 6

    def test_odd_dimensions_and_subsampling(self):
        import numpy as np
        from deequ_spark.llm import decode_jpeg, encode_jpeg
        img = self._gradient(41, 53)       # not multiples of 8 or 16
        for kw in (dict(quality=90), dict(quality=90, subsample=True)):
            h, w, c, pix = decode_jpeg(encode_jpeg(img, **kw))
            assert (h, w, c) == (41, 53, 3)
            assert np.abs(pix.astype(int) - img.astype(int)).max() <= 10

    def test_grayscale_single_component(self):
        import numpy as np
        from deequ_spark.llm import decode_jpeg, encode_jpeg
        yy, xx = np.mgrid[0:24, 0:31]
        g = ((xx * 3 + yy * 5) % 256).astype(np.uint8)
        h, w, c, pix = decode_jpeg(encode_jpeg(g, quality=95))
        assert (h, w, c) == (24, 31, 1)
        assert np.abs(pix[:, :, 0].astype(int) - g.astype(int)).max() <= 8

    def test_restart_markers_dri_rst(self):
        import numpy as np
        from deequ_spark.llm import decode_jpeg, encode_jpeg
        img = self._gradient(41, 53)
        plain = encode_jpeg(img, quality=90)
        rst = encode_jpeg(img, quality=90, restart_interval=3)
        assert b"\xFF\xDD" in rst and b"\xFF\xDD" not in plain
        assert any(bytes([0xFF, 0xD0 + i]) in rst for i in range(8))
        a = decode_jpeg(plain)[3]
        b = decode_jpeg(rst)[3]
        # restart markers change the byte stream but NOT the pixels
        assert np.array_equal(a, b)
        sub = encode_jpeg(img, quality=85, subsample=True,
                          restart_interval=2)
        h, w, c, pix = decode_jpeg(sub)
        assert (h, w, c) == (41, 53, 3)
        assert np.abs(pix.astype(int) - img.astype(int)).max() <= 16

    def test_quality_monotone_size(self):
        from deequ_spark.llm import encode_jpeg
        img = self._gradient(48, 48)
        sizes = [len(encode_jpeg(img, quality=q)) for q in (10, 50, 95)]
        assert sizes[0] < sizes[1] < sizes[2]

    def test_decode_image_dispatch_and_resize(self):
        import numpy as np
        from deequ_spark.llm import encode_jpeg
        from deequ_spark.llm.multimodal import decode_image, real_resize
        img = self._gradient(32, 32)
        data = encode_jpeg(img, quality=90)
        h, w, c, pix = decode_image(data)    # magic-byte dispatch
        assert (h, w, c) == (32, 32, 3)
        out = real_resize(data, 16, 12)
        assert out[:2] == b"\xFF\xD8"        # format-preserving
        h2, w2, c2, pix2 = decode_image(out)
        assert (h2, w2, c2) == (12, 16, 3)

    def test_malformed_progressive_and_corrupt_rejected(self):
        import pytest as _pytest
        from deequ_spark.llm import decode_jpeg, encode_jpeg
        data = encode_jpeg(self._gradient(16, 16))
        # a byte-patched SOF0->SOF2 stream is a MALFORMED progressive
        # file: its single scan claims the full 0..63 band, which a
        # progressive scan may not (r8: real SOF2 streams now decode)
        with _pytest.raises(NotImplementedError, match="DC and AC"):
            decode_jpeg(data.replace(b"\xFF\xC0", b"\xFF\xC2", 1))
        with _pytest.raises(NotImplementedError, match="SOI"):
            decode_jpeg(b"\x00\x01\x02")

    def test_progressive_decodes_exactly_like_baseline(self):
        """r8 SOF2 support: the progressive encoder reuses the baseline
        quantizer, so after DC first/refine + AC first/refine scans the
        decoded pixels must be IDENTICAL to the baseline encoding's —
        any successive-approximation bit misalignment breaks equality."""
        import numpy as np
        from deequ_spark.llm import decode_jpeg, encode_jpeg
        from deequ_spark.llm.jpeg import encode_progressive_jpeg
        rng = np.random.default_rng(42)
        for shape in ((16, 16), (17, 23), (40, 64, 3), (33, 47, 3)):
            img = rng.integers(0, 256, shape).astype(np.uint8)
            for q in (50, 80, 95):
                base = decode_jpeg(encode_jpeg(img, quality=q))
                prog = decode_jpeg(encode_progressive_jpeg(img, quality=q))
                assert base[:3] == prog[:3]
                assert np.array_equal(base[3], prog[3]), (shape, q)

    def test_progressive_420_subsampled_exact(self):
        """4:2:0 progressive: interleaved DC scans walk the 2x2-Y MCU
        grid while AC scans walk each component's own ceil'd raster —
        decode must equal the 4:2:0 baseline encoding's decode exactly
        (odd dims included, where the two geometries differ)."""
        import numpy as np
        from deequ_spark.llm import decode_jpeg, encode_jpeg
        from deequ_spark.llm.jpeg import encode_progressive_jpeg
        rng = np.random.default_rng(11)
        for shape in ((16, 16, 3), (17, 23, 3), (24, 40, 3)):
            img = rng.integers(0, 256, shape).astype(np.uint8)
            base = decode_jpeg(encode_jpeg(img, quality=80,
                                           subsample=True))
            prog = decode_jpeg(encode_progressive_jpeg(img, quality=80,
                                                       subsample=True))
            assert base[:3] == prog[:3]
            assert np.array_equal(base[3], prog[3]), shape

    def test_progressive_restart_markers_exact(self):
        """DRI + RSTn in EVERY progressive scan (DC interleaved, AC
        rasters, refinements): the decoder must byte-align, reset
        predictors/EOB-runs per interval, and still reproduce the
        baseline pixels exactly."""
        import numpy as np
        from deequ_spark.llm import decode_jpeg, encode_jpeg
        from deequ_spark.llm.jpeg import encode_progressive_jpeg
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (33, 47, 3)).astype(np.uint8)
        for ri in (1, 3):
            for sub in (False, True):
                base = decode_jpeg(encode_jpeg(img, quality=80,
                                               subsample=sub))
                data = encode_progressive_jpeg(img, quality=80,
                                               subsample=sub,
                                               restart_interval=ri)
                assert b"\xFF\xDD" in data          # DRI present
                prog = decode_jpeg(data)
                assert np.array_equal(base[3], prog[3]), (ri, sub)

    def test_progressive_eob_runs_and_multilevel_exact(self):
        """Review r8: per-block EOB0 never exercised the decoder's
        EOBn>0 multi-block runs or >1 approximation levels — the
        branches every libjpeg stream uses. eob_runs=True emits real
        EOBn runs (asserted below) with a flat 9-bit AC table carrying
        the EOBn codes; first_al=2/3 stacks refinement scans. Decode
        must still equal baseline exactly."""
        import numpy as np
        from deequ_spark.llm import decode_jpeg, encode_jpeg
        from deequ_spark.llm.jpeg import (_AcFirstScanEncoder,
                                          _BitWriter,
                                          encode_progressive_jpeg)
        rng = np.random.default_rng(13)
        img = rng.integers(0, 256, (64, 40, 3)).astype(np.uint8)
        img[:, :20] = 128            # flat half -> long EOB runs
        for q in (30, 80):
            for fal in (1, 2, 3):
                for er in (False, True):
                    base = decode_jpeg(encode_jpeg(img, quality=q))
                    prog = decode_jpeg(encode_progressive_jpeg(
                        img, quality=q, first_al=fal, eob_runs=er))
                    assert np.array_equal(base[3], prog[3]), (q, fal, er)
        # the run encoder really accumulates multi-block runs: three
        # all-zero bands flush as ONE EOBn covering 3 blocks (r=1,
        # extra=1 -> 9-bit symbol + 1 bit, not three EOB0s)
        from deequ_spark.llm.jpeg import _AC_LUMA_PROG, _build_codes
        ac = _build_codes(*_AC_LUMA_PROG)
        wtr = _BitWriter()
        enc = _AcFirstScanEncoder(wtr, 1, 63, 0, ac, eob_runs=True)
        zero = np.zeros(64, np.int32)
        for _ in range(3):
            enc.block(zero)
        enc.flush()
        bits_used = len(wtr.buf) * 8 + wtr.nbits
        assert bits_used == 10       # one EOB2 symbol (9) + 1 extra bit

    def test_progressive_stream_structure(self):
        """SOF2 marker, 1 interleaved DC + per-component AC scans, then
        refinement scans: 1 + 3 + 1 + 3 = 8 SOS for RGB."""
        import numpy as np
        from deequ_spark.llm.jpeg import encode_progressive_jpeg
        img = np.zeros((16, 16, 3), np.uint8)
        data = encode_progressive_jpeg(img)
        assert b"\xFF\xC2" in data and b"\xFF\xC0" not in data
        assert data.count(b"\xFF\xDA") == 8

    def test_progressive_decode_via_decode_image(self):
        """decode_image magic-byte dispatch reaches the progressive
        path too (same FF D8 magic)."""
        import numpy as np
        from deequ_spark.llm import decode_image
        from deequ_spark.llm.jpeg import encode_progressive_jpeg
        img = self._gradient(24, 16)
        h, w, c, pix = decode_image(encode_progressive_jpeg(img, 90))
        assert (h, w, c) == (24, 16, 3)
        assert float(np.abs(pix.astype(int)
                            - img.astype(int)).mean()) < 12.0

    def test_spec_structure(self):
        """Marker layout is spec-complete: JFIF APP0, 2 DQT, SOF0 with
        sampling factors, 4 DHT, SOS; entropy data is byte-stuffed."""
        from deequ_spark.llm import encode_jpeg
        data = encode_jpeg(self._gradient(16, 16), quality=75)
        assert data[2:4] == b"\xFF\xE0" and data[6:11] == b"JFIF\x00"
        assert data.count(b"\xFF\xDB") >= 2
        assert b"\xFF\xC0" in data and data.count(b"\xFF\xC4") == 4
        sos = data.index(b"\xFF\xDA")
        tail = data[sos + 14:-2]
        # every 0xFF inside entropy data must be stuffed with 0x00
        i = tail.find(b"\xFF")
        while i != -1 and i + 1 < len(tail):
            assert tail[i + 1] == 0x00
            i = tail.find(b"\xFF", i + 2)

    def test_quality_100_adversarial_block(self):
        """quant=1 + a basis-pattern block drives |coef| to the category
        boundary — the clamp keeps every symbol inside the baseline
        Huffman tables (no KeyError), cost is invisible (<=1 LSB)."""
        import numpy as np
        from deequ_spark.llm import decode_jpeg, encode_jpeg
        checker = np.indices((16, 16)).sum(axis=0) % 2 * 255
        img = checker.astype(np.uint8)
        h, w, c, pix = decode_jpeg(encode_jpeg(img, quality=100))
        assert (h, w, c) == (16, 16, 1)
        assert np.abs(pix[:, :, 0].astype(int) - img.astype(int)).max() <= 4
        rgb = np.stack([checker, 255 - checker, checker],
                       axis=2).astype(np.uint8)
        h, w, c, pix = decode_jpeg(encode_jpeg(rgb, quality=100))
        assert (h, w, c) == (16, 16, 3)

    def test_cmyk_component_count_rejected(self):
        import struct as _struct
        import pytest as _pytest
        from deequ_spark.llm import decode_jpeg, encode_jpeg
        data = bytearray(encode_jpeg(self._gradient(16, 16)))
        sof = bytes(data).index(b"\xFF\xC0")
        # patch component count 3 -> 4 (length stays consistent enough
        # for the guard, which fires before component parsing)
        data[sof + 9] = 4
        with _pytest.raises(NotImplementedError, match="component"):
            decode_jpeg(bytes(data))


class TestAudioFeatures:
    """audio_features (llm/multimodal.py): decode + RMS / zero-crossing /
    rFFT dominant-frequency screens over PCM WAV payloads."""

    def _media(self, spark, rows):
        return spark.createDataFrame(rows, "media_id long, payload binary")

    def test_tone_features_exact(self, spark):
        import numpy as np
        from deequ_spark.llm import audio_features
        from deequ_spark.llm.multimodal import encode_wav_pcm16
        n = np.arange(256)
        rows = []
        for mid, k in [(0, 3), (1, 17), (2, 40)]:
            s = np.round(12000 * np.cos(2 * np.pi * k * n / 256
                                        + 0.01)).astype(np.int16)
            rows.append((mid, bytearray(encode_wav_pcm16(s, 8000))))
        got = {r["media_id"]: r for r in
               audio_features(self._media(spark, rows)).collect()}
        for mid, k in [(0, 3), (1, 17), (2, 40)]:
            r = got[mid]
            assert r["dominant_bin"] == k
            assert r["zero_crossings"] == 2 * k
            assert r["n_frames"] == 256 and r["sample_rate"] == 8000
            assert abs(r["duration_ms"] - 32.0) < 1e-9
            assert abs(r["dominant_freq_hz"] - k * 8000 / 256) < 1e-9
            assert abs(r["rms"] - 12000 / np.sqrt(2)) < 60

    def test_silence_and_stereo_mono_averaging(self, spark):
        import io
        import wave

        import numpy as np
        from deequ_spark.llm import audio_features
        from deequ_spark.llm.multimodal import encode_wav_pcm16
        silent = encode_wav_pcm16(np.zeros(100, dtype=np.int16), 16000)
        # stereo WAV whose channels cancel -> mono average is silence
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(8000)
            left = np.tile(np.array([5000, -5000], dtype=np.int16), 50)
            inter = np.empty(200, dtype=np.int16)
            inter[0::2] = left
            inter[1::2] = -left
            w.writeframes(inter.astype("<i2").tobytes())
        rows = [(0, bytearray(silent)), (1, bytearray(buf.getvalue()))]
        got = {r["media_id"]: r for r in
               audio_features(self._media(spark, rows)).collect()}
        assert got[0]["rms"] == 0.0 and got[0]["zero_crossings"] == 0
        assert got[0]["dominant_bin"] == 0
        assert got[1]["rms"] == 0.0      # channels cancel after averaging
        assert got[1]["n_frames"] == 100


class TestVideoFrameSampling:
    """sample_video_frames (llm/multimodal.py): midpoint-uniform
    timestamps from the real header probe; pixel decode stays behind
    the documented codec hook."""

    def _media(self, spark):
        import numpy as np

        from deequ_spark.llm import encode_mp4_skeleton
        from deequ_spark.llm.multimodal import encode_wav_pcm16
        rows = [
            (1, encode_mp4_skeleton(2000, 640, 360)),
            (2, encode_mp4_skeleton(500, 1920, 1080, n_tracks=2)),
            (3, encode_wav_pcm16(np.zeros((100, 1), dtype=np.int16),
                                 8000)),
        ]
        return spark.createDataFrame(rows, "media_id long, payload binary")

    def test_uniform_midpoint_timestamps(self, spark):
        from deequ_spark.llm import sample_video_frames
        rows = sample_video_frames(self._media(spark), n_frames=4) \
            .orderBy("media_id", "frame_index").collect()
        by_id = {}
        for r in rows:
            by_id.setdefault(r["media_id"], []).append(r)
        assert [r["ts_ms"] for r in by_id[1]] == [250.0, 750.0,
                                                  1250.0, 1750.0]
        assert [r["ts_ms"] for r in by_id[2]] == [62.5, 187.5,
                                                  312.5, 437.5]
        assert all(r["width"] == 640 and r["height"] == 360
                   for r in by_id[1])
        assert by_id[2][0]["n_tracks"] == 2

    def test_non_video_filtered(self, spark):
        from deequ_spark.llm import sample_video_frames
        out = sample_video_frames(self._media(spark), n_frames=4)
        assert out.where(F.col("media_id") == 3).count() == 0
        assert out.count() == 8

    def test_decoder_hook(self, spark):
        from deequ_spark.llm import sample_video_frames
        out = sample_video_frames(
            self._media(spark), n_frames=2,
            frame_decoder=lambda data, ts: bytes([int(ts) % 256, 7]))
        rows = out.orderBy("media_id", "frame_index").collect()
        assert all(r["decoded"] for r in rows)
        assert bytes(rows[0]["pixels"]) == bytes([500 % 256, 7])

    def test_no_hook_means_null_pixels(self, spark):
        from deequ_spark.llm import sample_video_frames
        rows = sample_video_frames(self._media(spark),
                                   n_frames=2).collect()
        assert all(r["pixels"] is None and not r["decoded"] for r in rows)


class TestMediaProbe:
    """probe_media / probe_media_features / encode_mp4_skeleton
    (llm/multimodal.py): header-only format sniffing + metadata."""

    def test_probe_all_formats(self):
        import numpy as np
        from deequ_spark.llm import (encode_jpeg, encode_mp4_skeleton,
                                     probe_media)
        from deequ_spark.llm.multimodal import (encode_bmp, encode_png,
                                                encode_wav_pcm16)
        img = np.zeros((7, 9, 3), np.uint8)
        p = probe_media(encode_bmp(img))
        assert (p["format"], p["width"], p["height"]) == ("bmp", 9, 7)
        p = probe_media(encode_png(np.zeros((5, 6, 4), np.uint8)))
        assert (p["format"], p["n_channels"]) == ("png", 4)
        p = probe_media(encode_jpeg(img))
        assert (p["format"], p["width"], p["height"]) == ("jpeg", 9, 7)
        p = probe_media(encode_wav_pcm16(np.zeros(800, np.int16), 16000))
        assert (p["format"], p["sample_rate"],
                p["duration_ms"]) == ("wav", 16000, 50)
        p = probe_media(encode_mp4_skeleton(2500, 640, 360, n_tracks=2))
        assert (p["format"], p["kind"], p["width"], p["height"],
                p["duration_ms"], p["n_tracks"]) == \
            ("mp4", "video", 640, 360, 2500, 2)

    def test_progressive_jpeg_dims_sniffable(self):
        """Dimension sniffing succeeds where full decode refuses."""
        import numpy as np
        import pytest as _pytest
        from deequ_spark.llm import decode_jpeg, encode_jpeg, probe_media
        prog = encode_jpeg(np.zeros((12, 20, 3), np.uint8)) \
            .replace(b"\xFF\xC0", b"\xFF\xC2", 1)
        with _pytest.raises(NotImplementedError):
            decode_jpeg(prog)
        p = probe_media(prog)
        assert (p["format"], p["width"], p["height"]) == ("jpeg", 20, 12)

    def test_probe_never_raises(self):
        from deequ_spark.llm import probe_media
        for blob in (b"", b"garbage", b"BM\x01", b"\xFF\xD8\xFF",
                     b"\x00\x00\x00\x08ftyp", b"RIFF1234WAVExxxx",
                     b"II*\x00", b"MM\x00*\xFF", b"RIFF\x00\x00\x00\x00WEBP"):
            p = probe_media(blob)
            assert p["n_bytes"] == len(blob)   # always returns a dict

    def test_probe_tiff_both_endians(self):
        from deequ_spark.llm import probe_media
        from deequ_spark.llm.multimodal import encode_tiff_skeleton
        p = probe_media(encode_tiff_skeleton(640, 480, 3))
        assert (p["format"], p["kind"], p["width"], p["height"],
                p["n_channels"]) == ("tiff", "image", 640, 480, 3)
        p = probe_media(encode_tiff_skeleton(99, 77, 1, big_endian=True))
        assert (p["format"], p["width"], p["height"],
                p["n_channels"]) == ("tiff", 99, 77, 1)

    def test_probe_webp_vp8_vp8l_vp8x(self):
        import struct as _struct
        from deequ_spark.llm import probe_media
        from deequ_spark.llm.multimodal import encode_webp_skeleton
        p = probe_media(encode_webp_skeleton(320, 240))
        assert (p["format"], p["width"], p["height"],
                p["n_channels"]) == ("webp", 320, 240, 3)
        p = probe_media(encode_webp_skeleton(16, 10, lossless=True))
        assert (p["format"], p["width"], p["height"],
                p["n_channels"]) == ("webp", 16, 10, 4)
        # extended VP8X: 24-bit minus-one canvas dims
        vp8x = (b"\x00\x00\x00\x00" + (999).to_bytes(3, "little")
                + (499).to_bytes(3, "little"))
        blob = (b"RIFF" + _struct.pack("<I", 4 + 8 + len(vp8x)) + b"WEBP"
                + b"VP8X" + _struct.pack("<I", len(vp8x)) + vp8x)
        p = probe_media(blob)
        assert (p["width"], p["height"]) == (1000, 500)

    def test_probe_features_distributed(self, spark):
        import numpy as np
        from deequ_spark.llm import probe_media_features
        from deequ_spark.llm.multimodal import encode_bmp
        rows = [(0, bytearray(encode_bmp(np.zeros((2, 3, 3), np.uint8)))),
                (1, bytearray(b"not media")), (2, None)]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        got = {r["media_id"]: r for r in
               probe_media_features(df).collect()}
        assert got[0]["format"] == "bmp" and got[0]["width"] == 3
        assert got[1]["format"] == "unknown"
        assert got[2]["format"] == "unknown" and got[2]["n_bytes"] == 0


class TestGifCodec:
    """Pure-stdlib GIF codec (llm/gif.py): spec-faithful LZW with
    giflib width-transition semantics, interlace, local color tables,
    frame offsets, extension skipping."""

    def test_lzw_bit_packing_pinned(self):
        """1x1 fixture pins the exact packed bytes: codes clear=4,
        pixel=0, end=5 at 3 bits LSB-first -> 0x44 0x01 (spec App. F).
        Guards against silent bit-order drift."""
        from deequ_spark.llm.gif import _lzw_encode
        assert _lzw_encode(b"\x00", 2) == b"\x44\x01"

    def test_round_trip_pixel_exact(self):
        import numpy as np
        from deequ_spark.llm import decode_gif, encode_gif
        img = np.stack([np.tile(np.arange(40, dtype=np.uint8) * 6 % 251,
                                (23, 1))] * 3, axis=2)
        h, w, c, px = decode_gif(encode_gif(img))
        assert (h, w, c) == (23, 40, 3) and np.array_equal(px, img)

    def test_code_width_growth_to_12_bits(self):
        """80x90 random 256-color image forces the code table through
        every width transition (and usually a CLEAR reset)."""
        import numpy as np
        from deequ_spark.llm import decode_gif, encode_gif
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (80, 90, 1), dtype=np.uint8) \
            .repeat(3, axis=2)
        _, _, _, px = decode_gif(encode_gif(img))
        assert np.array_equal(px, img)

    def test_interlaced_round_trip(self):
        import numpy as np
        from deequ_spark.llm import decode_gif, encode_gif
        rng = np.random.default_rng(11)
        img = rng.integers(0, 4, (13, 9, 1), dtype=np.uint8) \
            .repeat(3, axis=2) * 80
        _, _, _, px = decode_gif(encode_gif(img, interlace=True))
        assert np.array_equal(px, img)

    def test_palette_bound_enforced(self):
        import numpy as np
        import pytest as _pytest
        from deequ_spark.llm import encode_gif
        img = np.zeros((1, 257, 3), np.uint8)
        img[0, :, 0] = np.arange(257) % 256
        img[0, :, 1] = np.arange(257) // 256
        with _pytest.raises(ValueError, match="256"):
            encode_gif(img)

    def test_hand_built_lct_offset_extension(self):
        """Decoder paths the encoder never emits: GCE extension block,
        frame at a (left, top) offset, LOCAL color table overriding the
        global one, background fill outside the frame."""
        import struct as _struct
        from deequ_spark.llm import decode_gif
        from deequ_spark.llm.gif import _lzw_encode
        lzw = _lzw_encode(bytes([0, 1, 1, 0]), 2)
        hand = bytearray(b"GIF89a")
        hand += _struct.pack("<HHBBB", 4, 3, 0x80, 1, 0)
        hand += bytes([10, 10, 10, 200, 200, 200])       # GCT, bg=1
        hand += b"\x21\xF9\x04\x00\x00\x00\x00\x00"      # GCE, skipped
        hand += _struct.pack("<BHHHHB", 0x2C, 1, 1, 2, 2, 0x80)
        hand += bytes([255, 0, 0, 0, 0, 255])            # LCT red/blue
        hand.append(2)
        hand += bytes([len(lzw)]) + lzw + b"\x00\x3B"
        h, w, c, px = decode_gif(bytes(hand))
        assert (h, w) == (3, 4)
        assert tuple(px[0, 0]) == (200, 200, 200)        # background
        assert tuple(px[1, 1]) == (255, 0, 0)
        assert tuple(px[2, 2]) == (255, 0, 0)
        assert tuple(px[1, 2]) == (0, 0, 255)

    def test_dispatch_probe_resize(self):
        import numpy as np
        from deequ_spark.llm import encode_gif, probe_media
        from deequ_spark.llm.multimodal import decode_image, real_resize
        img = np.tile(np.arange(12, dtype=np.uint8).reshape(1, 12, 1) * 20,
                      (6, 1, 3))
        blob = encode_gif(img)
        h, w, _, px = decode_image(blob)
        assert (h, w) == (6, 12) and np.array_equal(px, img)
        p = probe_media(blob)
        assert (p["format"], p["kind"], p["width"], p["height"]) == \
            ("gif", "image", 12, 6)
        assert p["n_tracks"] == 1                        # frame count
        rz = real_resize(blob, 6, 3)
        assert rz[:6] == b"GIF89a"                       # format-preserving
        h, w, _, _ = decode_image(rz)
        assert (h, w) == (3, 6)

    def test_animated_frame_count_probed(self):
        """probe_media counts GIF frames with a block walk (no LZW
        decode) — an animated GIF routes differently from a still."""
        import struct as _struct
        from deequ_spark.llm import probe_media
        from deequ_spark.llm.gif import _lzw_encode
        lzw = _lzw_encode(bytes([0, 1, 1, 0]), 2)
        frame = (_struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0)
                 + bytes([2, len(lzw)]) + lzw + b"\x00")
        gce = b"\x21\xF9\x04\x00\x02\x00\x00\x00"
        hand = (b"GIF89a" + _struct.pack("<HHBBB", 2, 2, 0x80, 0, 0)
                + bytes([0, 0, 0, 255, 255, 255])
                + gce + frame + gce + frame + b"\x3B")
        p = probe_media(bytes(hand))
        assert (p["format"], p["n_tracks"]) == ("gif", 2)

    def test_non_gif_raises_not_implemented(self):
        import pytest as _pytest
        from deequ_spark.llm import decode_gif
        with _pytest.raises(NotImplementedError):
            decode_gif(b"RIFF1234WAVE")

    def test_lzw_round_trip_property(self):
        """Hypothesis: decode(encode(x)) == x for arbitrary index
        streams at every min-code-size — repeated runs, KwKwK-inducing
        patterns, width transitions, empty streams."""
        from hypothesis import given, settings
        from hypothesis import strategies as st
        from deequ_spark.llm.gif import _lzw_decode, _lzw_encode

        @settings(max_examples=60, deadline=None)
        @given(st.integers(2, 8).flatmap(
            lambda mcs: st.tuples(
                st.just(mcs),
                st.lists(st.integers(0, (1 << mcs) - 1),
                         max_size=2000))))
        def check(case):
            mcs, idx = case
            data = bytes(idx)
            assert _lzw_decode(_lzw_encode(data, mcs), mcs,
                               len(data)) == data

        check()


class TestMp3Probe:
    """MP3 frame-header probing (multimodal.py _probe_mp3 /
    encode_mp3_frames): ISO/IEC 11172-3 §2.4.2.3 header fields, Xing VBR
    tag, ID3v2 skip, frame-chain walking. 64 kbps @ 48 kHz fixtures give
    pad-free 192-byte frames at exactly 24 ms each."""

    def test_cbr_frame_walk_mono(self):
        from deequ_spark.llm import encode_mp3_frames, probe_media
        p = probe_media(encode_mp3_frames(5, mono=True))
        assert (p["format"], p["kind"], p["sample_rate"], p["n_channels"],
                p["duration_ms"]) == ("mp3", "audio", 48000, 1, 120)

    def test_xing_tag_survives_truncation(self):
        """The Xing frame count makes a first-frame-only probe exact —
        the header-only read a 100 TB router actually performs."""
        from deequ_spark.llm import encode_mp3_frames, probe_media
        full = encode_mp3_frames(7, mono=False, xing=True)
        p = probe_media(full)
        assert (p["n_channels"], p["duration_ms"]) == (2, 168)
        p = probe_media(full[:196])        # one frame + a few bytes
        assert p["duration_ms"] == 168     # tag, not chain, supplied it

    def test_id3v2_tag_skipped(self):
        from deequ_spark.llm import encode_mp3_frames, probe_media
        id3 = (b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + b"\x00" * 20)
        p = probe_media(id3 + encode_mp3_frames(3))
        assert (p["format"], p["duration_ms"]) == ("mp3", 72)

    def test_mpeg2_rate_table_and_576_spf(self):
        # hand-built MPEG2 Layer III header: 24 kbps @ 16 kHz mono
        from deequ_spark.llm import probe_media
        hdr = bytes([0xFF, 0xF3, (3 << 4) | (2 << 2), 0xC0])
        p = probe_media(hdr + b"\x00" * 200)
        assert (p["sample_rate"], p["duration_ms"]) == (16000, 36)

    def test_pseudo_sync_garbage_stays_unknown(self):
        from deequ_spark.llm import probe_media
        assert probe_media(b"\xFF\xE0garbage-not-a-frame")["format"] == \
            "unknown"
        # reserved version bits / free bitrate / bad rate index all reject
        for b1, b2 in ((0xEB, 0x92), (0xFB, 0x02), (0xFB, 0x9C)):
            blob = bytes([0xFF, b1, b2, 0xC0]) + b"\x00" * 64
            assert probe_media(blob)["format"] == "unknown"


class TestPackingProperties:
    """Hypothesis property tests for pack_sequences: invariants that
    must hold for ANY corpus shape, not just the fixtures."""

    def test_invariants_random_corpora(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from deequ_spark.llm import pack_sequences

        @settings(max_examples=8, deadline=None,
                  suppress_health_check=list(HealthCheck))
        @given(st.lists(st.tuples(st.integers(0, 10**6),
                                  st.integers(0, 500)),
                        min_size=1, max_size=40, unique_by=lambda t: t[0]),
               st.integers(1, 300), st.integers(1, 5))
        def check(rows, budget, n_groups):
            df = spark.createDataFrame(rows, "doc_id long, tokens long")
            packed = pack_sequences(df, "doc_id", F.col("tokens"),
                                    budget=budget,
                                    n_groups=n_groups).collect()
            total = sum(t for _, t in rows if t > 0)
            # token conservation
            assert sum(r["slice_tokens"] for r in packed) == total
            # every slice positive and within budget
            assert all(1 <= r["slice_tokens"] <= budget for r in packed)
            # per (group, pack) fill <= budget, == budget except each
            # group's last pack
            fills = {}
            for r in packed:
                key = (r["group"], r["pack_id"])
                fills[key] = fills.get(key, 0) + r["slice_tokens"]
            for (g, p), fill in fills.items():
                assert fill <= budget
                last = max(pp for (gg, pp) in fills if gg == g)
                if p != last:
                    assert fill == budget
            # contiguity: packs within a group are 0..last with no holes
            for g in {gg for gg, _ in fills}:
                packs = sorted(pp for gg, pp in fills if gg == g)
                assert packs == list(range(len(packs)))

        check()


class TestLmQualityScore:
    """char_trigram_model + lm_quality_score (llm/text.py): CCNet-style
    perplexity-proxy quality filtering."""

    def test_model_probabilities_sum_and_smoothing(self, spark):
        import math
        from deequ_spark.llm import char_trigram_model
        df = spark.createDataFrame([(0, "aaaa")], "id long, text string")
        model = {r["trigram"]: r for r in
                 char_trigram_model(df, "text").collect()}
        # 2 trigrams, both 'aaa': c=2, total=2, vocab=1
        assert set(model) == {"aaa"}
        assert abs(model["aaa"]["log_prob"] - math.log(3 / 3)) < 1e-12
        assert abs(model["aaa"]["unseen_log_prob"]
                   - math.log(1 / 3)) < 1e-12

    def test_fluent_scores_lower_than_gibberish(self, spark):
        from deequ_spark.llm import char_trigram_model, lm_quality_score
        corpus = spark.createDataFrame(
            [(i, "the quick brown fox jumps over the lazy dog") for i
             in range(5)], "doc_id long, text string")
        model = char_trigram_model(corpus, "text")
        cand = spark.createDataFrame(
            [(0, "the quick brown fox"), (1, "zxqj vwpk qqzz xjvw")],
            "doc_id long, text string")
        got = {r["doc_id"]: r for r in
               lm_quality_score(cand, "doc_id", "text", model).collect()}
        assert got[0]["cross_entropy"] < got[1]["cross_entropy"]
        assert got[0]["n_trigrams"] == len("the quick brown fox") - 2

    def test_short_docs_unscored(self, spark):
        from deequ_spark.llm import char_trigram_model, lm_quality_score
        corpus = spark.createDataFrame([(0, "hello world")],
                                       "doc_id long, text string")
        model = char_trigram_model(corpus, "text")
        cand = spark.createDataFrame([(0, "hi"), (1, "hello")],
                                     "doc_id long, text string")
        got = {r["doc_id"]: r for r in
               lm_quality_score(cand, "doc_id", "text", model).collect()}
        assert got[0]["cross_entropy"] is None     # < 3 chars
        assert got[1]["cross_entropy"] is not None

    def test_scoring_uses_broadcast_join(self, spark):
        from deequ_spark.llm import char_trigram_model, lm_quality_score
        corpus = spark.createDataFrame(
            [(i, "some sample text here") for i in range(4)],
            "doc_id long, text string")
        model = char_trigram_model(corpus, "text")
        plan = lm_quality_score(corpus, "doc_id", "text", model)._jdf \
            .queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


class TestPipelineCheckpointKnob:
    def test_uncut_chain_equals_cut_chain(self, spark):
        """checkpoint_stages=False must produce the identical output
        (the cuts are plan surgery, never semantics) — verified on a
        short chain where the uncut plan stays analyzable."""
        from deequ_spark.llm import prepare_training_corpus
        rows = [(i, "the quick brown fox jumps over the lazy dog plus "
                 + ("unique words " * (1 + i % 3)) + str(i % 5))
                for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        outs = {}
        for cp in (True, False):
            out, stats = prepare_training_corpus(
                df, "doc_id", "text", min_words=3,
                boilerplate_min_docs=50, near_dedup=False,
                chunk_tokens=8, chunk_overlap=2,
                checkpoint_stages=cp,
                gopher_kwargs={"min_stopword_hits": 1})
            outs[cp] = sorted(tuple(r) for r in out.collect())
            if cp:
                out.unpersist()
        assert outs[True] == outs[False]

    def test_checkpoint_input_cuts_raw_source_once(self, spark):
        """r12 wave 3: checkpoint_input=True lets the FIRST multi-ref
        stage cut the raw source (one extra localCheckpoint, exactly),
        and the output is identical — the knob is plan surgery for
        expensive opaque inputs (crawl_to_corpus sets it), never
        semantics."""
        from pyspark.sql.classic.dataframe import DataFrame as CDF
        from deequ_spark.llm import prepare_training_corpus
        docs = spark.createDataFrame(
            [(i, "shared header line\ncontent %d words here" % (i % 5))
             for i in range(30)],
            "doc_id long, text string")
        calls = []
        orig = CDF.localCheckpoint

        def counted(self, eager=True):
            calls.append(eager)
            return orig(self, eager=eager)

        CDF.localCheckpoint = counted
        try:
            outs, n_cuts = {}, {}
            for ci in (False, True):
                calls.clear()
                out, _ = prepare_training_corpus(
                    docs, "doc_id", "text", quality_filter=False,
                    boilerplate_min_docs=5, near_dedup=False,
                    chunk=False, collect_stats=False,
                    checkpoint_input=ci)
                outs[ci] = sorted(tuple(r) for r in out.collect())
                n_cuts[ci] = len(calls)
                out.unpersist()
        finally:
            CDF.localCheckpoint = orig
        assert outs[False] == outs[True]
        assert n_cuts[True] == n_cuts[False] + 1


class TestPipelineEndToEnd:
    """prepare_training_corpus with the r7 post-dedup stages: LM filter,
    deterministic sampling, sequence packing."""

    def _corpus(self, spark):
        fluent = ("the quick brown fox jumps over the lazy dog and then "
                  "runs far away into the quiet green forest tonight " * 3)
        gibberish = "zxqj vwpk qqzz xjvw kjzx wqpv zzqq wjxv " * 8
        rows = [(i, fluent + f" marker{i}") for i in range(20)]
        rows += [(100 + i, gibberish + f" tag{i}") for i in range(4)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_lm_filter_drops_high_entropy_docs(self, spark):
        from deequ_spark.llm import prepare_training_corpus
        # quality gate OFF so the LM stage is what removes the gibberish
        out, stats = prepare_training_corpus(
            self._corpus(spark), "doc_id", "text",
            quality_filter=False, boilerplate=False, near_dedup=False,
            chunk=False, lm_filter_quantile=0.8)
        kept = {r["doc_id"] for r in out.select("doc_id").collect()}
        # the gibberish block scores above the 0.8 quantile and is gone
        assert all(i < 100 for i in kept)
        assert stats["lm_filter"] < stats["exact_dedup"] == 24

    def test_sampling_and_packing_stages(self, spark):
        from deequ_spark.llm import prepare_training_corpus
        out, stats = prepare_training_corpus(
            self._corpus(spark), "doc_id", "text", min_words=10,
            boilerplate=False, near_dedup=False,
            sample_fraction=0.5, pack_budget=64)
        assert 0 < stats["sample"] <= stats["exact_dedup"]
        # packing output grain: (group, pack_id, id, ...) slices
        cols = set(out.columns)
        assert {"group", "pack_id", "id", "slice_tokens"} <= cols
        fills = (out.groupBy("group", "pack_id")
                 .agg(F.sum("slice_tokens").alias("f")).collect())
        assert all(r["f"] <= 64 for r in fills)
        # deterministic: same inputs -> same sampled stats
        _, stats2 = prepare_training_corpus(
            self._corpus(spark), "doc_id", "text", min_words=10,
            boilerplate=False, near_dedup=False,
            sample_fraction=0.5, pack_budget=64)
        assert stats2["sample"] == stats["sample"]
        assert stats2["packs"] == stats["packs"]

    def test_paragraph_dedup_stage(self, spark):
        from deequ_spark.llm import prepare_training_corpus
        docs = spark.createDataFrame([
            (1, "unique intro\n\nshared legal disclaimer text"),
            (2, "shared legal disclaimer text\n\nfresh body two"),
            (3, "shared legal disclaimer text"),
        ], "doc_id long, text string")
        out, stats = prepare_training_corpus(
            docs, "doc_id", "text", quality_filter=False,
            boilerplate=False, exact_dedup=False, near_dedup=False,
            chunk=False, paragraph_dedup_sep="\n\n")
        got = {r["doc_id"]: r["text"] for r in out.collect()}
        assert got[1] == "unique intro\n\nshared legal disclaimer text"
        assert got[2] == "fresh body two"
        assert 3 not in got            # emptied -> dropped
        assert stats["paragraph_dedup"] == 2

    def test_semantic_dedup_stage_keeps_unembedded_docs(self, spark):
        import numpy as np

        from deequ_spark.llm import prepare_training_corpus
        rng = np.random.default_rng(21)
        base = rng.standard_normal(8)
        base = base / np.linalg.norm(base)
        docs = spark.createDataFrame(
            [(i, f"document body number {i} with words") for i in range(5)],
            "doc_id long, text string")
        # ids 0-2 near-identical embeddings; 3 distinct; 4 HAS NO ROW
        emb_rows = [(i, [float(x) for x in
                         base + 1e-3 * rng.standard_normal(8)])
                    for i in range(3)]
        emb_rows.append((3, [float(x) for x in -base]))
        emb = spark.createDataFrame(emb_rows, "doc_id long, vec array<double>")
        out, stats = prepare_training_corpus(
            docs, "doc_id", "text", quality_filter=False,
            boilerplate=False, exact_dedup=False, near_dedup=False,
            chunk=False, embeddings=emb, embedding_cols=("doc_id", "vec"),
            semantic_threshold=0.99, semantic_clusters=2)
        kept = {r["doc_id"] for r in out.collect()}
        # one of {0,1,2} survives, 3 untouched, 4 passes (unjudgeable)
        assert len(kept & {0, 1, 2}) == 1
        assert {3, 4} <= kept
        assert stats["semantic_dedup"] == 3

    def test_span_dedup_stage(self, spark):
        from deequ_spark.llm import prepare_training_corpus
        docs = spark.createDataFrame([
            (1, "aa bb cc dd unique tail one"),
            (2, "xx aa bb cc dd yy zz"),
        ], "doc_id long, text string")
        out, stats = prepare_training_corpus(
            docs, "doc_id", "text", quality_filter=False,
            boilerplate=False, exact_dedup=False, near_dedup=False,
            chunk=False, span_dedup_n=4)
        got = {r["doc_id"]: r["text"] for r in out.collect()}
        assert got[1] == "aa bb cc dd unique tail one"
        assert got[2] == "xx yy zz"
        assert stats["span_dedup"] == 2

    def test_dsir_stage(self, spark):
        from deequ_spark.llm import prepare_training_corpus
        target = spark.createDataFrame(
            [(i, "clean reference prose about the experiment results")
             for i in range(5)], "doc_id long, text string")
        docs = spark.createDataFrame(
            [(i, "clean reference prose with extra details "
                 f"number {i}") for i in range(6)]
            + [(50 + i, "zxqj vwpk qqzz gibberish block "
                        f"{i}") for i in range(6)],
            "doc_id long, text string")
        out, stats = prepare_training_corpus(
            docs, "doc_id", "text", quality_filter=False,
            boilerplate=False, exact_dedup=False, near_dedup=False,
            chunk=False, dsir_target=target, dsir_k=4,
            dsir_temperature=0.5)
        kept = {r["doc_id"] for r in out.collect()}
        assert stats["dsir"] == 4
        assert all(i < 50 for i in kept)    # drew the target-like docs
        import pytest as _pytest
        with _pytest.raises(ValueError, match="dsir_k"):
            prepare_training_corpus(docs, "doc_id", "text",
                                    dsir_target=target)

    def test_all_stages_compose(self, spark):
        """Every stage enabled at once — quality, boilerplate,
        paragraph dedup, span dedup, exact+near dedup, SemDeDup, LM
        filter, DSIR, packing — must compose into one run with stats
        in pipeline order and a non-empty packed result."""
        import numpy as np

        from deequ_spark.llm import prepare_training_corpus
        rng = np.random.default_rng(31)
        body = ("the results of the experiment were consistent with the "
                "theory and the measurements supported the analysis of "
                "the data in the report that we prepared for the review ")
        rows = []
        for i in range(24):
            text = (f"COMMON HEADER LINE\n{body}variant {i} "
                    f"\n\nshared disclaimer paragraph\n\n{body}tail {i}")
            rows.append((i, text))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        emb_rows = [(i, [float(x) for x in rng.standard_normal(8)])
                    for i in range(24)]
        emb = spark.createDataFrame(emb_rows, "doc_id long, vec array<double>")
        target = docs.select("doc_id", "text").limit(6)
        out, stats = prepare_training_corpus(
            docs, "doc_id", "text", min_words=10,
            boilerplate_min_docs=5,
            paragraph_dedup_sep="\n\n", span_dedup_n=30,
            embeddings=emb, embedding_cols=("doc_id", "vec"),
            semantic_threshold=0.999, semantic_clusters=2,
            lm_filter_quantile=0.95, dsir_target=target, dsir_k=8,
            pack_budget=64)
        expected_order = ["input", "quality", "boilerplate",
                          "paragraph_dedup", "span_dedup", "exact_dedup",
                          "near_dedup", "semantic_dedup", "lm_filter",
                          "dsir", "packs"]
        assert list(stats.keys()) == expected_order
        assert stats["dsir"] == 8
        assert out.count() > 0
        assert {"group", "pack_id", "id", "slice_tokens"} <= set(out.columns)

    def test_bad_quantile_rejected(self, spark):
        import pytest as _pytest
        from deequ_spark.llm import prepare_training_corpus
        with _pytest.raises(ValueError, match="lm_filter_quantile"):
            prepare_training_corpus(self._corpus(spark), "doc_id",
                                    "text", lm_filter_quantile=1.5)


class TestAssemblePacks:
    def test_examples_and_boundaries(self, spark):
        """Packed examples carry every token exactly once, in layout
        order, with document spans summing to the pack size."""
        from deequ_spark.llm import assemble_packs, pack_sequences
        rows = [(1, [101, 102, 103]), (2, [201, 202, 203, 204, 205]),
                (3, [301]), (4, [401, 402, 403, 404])]
        ids = spark.createDataFrame(rows, "doc_id long, token_ids array<long>")
        packed = pack_sequences(ids, "doc_id", F.size("token_ids"),
                                budget=4, n_groups=1)
        out = {(r["group"], r["pack_id"]):
               (list(r["token_ids"]),
                [(x["id"], x["n_tokens"]) for x in r["doc_spans"]])
               for r in assemble_packs(packed, ids, budget=4,
                                       id_col="doc_id").collect()}
        # stream in id order: 101..103,201..205,301,401..404 cut by 4
        assert out[(0, 0)] == ([101, 102, 103, 201], [(1, 3), (2, 1)])
        assert out[(0, 1)] == ([202, 203, 204, 205], [(2, 4)])
        assert out[(0, 2)] == ([301, 401, 402, 403], [(3, 1), (4, 3)])
        assert out[(0, 3)] == ([404], [(4, 1)])

    def test_token_conservation_with_bpe_ids(self, spark):
        """End-to-end: train BPE -> encode to ids -> pack -> assemble;
        concatenating all packs per group reproduces the concatenated
        per-document id streams."""
        from deequ_spark.llm import (assemble_packs, bpe_encode_ids,
                                     pack_sequences, train_bpe)
        docs = spark.createDataFrame(
            [(i, f"doc number {i} with some shared words here")
             for i in range(10)], "doc_id long, text string")
        merges = train_bpe(docs, "text", n_merges=15)
        enc = bpe_encode_ids(docs, "text", merges)
        packed = pack_sequences(enc, "doc_id", F.size("token_ids"),
                                budget=16, n_groups=2)
        packs = assemble_packs(packed, enc, budget=16,
                               id_col="doc_id")
        rows = sorted(packs.collect(),
                      key=lambda r: (r["group"], r["pack_id"]))
        got = {}
        for r in rows:
            got.setdefault(r["group"], []).extend(r["token_ids"])
        want = {}
        for r in sorted(enc.collect(), key=lambda r: r["doc_id"]):
            want.setdefault(r["doc_id"] % 2, []).extend(r["token_ids"])
        assert got == want
        # every pack except each group's last is exactly the budget
        by_group = {}
        for r in rows:
            by_group.setdefault(r["group"], []).append(len(r["token_ids"]))
        for sizes in by_group.values():
            assert all(s == 16 for s in sizes[:-1])


class TestAssemblePacksProperty:
    def test_matches_python_packer_model(self, spark):
        """Hypothesis: assemble_packs over random corpora equals a
        pure-Python concat-and-chunk model — pins the closed-form
        within-doc offsets against an independent implementation."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from deequ_spark.llm import assemble_packs, pack_sequences

        docs_s = st.lists(st.integers(min_value=1, max_value=9),
                          min_size=1, max_size=8)

        @given(docs_s, st.integers(min_value=2, max_value=7))
        @settings(max_examples=8, deadline=None)
        def check(lengths, budget):
            rows = [(i, [i * 100 + j for j in range(n)])
                    for i, n in enumerate(lengths)]
            ids = spark.createDataFrame(
                rows, "doc_id long, token_ids array<long>")
            packed = pack_sequences(ids, "doc_id", F.size("token_ids"),
                                    budget=budget, n_groups=1)
            got = {r["pack_id"]: list(r["token_ids"]) for r in
                   assemble_packs(packed, ids, budget=budget,
                                  id_col="doc_id").collect()}
            # reference model: concatenate in id order, cut by budget
            stream = [t for _, toks in rows for t in toks]
            want = {p: stream[p * budget:(p + 1) * budget]
                    for p in range(-(-len(stream) // budget))}
            assert got == want

        check()


class TestGifAnimation:
    """Multi-frame GIF compositing (gif.py decode_gif_frames /
    encode_gif_animation): GCE delay/transparency/disposal semantics,
    including the cases where restore-background and restore-previous
    DIFFER (overlapping patches)."""

    def _red(self):
        import numpy as np
        return np.full((2, 2, 3), 0, np.uint8) + np.array(
            [200, 0, 0], np.uint8)

    def test_disposal_1_accumulates(self):
        import numpy as np
        from deequ_spark.llm import decode_gif_frames, encode_gif_animation
        f = [{"patch": np.full((2, 2, 3), 100, np.uint8), "left": 0,
              "top": 0, "disposal": 1, "delay_cs": 5},
             {"patch": np.full((2, 2, 3), 50, np.uint8), "left": 2,
              "top": 2, "disposal": 1, "delay_cs": 7}]
        frames = decode_gif_frames(encode_gif_animation((4, 4), f))
        assert [fr["delay_cs"] for fr in frames] == [5, 7]
        assert [fr["disposal"] for fr in frames] == [1, 1]
        c0, c1 = frames[0]["canvas"], frames[1]["canvas"]
        assert int(c0.sum()) == 4 * 3 * 100
        # frame 0 retained under disposal 1
        assert int(c1.sum()) == 4 * 3 * 100 + 4 * 3 * 50
        assert tuple(c1[0, 0]) == (100, 100, 100)
        assert tuple(c1[3, 3]) == (50, 50, 50)

    def test_disposal_2_restores_background_rect(self):
        import numpy as np
        from deequ_spark.llm import decode_gif_frames, encode_gif_animation
        f = [{"patch": np.full((2, 2, 3), 100, np.uint8), "left": 0,
              "top": 0, "disposal": 2, "delay_cs": 1},
             {"patch": np.full((1, 1, 3), 50, np.uint8), "left": 3,
              "top": 3, "disposal": 1, "delay_cs": 1}]
        frames = decode_gif_frames(encode_gif_animation((4, 4), f))
        c1 = frames[1]["canvas"]
        assert tuple(c1[0, 0]) == (0, 0, 0)      # frame 0 erased to bg
        assert int(c1.sum()) == 3 * 50

    def test_disposal_3_vs_2_differ_on_overlap(self):
        """Overlapping patches: disposal 3 restores the PRE-FRAME canvas
        (red pixel under the green patch comes back); disposal 2 would
        black out the green rect including the red underneath."""
        import numpy as np
        from deequ_spark.llm import decode_gif_frames, encode_gif_animation
        red = np.zeros((2, 2, 3), np.uint8); red[:, :, 0] = 200
        green = np.zeros((2, 2, 3), np.uint8); green[:, :, 1] = 150
        blue = np.zeros((1, 1, 3), np.uint8); blue[:, :, 2] = 90
        base = [{"patch": red, "left": 0, "top": 0, "disposal": 1,
                 "delay_cs": 1},
                {"patch": green, "left": 1, "top": 1, "disposal": 3,
                 "delay_cs": 1},
                {"patch": blue, "left": 3, "top": 3, "disposal": 1,
                 "delay_cs": 1}]
        frames = decode_gif_frames(encode_gif_animation((4, 4), base))
        c1, c2 = frames[1]["canvas"], frames[2]["canvas"]
        assert tuple(c1[1, 1]) == (0, 150, 0)    # green over red
        assert tuple(c2[1, 1]) == (200, 0, 0)    # restored by disposal 3
        base[1]["disposal"] = 2
        frames2 = decode_gif_frames(encode_gif_animation((4, 4), base))
        assert tuple(frames2[2]["canvas"][1, 1]) == (0, 0, 0)  # bg rect

    def test_transparency_shows_underlying_content(self):
        """A transparent hole over an existing patch shows that patch,
        not the background."""
        import numpy as np
        from deequ_spark.llm import decode_gif_frames, encode_gif_animation
        red = np.zeros((2, 2, 3), np.uint8); red[:, :, 0] = 200
        green = np.zeros((2, 2, 3), np.uint8); green[:, :, 1] = 150
        mask = np.zeros((2, 2), bool); mask[0, 0] = True
        f = [{"patch": red, "left": 0, "top": 0, "disposal": 1,
              "delay_cs": 1},
             {"patch": green, "left": 0, "top": 0, "disposal": 1,
              "delay_cs": 1, "transparent_mask": mask}]
        frames = decode_gif_frames(encode_gif_animation((2, 2), f))
        c1 = frames[1]["canvas"]
        assert tuple(c1[0, 0]) == (200, 0, 0)    # hole shows red
        assert tuple(c1[0, 1]) == (0, 150, 0)
        assert tuple(c1[1, 1]) == (0, 150, 0)

    def test_still_gif_yields_one_frame_defaults(self):
        """A plain encode_gif stream (no GCE) composites as one frame
        with disposal 0 / delay 0."""
        import numpy as np
        from deequ_spark.llm import decode_gif_frames, encode_gif
        img = np.full((3, 5, 3), 77, np.uint8)
        frames = decode_gif_frames(encode_gif(img))
        assert len(frames) == 1
        assert (frames[0]["disposal"], frames[0]["delay_cs"]) == (0, 0)
        assert np.array_equal(frames[0]["canvas"], img)

    def test_gif_frame_features_distributed(self, spark):
        import numpy as np
        from deequ_spark.llm import encode_gif_animation, gif_frame_features
        f = [{"patch": np.full((2, 2, 3), 10, np.uint8), "left": 0,
              "top": 0, "disposal": 1, "delay_cs": 3},
             {"patch": np.full((2, 2, 3), 20, np.uint8), "left": 2,
              "top": 0, "disposal": 2, "delay_cs": 4}]
        blob = encode_gif_animation((4, 4), f)
        df = spark.createDataFrame([(1, bytearray(blob))],
                                   "media_id long, payload binary")
        rows = {r["frame_index"]: r for r in
                gif_frame_features(df).collect()}
        assert rows[0]["canvas_sum"] == 4 * 3 * 10
        assert rows[0]["lit_px"] == 4
        assert rows[1]["canvas_sum"] == 4 * 3 * 10 + 4 * 3 * 20
        assert rows[1]["lit_px"] == 8
        assert rows[1]["delay_cs"] == 4 and rows[1]["disposal"] == 2


class TestMp3FrameProfile:
    """Per-frame MP3 VBR profiling (multimodal.py mp3_frame_profile /
    encode_mp3_vbr): frame chain walking with per-frame bitrates, ID3v2
    skip, resync, truncation."""

    def test_vbr_offsets_and_bitrates(self, spark):
        from deequ_spark.llm import encode_mp3_vbr, mp3_frame_profile
        rates = [64, 128, 96, 160]
        blob = encode_mp3_vbr(rates, id3_payload=7)
        df = spark.createDataFrame([(5, bytearray(blob))],
                                   "media_id long, payload binary")
        rows = sorted(mp3_frame_profile(df).collect(),
                      key=lambda r: r["frame_index"])
        assert [r["bitrate_kbps"] for r in rows] == rates
        assert [r["frame_bytes"] for r in rows] == [3 * k for k in rates]
        # 10-byte ID3 header + 7 payload bytes precede frame 0
        offs = [17]
        for k in rates[:-1]:
            offs.append(offs[-1] + 3 * k)
        assert [r["byte_offset"] for r in rows] == offs
        assert all(r["sample_rate"] == 48000 and r["samples"] == 1152
                   for r in rows)

    def test_resync_and_truncation(self, spark):
        from deequ_spark.llm import encode_mp3_vbr, mp3_frame_profile
        blob = b"\x00garbage\xff\x00" + encode_mp3_vbr([64, 64, 64])
        truncated = blob[:-50]               # cut into the last frame
        df = spark.createDataFrame(
            [(1, bytearray(blob)), (2, bytearray(truncated))],
            "media_id long, payload binary")
        got = {}
        for r in mp3_frame_profile(df).collect():
            got.setdefault(r["media_id"], []).append(r)
        assert len(got[1]) == 3
        assert got[1][0]["byte_offset"] == 10    # past the garbage
        # the final truncated frame still profiles from its header;
        # the chain stops after it (header-only parsing)
        assert len(got[2]) == 3

    def test_cbr_profile_agrees_with_probe(self):
        from deequ_spark.llm import encode_mp3_frames, probe_media
        from deequ_spark.llm.multimodal import (_mp3_frame_header)
        blob = encode_mp3_frames(6)
        p = probe_media(blob)
        hdr = _mp3_frame_header(blob, 0)
        assert hdr is not None and hdr[5] == 64   # kbps now exposed
        assert p["duration_ms"] == 6 * 24


class TestMp4SampleProfile:
    """MP4 stbl sample-table profiling (multimodal.py mp4_sample_profile
    / encode_mp4_samples): stts run expansion, per-sample stsz, stsc
    chunk-map expansion against stco absolute offsets, stss sync flags,
    two-pass offset correctness."""

    def test_samples_offsets_timing_sync(self, spark):
        from deequ_spark.llm import encode_mp4_samples, mp4_sample_profile
        sizes = [100, 110, 120, 130, 140]
        deltas = [512, 512, 512, 256, 256]
        blob = encode_mp4_samples(sizes, deltas, sync_samples=[1, 4],
                                  chunk_size=2)
        df = spark.createDataFrame([(9, bytearray(blob))],
                                   "media_id long, payload binary")
        rows = sorted(mp4_sample_profile(df).collect(),
                      key=lambda r: r["sample_index"])
        assert [r["size_bytes"] for r in rows] == sizes
        assert [r["duration_ms"] for r in rows] == deltas
        assert [r["dts_ms"] for r in rows] == [0, 512, 1024, 1536, 1792]
        assert [r["is_sync"] for r in rows] == [True, False, False,
                                                True, False]
        # absolute offsets: chunk 0 starts at the mdat payload; chunks
        # are 2 samples each, contiguous
        base = blob.find(b"mdat") + 4
        assert [r["byte_offset"] for r in rows] == \
            [base, base + 100, base + 210, base + 210 + 120,
             base + 210 + 120 + 130]
        # the stco entries must equal the real payload positions
        assert rows[2]["byte_offset"] == base + 210

    def test_no_stss_means_all_sync_and_uniform_stsz(self, spark):
        from deequ_spark.llm import encode_mp4_samples, mp4_sample_profile
        blob = encode_mp4_samples([64, 64, 64], [100, 100, 100],
                                  chunk_size=3)
        df = spark.createDataFrame([(1, bytearray(blob))],
                                   "media_id long, payload binary")
        rows = mp4_sample_profile(df).collect()
        assert len(rows) == 3 and all(r["is_sync"] for r in rows)

    def test_single_partial_chunk_stsc_declares_true_count(self):
        """r11 ADVICE: with n < chunk_size the lone stsc entry must say
        (1, n), not (1, chunk_size) — a strict external parser derives
        sample count from stsc and must agree with the n-entry stsz."""
        import struct
        from deequ_spark.llm import encode_mp4_samples, mp4_samples
        blob = encode_mp4_samples([10, 20, 30], [100, 100, 100],
                                  chunk_size=8)
        at = blob.find(b"stsc")
        n_entries, = struct.unpack(">I", blob[at + 8:at + 12])
        assert n_entries == 1
        first_chunk, spc, _ = struct.unpack(">III", blob[at + 12:at + 24])
        assert (first_chunk, spc) == (1, 3)
        # strict stsc-derived walk equals stsz-derived samples
        assert len(list(mp4_samples(blob))) == 3

    def test_garbage_and_skeleton_yield_no_rows(self, spark):
        from deequ_spark.llm import (encode_mp4_skeleton,
                                     mp4_sample_profile)
        df = spark.createDataFrame(
            [(1, bytearray(b"\x00" * 64)),
             (2, bytearray(encode_mp4_skeleton(1000, 160, 90)))],
            "media_id long, payload binary")
        assert mp4_sample_profile(df).count() == 0


class TestId3TextFrames:
    """ID3v2 text-frame extraction (multimodal.py encode_id3v2 /
    parse_id3_frames / id3_text_frames): v2.3 big-endian vs v2.4
    syncsafe frame sizes, all four text encodings, padding stop,
    non-text frame skip, composition with a real MP3 stream."""

    def test_both_versions_and_encodings(self, spark):
        from deequ_spark.llm import (encode_id3v2, encode_mp3_frames,
                                     id3_text_frames)
        v4 = encode_id3v2([("TIT2", "Café Nights", 3),
                           ("TPE1", "Artíst", 1)],
                          version=4, padding=7) + encode_mp3_frames(2)
        v3 = encode_id3v2([("TIT2", "Plain Title", 0),
                           ("TALB", "Album X", 1)],
                          version=3) + encode_mp3_frames(2)
        df = spark.createDataFrame(
            [(1, bytearray(v4)), (2, bytearray(v3))],
            "media_id long, payload binary")
        got = {(r["media_id"], r["frame_id"]): r["value"]
               for r in id3_text_frames(df).collect()}
        assert got == {(1, "TIT2"): "Café Nights",
                       (1, "TPE1"): "Artíst",
                       (2, "TIT2"): "Plain Title",
                       (2, "TALB"): "Album X"}

    def test_probe_still_reads_audio_past_big_tag(self):
        """The syncsafe skip and the frame walk must agree: a tagged MP3
        still probes its duration."""
        from deequ_spark.llm import encode_id3v2, encode_mp3_frames
        from deequ_spark.llm import probe_media
        blob = encode_id3v2([("TIT2", "x" * 300, 3)]) \
            + encode_mp3_frames(4)
        p = probe_media(blob)
        assert (p["format"], p["duration_ms"]) == ("mp3", 96)

    def test_non_text_frames_skipped_and_no_tag_empty(self, spark):
        import struct as _struct
        from deequ_spark.llm import (encode_id3v2, encode_mp3_frames,
                                     id3_text_frames, parse_id3_frames)
        # hand-build a v2.4 tag with a binary APIC frame before TIT2
        apic = b"APIC" + bytes([0, 0, 0, 5]) + b"\x00\x00" + b"\xff" * 5
        tit2 = b"TIT2" + bytes([0, 0, 0, 6]) + b"\x00\x00" \
            + b"\x03title"
        body = apic + tit2
        n = len(body)
        tag = (b"ID3\x04\x00\x00"
               + bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                        (n >> 7) & 0x7F, n & 0x7F]) + body)
        assert parse_id3_frames(tag) == [("TIT2", "title")]
        df = spark.createDataFrame(
            [(1, bytearray(encode_mp3_frames(2)))],
            "media_id long, payload binary")
        assert id3_text_frames(df).count() == 0


class TestGifVideoSampling:
    """sample_video_frames over animated GIFs: the one video container
    decoded end-to-end in-process — sampled rows carry REAL composited
    canvases (BMP) on the GCE-delay timeline."""

    def test_animated_gif_samples_decoded_canvases(self, spark):
        import numpy as np
        from deequ_spark.llm import (encode_gif_animation,
                                     sample_video_frames)
        from deequ_spark.llm.multimodal import decode_image
        # two frames, delays 20 cs + 30 cs -> 200 ms + 300 ms timeline
        f = [{"patch": np.full((2, 2, 3), 100, np.uint8), "left": 0,
              "top": 0, "disposal": 1, "delay_cs": 20},
             {"patch": np.full((2, 2, 3), 50, np.uint8), "left": 2,
              "top": 2, "disposal": 1, "delay_cs": 30}]
        blob = encode_gif_animation((4, 4), f)
        df = spark.createDataFrame([(1, bytearray(blob))],
                                   "media_id long, payload binary")
        rows = sorted(sample_video_frames(df, n_frames=4).collect(),
                      key=lambda r: r["frame_index"])
        assert len(rows) == 4 and all(r["decoded"] for r in rows)
        assert [round(r["ts_ms"], 1) for r in rows] == \
            [62.5, 187.5, 312.5, 437.5]
        # first two samples fall in frame 0 (ends 200ms), rest frame 1
        sums = []
        for r in rows:
            h, w, _, px = decode_image(bytes(r["pixels"]))
            assert (h, w) == (4, 4)
            sums.append(int(px.sum()))
        assert sums[0] == sums[1] == 4 * 3 * 100
        assert sums[2] == sums[3] == 4 * 3 * 100 + 4 * 3 * 50
        assert rows[0]["n_tracks"] == 2

    def test_still_gif_yields_no_video_rows(self, spark):
        import numpy as np
        from deequ_spark.llm import encode_gif, sample_video_frames
        df = spark.createDataFrame(
            [(1, bytearray(encode_gif(np.full((2, 2, 3), 7, np.uint8))))],
            "media_id long, payload binary")
        assert sample_video_frames(df, n_frames=3).count() == 0

    def test_mp4_path_unchanged(self, spark):
        from deequ_spark.llm import encode_mp4_skeleton, sample_video_frames
        df = spark.createDataFrame(
            [(1, bytearray(encode_mp4_skeleton(800, 64, 32)))],
            "media_id long, payload binary")
        rows = sample_video_frames(df, n_frames=2).collect()
        assert len(rows) == 2
        assert all(not r["decoded"] and r["pixels"] is None for r in rows)


class TestVideoKeyframeSampling:
    """sample_video_keyframes: the seek plan — each uniform grid
    position snaps to its nearest preceding stss sync sample."""

    def test_grid_snaps_to_preceding_sync(self, spark):
        from deequ_spark.llm import (encode_mp4_samples,
                                     sample_video_keyframes)
        # 8 samples x 250 ms, syncs at samples 1 and 5 (ts 0 / 1000 ms)
        blob = encode_mp4_samples([10] * 8, [250] * 8,
                                  sync_samples=[1, 5])
        df = spark.createDataFrame([(1, bytearray(blob))],
                                   "media_id long, payload binary")
        rows = sorted(sample_video_keyframes(df, n_frames=4).collect(),
                      key=lambda r: r["grid_index"])
        # grid ts: 250, 750, 1250, 1750 -> syncs at 0, 0, 1000, 1000
        assert [r["ts_ms"] for r in rows] == [0, 0, 1000, 1000]
        assert [r["sample_index"] for r in rows] == [0, 0, 4, 4]
        base = blob.find(b"mdat") + 4
        assert rows[0]["byte_offset"] == base
        assert rows[2]["byte_offset"] == base + 40
        assert all(r["size_bytes"] == 10 for r in rows)

    def test_no_stss_means_every_sample_seekable(self, spark):
        from deequ_spark.llm import (encode_mp4_samples,
                                     sample_video_keyframes)
        blob = encode_mp4_samples([7, 7, 7, 7], [500] * 4)
        df = spark.createDataFrame([(1, bytearray(blob))],
                                   "media_id long, payload binary")
        rows = sorted(sample_video_keyframes(df, n_frames=4).collect(),
                      key=lambda r: r["grid_index"])
        # all-sync: each grid point lands on its own sample
        assert [r["sample_index"] for r in rows] == [0, 1, 2, 3]

    def test_skeleton_and_garbage_yield_nothing(self, spark):
        from deequ_spark.llm import (encode_mp4_skeleton,
                                     sample_video_keyframes)
        df = spark.createDataFrame(
            [(1, bytearray(encode_mp4_skeleton(1000, 64, 32))),
             (2, bytearray(b"\x00" * 32))],
            "media_id long, payload binary")
        assert sample_video_keyframes(df).count() == 0


class TestTokenMixtureSample:
    """token_mixture_sample: budgets are TOKEN floors per domain,
    filled in the deterministic md5 order."""

    def _corpus(self, spark):
        rows = []
        for d, n, toks in (("web", 30, 10), ("code", 30, 50)):
            for k in range(n):
                rows.append((f"{d}{k}", d, "w " * toks))
        return spark.createDataFrame(rows, "key string, dom string, "
                                     "text string")

    def test_budgets_delivered_as_floors(self, spark):
        from deequ_spark.llm import token_mixture_sample
        from pyspark.sql import functions as F
        df = self._corpus(spark)
        toks = F.size(F.filter(F.split("text", r"\s+"),
                               lambda t: t != ""))
        out = token_mixture_sample(
            df, "dom", "key", toks,
            {"web": 0.5, "code": 0.5}, total_tokens=600).cache()
        got = {r["dom"]: r["t"] for r in
               out.groupBy("dom")
               .agg(F.sum(toks).alias("t")).collect()}
        # floors: each domain delivers >= 300 tokens, overshoot < 1 doc
        assert 300 <= got["web"] < 310
        assert 300 <= got["code"] < 350
        # deterministic: identical keys on re-run
        keys1 = sorted(r["key"] for r in out.collect())
        out2 = token_mixture_sample(
            df, "dom", "key", toks,
            {"web": 0.5, "code": 0.5}, total_tokens=600)
        assert keys1 == sorted(r["key"] for r in out2.collect())
        out.unpersist()

    def test_quota_caps_at_availability(self, spark):
        from deequ_spark.llm import token_mixture_sample
        from pyspark.sql import functions as F
        df = self._corpus(spark)
        toks = F.size(F.filter(F.split("text", r"\s+"),
                               lambda t: t != ""))
        # web has only 300 tokens total; a 10000-token ask caps there
        out = token_mixture_sample(
            df, "dom", "key", toks,
            {"web": 1.0}, total_tokens=10_000)
        rows = out.collect()
        assert {r["dom"] for r in rows} == {"web"}
        assert len(rows) == 30                      # everything kept

    def test_row_vs_token_mixture_differ_on_skewed_lengths(self, spark):
        """The reason this operator exists: with 5x length skew, row
        quotas deliver 5x-off token mass; token quotas deliver even."""
        from deequ_spark.llm import mixture_sample, token_mixture_sample
        from pyspark.sql import functions as F
        df = self._corpus(spark)
        toks = F.size(F.filter(F.split("text", r"\s+"),
                               lambda t: t != ""))
        by_rows = mixture_sample(df, "dom", "key",
                                 {"web": 0.5, "code": 0.5}, total=20)
        got_r = {r["dom"]: r["t"] for r in
                 by_rows.groupBy("dom").agg(F.sum(toks).alias("t"))
                 .collect()}
        assert got_r["code"] / got_r["web"] == 5.0  # rows even, tokens 5x
        by_toks = token_mixture_sample(df, "dom", "key", toks,
                                       {"web": 0.5, "code": 0.5},
                                       total_tokens=600)
        got_t = {r["dom"]: r["t"] for r in
                 by_toks.groupBy("dom").agg(F.sum(toks).alias("t"))
                 .collect()}
        assert got_t["code"] / got_t["web"] < 1.2


class TestMediaRobustness:
    """Corrupt/mixed blobs must skip, never kill the task — the 100 TB
    contract for every media indexer."""

    def test_gif_frame_features_skips_non_gif_and_corrupt(self, spark):
        import numpy as np
        from deequ_spark.llm import (encode_gif_animation,
                                     gif_frame_features)
        good = encode_gif_animation(
            (4, 4), [{"patch": np.full((2, 2, 3), 9, np.uint8),
                      "left": 0, "top": 0, "disposal": 1,
                      "delay_cs": 1}])
        corrupt = good[:20] + b"\x7f" + good[21:]   # break a block tag
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(b"not a gif at all")),
             (3, bytearray(corrupt)), (4, None)],
            "media_id long, payload binary")
        rows = gif_frame_features(df).collect()
        assert {r["media_id"] for r in rows} <= {1, 3}
        assert any(r["media_id"] == 1 for r in rows)

    def test_gif_frame_features_skips_truncated_blobs(self, spark):
        """A GIF cut mid-descriptor raises struct.error (not ValueError)
        and one cut mid-extension raises IndexError; both must skip the
        blob, never the task (r11 ADVICE hardening)."""
        import numpy as np
        from deequ_spark.llm import (encode_gif_animation,
                                     gif_frame_features)
        good = encode_gif_animation(
            (4, 4), [{"patch": np.full((2, 2, 3), 9, np.uint8),
                      "left": 0, "top": 0, "disposal": 1,
                      "delay_cs": 1}])
        cuts = [good[:k] for k in range(14, len(good), 3)]
        df = spark.createDataFrame(
            [(i, bytearray(c)) for i, c in enumerate(cuts)]
            + [(999, bytearray(good))],
            "media_id long, payload binary")
        rows = gif_frame_features(df).collect()
        assert any(r["media_id"] == 999 for r in rows)

    def test_video_frames_skips_corrupt_animated_gif(self, spark):
        """probe_media can call a blob 'animated' whose full decode
        fails; sample_video_frames must skip it, not kill the task."""
        import numpy as np
        from deequ_spark.llm import (encode_gif_animation,
                                     sample_video_frames)
        good = encode_gif_animation(
            (4, 4), [{"patch": np.full((2, 2, 3), 9, np.uint8),
                      "left": 0, "top": 0, "disposal": 1,
                      "delay_cs": 2},
                     {"patch": np.full((2, 2, 3), 5, np.uint8),
                      "left": 2, "top": 2, "disposal": 1,
                      "delay_cs": 2}])
        truncated = good[:len(good) - 12]   # probe sees 2 frames; decode dies
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(truncated))],
            "media_id long, payload binary")
        rows = sample_video_frames(df, n_frames=2).collect()
        ids = {r["media_id"] for r in rows}
        assert 1 in ids

    def test_gif_offscreen_frame_clips_to_empty(self):
        """A frame whose origin lies past the logical screen is legal to
        parse; it must clip to zero pixels instead of raising."""
        import numpy as np
        from deequ_spark.llm.gif import (decode_gif_frames,
                                         encode_gif_animation)
        blob = encode_gif_animation(
            (4, 4), [{"patch": np.full((2, 2, 3), 9, np.uint8),
                      "left": 0, "top": 0, "disposal": 1,
                      "delay_cs": 1}])
        # move the frame descriptor's left/top past the 4x4 screen
        at = blob.find(b"\x2c")          # image separator
        off = bytearray(blob)
        off[at + 1:at + 5] = (6).to_bytes(2, "little") \
            + (6).to_bytes(2, "little")
        frames = decode_gif_frames(bytes(off))
        assert len(frames) == 1
        assert not frames[0]["canvas"].any()    # nothing drawn

    def test_mp4_samples_survives_lying_box_sizes(self, spark):
        from deequ_spark.llm import (encode_mp4_samples, mp4_samples,
                                     mp4_sample_profile)
        good = encode_mp4_samples([10, 10], [100, 100])
        # corrupt the stsz entry count to claim far more samples than
        # the payload holds — the walk must stop, not raise
        at = good.find(b"stsz")
        lying = bytearray(good)
        lying[at + 12:at + 16] = (10_000_000).to_bytes(4, "big")
        assert list(mp4_samples(bytes(lying))) == []
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(bytes(lying)))],
            "media_id long, payload binary")
        rows = mp4_sample_profile(df).collect()
        assert {r["media_id"] for r in rows} == {1}
