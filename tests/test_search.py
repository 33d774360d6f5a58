"""Corpus search / token statistics (deequ_spark/llm/search.py).

The reference engine has no retrieval operator; these extend the
LLM-pipeline category. BM25 expectations are computed by an
independent pure-Python reimplementation of the Robertson/Lucene
formula, not by calling the operator's own internals.
"""

import math

import pytest
from pyspark.sql import functions as F

from deequ_spark.llm import (bm25_corpus_stats, bm25_topk, corpus_drift,
                             corpus_token_stats, token_frequencies,
                             word_tokens)

DOCS = [
    (1, "the hash join beats the merge join on small tables"),
    (2, "a merge join needs sorted inputs; a hash join does not"),
    (3, "tables tables tables and more tables"),
    (4, "completely unrelated text about penguins and glaciers"),
    (5, "hash hash hash hash hash"),
]


def _expected_bm25(corpus, query_terms, k1=1.2, b=0.75):
    """Independent BM25: tokenize, df/idf, per-doc score."""
    toks = {i: [t.lower() for t in
                __import__("re").findall(r"[a-z0-9]+", txt.lower())]
            for i, txt in corpus}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for i, tk in toks.items():
        s = 0.0
        for t in query_terms:
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            tf = tk.count(t)
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
        scores[i] = s
    return scores, avgdl


class TestWordTokens:
    def test_lowercase_and_split(self, spark):
        df = spark.createDataFrame([("Hello, World-42!",)], "t string")
        out = df.select(word_tokens(F.col("t")).alias("tk")).collect()[0]["tk"]
        assert out == ["hello", "world", "42"]

    def test_empty_and_null(self, spark):
        df = spark.createDataFrame([("",), (None,)], "t string")
        rows = df.select(word_tokens(F.col("t")).alias("tk")).collect()
        assert rows[0]["tk"] == []
        assert rows[1]["tk"] is None


class TestBm25:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(DOCS, "doc_id long, text string")

    def test_corpus_stats(self, docs):
        st = bm25_corpus_stats(docs, "text", ["hash", "join", "tables"])
        assert st["n_docs"] == 5.0
        # df: hash in docs 1,2,5; join in 1,2; tables in 1,3
        assert st["df"] == [3.0, 2.0, 2.0]
        _, avgdl = _expected_bm25(DOCS, [])
        assert st["avgdl"] == pytest.approx(avgdl, abs=0)

    def test_scores_match_independent_formula(self, docs):
        exp, _ = _expected_bm25(DOCS, ["hash", "join"])
        got = {r["doc_id"]: r["score"]
               for r in bm25_topk(docs, "doc_id", "text",
                                  "hash join", k=10).collect()}
        # doc 4 has no query term -> excluded by score > 0
        assert set(got) == {i for i, s in exp.items() if s > 0}
        for i, s in got.items():
            assert s == pytest.approx(exp[i], rel=1e-12)

    def test_ranking_and_tiebreak(self, docs):
        rows = bm25_topk(docs, "doc_id", "text", "hash join", k=3).collect()
        assert [r["rank"] for r in rows] == [1, 2, 3]
        assert rows[0]["score"] >= rows[1]["score"] >= rows[2]["score"]

    def test_term_dedup_and_case(self, docs):
        a = bm25_topk(docs, "doc_id", "text", "Hash HASH hash", k=5).collect()
        b = bm25_topk(docs, "doc_id", "text", "hash", k=5).collect()
        assert [(r["doc_id"], r["score"]) for r in a] == \
               [(r["doc_id"], r["score"]) for r in b]

    def test_empty_query_raises(self, docs):
        with pytest.raises(ValueError):
            bm25_topk(docs, "doc_id", "text", "!!! ???")

    def test_plan_shape(self, docs):
        """Scoring pass is map-only: top-k plans as TakeOrderedAndProject
        (per-partition heap + driver merge), never a global sort, and the
        scored projection has no hash-partition Exchange."""
        plan = bm25_topk(docs, "doc_id", "text", "hash join",
                         k=5)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "Exchange hashpartitioning" not in plan
        assert "Sort " not in plan.replace("TakeOrdered", "")


class TestTokenStats:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(DOCS, "doc_id long, text string")

    def test_frequencies_and_tiebreak(self, docs):
        rows = token_frequencies(docs, "text", top_n=4).collect()
        # 'tables' x5, 'hash' x7... recount: doc1 tables(1)+doc3 tables(4)=5;
        # hash: doc1(1)+doc2(1)+doc5(5)=7; join: doc1(2)+doc2(2)=4; the: doc1(2)
        assert (rows[0]["token"], rows[0]["freq"]) == ("hash", 7)
        assert (rows[1]["token"], rows[1]["freq"]) == ("tables", 5)
        assert (rows[2]["token"], rows[2]["freq"]) == ("join", 4)
        assert [r["rank"] for r in rows] == [1, 2, 3, 4]
        # rank-4 tie at freq 2 broken by token asc
        assert rows[3]["token"] == min(
            t for t, f in [("a", 2), ("the", 2)] if f == 2)

    def test_corpus_stats_totals(self, docs):
        st = corpus_token_stats(docs, "text", top_n=1000)
        n_tokens = sum(len(__import__("re").findall(r"[a-z0-9]+", t.lower()))
                       for _, t in DOCS)
        assert st["n_tokens"] == float(n_tokens)
        assert st["top1_freq"] == 7.0
        assert st["top_n_mass"] == float(n_tokens)  # top_n covers all

    def test_corpus_drift_self_is_zero(self, spark):
        df = spark.createDataFrame(
            [(i, "alpha beta gamma words") for i in range(20)],
            "id long, text string")
        d = corpus_drift(df, df, "text", top_n=10)
        assert d["psi"] == 0.0 and d["l_infinity"] == 0.0
        assert d["n_tokens_a"] == d["n_tokens_b"] == 80.0

    def test_corpus_drift_detects_vocab_shift(self, spark):
        a = spark.createDataFrame(
            [(i, "alpha beta gamma common words") for i in range(20)],
            "id long, text string")
        b = spark.createDataFrame(
            [(i, "delta epsilon gamma common words") for i in range(20)],
            "id long, text string")
        d = corpus_drift(a, b, "text", top_n=10)
        # alpha/beta have p=0.2 in a, 0 in b -> exact L-inf
        assert d["l_infinity"] == pytest.approx(0.2, abs=1e-12)
        assert d["psi"] > 1.0
        top = {t for t, _, _ in d["top_drifted"][:4]}
        assert top == {"alpha", "beta", "delta", "epsilon"}
        # PSI matches an independent computation over the union + OTHER
        import math
        exp = 0.0
        for pa, pb in [(0.2, 1e-4), (0.2, 1e-4), (1e-4, 0.2), (1e-4, 0.2)]:
            exp += (pb - pa) * math.log(pb / pa)
        assert d["psi"] == pytest.approx(exp, rel=1e-12)

    def test_corpus_drift_other_bucket(self, spark):
        """top_n=1 folds everything but the head token into __OTHER__;
        totals must still be conserved exactly."""
        a = spark.createDataFrame(
            [(0, "x x x y z")], "id long, text string")
        b = spark.createDataFrame(
            [(0, "x x w w w")], "id long, text string")
        d = corpus_drift(a, b, "text", top_n=1)
        # union = {x, w} (side heads); y,z fold into a's OTHER
        assert d["union_size"] == 2.0
        assert d["other_a"] == 2.0 and d["other_b"] == 0.0
        assert d["n_tokens_a"] == 5.0 and d["n_tokens_b"] == 5.0

    def test_zipf_slope_on_synthetic_zipf(self, spark):
        # freq(rank r) = round(1000 / r) for 50 tokens -> slope near -1
        text = " ".join(f"tok{r:03d} " * round(1000 / r)
                        for r in range(1, 51))
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        st = corpus_token_stats(df, "text", top_n=50)
        assert st["zipf_slope"] == pytest.approx(-1.0, abs=0.05)


class TestQuantizedEmbeddings:
    def test_round_trip_and_cosine_error(self, spark):
        import numpy as np

        from deequ_spark.llm import (cosine_quantized,
                                     dequantize_embedding,
                                     quantize_embeddings)
        rng = np.random.default_rng(17)
        vecs = rng.standard_normal((50, 32))
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(50)],
            "id long, vec array<double>")
        q = quantize_embeddings(df, "vec")
        rows = q.collect()
        for r in rows:
            assert all(-127 <= x <= 127 for x in r["vec_q8"])
        # dequantized reconstruction error bounded by scale/2 per coord
        dq = q.select("id", "vec",
                      dequantize_embedding("vec_q8", "vec_scale")
                      .alias("back"), "vec_scale").collect()
        for r in dq:
            err = max(abs(a - b) for a, b in zip(r["vec"], r["back"]))
            assert err <= r["vec_scale"] / 2 + 1e-6
        # quantized cosine tracks exact cosine within 1e-2
        a = q.selectExpr("id AS ia", "vec AS va", "vec_q8 AS qa")
        b = q.selectExpr("id AS ib", "vec AS vb", "vec_q8 AS qb")
        pairs = a.join(b, F.col("ia") < F.col("ib")).limit(300)
        from deequ_spark.llm.similarity import cosine_similarity_expr
        got = pairs.select(
            cosine_similarity_expr(F.col("va"), F.col("vb")).alias("c"),
            cosine_quantized("qa", "qb").alias("cq")).collect()
        assert max(abs(r["c"] - r["cq"]) for r in got) < 1e-2

    def test_zero_vector(self, spark):
        from deequ_spark.llm import cosine_quantized, quantize_embeddings
        df = spark.createDataFrame([(1, [0.0, 0.0, 0.0]),
                                    (2, [1.0, 0.0, 0.0])],
                                   "id long, vec array<double>")
        q = quantize_embeddings(df, "vec").collect()
        z = {r["id"]: r for r in q}
        assert list(z[1]["vec_q8"]) == [0, 0, 0]
        assert z[1]["vec_scale"] == 0.0
        df2 = spark.createDataFrame(
            [(list(z[1]["vec_q8"]), list(z[2]["vec_q8"]))],
            "a array<tinyint>, b array<tinyint>")
        [r] = df2.select(cosine_quantized("a", "b").alias("c")).collect()
        assert r["c"] == 0.0

    def test_plan_stays_jvm(self, spark):
        from deequ_spark.llm import quantize_embeddings
        df = spark.createDataFrame([(1, [0.5, -0.25])],
                                   "id long, vec array<double>")
        out = quantize_embeddings(df, "vec")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Exchange" not in plan


class TestQuantizedProperty:
    def test_cosine_error_bounded_random_dims(self, spark):
        """Hypothesis: quantized cosine tracks exact cosine within 2e-2
        across random dimensions and magnitudes (scale invariance means
        wildly different vector norms must not hurt accuracy)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from deequ_spark.llm import cosine_quantized, quantize_embeddings
        from deequ_spark.llm.similarity import cosine_similarity_expr

        vec = st.lists(st.floats(min_value=-1e3, max_value=1e3,
                                 allow_nan=False, allow_infinity=False),
                       min_size=4, max_size=24)

        @given(st.lists(vec, min_size=2, max_size=4))
        @settings(max_examples=8, deadline=None)
        def check(vecs):
            import math
            dim = len(vecs[0])
            vecs = [v[:dim] + [0.0] * (dim - len(v)) if len(v) < dim
                    else v[:dim] for v in vecs]
            # skip degenerate all-tiny vectors (quantize to all-zero)
            vecs = [v for v in vecs if max(abs(x) for x in v) > 1e-6]
            if len(vecs) < 2:
                return
            df = spark.createDataFrame(
                [(i, v) for i, v in enumerate(vecs)],
                "id long, vec array<double>")
            q = quantize_embeddings(df, "vec")
            a = q.selectExpr("id AS ia", "vec AS va", "vec_q8 AS qa")
            b = q.selectExpr("id AS ib", "vec AS vb", "vec_q8 AS qb")
            got = (a.join(b, F.col("ia") < F.col("ib"))
                   .select(cosine_similarity_expr(F.col("va"),
                                                  F.col("vb")).alias("c"),
                           cosine_quantized("qa", "qb").alias("cq"))
                   .collect())
            for r in got:
                if r["c"] is not None and not math.isnan(r["c"]):
                    assert abs(r["c"] - r["cq"]) < 2e-2

        check()
