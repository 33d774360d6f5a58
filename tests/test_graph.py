"""Host link-graph analytics (deequ_spark/llm/graph.py): href
extraction, host-edge building, deterministic integer PageRank."""

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from deequ_spark.llm import extract_links, link_edges, pagerank


@pytest.fixture(scope="module")
def spark():
    return (SparkSession.builder.master("local[4]")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.ui.enabled", "false").getOrCreate())


class TestExtractLinks:
    def test_quote_styles_and_filters(self, spark):
        html = ("<a href='http://B.com/p'>x</a>"
                "<A HREF=\"https://a.com/q?x=1#frag\">y</A>"
                "<a class='z' href=bare.html>r</a>"
                "<a href='mailto:z@q.com'>m</a>")
        df = spark.createDataFrame([(html,)], "h string")
        [row] = df.select(extract_links("h").alias("l")).collect()
        assert row["l"] == ["http://B.com/p", "https://a.com/q?x=1",
                            "bare.html", "mailto:z@q.com"]

    def test_edges_absolute_http_only_no_self(self, spark):
        pages = spark.createDataFrame([
            ("http://a.com/x",
             "<a href='http://B.com/p'>x</a>"
             "<a href=\"https://a.com/self\">s</a>"      # self: out
             "<a href=/rel>r</a>"                        # relative: out
             "<a href='mailto:z@q.com'>m</a>"            # scheme: out
             "<a href='http://c.com/#f'>c</a>"),
            ("http://a.com/y",
             "<a href='http://b.com/other'>dup edge</a>")],
            "url string, html string")
        e = sorted(tuple(x) for x in
                   link_edges(pages, "url", "html").collect())
        # (a,b) appears once despite two pages linking b
        assert e == [("a.com", "b.com"), ("a.com", "c.com")]


class TestPagerank:
    EDGES = [("A", "B"), ("B", "C"), ("C", "A"), ("D", "A")]

    def test_two_iterations_hand_computed(self, spark):
        """micro=1e6, d=85: iter1 A=1850000,B=1000000,C=1000000,
        D=150000; iter2 A=1127500,B=1722500,C=1000000,D=150000 —
        integer division at every step, computed by hand."""
        edges = spark.createDataFrame(self.EDGES,
                                      "src_host string, dst_host string")
        r = {x["node"]: x["rank_micro"] for x in
             pagerank(edges, iterations=2).collect()}
        assert r == {"A": 1127500, "B": 1722500,
                     "C": 1000000, "D": 150000}

    def test_bit_identical_across_partitionings(self, spark):
        """The reproducibility claim: integer sums are order-free, so
        1 partition and 16 partitions give BYTE-identical ranks (a
        float PageRank differs in the last ulps)."""
        import random
        rng = random.Random(7)
        edges = [(f"h{rng.randrange(40)}", f"h{rng.randrange(40)}")
                 for _ in range(300)]
        edges = [(s, d) for s, d in edges if s != d]
        df = spark.createDataFrame(edges,
                                   "src_host string, dst_host string")
        r1 = {x["node"]: x["rank_micro"] for x in
              pagerank(df.coalesce(1), iterations=3).collect()}
        r16 = {x["node"]: x["rank_micro"] for x in
               pagerank(df.repartition(16), iterations=3).collect()}
        assert r1 == r16

    def test_duplicate_edges_count_once(self, spark):
        dup = spark.createDataFrame(self.EDGES + [("D", "A")] * 5,
                                    "src_host string, dst_host string")
        base = spark.createDataFrame(self.EDGES,
                                     "src_host string, dst_host string")
        assert sorted(map(tuple, pagerank(dup, 2).collect())) == \
            sorted(map(tuple, pagerank(base, 2).collect()))

    def test_dangling_mass_leaks_not_crashes(self, spark):
        """E has only in-links (dangling): its rank accrues but is not
        redistributed — documented semantics."""
        edges = spark.createDataFrame([("A", "E"), ("B", "E")],
                                      "src_host string, dst_host string")
        r = {x["node"]: x["rank_micro"] for x in
             pagerank(edges, iterations=1).collect()}
        assert r["E"] == 150000 + (85 * 2_000_000) // 100
        assert r["A"] == 150000 and r["B"] == 150000

    def test_damping_guard(self, spark):
        edges = spark.createDataFrame(self.EDGES,
                                      "src_host string, dst_host string")
        with pytest.raises(ValueError, match="damping_pct"):
            pagerank(edges, damping_pct=150)

    def test_plan_no_cartesian(self, spark):
        edges = spark.createDataFrame(self.EDGES,
                                      "src_host string, dst_host string")
        out = pagerank(edges, iterations=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # localCheckpoint per iteration keeps the final plan flat —
        # a scan over the checkpointed RDD, not k stacked joins
        assert "CartesianProduct" not in plan


class TestAnchorTexts:
    def test_extraction_strips_markup_and_filters(self, spark):
        from deequ_spark.llm import anchor_texts
        pages = spark.createDataFrame([
            ("http://src.com/a",
             '<a href="http://t1.com/x">Great <b>Docs</b></a>'
             "<a href='http://t2.com/y'>cheap   pills</a>"
             '<a href="mailto:x@y.com">mail</a>'
             '<a href="/rel">rel</a>'
             '<a href="http://src.com/self">self</a>'
             '<a href="http://t1.com/z"></a>')],
            "url string, html string")
        rows = sorted(tuple(r) for r in
                      anchor_texts(pages, "url", "html").collect())
        assert rows == [("src.com", "t1.com", "Great Docs"),
                        ("src.com", "t2.com", "cheap pills")]

    def test_term_profile_rank_deterministic(self, spark):
        from deequ_spark.llm import anchor_term_profile
        anchors = spark.createDataFrame(
            [("s", "h.com", "alpha beta"), ("s", "h.com", "beta gamma"),
             ("s", "h.com", "beta alpha")],
            "src_host string, dst_host string, anchor string")
        got = [(r["term"], r["n"], r["rank"]) for r in
               anchor_term_profile(anchors, top_k=2)
               .orderBy("rank").collect()]
        # beta x3 first; alpha x2 beats gamma x1
        assert got == [("beta", 3, 1), ("alpha", 2, 2)]

    def test_plan_stays_jvm_side(self, spark):
        from deequ_spark.llm import anchor_texts
        from deequ_spark.diagnostics import plan_report
        pages = spark.createDataFrame(
            [("http://a.com/", '<a href="http://b.com/">x</a>')],
            "url string, html string")
        rep = plan_report(anchor_texts(pages, "url", "html"))
        assert rep["python_row_udfs"] == 0 and rep["arrow_python"] == 0

    def test_anchor_entities_decoded(self, spark):
        from deequ_spark.llm import anchor_term_profile, anchor_texts
        pages = spark.createDataFrame(
            [("http://s.com/", '<a href="http://t.com/">Tips &amp; '
                               "Tricks</a>")],
            "url string, html string")
        a = anchor_texts(pages, "url", "html")
        [row] = a.collect()
        assert row["anchor"] == "Tips & Tricks"
        terms = {r["term"] for r in anchor_term_profile(a).collect()}
        assert terms == {"tips", "tricks"}  # no 'amp' pollution
