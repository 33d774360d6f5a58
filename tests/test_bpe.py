"""BPE tokenizer training (deequ_spark/llm/bpe.py) — Sennrich
word-frequency formulation, one corpus pass + driver loop."""

import random

import pytest

from deequ_spark.llm import (bpe_encode_word, bpe_token_count, train_bpe,
                             word_frequency_table)
from deequ_spark.llm.bpe import END, _merge_vocab


@pytest.fixture(scope="module")
def sennrich(spark):
    """The classic example: low x5, lower x2, newest x6, widest x3."""
    return spark.createDataFrame(
        [(i, " ".join([w] * n)) for i, (w, n) in enumerate(
            (("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)))],
        "id long, text string")


class TestTrainBpe:
    def test_classic_merge_sequence(self, sennrich):
        merges = train_bpe(sennrich, "text", n_merges=5)
        # hand-derived: es(9), est(9), est</w>(9), lo(7), low(7)
        assert merges == [("e", "s"), ("es", "t"), ("est", END),
                          ("l", "o"), ("lo", "w")]

    def test_word_frequency_table(self, sennrich):
        freq = {r["word"]: r["count"] for r in
                word_frequency_table(sennrich, "text").collect()}
        assert freq == {"low": 5, "lower": 2, "newest": 6, "widest": 3}

    def test_min_pair_count_stops_early(self, spark):
        docs = spark.createDataFrame([(0, "ab cd ef")],
                                     "id long, text string")
        # every pair occurs once -> nothing reaches min_pair_count=2
        assert train_bpe(docs, "text", n_merges=10) == []

    def test_deterministic_tie_break(self, spark):
        # 'xy' and 'ab' both occur 3 times -> lexicographic pair order
        docs = spark.createDataFrame([(0, "xy xy xy ab ab ab")],
                                     "id long, text string")
        merges = train_bpe(docs, "text", n_merges=1)
        assert merges == [("a", "b")]


class TestEncode:
    def test_generalizes_to_unseen_words(self, sennrich):
        merges = train_bpe(sennrich, "text", n_merges=10)
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        assert bpe_encode_word("lowest", ranks) == ["low", "est" + END]

    def test_round_trip_reconstruction(self, sennrich):
        merges = train_bpe(sennrich, "text", n_merges=10)
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        for w in ("low", "lower", "newest", "widest", "lowest", "zq"):
            assert "".join(bpe_encode_word(w, ranks)) == w + END

    def test_encoder_matches_trainer_segmentation(self, spark):
        """Greedy lowest-rank encoding must reproduce the trainer's own
        segmentation of every trained word — the standard BPE
        trainer/encoder agreement, fuzzed over random corpora."""
        rng = random.Random(13)
        for trial in range(5):
            words = ["".join(rng.choice("abcd") for _ in range(
                rng.randint(2, 6))) for _ in range(12)]
            text = " ".join(w for w in words
                            for _ in range(rng.randint(1, 5)))
            docs = spark.createDataFrame([(0, text)],
                                         "id long, text string")
            merges = train_bpe(docs, "text", n_merges=15,
                               min_pair_count=2)
            ranks = {tuple(p): i for i, p in enumerate(merges)}
            # trainer-side segmentation: replay merges in order
            vocab = {tuple(w) + (END,): 1 for w in set(words)}
            for pair in merges:
                vocab = _merge_vocab(vocab, pair)
            trained = {"".join(s).replace(END, ""): list(s)
                       for s in vocab}
            for w in set(words):
                assert bpe_encode_word(w, ranks) == trained[w], \
                    (trial, w, merges)


class TestTokenCount:
    def test_counts_under_trained_tokenizer(self, sennrich):
        merges = train_bpe(sennrich, "text", n_merges=10)
        got = {r["id"]: r["bpe_tokens"] for r in
               bpe_token_count(sennrich, "text", merges).collect()}
        # low x5 -> 1 tok each; lower x2 -> low+e+r+</w> = 4 each;
        # newest x6 -> 1 each; widest x3 -> w+i+dest</w> = 3 each
        assert got == {0: 5, 1: 8, 2: 6, 3: 9}

    def test_null_text_counts_zero(self, spark):
        docs = spark.createDataFrame([(0, None), (1, "a a")],
                                     "id long, text string")
        merges = [("a", END)]
        got = {r["id"]: r["bpe_tokens"] for r in
               bpe_token_count(docs, "text", merges).collect()}
        assert got[0] == 0 and got[1] == 2


class TestTrainTraced:
    def test_return_counts_matches_merges(self, spark):
        df = spark.createDataFrame(
            [("low low low lower lowest new newer",),
             ("newer newer wider low new",)], "text string")
        from deequ_spark.llm.bpe import train_bpe
        merges = train_bpe(df, "text", n_merges=4)
        traced = train_bpe(df, "text", n_merges=4, return_counts=True)
        assert [(a, b) for a, b, _ in traced] == merges
        assert traced[0] == ("l", "o", 6)
        assert traced[1] == ("lo", "w", 6)
        # counts are non-increasing only per greedy argmax within a
        # step, not globally — but every count respects min_pair_count
        assert all(c >= 2 for _, _, c in traced)


class TestIdsRoundTrip:
    def test_encode_decode_round_trip(self, spark):
        from deequ_spark.llm import (bpe_decode_ids, bpe_encode_ids,
                                     bpe_vocab, train_bpe)
        corpus = spark.createDataFrame(
            [("low low low lower lowest new newer",),
             ("newer newer wider low new",)], "text string")
        merges = train_bpe(corpus, "text", n_merges=20)
        enc = bpe_encode_ids(corpus, "text", merges)
        out = enc.select(
            "text", bpe_decode_ids("token_ids", merges).alias("back"))
        for r in out.collect():
            assert r["back"] == r["text"]          # already lowercase

    def test_ids_deterministic_and_bounded(self, spark):
        from deequ_spark.llm import bpe_encode_ids, bpe_vocab, train_bpe
        corpus = spark.createDataFrame(
            [("aa ab aa ab ba",), ("aa aa ba ba",)], "text string")
        merges = train_bpe(corpus, "text", n_merges=6)
        vocab = bpe_vocab(merges)
        rows = bpe_encode_ids(corpus, "text", merges).collect()
        for r in rows:
            assert all(0 <= i < len(vocab) for i in r["token_ids"])
        # same corpus, second run: identical ids (stable vocab order)
        rows2 = bpe_encode_ids(corpus, "text", merges).collect()
        assert [list(r["token_ids"]) for r in rows] == \
            [list(r["token_ids"]) for r in rows2]

    def test_unknown_chars_map_to_unk(self, spark):
        """Printable ASCII always encodes (default base alphabet);
        out-of-alphabet characters become <unk>."""
        from deequ_spark.llm import bpe_decode_ids, bpe_encode_ids, train_bpe
        corpus = spark.createDataFrame([("abc abc abd",)], "text string")
        merges = train_bpe(corpus, "text", n_merges=5)
        novel = spark.createDataFrame([("abc xyz caf\u00e9",)],
                                      "text string")
        enc = bpe_encode_ids(novel, "text", merges)
        [r] = enc.select(bpe_decode_ids("token_ids", merges)
                         .alias("back")).collect()
        assert r["back"].startswith("abc xyz caf")   # ASCII survives
        assert "\ufffd" in r["back"]                  # é -> unk

    def test_vocab_convention(self, spark):
        from deequ_spark.llm import bpe_vocab
        v = bpe_vocab([("a", "b"), ("ab", "c</w>")])
        assert v["<unk>"] == 0 and v["</w>"] == 1
        # base chars sorted, then merge products in merge order
        assert v["a"] < v["b"] < v["c"]
        assert v["ab"] < v["abc</w>"]
        assert v["abc</w>"] == len(v) - 1
        # END never leaks single characters into the base alphabet:
        # ids are contiguous and the two merge products are the last two
        assert sorted(v.values()) == list(range(len(v)))


class TestBpeProperty:
    def test_round_trip_random_ascii_corpora(self, spark):
        """Hypothesis: decode(encode(x)) == normalized x for random
        printable-ASCII corpora across merge counts — pins the id
        convention, the greedy encoder, and the expression decoder
        together against arbitrary content."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from pyspark.sql import functions as F

        from deequ_spark.llm import (bpe_decode_ids, bpe_encode_ids,
                                     train_bpe)

        word = st.text(alphabet="abcdxy.!", min_size=1, max_size=6)
        doc = st.builds(" ".join, st.lists(word, min_size=1, max_size=12))

        @given(st.lists(doc, min_size=1, max_size=6),
               st.integers(min_value=0, max_value=25))
        @settings(max_examples=7, deadline=None)
        def check(docs_txt, n_merges):
            df = spark.createDataFrame(
                [(i, t) for i, t in enumerate(docs_txt)],
                "id long, text string")
            merges = train_bpe(df, "text", n_merges=n_merges,
                               min_pair_count=2)
            enc = bpe_encode_ids(df, "text", merges)
            out = enc.select(
                F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
                .alias("norm"),
                bpe_decode_ids("token_ids", merges).alias("back"))
            for r in out.collect():
                assert r["back"] == r["norm"]

        check()
