"""Property-based tests (hypothesis) for the mergeable-state algebra and
sketches — SURVEY §5 point (d): ``metric(merge(state(A), state(B))) ==
metric(state(A ∪ B))`` for arbitrary partitions of arbitrary data, plus
associativity/commutativity, KLL rank-error contracts, and interval
strategy invariants. Pure Python — no SparkSession needed, so these run
in milliseconds and explore thousands of inputs.

Reference parity: the reference asserts merge==recompute only on fixed
fixtures (StateAggregationIntegrationTest.scala); property testing is
strictly stronger.
"""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deequ_spark.analyzers.base import (CorrelationState, FourthMomentState,
                                        MaxState, MeanState, MinState,
                                        NumMatches, NumMatchesAndCount,
                                        StandardDeviationState, SumState,
                                        ThirdMomentState)

finite = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                   allow_infinity=False)
datasets = st.lists(finite, min_size=1, max_size=60)


def mean_state(xs):
    return MeanState(sum(xs), len(xs))


def stddev_state(xs):
    n = len(xs)
    avg = sum(xs) / n
    return StandardDeviationState(n, avg, sum((x - avg) ** 2 for x in xs))


def third_state(xs):
    n = len(xs)
    avg = sum(xs) / n
    return ThirdMomentState(n, avg, sum((x - avg) ** 2 for x in xs),
                            sum((x - avg) ** 3 for x in xs))


def fourth_state(xs):
    n = len(xs)
    avg = sum(xs) / n
    return FourthMomentState(n, avg,
                             sum((x - avg) ** 2 for x in xs),
                             sum((x - avg) ** 3 for x in xs),
                             sum((x - avg) ** 4 for x in xs))


def corr_state(pairs):
    n = len(pairs)
    xa = sum(p[0] for p in pairs) / n
    ya = sum(p[1] for p in pairs) / n
    return CorrelationState(
        n, xa, ya,
        sum((p[0] - xa) * (p[1] - ya) for p in pairs),
        sum((p[0] - xa) ** 2 for p in pairs),
        sum((p[1] - ya) ** 2 for p in pairs))


def close(a, b, tol=1e-6):
    return math.isclose(a, b, rel_tol=tol, abs_tol=tol)


class TestMergeEqualsRecompute:
    """Partition-invariance: state(A) ⊕ state(B) ≡ state(A ∪ B)."""

    @given(datasets, datasets)
    @settings(max_examples=300, deadline=None)
    def test_mean(self, a, b):
        merged = mean_state(a).merge(mean_state(b))
        assert close(merged.metric_value, mean_state(a + b).metric_value)

    @given(datasets, datasets)
    @settings(max_examples=300, deadline=None)
    def test_variance_parallel_welford(self, a, b):
        merged = stddev_state(a).merge(stddev_state(b))
        whole = stddev_state(a + b)
        # m2 is a sum of squares — compare with a scale-relative tolerance
        scale = max(abs(whole.m2), 1.0)
        assert abs(merged.m2 - whole.m2) <= 1e-7 * scale
        assert close(merged.n, whole.n) and close(merged.avg, whole.avg,
                                                  tol=1e-7)

    @given(datasets, datasets)
    @settings(max_examples=300, deadline=None)
    def test_third_moment(self, a, b):
        merged = third_state(a).merge(third_state(b))
        whole = third_state(a + b)
        # m3 suffers catastrophic cancellation for near-symmetric data;
        # what matters downstream is skewness = √n·m3/m2^1.5, so condition
        # the tolerance on the denominator's magnitude
        scale = max(abs(whole.m3), abs(merged.m3), whole.m2 ** 1.5, 1.0)
        assert abs(merged.m3 - whole.m3) <= 1e-9 * scale

    @given(datasets, datasets)
    @settings(max_examples=300, deadline=None)
    def test_fourth_moment(self, a, b):
        merged = fourth_state(a).merge(fourth_state(b))
        whole = fourth_state(a + b)
        # kurtosis = n·m4/m2² — condition on the denominator's magnitude
        scale = max(abs(whole.m4), abs(merged.m4), whole.m2 ** 2, 1.0)
        assert abs(merged.m4 - whole.m4) <= 1e-9 * scale

    @given(st.lists(st.tuples(finite, finite), min_size=2, max_size=60),
           st.lists(st.tuples(finite, finite), min_size=2, max_size=60))
    @settings(max_examples=300, deadline=None)
    def test_correlation(self, a, b):
        merged = corr_state(a).merge(corr_state(b))
        whole = corr_state(a + b)
        # correlation = ck/√(x_mk·y_mk) — condition on that denominator,
        # plus an absolute term for cancellation dust that scales with the
        # magnitude of the means (ulp of (x−x̄)(y−ȳ) products)
        denom = max((whole.x_mk * whole.y_mk) ** 0.5, 1.0)
        dust = 1e-9 * (abs(whole.x_avg) + 1.0) * (abs(whole.y_avg) + 1.0)
        for f in ("ck", "x_mk", "y_mk"):
            scale = max(abs(getattr(whole, f)), denom, 1.0)
            assert abs(getattr(merged, f) - getattr(whole, f)) \
                <= 1e-6 * scale + dust

    @given(datasets, datasets)
    @settings(max_examples=200, deadline=None)
    def test_min_max_sum_counts(self, a, b):
        assert MinState(min(a)).merge(MinState(min(b))).min_value == min(a + b)
        assert MaxState(max(a)).merge(MaxState(max(b))).max_value == max(a + b)
        assert close(SumState(sum(a)).merge(SumState(sum(b))).sum_value,
                     sum(a + b), tol=1e-9)
        nm = NumMatches(len(a)).merge(NumMatches(len(b)))
        assert nm.num_matches == len(a) + len(b)
        nmc = (NumMatchesAndCount(len(a) // 2, len(a))
               .merge(NumMatchesAndCount(len(b) // 2, len(b))))
        assert nmc.count == len(a) + len(b)


class TestMergeAlgebra:
    """The states form a commutative semigroup — order and grouping of
    partitions must not change the result (this is what makes the
    streaming/incremental path correct for ANY partitioning)."""

    @given(datasets, datasets, datasets)
    @settings(max_examples=200, deadline=None)
    def test_associative_commutative_stddev(self, a, b, c):
        sa, sb, sc = stddev_state(a), stddev_state(b), stddev_state(c)
        left = sa.merge(sb).merge(sc)
        right = sa.merge(sb.merge(sc))
        swapped = sc.merge(sb).merge(sa)
        for other in (right, swapped):
            scale = max(abs(left.m2), 1.0)
            assert abs(left.m2 - other.m2) <= 1e-6 * scale
            assert close(left.n, other.n)
            assert close(left.avg, other.avg, tol=1e-6)


class TestKLLProperties:
    @given(st.lists(finite, min_size=10, max_size=400),
           st.integers(min_value=1, max_value=9))
    @settings(max_examples=100, deadline=None)
    def test_quantile_rank_error(self, xs, decile):
        import numpy as np

        from deequ_spark.analyzers.kll import KLLSketchCore
        sk = KLLSketchCore(k=256)
        sk.update_batch(np.array(xs, dtype=np.float64))
        q = decile / 10
        est = sk.quantile(q)
        srt = sorted(xs)
        # two-sided rank band — duplicates make the ≤-rank jump, so the
        # correct contract is: strict-rank − ε ≤ q ≤ ≤-rank + ε
        lo_rank = sum(1 for v in srt if v < est) / len(srt)
        hi_rank = sum(1 for v in srt if v <= est) / len(srt)
        assert lo_rank - 0.15 <= q <= hi_rank + 0.15
        assert srt[0] <= est <= srt[-1]

    @given(st.lists(finite, min_size=5, max_size=200),
           st.lists(finite, min_size=5, max_size=200))
    @settings(max_examples=100, deadline=None)
    def test_merge_conserves_mass_and_bounds(self, a, b):
        import numpy as np

        from deequ_spark.analyzers.kll import KLLSketchCore
        sa, sb = KLLSketchCore(k=128), KLLSketchCore(k=128)
        sa.update_batch(np.array(a, dtype=np.float64))
        sb.update_batch(np.array(b, dtype=np.float64))
        merged = sa.merge(sb)
        assert merged.count == len(a) + len(b)
        assert merged.min_value == min(a + b)
        assert merged.max_value == max(a + b)


class TestIntervalProperties:
    @given(st.floats(min_value=0.01, max_value=0.99),
           st.integers(min_value=2, max_value=10**6))
    @settings(max_examples=300, deadline=None)
    def test_interval_brackets_p(self, p, n):
        from deequ_spark import WaldIntervalStrategy, WilsonScoreIntervalStrategy
        for strat in (WaldIntervalStrategy(), WilsonScoreIntervalStrategy()):
            iv = strat.calculate_target_confidence_interval(p, n)
            # rounding is DOWN for lower / UP for upper, so the interval
            # always brackets the point estimate
            assert iv.lower_bound <= p + 1e-9
            assert iv.upper_bound >= p - 1e-9
            assert iv.lower_bound <= iv.upper_bound

    @given(st.floats(min_value=0.05, max_value=0.95))
    @settings(max_examples=100, deadline=None)
    def test_wald_narrows_with_n(self, p):
        from deequ_spark import WaldIntervalStrategy
        w = WaldIntervalStrategy()
        small = w.calculate_target_confidence_interval(p, 50)
        big = w.calculate_target_confidence_interval(p, 50_000)
        assert (big.upper_bound - big.lower_bound) <= \
            (small.upper_bound - small.lower_bound) + 1e-9


class TestMinHashProperty:
    """Carter-Wegman minhash agreement rate estimates Jaccard — checked
    driver-side with the same P31 hash family the Spark expressions use."""

    @given(st.sets(st.integers(min_value=0, max_value=10**6), min_size=5,
                   max_size=80),
           st.sets(st.integers(min_value=0, max_value=10**6), min_size=5,
                   max_size=80))
    @settings(max_examples=60, deadline=None)
    def test_signature_agreement_tracks_jaccard(self, sa, sb):
        import random
        P31 = (1 << 31) - 1
        rng = random.Random(0x5EED)
        coeffs = [(rng.randrange(1, P31), rng.randrange(P31))
                  for _ in range(256)]

        def sig(items):
            return [min((a * (h % P31) + b) % P31 for h in items)
                    for a, b in coeffs]

        true_j = len(sa & sb) / len(sa | sb)
        agree = sum(x == y for x, y in zip(sig(sa), sig(sb))) / 256
        # 256 hashes → standard error ≤ 0.031; 6σ band
        assert abs(agree - true_j) <= 0.2


class TestParagraphDedupModel:
    """paragraph_dedup (llm/text.py) vs a pure-Python keep-first model:
    scanning documents in ascending id and paragraphs in order, the
    first sighting of each candidate paragraph survives and every later
    sighting is cut — exactly the distributed min-(id,pos) winner rule."""

    @given(st.lists(
        st.lists(st.sampled_from(["aaa", "bbb", "ccc", "dd", "e", "ffff"]),
                 min_size=1, max_size=5),
        min_size=1, max_size=7))
    @settings(max_examples=6, deadline=None)
    def test_matches_sequential_model(self, spark, corpora):
        from deequ_spark.llm import paragraph_dedup
        min_chars = 2
        sep = "\n\n"
        docs = [(i, sep.join(paras)) for i, paras in enumerate(corpora)]
        seen, expected = set(), {}
        for i, _ in docs:
            kept, removed = [], 0
            # NOTE: split/join round-trip, so re-split the joined text —
            # identical to what the operator sees
            for p in docs[i][1].split(sep):
                if len(p) < min_chars:
                    kept.append(p)
                elif p in seen:
                    removed += 1
                else:
                    seen.add(p)
                    kept.append(p)
            expected[i] = (sep.join(kept), removed)
        df = spark.createDataFrame(docs, "id long, text string")
        got = {r["id"]: (r["deduped"], r["n_removed"])
               for r in paragraph_dedup(df, "id", "text", sep=sep,
                                        min_chars=min_chars).collect()}
        assert got == expected


class TestDistanceMetricProperties:
    """distance.py PSI / L-inf invariants (exercised corpus-wide by
    llm/search.py corpus_drift)."""

    counts = st.dictionaries(
        st.sampled_from(list("abcdefgh")),
        st.integers(min_value=0, max_value=1000),
        min_size=1, max_size=8)

    @given(counts, counts)
    @settings(max_examples=200, deadline=None)
    def test_psi_nonnegative_and_symmetric(self, a, b):
        from deequ_spark.distance import psi
        if sum(a.values()) == 0 or sum(b.values()) == 0:
            return  # defined as inf; not a drift measurement
        ab, ba = psi(a, b), psi(b, a)
        # each term (pb-pa)*ln(pb/pa) has matching signs -> >= 0
        assert ab >= -1e-12
        assert ab == pytest.approx(ba, rel=1e-9, abs=1e-12)

    @given(counts)
    @settings(max_examples=100, deadline=None)
    def test_self_distance_zero(self, a):
        from deequ_spark.distance import l_infinity_distance, psi
        if sum(a.values()) == 0:
            return
        assert psi(a, a) == 0.0
        assert l_infinity_distance(a, a) == 0.0

    @given(counts, counts)
    @settings(max_examples=200, deadline=None)
    def test_linf_bounded(self, a, b):
        from deequ_spark.distance import l_infinity_distance
        d = l_infinity_distance(a, b)
        assert 0.0 <= d <= 1.0


# ---------------------------------------------------------------------------
# similarity-join signature soundness (deequ_spark/linkage.py)
# ---------------------------------------------------------------------------

def _lev_py(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _del_variants_py(s: str, k: int) -> set:
    """Python model of linkage._deletion_variants (FastSS)."""
    out = {s}
    if k >= 1:
        out |= {s[:i] + s[i + 1:] for i in range(len(s))}
    if k >= 2:
        out |= {s[:i] + s[i + 1:j] + s[j + 1:]
                for i in range(len(s) - 1) for j in range(i + 1, len(s))}
    return out


def _seg_geometry_py(l: int, i: int, k: int):
    base, rem = divmod(l, k + 1)
    cut = k + 1 - rem
    if i < cut:
        return i * base, base
    return i * base + (i - cut), base + 1


def _index_keys_py(s: str, k: int) -> set:
    l = len(s)
    if l >= k + 1:
        out = set()
        for i in range(k + 1):
            start, ln = _seg_geometry_py(l, i, k)
            out.add((s[start:start + ln], i, l))
        return out
    return {("", -1, l)}


def _probe_keys_py(t: str, k: int) -> set:
    m = len(t)
    out = set()
    for l in range(max(k + 1, m - k), m + k + 1):
        for i in range(k + 1):
            start, ln = _seg_geometry_py(l, i, k)
            for p in range(max(0, start - k), min(m - ln, start + k) + 1):
                out.add((t[p:p + ln], i, l))
    for l in range(max(0, m - k), min(k, m + k) + 1):
        out.add(("", -1, l))
    return out


short_strings = st.text(alphabet="ab", max_size=8)


class TestSimilaritySignatureSoundness:
    """The property the EXACTNESS of both joins rests on: any pair
    within the distance threshold shares at least one signature, for
    every string pair, so blocking can never lose a true pair."""

    @given(short_strings, short_strings, st.integers(0, 2))
    @settings(max_examples=1000, deadline=None)
    def test_deletion_variants_sound(self, s, t, k):
        if _lev_py(s, t) <= k:
            assert _del_variants_py(s, k) & _del_variants_py(t, k)

    @given(short_strings, short_strings, st.integers(0, 3))
    @settings(max_examples=1000, deadline=None)
    def test_segment_keys_sound(self, s, t, k):
        # self-join generates BOTH directions; soundness needs only one
        if _lev_py(s, t) <= k:
            assert (_index_keys_py(s, k) & _probe_keys_py(t, k)) or \
                   (_index_keys_py(t, k) & _probe_keys_py(s, k))

    @given(short_strings, st.integers(1, 2))
    @settings(max_examples=500, deadline=None)
    def test_deletion_variant_count_bound(self, s, k):
        # |variants| <= 1 + n + n(n-1)/2 — the O(n^k) budget the auto
        # method gate relies on
        n = len(s)
        bound = 1 + n + (n * (n - 1) // 2 if k >= 2 else 0)
        assert len(_del_variants_py(s, k)) <= bound


def test_spark_signatures_match_python_model(spark):
    """Bridge: the Spark expressions produce EXACTLY the Python model's
    signatures, so the pure-Python property sweep above speaks for the
    Spark implementation."""
    from pyspark.sql import functions as F
    from deequ_spark.linkage import (_deletion_variants, _index_keys,
                                     _probe_keys)
    fixtures = ["", "a", "ab", "aba", "abcd", "aaaa", "Customer#01",
                "xyzzy", "ababab", "ü日本b"]
    df = spark.createDataFrame([(s,) for s in fixtures], "s string")
    for k in (0, 1, 2):
        rows = df.select(
            "s", _deletion_variants(F.col("s"), k).alias("d"),
            _index_keys(F.col("s"), k).alias("ik"),
            _probe_keys(F.col("s"), k).alias("pk")).collect()
        for r in rows:
            s = r["s"]
            assert set(r["d"]) == _del_variants_py(s, k), (s, k)
            assert {tuple(x) for x in r["ik"]} == _index_keys_py(s, k), \
                (s, k)
            assert {tuple(x) for x in r["pk"]} == _probe_keys_py(s, k), \
                (s, k)


class TestMediaWalkerProperties:
    """Hypothesis equivalence of the byte-stream walkers against
    independent pure-Python reference models — random fixtures cover
    the run-length/chunk-map/encoding corners hand fixtures miss."""

    def test_mp3_vbr_walk_matches_closed_form(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st
        from deequ_spark.llm import encode_mp3_vbr, mp3_frames

        legal = [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                 256, 320]

        @settings(max_examples=60, deadline=None)
        @given(st.lists(st.sampled_from(legal), min_size=1, max_size=20),
               st.integers(0, 40))
        def check(rates, id3):
            blob = encode_mp3_vbr(rates, id3_payload=id3)
            got = list(mp3_frames(blob))
            assert [g[2] for g in got] == rates
            # closed form: 48 kHz MPEG1 frame = 3*kbps bytes, pad-free
            off = (10 + id3) if id3 else 0
            for j, g in enumerate(got):
                assert g[:2] == (j, off)
                assert g[3:] == (48000, 3 * rates[j], 1152)
                off += 3 * rates[j]

        check()

    def test_mp4_stbl_walk_matches_reference_model(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st
        from deequ_spark.llm import encode_mp4_samples, mp4_samples

        @settings(max_examples=60, deadline=None)
        @given(st.integers(1, 24).flatmap(lambda n: st.tuples(
            st.lists(st.integers(1, 500), min_size=n, max_size=n),
            st.lists(st.integers(1, 2000), min_size=n, max_size=n),
            st.sets(st.integers(1, n)),
            st.integers(1, 5))))
        def check(case):
            sizes, deltas, sync, chunk = case
            blob = encode_mp4_samples(sizes, deltas,
                                      sync_samples=sorted(sync) or None,
                                      chunk_size=chunk, timescale=1000)
            got = list(mp4_samples(blob))
            assert len(got) == len(sizes)
            base = blob.find(b"mdat") + 4
            off, dts = base, 0
            for j, g in enumerate(got):
                want_sync = (j + 1) in sync if sync else True
                assert g == (1, j, off, sizes[j], dts, deltas[j],
                             want_sync)
                off += sizes[j]
                dts += deltas[j]

        check()

    def test_gif_animation_matches_numpy_compositor(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st
        import numpy as np
        from deequ_spark.llm import decode_gif_frames, encode_gif_animation

        frame_st = st.tuples(
            st.integers(1, 200),       # grey value
            st.integers(0, 5), st.integers(0, 5),  # left, top
            st.integers(0, 3),         # disposal
            st.integers(0, 99),        # delay
            st.booleans())             # transparent top row

        @settings(max_examples=40, deadline=None)
        @given(st.lists(frame_st, min_size=1, max_size=6))
        def check(frames):
            spec = []
            for v, left, top, disp, delay, transp in frames:
                mask = None
                if transp:
                    mask = np.zeros((3, 3), bool)
                    mask[0, :] = True
                spec.append({"patch": np.full((3, 3, 3), v, np.uint8),
                             "left": left, "top": top, "disposal": disp,
                             "delay_cs": delay, "transparent_mask": mask})
            got = decode_gif_frames(encode_gif_animation((8, 8), spec))
            # independent reference compositor
            canvas = np.zeros((8, 8, 3), np.uint8)
            for k, (v, left, top, disp, delay, transp) in \
                    enumerate(frames):
                snap = canvas.copy()
                rows = range(1, 3) if transp else range(3)
                for r in rows:
                    canvas[top + r, left:left + 3] = v
                assert got[k]["delay_cs"] == delay
                assert got[k]["disposal"] == disp
                assert np.array_equal(got[k]["canvas"], canvas), k
                if disp == 2:
                    canvas[top:top + 3, left:left + 3] = 0
                elif disp == 3:
                    canvas = snap

        check()

    def test_id3_round_trip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st
        from deequ_spark.llm import encode_id3v2, parse_id3_frames

        ids = st.sampled_from(["TIT2", "TPE1", "TALB", "TYER", "TCON"])
        text = st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x24F),
            min_size=0, max_size=40)

        @settings(max_examples=60, deadline=None)
        @given(st.integers(3, 4), st.integers(0, 30),
               st.lists(st.tuples(ids, text), min_size=1, max_size=5))
        def check(version, padding, frames):
            spec = []
            for fid, t in frames:
                # v2.3 has no utf-8 encoding byte; latin-1 only fits
                # codepoints < 256 — pick per string
                if version == 4:
                    enc = 3
                elif all(ord(c) < 256 for c in t):
                    enc = 0
                else:
                    enc = 1
                spec.append((fid, t, enc))
            tag = encode_id3v2(spec, version=version, padding=padding)
            got = parse_id3_frames(tag + b"\xffrest-of-stream")
            # parser strips trailing NULs (spec padding convention)
            want = [(fid, t.rstrip("\x00")) for fid, t, _ in spec]
            assert got == want

        check()


class TestArchiveWalkerProperties:
    """Hypothesis equivalence for the archive indexers: spans must tile
    files exactly and range-read back the indexed bytes."""

    def test_tar_member_walk_matches_tarfile(self):
        import io
        import tarfile
        from hypothesis import given, settings
        from hypothesis import strategies as st
        from deequ_spark.llm import tar_members

        names = st.text(alphabet="abcdefghij0123456789._-",
                        min_size=1, max_size=30).filter(
            lambda s: not s.startswith(".") and s.strip("."))

        @settings(max_examples=50, deadline=None)
        @given(st.lists(st.tuples(names, st.integers(0, 1500)),
                        min_size=1, max_size=8, unique_by=lambda t: t[0]))
        def check(members):
            buf = io.BytesIO()
            with tarfile.open(fileobj=buf, mode="w",
                              format=tarfile.USTAR_FORMAT) as tar:
                for name, size in members:
                    info = tarfile.TarInfo(name)
                    blob = bytes((size + k) % 251 for k in range(size))
                    info.size = size
                    tar.addfile(info, io.BytesIO(blob))
            data = buf.getvalue()
            got = list(tar_members(data))
            assert [g[0] for g in got] == [m[0] for m in members]
            for (name, size), (gname, off, gsize) in zip(members, got):
                assert gsize == size
                assert data[off:off + size] == bytes(
                    (size + k) % 251 for k in range(size))

        check()

    def test_warc_span_walk_round_trip(self):
        import gzip
        from hypothesis import given, settings
        from hypothesis import strategies as st
        from deequ_spark.llm import build_warc_file, build_warc_record
        from deequ_spark.llm.warc import (_iter_record_spans,
                                          iter_warc_records)

        payloads = st.lists(st.binary(min_size=0, max_size=400),
                            min_size=1, max_size=6)

        @settings(max_examples=50, deadline=None)
        @given(payloads, st.booleans())
        def check(bodies, gz):
            recs = [build_warc_record(
                "response", b, target_uri=f"http://h.io/{k}")
                for k, b in enumerate(bodies)]
            blob = build_warc_file(recs, gzip_members=gz)
            spans = list(_iter_record_spans(blob))
            assert len(spans) == len(bodies)
            # spans tile the file in order, starting at 0
            assert spans[0][0] == 0
            for k, (off, ln, h, payload) in enumerate(spans):
                assert payload == bodies[k]
                piece = blob[off:off + ln]
                if gz:
                    piece = gzip.decompress(piece)
                inner = list(iter_warc_records(piece))
                assert len(inner) == 1 and inner[0][1] == bodies[k]
            assert spans[-1][0] + spans[-1][1] == len(blob)

        check()

    def test_surt_key_total_on_arbitrary_text(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st
        from deequ_spark.llm import surt_key

        @settings(max_examples=200, deadline=None)
        @given(st.text(max_size=80))
        def check(s):
            out = surt_key(s)                 # never raises
            assert out is None or ")" in out

        check()
