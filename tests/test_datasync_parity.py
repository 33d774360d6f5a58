"""DataSynchronization parity fixtures transcribed from the reference's
comparison/DataSynchronizationTest.scala (ratios, key-uniqueness
preconditions, row-level annotation)."""

import pytest

from deequ_spark import DataSynchronization


@pytest.fixture(scope="module")
def ds1(spark):
    return spark.createDataFrame(
        [(1, "John", "NY"), (2, "Javier", "WI"), (3, "Helena", "TX"),
         (4, "Helena", "TX"), (5, "Nick", "FL"), (6, "Molly", "TX")],
        "id int, name string, state string")


@pytest.fixture(scope="module")
def ds2(spark):
    return spark.createDataFrame(
        [(1, "John", "NY"), (2, "Javier", "WI"), (3, "Helena", "TX"),
         (4, "Helena", "TX"), (5, "Helena", "FL"), (7, "Megan", "TX")],
        "id int, name string, state string")


class TestColumnMatchRatios:
    """DataSynchronizationTest.scala:32-420."""

    def test_name_comp_ratio_066(self, ds1, ds2):
        r = DataSynchronization.column_match(
            ds1, ds2, {"id": "id"}, {"name": "name"}, lambda v: v >= 0.60)
        assert r.passed
        assert r.ratio == pytest.approx(4 / 6)

    def test_state_comp_ratio_083(self, ds1, ds2):
        r = DataSynchronization.column_match(
            ds1, ds2, {"id": "id"}, {"state": "state"}, lambda v: v >= 0.80)
        assert r.passed
        assert r.ratio == pytest.approx(5 / 6)

    def test_non_unique_key_fails(self, ds1, ds2):
        r = DataSynchronization.column_match(
            ds1, ds2, {"name": "name"}, {"state": "state"},
            lambda v: v >= 0.66)
        assert r.passed is None and r.error

    def test_all_columns_ratio_066(self, ds1, ds2):
        r = DataSynchronization.column_match(
            ds1, ds2, {"id": "id"}, None, lambda v: v >= 0.60)
        assert r.passed
        assert r.ratio == pytest.approx(4 / 6)

    def test_zero_matches(self, spark, ds1):
        other = spark.createDataFrame(
            [(10, "A", "AA"), (11, "B", "BB")],
            "id int, name string, state string")
        r = DataSynchronization.column_match(
            ds1, other, {"id": "id"}, {"name": "name"}, lambda v: v > 0)
        assert r.passed is False
        assert r.ratio == 0.0


@pytest.fixture(scope="module")
def ref2(spark):
    """referenceDataset (:419-429) — renamed columns, id 4 drifts."""
    return spark.createDataFrame(
        [(1, "John", "NY"), (2, "Javier", "WI"), (3, "Helena", "TX"),
         (4, "Helena", "WA"), (5, "Helena", "FL"), (7, "Megan", "TX")],
        "id2 int, name2 string, state2 string")


class TestRowLevelAnnotation:
    """DataSynchronizationTest.scala:431-520."""

    def test_annotate_name(self, ds1, ref2):
        out = DataSynchronization.column_match_row_level(
            ds1, ref2, {"id": "id2"}, {"name": "name2"}, "outcome")
        assert "name" in out.columns and "name2" not in out.columns
        got = {r["id"]: r["outcome"] for r in out.collect()}
        assert got == {1: True, 2: True, 3: True, 4: True, 5: False, 6: False}

    def test_annotate_name_and_state(self, ds1, ref2):
        out = DataSynchronization.column_match_row_level(
            ds1, ref2, {"id": "id2"}, {"name": "name2", "state": "state2"},
            "outcome")
        got = {r["id"]: r["outcome"] for r in out.collect()}
        assert got == {1: True, 2: True, 3: True, 4: False, 5: False,
                       6: False}

    def test_annotate_with_extra_key_column(self, ds1, ref2):
        out = DataSynchronization.column_match_row_level(
            ds1, ref2, {"id": "id2", "name": "name2"},
            {"name": "name2", "state": "state2"}, "outcome")
        got = {r["id"]: r["outcome"] for r in out.collect()}
        assert got == {1: True, 2: True, 3: True, 4: False, 5: False,
                       6: False}


class TestReferentialIntegrityFixtures:
    """comparison/ReferentialIntegrityTest.scala:216-400 — subsetCheck
    ratios (duplicate primary rows COUNT toward the ratio) and
    missing-column errors."""

    @pytest.fixture(scope="class")
    def primary(self, spark):
        return spark.createDataFrame(
            [(1, "John", "NY"), (2, "Javier", "WI"), (3, "Helena", "TX"),
             (3, "Helena", "TX")], "id int, name string, state string")

    @pytest.fixture(scope="class")
    def reference(self, spark):
        return spark.createDataFrame(
            [(1, "John", "NY"), (2, "Javier", "WI"), (3, "Helena", "TX"),
             (5, "Tyler", "FL"), (6, "Megan", "TX")],
            "new_id int, name string, state string")

    def test_id_match_full(self, primary, reference):
        from deequ_spark import ReferentialIntegrity
        r = ReferentialIntegrity.subset_check(
            primary, ["id"], reference, ["new_id"], lambda v: v >= 1.0)
        assert r.passed and r.ratio == 1.0

    def test_reverse_id_match_060(self, primary, reference):
        from deequ_spark import ReferentialIntegrity
        r = ReferentialIntegrity.subset_check(
            reference, ["new_id"], primary, ["id"], lambda v: v == 0.6)
        assert r.passed and r.ratio == pytest.approx(0.6)

    def test_state_with_wrong_column_zero(self, primary, reference):
        from deequ_spark import ReferentialIntegrity
        # states matched against names: nothing matches
        r = ReferentialIntegrity.subset_check(
            primary, ["state"], reference, ["name"], lambda v: v > 0)
        assert r.passed is False and r.ratio == 0.0

    def test_missing_columns_error(self, primary, reference):
        from deequ_spark import ReferentialIntegrity
        r1 = ReferentialIntegrity.subset_check(
            primary, ["col1"], reference, ["new_id"], lambda v: True)
        assert r1.passed is None and r1.error
        r2 = ReferentialIntegrity.subset_check(
            primary, ["id"], reference, ["col2"], lambda v: True)
        assert r2.passed is None and r2.error

    def test_multiple_columns(self, primary, reference):
        from deequ_spark import ReferentialIntegrity
        r = ReferentialIntegrity.subset_check(
            primary, ["name", "state"], reference, ["name", "state"],
            lambda v: v >= 1.0)
        assert r.passed and r.ratio == 1.0
