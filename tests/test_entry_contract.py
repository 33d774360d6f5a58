"""Contract tests for the driver surface (__spark_entry__.py).

The round driver snapshots the first 50 ``queries()`` entries and
hash-compares each against its ``oracle_sql()`` on DuckDB, so the
registry itself has invariants worth pinning:

* every query name has an oracle (value-gated, not rows-only),
* the registry stays <= 100 names so full driver coverage fits two
  50-slot windows (r11 consolidation),
* the r11 family composites union parts with DISJOINT metric names —
  a hash mismatch must attribute to one operator's rows.
"""

import sys

sys.path.insert(0, "/root/repo")

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def test_registry_size_and_oracle_parity():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) <= 100, "registry must fit two 50-slot driver windows"
    assert set(qs) == set(oracles)


_ALL_FOLDS = {**entry_mod._R11_FOLDS, **entry_mod._R12_FOLDS}


def test_fold_map_matches_registry():
    qs = set(entry_mod.queries())
    for comp, parts in _ALL_FOLDS.items():
        assert comp in qs
        for part in parts:
            assert part not in qs, f"{part} folded into {comp} but still registered"


@pytest.mark.parametrize("comp", sorted(_ALL_FOLDS))
def test_composite_metric_names_disjoint(spark, comp):
    df = entry_mod.queries()[comp](spark, SF)
    assert df.columns == ["metric", "value"]
    metrics = [r["metric"] for r in df.select("metric").collect()]
    dupes = {m for m in metrics if metrics.count(m) > 1}
    assert not dupes, f"{comp} has colliding metric names: {sorted(dupes)}"
