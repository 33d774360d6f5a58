"""AnalysisRunner — fuses many analyzers into minimal Spark work.

Reference parity:
/root/reference/src/main/scala/com/amazon/deequ/analyzers/runners/
AnalysisRunner.scala:101-247 (orchestration), :342-387 (scan fusion with
offsets), :582-605 (grouping fusion), :122-134 (metric reuse from
repository), :389-416 (column pruning before agg).

Execution contract (the engine's scale story):
  * N scan-shareable analyzers  → exactly ONE ``df.agg(...)`` job = one
    pass over the data, regardless of N.
  * M grouping analyzers over the same (columns, filter) → ONE shuffle
    (the GROUP BY) + one fused second-stage agg (single action here,
    vs two jobs in the reference, since num_rows is recovered as
    SUM(absolute) inside the same aggregation).
  * Column pruning: the fused scan selects only referenced columns so
    parquet/DSv2 scans read a narrow projection.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..analyzers.base import Analyzer, ScanShareableAnalyzer, State
from ..analyzers.grouping import (COUNT_COL, NULL_FIELD_REPLACEMENT,
                                  FrequenciesAndNumRows,
                                  FrequencyBasedAnalyzer, Histogram,
                                  ScanShareableFrequencyBasedAnalyzer,
                                  exclude_all_null_groups, frequencies_plan,
                                  frequencies_plan_all)
from ..compat import CamelCaseMixin, PyDeequCompatMeta
from ..metrics import DoubleMetric, Metric


@dataclass
class AnalyzerContext:
    """Computed metrics per analyzer (parity: AnalyzerContext.scala)."""

    metric_map: Dict[Analyzer, Metric] = field(default_factory=dict)

    def all_metrics(self) -> List[Metric]:
        return list(self.metric_map.values())

    def metric(self, analyzer: Analyzer) -> Optional[Metric]:
        return self.metric_map.get(analyzer)

    def __add__(self, other: "AnalyzerContext") -> "AnalyzerContext":
        merged = dict(self.metric_map)
        merged.update(other.metric_map)
        return AnalyzerContext(merged)

    def _simplified_rows(self, for_analyzers=None):
        """Flattened (entity, instance, name, value) rows with the metric
        name decorated by the analyzer's filter, exactly as the reference
        renders them (AnalyzerContext.scala:78-127: FilterableAnalyzer →
        'Name (where: cond)')."""
        rows = []
        for analyzer, metric in self.metric_map.items():
            if for_analyzers and analyzer not in for_analyzers:
                continue
            where = getattr(analyzer, "where", None)
            flattened = getattr(metric, "flattened", None)
            for m in (flattened if flattened is not None else [metric]):
                # flattened metrics are DoubleMetrics by contract; a
                # custom Metric subclass without a `flattened` property
                # and a non-numeric payload is skipped, not crashed on
                if m.is_success and isinstance(m.value, (int, float)) \
                        and not isinstance(m.value, bool):
                    name = (f"{m.name} (where: {where})" if where is not None
                            else m.name)
                    rows.append((m.entity.value, m.instance, name,
                                 float(m.value)))
        return rows

    def success_metrics_as_json(self, for_analyzers=None) -> str:
        return json.dumps([
            {"entity": e, "instance": i, "name": n, "value": v}
            for e, i, n, v in self._simplified_rows(for_analyzers)])

    def success_metrics_as_dataframe(self, spark: SparkSession,
                                     for_analyzers: Optional[Sequence[Analyzer]] = None
                                     ) -> DataFrame:
        return spark.createDataFrame(
            self._simplified_rows(for_analyzers),
            "entity string, instance string, name string, value double")


def _dedup(analyzers: Sequence[Analyzer]) -> List[Analyzer]:
    seen, out = set(), []
    for a in analyzers:
        if a not in seen:
            seen.add(a)
            out.append(a)
    return out


class _LockingStateProvider:
    """Serializes persist/load against a wrapped StateProvider: the
    runner's execution groups save DISJOINT analyzer keys, but provider
    internals (one backing dict, one filesystem directory) are shared
    and make no thread-safety promise of their own."""

    def __init__(self, inner):
        import threading
        self._inner = inner
        self._lock = threading.Lock()

    def persist(self, analyzer, state) -> None:
        with self._lock:
            self._inner.persist(analyzer, state)

    def load(self, analyzer):
        with self._lock:
            return self._inner.load(analyzer)


def _run_task_groups(data: DataFrame, tasks: List[Any]) -> AnalyzerContext:
    """Execute the runner's independent per-group actions, overlapped.

    Each task is one self-contained Spark action chain over a disjoint
    analyzer set (fused scan / KLL pass / one grouping bucket / one
    standalone analyzer). With ≥2 tasks they are submitted from a small
    thread pool so one group's tasks back-fill executors idled by
    another group's straggler tail (guide §2.6 — actions are only
    sequential because the driver calls them sequentially); results
    merge in SUBMISSION order, so the metric map is identical to a
    sequential run, value for value and key-order included.
    ``spark.deequ.runner.maxConcurrentGroups`` (default 3, guide §2.6:
    "2-3 jobs in flight is plenty") bounds in-flight actions; ≤1 runs
    sequentially in the calling thread. Pool threads run under
    ``inheritable_thread_target`` so the caller's job group / job
    description / other thread-local properties propagate to the jobs
    the tasks submit (and cancellation via job group still reaches
    them)."""
    results = AnalyzerContext()
    max_conc = 3
    try:
        max_conc = int(data.sparkSession.conf.get(
            "spark.deequ.runner.maxConcurrentGroups", "3"))
    except Exception:  # noqa: BLE001 — conf unreadable → default
        pass
    if len(tasks) <= 1 or max_conc <= 1:
        for t in tasks:
            results += t()
        return results
    from concurrent.futures import ThreadPoolExecutor

    try:
        from pyspark import inheritable_thread_target
        # session form (Spark 3.5+/4.x): inherits job group, job
        # description AND session tags into the pool threads
        deco = inheritable_thread_target(data.sparkSession)
        wrapped = [deco(t) for t in tasks]
    except Exception:  # noqa: BLE001 — utility unavailable → plain tasks
        wrapped = tasks
    with ThreadPoolExecutor(max_workers=min(max_conc, len(tasks))) as pool:
        futures = [pool.submit(t) for t in wrapped]
        try:
            for fut in futures:
                results += fut.result()
        except BaseException:
            # first failure cancels every not-yet-started task so later
            # groups cannot persist states after the run has raised —
            # the closest a pool gets to sequential mode's
            # stop-at-first-failure (in-flight tasks still drain)
            for f in futures:
                f.cancel()
            raise
    return results


def do_analysis_run(data: DataFrame,
                    analyzers: Sequence[Analyzer],
                    metrics_repository=None,
                    reuse_existing_results_for_key=None,
                    save_or_append_results_with_key=None,
                    save_states_with=None,
                    aggregate_with=None,
                    fail_if_results_missing: bool = False,
                    keep_state_cache: bool = False) -> AnalyzerContext:
    """Compute all metrics with minimal passes (parity:
    AnalysisRunner.scala:101-247). Reuse and save are SEPARATE keys (as in
    the reference): passing a reuse key never writes back — otherwise a
    transient failure metric would poison the repository for that key.

    ``aggregate_with`` (parity: AnalysisRunner aggregateWith) is a state
    loader holding PRIOR states: the data (typically a delta partition) is
    scanned once with the usual fusion, its states are merged with the
    prior ones, and metrics come from the merged states — the incremental
    pattern (IncrementalAnalysisTest.scala:30-105). ``save_states_with``
    then persists the MERGED states, so consecutive deltas chain. When
    both point at the SAME FileSystemStateProvider path, construct it
    with ``allow_overwrite=True`` — the merged write replaces the prior
    state file, and the default (HdfsStateProvider parity) refuses
    overwrites.

    ``keep_state_cache=True`` (r12 perf) leaves DataFrame-valued states
    (grouping frequency tables) CACHED when they are saved into
    ``save_states_with`` — the caller owns the cache and must unpersist
    via the state's ``frequencies`` once merged/consumed. Without it a
    saved frequency state is a lazy plan whose every later merge
    re-runs the batch groupBy (measured: the streaming path paid the
    shuffle twice per micro-batch). Default False keeps the no-leak
    contract for everyone else."""
    analyzers = _dedup(analyzers)
    if not analyzers:
        return AnalyzerContext()

    if aggregate_with is not None:
        from ..states import InMemoryStateProvider
        delta_states = InMemoryStateProvider()
        do_analysis_run(data, analyzers, save_states_with=delta_states)
        ctx = run_on_aggregated_states(
            data, analyzers, [aggregate_with, delta_states],
            save_states_with=save_states_with)
        if metrics_repository is not None and save_or_append_results_with_key is not None:
            metrics_repository.save(save_or_append_results_with_key, ctx)
        return ctx

    # 1. reuse SUCCESSFUL metrics already in the repository (:122-134)
    results = AnalyzerContext()
    to_run: List[Analyzer] = []
    if metrics_repository is not None and reuse_existing_results_for_key is not None:
        existing = metrics_repository.load_by_key(reuse_existing_results_for_key)
        existing_map = existing.metric_map if existing else {}
        for a in analyzers:
            if a in existing_map and existing_map[a].is_success:
                results.metric_map[a] = existing_map[a]
            else:
                to_run.append(a)
    else:
        to_run = list(analyzers)

    # 1b. strict-reuse mode: the caller asserted every metric is already in
    # the repository (parity: VerificationRunBuilder.scala:195-205,
    # ReusingNotPossibleResultsMissingException)
    if fail_if_results_missing and to_run:
        missing = ", ".join(str(a) for a in to_run)
        raise ValueError(
            "fail_if_results_missing is set but these analyzers have no "
            f"stored metrics for the reuse key: {missing}")

    # 2. preconditions → failure metrics without running (:143-152)
    passed: List[Analyzer] = []
    schema = data.schema
    for a in to_run:
        try:
            for check in a.preconditions():
                check(schema)
            passed.append(a)
        except Exception as exc:  # noqa: BLE001
            results.metric_map[a] = a.to_failure_metric(exc)

    # 3. partition by execution strategy (:154-160)
    from ..analyzers.kll import KLLSketch, compute_kll_states
    scanning = [a for a in passed if isinstance(a, ScanShareableAnalyzer)]
    grouping = [a for a in passed
                if isinstance(a, FrequencyBasedAnalyzer)
                and not isinstance(a, Histogram)]
    klls = [a for a in passed if isinstance(a, KLLSketch)]
    others = [a for a in passed
              if a not in scanning and a not in grouping and a not in klls]

    # 4-6. the execution groups below — the fused scan, the shared KLL
    # Arrow pass, each grouping bucket, and each standalone analyzer —
    # are INDEPENDENT Spark actions over the same immutable input, yet
    # they used to run strictly one after another, so every group's
    # straggler tail left the cluster idle (guide §2.6 "overlap
    # independent jobs": actions are only sequential because driver
    # code calls them sequentially). They are built as task closures
    # and submitted from a small thread pool; each task touches a
    # DISJOINT set of analyzers and returns its own AnalyzerContext,
    # and the contexts merge in submission order, so the resulting
    # metric map (values AND iteration order) is identical to the
    # sequential run. `spark.deequ.runner.maxConcurrentGroups` bounds
    # the in-flight actions (guide: 2-3 in flight is plenty — enough to
    # back-fill a tail, not enough to fight for executors); 1 restores
    # fully sequential submission.
    buckets: Dict[Tuple, List[FrequencyBasedAnalyzer]] = {}
    for a in grouping:
        key = (tuple(sorted(a.grouping_columns)), getattr(a, "where", None))
        buckets.setdefault(key, []).append(a)

    # r13 (guide §2.4 "two operations keyed the same way can share one
    # exchange"): a standalone Histogram whose (column, where) matches a
    # grouping bucket rides THAT bucket's shuffle instead of running its
    # own corpus-wide groupBy. The shared table is the null-INCLUSIVE
    # raw groupBy: the bucket's view is it minus the all-null-key group
    # (exactly frequencies_plan's pre-shuffle exclusion) and the
    # Histogram's view is a post-shuffle string-cast re-aggregation of
    # it (cast is per-value deterministic, so regrouping the tiny
    # frequency table by cast(key) sums to exactly the corpus-level
    # counts). Guards: no binning/sum_column (those change the grouped
    # expression), no float/double column (groupBy normalizes -0.0→0.0
    # and NaN bit patterns BEFORE the cast, a corpus-level string
    # groupBy would not), plain unquoted column name, and no state
    # provider (the saved bucket state must keep its standalone cache
    # lifecycle). Identical values either way — only one Exchange
    # where two ran.
    shared_hists: Dict[Tuple, List[Histogram]] = {}
    others_canonical = list(others)
    share = True
    try:
        share = str(data.sparkSession.conf.get(
            "spark.deequ.runner.shareHistogramShuffle", "true")).lower() \
            == "true"
    except Exception:  # noqa: BLE001 — conf unreadable → default on
        pass
    if share and buckets and save_states_with is None:
        schema_by_name = {f.name: f.dataType for f in schema.fields}
        remaining = []
        for a in others:
            key = None
            if (type(a) is Histogram and a.binning_udf is None
                    and a.sum_column is None
                    and a.column == a._plain_column
                    and a.column in schema_by_name
                    and schema_by_name[a.column].typeName()
                    not in ("float", "double")):
                key = ((a.column,), a.where)
            if key is not None and key in buckets:
                shared_hists.setdefault(key, []).append(a)
            else:
                remaining.append(a)
        others = remaining

    def run_klls() -> AnalyzerContext:
        # ONE extra Arrow pass for ALL KLL columns combined
        # (parity: KLLRunner.computeKLLSketchesInExtraPass, :162-167)
        ctx = AnalyzerContext()
        try:
            kll_states = compute_kll_states(data, klls)
            for a in klls:
                state = kll_states.get(a)
                if save_states_with is not None and state is not None:
                    save_states_with.persist(a, state)
                ctx.metric_map[a] = a.compute_metric_from_state(state)
        except Exception as exc:  # noqa: BLE001
            for a in klls:
                ctx.metric_map[a] = a.to_failure_metric(exc)
        return ctx

    def run_standalone(a: Analyzer) -> AnalyzerContext:
        # standalone execution (Histogram, HistogramBinned, CustomSql…)
        ctx = AnalyzerContext()
        try:
            state = a.compute_state_from(data)
            if save_states_with is not None and state is not None:
                save_states_with.persist(a, state)
            ctx.metric_map[a] = a.compute_metric_from_state(state)
        except Exception as exc:  # noqa: BLE001
            ctx.metric_map[a] = a.to_failure_metric(exc)
        return ctx

    # state providers make no thread-safety promise, so concurrent tasks
    # persist through one lock (disjoint analyzer keys, shared provider
    # internals — e.g. one backing dict or filesystem directory)
    if save_states_with is not None:
        save_states_with = _LockingStateProvider(save_states_with)

    tasks: List[Any] = []
    if scanning:
        tasks.append(lambda: _run_scanning_analyzers(
            data, scanning, save_states_with))
    if klls:
        tasks.append(run_klls)
    for (cols_key, where), bucket in buckets.items():
        hists = shared_hists.get((cols_key, where), [])
        tasks.append(lambda b=bucket, w=where, h=hists:
                     _run_grouping_analyzers(
                         data, list(b[0].grouping_columns), w, b,
                         save_states_with, keep_state_cache=keep_state_cache,
                         shared_histograms=h))
    for a in others:
        tasks.append(lambda a=a: run_standalone(a))

    task_results = _run_task_groups(data, tasks)
    if shared_hists:
        # histogram metrics were computed inside a bucket's task — put
        # the merged map back in the exact order the unshared run
        # produces (scan, KLL, buckets, standalones), so downstream
        # metric rendering is byte-identical
        canonical = list(scanning) + list(klls)
        for b in buckets.values():
            # a bucket task's map order is shareable-then-non-shareable
            canonical += [a for a in b if isinstance(
                a, ScanShareableFrequencyBasedAnalyzer)]
            canonical += [a for a in b if not isinstance(
                a, ScanShareableFrequencyBasedAnalyzer)]
        canonical += others_canonical
        ordered = AnalyzerContext()
        for a in canonical:
            if a in task_results.metric_map:
                ordered.metric_map[a] = task_results.metric_map[a]
        for a, m in task_results.metric_map.items():
            ordered.metric_map.setdefault(a, m)
        task_results = ordered
    results += task_results

    # 7. store newly computed metrics ONLY under an explicit save key
    if metrics_repository is not None and save_or_append_results_with_key is not None:
        metrics_repository.save(save_or_append_results_with_key, results)

    return results


def _run_scanning_analyzers(data: DataFrame,
                            analyzers: List[ScanShareableAnalyzer],
                            save_states_with=None) -> AnalyzerContext:
    """ONE ``df.agg(...)`` for all analyzers (AnalysisRunner.scala:342-387)."""
    ctx = AnalyzerContext()

    # column pruning before agg (:389-416) — helps DSv2 scan planning and
    # keeps the parquet ReadSchema narrow
    referenced: Optional[set] = set()
    for a in analyzers:
        cols = a.columns_referenced()
        if cols is None:
            referenced = None
            break
        referenced.update(cols)
    pruned = data
    if referenced is not None and referenced and len(referenced) < len(data.columns):
        # backtick names so a literal dot/space in a column name is not
        # parsed as nested-field access
        pruned = data.select(
            *[F.col(f"`{c}`") for c in sorted(referenced)])

    aggregations = []
    offsets: List[int] = []
    current = 0
    runnable: List[ScanShareableAnalyzer] = []
    for a in analyzers:
        try:
            aggs = a.aggregation_functions()
        except Exception as exc:  # noqa: BLE001
            # Parity AnalysisTest.scala:342-365: a failure while BUILDING
            # the fused aggregation fails every analyzer in the scan group
            # (the expressions were to be computed in one shared pass)
            for other in analyzers:
                ctx.metric_map[other] = other.to_failure_metric(exc)
            return ctx
        aggregations.extend(aggs)
        offsets.append(current)
        current += len(aggs)
        runnable.append(a)

    if not runnable:
        return ctx

    try:
        result = pruned.agg(*aggregations).collect()[0]
    except Exception:  # noqa: BLE001
        # one analyzer's invalid expression (e.g. bad `where` SQL, parsed
        # lazily at agg time) must not poison the whole fused pass —
        # isolate by running each analyzer alone
        for a in runnable:
            try:
                state = a.compute_state_from(pruned)
                if save_states_with is not None and state is not None:
                    save_states_with.persist(a, state)
                ctx.metric_map[a] = a.compute_metric_from_state(state)
            except Exception as exc:  # noqa: BLE001
                ctx.metric_map[a] = a.to_failure_metric(exc)
        return ctx
    for a, offset in zip(runnable, offsets):
        try:
            state = a.from_aggregation_result(result, offset)
            if save_states_with is not None and state is not None:
                save_states_with.persist(a, state)
            ctx.metric_map[a] = a.compute_metric_from_state(state)
        except Exception as exc:  # noqa: BLE001
            ctx.metric_map[a] = a.to_failure_metric(exc)
    return ctx


def _run_grouping_analyzers(data: DataFrame,
                            grouping_columns: List[str],
                            where: Optional[str],
                            analyzers: List[FrequencyBasedAnalyzer],
                            save_states_with=None,
                            keep_state_cache: bool = False,
                            shared_histograms: Optional[List[Histogram]]
                            = None) -> AnalyzerContext:
    """One shuffle for the whole bucket; fused second stage
    (AnalysisRunner.scala:560-628).

    ``shared_histograms`` (r13, guide §2.4): standalone Histograms on
    the bucket's single column/filter that would otherwise pay their own
    corpus shuffle. The bucket then groups WITHOUT the null-key
    exclusion (persisted once); the bucket's analyzers read the
    all-null-group-excluded view (value-identical to frequencies_plan)
    and each histogram reads a post-shuffle string-cast re-aggregation
    of the same table (value-identical to its own corpus groupBy — cast
    is per-value deterministic, so group sums equal corpus counts)."""
    ctx = AnalyzerContext()
    hists = list(shared_histograms or [])
    freq_incl = None
    try:
        if hists:
            freq_incl = frequencies_plan_all(data, grouping_columns, where)
            frequencies = exclude_all_null_groups(freq_incl,
                                                  grouping_columns)
        else:
            frequencies = frequencies_plan(data, grouping_columns, where)
    except Exception as exc:  # noqa: BLE001  (e.g. invalid `where` SQL)
        for a in analyzers + hists:
            ctx.metric_map[a] = a.to_failure_metric(exc)
        return ctx

    shareable = [a for a in analyzers
                 if isinstance(a, ScanShareableFrequencyBasedAnalyzer)]
    non_shareable = [a for a in analyzers if a not in shareable]

    # persist the (small, post-shuffle) frequency table only when >1 action
    # will consume it (parity :576-578, 626). With shared histograms the
    # CACHED frame is the null-inclusive table — the bucket view and every
    # histogram view are cheap post-shuffle derivations of it.
    needs_persist = bool(non_shareable) or (save_states_with is not None) \
        or bool(hists)
    cached = None
    if needs_persist:
        cached = (freq_incl if freq_incl is not None else frequencies) \
            .persist(StorageLevel.MEMORY_AND_DISK)
        if freq_incl is not None:
            freq_incl = cached
            frequencies = exclude_all_null_groups(freq_incl,
                                                  grouping_columns)
        else:
            frequencies = cached

    def _histogram_metrics() -> None:
        """Derive each shared histogram's table from the cached
        null-inclusive frequencies: coalesce(cast(key AS string),
        NullValue), regroup, sum counts — a tiny post-shuffle exchange
        over distinct values, not a corpus pass."""
        for h in hists:
            try:
                plain = h._plain_column
                key = F.col(f"`{plain}`")
                derived = (freq_incl.select(
                    F.coalesce(key.cast("string"),
                               F.lit(NULL_FIELD_REPLACEMENT)).alias(plain),
                    F.col(COUNT_COL))
                    .groupBy(F.col(f"`{plain}`"))
                    .agg(F.sum(COUNT_COL).cast("long").alias(COUNT_COL)))
                ctx.metric_map[h] = h.compute_metric_from_state(
                    FrequenciesAndNumRows(derived))
            except Exception as exc:  # noqa: BLE001
                ctx.metric_map[h] = h.to_failure_metric(exc)

    # fused second stage: SUM(absolute) at offset 0 recovers num_rows in the
    # SAME action as every analyzer's aggregates
    aggregations = [F.sum(F.col(COUNT_COL)).cast("long")]
    offsets: List[int] = []
    current = 1
    for a in shareable:
        try:
            aggs = a.aggregation_functions()
        except Exception as exc:  # noqa: BLE001
            # Parity AnalysisTest.scala:398-427: failure while building the
            # fused second stage fails every analyzer sharing the GROUP BY
            for other in analyzers:
                ctx.metric_map[other] = other.to_failure_metric(exc)
            # shared histograms do not share the second stage: compute
            # them from the (still valid) inclusive table, as standalone
            # execution would have succeeded
            _histogram_metrics()
            if cached is not None:
                cached.unpersist()
            return ctx
        aggregations.extend(aggs)
        offsets.append(current)
        current += len(aggs)

    try:
        result = frequencies.agg(*aggregations).collect()[0]
    except Exception:  # noqa: BLE001
        # isolate a poisoned expression (bad `where`/column) per analyzer
        for a in analyzers:
            try:
                state = a.compute_state_from(data)
                ctx.metric_map[a] = a.compute_metric_from_state(state)
            except Exception as exc:  # noqa: BLE001
                ctx.metric_map[a] = a.to_failure_metric(exc)
        for h in hists:
            try:
                state = h.compute_state_from(data)
                ctx.metric_map[h] = h.compute_metric_from_state(state)
            except Exception as exc:  # noqa: BLE001
                ctx.metric_map[h] = h.to_failure_metric(exc)
        if cached is not None:
            cached.unpersist()
        return ctx
    num_rows = int(result[0] or 0)

    for a, offset in zip(shareable, offsets):
        ctx.metric_map[a] = a.metric_from_aggregation_result(result, offset, num_rows)

    state = FrequenciesAndNumRows(frequencies, num_rows)
    if save_states_with is not None:
        for a in analyzers:
            save_states_with.persist(a, state)
    for a in non_shareable:
        try:
            ctx.metric_map[a] = a.compute_metric_from_state(state)
        except Exception as exc:  # noqa: BLE001
            ctx.metric_map[a] = a.to_failure_metric(exc)

    _histogram_metrics()

    # keep_state_cache: the SAVED state keeps its materialized
    # frequency table — the caller (streaming merge) reads it once more
    # and unpersists; dropping it here would make every later state
    # merge re-run the groupBy shuffle
    if cached is not None and not (keep_state_cache
                                   and save_states_with is not None):
        cached.unpersist()
    return ctx


def run_on_aggregated_states(schema_source: DataFrame,
                             analyzers: Sequence[Analyzer],
                             state_loaders: Sequence[Any],
                             save_states_with=None) -> AnalyzerContext:
    """Compute metrics purely from merged persisted states — no data scan
    (parity: AnalysisRunner.scala:466-541, runOnAggregatedStates).
    ``save_states_with`` persists the merged states (saveStatesWith)."""
    ctx = AnalyzerContext()
    for a in _dedup(analyzers):
        merged: Optional[State] = None
        try:
            for loader in state_loaders:
                state = loader.load(a)
                if state is not None:
                    merged = state if merged is None else merged.merge(state)
            if save_states_with is not None and merged is not None:
                save_states_with.persist(a, merged)
            ctx.metric_map[a] = a.compute_metric_from_state(merged)
        except Exception as exc:  # noqa: BLE001
            ctx.metric_map[a] = a.to_failure_metric(exc)
    return ctx


class AnalysisRunBuilder(CamelCaseMixin):
    """Fluent analysis entry point (parity: runners/AnalysisRunBuilder.scala
    + AnalysisRunner.scala onData). Adding the SAME analyzer twice is an
    error, matching the reference builder's require (AnalysisRunnerTests
    "should give error for duplicate analyzers"); distinct where-filtered
    variants of one analyzer coexist fine."""

    def __init__(self, data: DataFrame):
        self._data = data
        self._analyzers: List[Analyzer] = []
        self._repository = None
        self._reuse_key = None
        self._save_key = None
        self._fail_if_results_missing = False
        self._state_provider = None

    def add_analyzer(self, analyzer: Analyzer) -> "AnalysisRunBuilder":
        if analyzer in self._analyzers:
            raise ValueError(f"Analyzer {analyzer} can only be added once")
        self._analyzers.append(analyzer)
        return self

    def add_analyzers(self, analyzers: Sequence[Analyzer]) -> "AnalysisRunBuilder":
        for a in analyzers:
            self.add_analyzer(a)
        return self

    def use_repository(self, repository) -> "AnalysisRunBuilder":
        self._repository = repository
        return self

    def reuse_existing_results_for_key(
            self, key, fail_if_results_missing: bool = False
    ) -> "AnalysisRunBuilder":
        self._reuse_key = key
        self._fail_if_results_missing = fail_if_results_missing
        return self

    def save_or_append_result(self, key) -> "AnalysisRunBuilder":
        self._save_key = key
        return self

    def save_states_with(self, provider) -> "AnalysisRunBuilder":
        self._state_provider = provider
        return self

    def aggregate_with(self, loader) -> "AnalysisRunBuilder":
        """Merge this run's states with PRIOR states from ``loader``
        before computing metrics — the incremental pattern
        (AnalysisRunner.scala aggregateWith)."""
        self._aggregate_with = loader
        return self

    def run(self) -> AnalyzerContext:
        return do_analysis_run(
            self._data, self._analyzers,
            metrics_repository=self._repository,
            reuse_existing_results_for_key=self._reuse_key,
            save_or_append_results_with_key=self._save_key,
            save_states_with=self._state_provider,
            aggregate_with=getattr(self, "_aggregate_with", None),
            fail_if_results_missing=self._fail_if_results_missing)


class AnalysisRunner(metaclass=PyDeequCompatMeta):
    """Parity: AnalysisRunner.scala onData/run entry points.
    PyDeequ-compatible static camelCase: ``AnalysisRunner.onData(df)``."""

    @staticmethod
    def on_data(data: DataFrame) -> AnalysisRunBuilder:
        return AnalysisRunBuilder(data)

    @staticmethod
    def run(data: DataFrame, analyzers: Sequence[Analyzer],
            aggregate_with=None, save_states_with=None) -> AnalyzerContext:
        return do_analysis_run(data, analyzers,
                               aggregate_with=aggregate_with,
                               save_states_with=save_states_with)
