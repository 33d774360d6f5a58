"""VerificationSuite — the flagship entry point.

Reference parity: /root/reference/src/main/scala/com/amazon/deequ/
{VerificationSuite,VerificationRunBuilder,VerificationResult}.scala
(lifecycle documented in SURVEY §3.1). Collects required analyzers from all
checks, runs them through the fused AnalysisRunner (one scan), evaluates
each check's constraints against the resulting metrics.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analyzers.base import Analyzer
from .checks import Check, CheckResult, CheckStatus
from .compat import CamelCaseMixin, PyDeequCompatMeta
from .constraints import ConstraintStatus
from .runners.analysis_runner import AnalyzerContext, do_analysis_run


def _write_text_dfs(spark: Optional[SparkSession], path: str, content: str,
                    overwrite: bool = True) -> None:
    """Write a small text file through the Hadoop FileSystem API so that
    hdfs:// s3:// file:// paths all work on a real cluster
    (parity: io/DfsUtils.scala:43-75 writeToTextFileOnDfs)."""
    try:
        jvm = spark._jvm  # type: ignore[union-attr]
        conf = spark._jsc.hadoopConfiguration()  # type: ignore[union-attr]
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(conf)
        out = fs.create(hpath, overwrite)
        try:
            out.write(bytearray(content.encode("utf-8")))
        finally:
            out.close()
    except Exception:  # pragma: no cover — Spark Connect / no JVM gateway
        with open(path, "w" if overwrite else "x", encoding="utf-8") as f:
            f.write(content)


@dataclass
class VerificationResult(CamelCaseMixin):
    status: CheckStatus
    check_results: Dict[Check, CheckResult]
    metrics: AnalyzerContext

    def success_metrics_as_json(self) -> str:
        return self.metrics.success_metrics_as_json()

    def check_results_as_json(self) -> str:
        """JSON array of simplified per-constraint results
        (parity: VerificationResult.scala:106-124 checkResultsAsJson)."""
        import json
        rows = []
        for check, result in self.check_results.items():
            for cr in result.constraint_results:
                rows.append({
                    "check": check.description,
                    "check_level": check.level.value,
                    "check_status": result.status.value,
                    "constraint": str(cr.constraint),
                    "constraint_status": cr.status.value,
                    "constraint_message": cr.message or "",
                })
        return json.dumps(rows, sort_keys=True)

    def success_metrics_as_dataframe(self, spark: SparkSession) -> DataFrame:
        return self.metrics.success_metrics_as_dataframe(spark)

    def check_results_as_dataframe(self, spark: SparkSession) -> DataFrame:
        """Parity: VerificationResult.scala:55-92."""
        rows = []
        for check, result in self.check_results.items():
            for cr in result.constraint_results:
                rows.append((check.description, check.level.value,
                             result.status.value, str(cr.constraint),
                             cr.status.value, cr.message or ""))
        return spark.createDataFrame(
            rows, "check string, check_level string, check_status string, "
                  "constraint string, constraint_status string, "
                  "constraint_message string")

    def row_level_results_as_dataframe(self, data: DataFrame) -> DataFrame:
        """Annotate each input row with one boolean column per check — AND of
        the check's constraint-level row conditions
        (parity: VerificationResult.scala:94-155).

        Scale note: a pure projection — no aggregation, no shuffle; Catalyst
        fuses it into the scan.
        """
        from .analyzers.base import EmptyStateError
        from .analyzers.grouping import FrequencyBasedAnalyzer

        out = data
        used_names = set(data.columns)
        for check, result in self.check_results.items():
            cond = None
            per_constraint: List = []   # index-aligned row columns
            for cr in result.constraint_results:
                constraint = cr.constraint
                analyzer = getattr(constraint, "analyzer", None)
                row_level = getattr(analyzer, "row_level_results", None)
                if row_level is None:
                    per_constraint.append(None)
                    continue
                # A metric that failed for any reason other than
                # where-filtered-everything (e.g. a precondition like
                # isNumeric/isString) contributes lit(false) — grouped
                # (uniqueness) constraints contribute nothing (parity:
                # VerificationResult.scala:145-155 constraintResultToColumn
                # orElse(lit(false)) / None for RowLevelGroupedConstraint).
                # This also keeps one bad column from poisoning the whole
                # projection with an AnalysisException.
                metric = cr.metric
                usable = metric is not None and (
                    metric.is_success
                    or (isinstance(metric.error, EmptyStateError)
                        and getattr(analyzer, "where", None) is not None))
                if not usable:
                    if isinstance(analyzer, FrequencyBasedAnalyzer):
                        per_constraint.append(None)
                        continue
                    col = F.lit(False)
                else:
                    # Each analyzer encodes its own (where × null-behavior ×
                    # filtered-row-outcome) truth table — three-valued:
                    # filtered rows are TRUE by default or NULL via
                    # AnalyzerOptions(filtered_row=NULL), in-scope NULLs
                    # follow NullBehavior (parity:
                    # VerificationResult.scala:128-147,
                    # Constraint.scala:1214-1288). Value-asserted analyzers
                    # (min/max/length) apply the constraint's assertion
                    # per row.
                    col = row_level(getattr(constraint, "assertion", None))
                    if col is None:
                        # analyzer declares no row-level form for this
                        # configuration (e.g. DuplicateRowCount with empty
                        # columns) — contributes nothing, like grouped
                        # constraints
                        per_constraint.append(None)
                        continue
                per_constraint.append(col)
                # three-valued AND, as the reference's metrics.reduce(_ and _)
                cond = col if cond is None else (cond & col)
            # DQDL composite checks carry an eval tree: the row outcome
            # follows the rule's and/or structure per MEMBER rule, not a
            # flat AND (EvaluateDataQualityRowLevelSpec.scala:275-345)
            tree = getattr(check, "_dqdl_eval_tree", None)
            if tree is not None and "children" in tree:
                def row_tree(node):
                    if "span" in node:
                        s, e = node["span"]
                        cols = [c for c in per_constraint[s:e]
                                if c is not None]
                        if not cols:
                            return None
                        acc = cols[0]
                        for c in cols[1:]:
                            acc = acc & c
                        return acc
                    parts = [row_tree(c) for c in node["children"]]
                    parts = [p for p in parts if p is not None]
                    if not parts:
                        return None
                    acc = parts[0]
                    for p in parts[1:]:
                        acc = (acc | p) if node["op"] == "or" else (acc & p)
                    return acc
                cond = row_tree(tree)
            if cond is not None:
                # two checks sharing a description must not silently
                # overwrite each other's outcome column — suffix an index
                name, i = check.description, 1
                while name in used_names:
                    i += 1
                    name = f"{check.description}_{i}"
                used_names.add(name)
                out = out.withColumn(name, cond)
        return out


class VerificationRunBuilder(CamelCaseMixin):
    """Parity: VerificationRunBuilder.scala:28-180. PyDeequ-compatible
    camelCase access (compat.py): ``.addCheck(c).useRepository(r).run()``."""

    def __init__(self, data: DataFrame):
        self._data = data
        self._checks: List[Check] = []
        self._required_analyzers: List[Analyzer] = []
        self._repository = None
        self._reuse_key = None
        self._fail_if_results_missing = False
        self._save_key = None
        self._state_persister = None
        self._anomaly_checks: List = []
        self._spark: Optional[SparkSession] = None
        self._save_check_results_json_path: Optional[str] = None
        self._save_success_metrics_json_path: Optional[str] = None
        self._overwrite_output_files = True

    def add_check(self, check: Check) -> "VerificationRunBuilder":
        self._checks.append(check)
        return self

    def add_checks(self, checks: Sequence[Check]) -> "VerificationRunBuilder":
        self._checks.extend(checks)
        return self

    def add_required_analyzer(self, analyzer: Analyzer) -> "VerificationRunBuilder":
        self._required_analyzers.append(analyzer)
        return self

    def add_required_analyzers(self, analyzers) -> "VerificationRunBuilder":
        self._required_analyzers.extend(analyzers)
        return self

    def use_repository(self, repository) -> "VerificationRunBuilder":
        self._repository = repository
        return self

    def reuse_existing_results_for_key(
            self, key,
            fail_if_results_missing: bool = False) -> "VerificationRunBuilder":
        """Parity: VerificationRunBuilder.scala:195-205."""
        self._reuse_key = key
        self._fail_if_results_missing = fail_if_results_missing
        return self

    def save_or_append_result(self, key) -> "VerificationRunBuilder":
        self._save_key = key
        return self

    def use_spark_session(self, spark: SparkSession) -> "VerificationRunBuilder":
        """Enable DFS file outputs (parity:
        VerificationRunBuilderWithSparkSession, VerificationRunBuilder.scala:246-263)."""
        self._spark = spark
        return self

    def save_check_results_json_to_path(self, path: str) -> "VerificationRunBuilder":
        """Write check results JSON to a DFS path (e.g. S3) after the run
        (parity: VerificationRunBuilder.scala:252-260)."""
        self._save_check_results_json_path = path
        return self

    def save_success_metrics_json_to_path(self, path: str) -> "VerificationRunBuilder":
        """Write success metrics JSON to a DFS path after the run
        (parity: VerificationRunBuilder.scala:262-271)."""
        self._save_success_metrics_json_path = path
        return self

    def overwrite_previous_files(self, overwrite: bool) -> "VerificationRunBuilder":
        self._overwrite_output_files = overwrite
        return self

    def save_states_with(self, persister) -> "VerificationRunBuilder":
        self._state_persister = persister
        return self

    def aggregate_with(self, loader) -> "VerificationRunBuilder":
        """Merge this run's states with PRIOR states from ``loader``
        before evaluating checks (VerificationRunBuilder.scala:111-116)."""
        self._state_loader = loader
        return self

    def add_anomaly_check(self, strategy, analyzer: Analyzer,
                          check_config=None) -> "VerificationRunBuilder":
        """Parity: VerificationRunBuilder.scala:226-243."""
        from .anomaly import AnomalyCheck
        self._anomaly_checks.append(AnomalyCheck(strategy, analyzer, check_config))
        self._required_analyzers.append(analyzer)
        return self

    def run(self) -> VerificationResult:
        """Parity: VerificationSuite.doVerificationRun (:101-170)."""
        required = list(self._required_analyzers)
        for check in self._checks:
            required.extend(check.required_analyzers())

        context = do_analysis_run(
            self._data, required,
            metrics_repository=self._repository,
            reuse_existing_results_for_key=self._reuse_key,
            fail_if_results_missing=self._fail_if_results_missing,
            save_states_with=self._state_persister,
            aggregate_with=getattr(self, "_state_loader", None))

        checks = list(self._checks)
        for ac in self._anomaly_checks:
            checks.append(ac.to_check(self._repository))

        check_results = {c: c.evaluate(context.metric_map) for c in checks}
        if not check_results:
            status = CheckStatus.SUCCESS
        else:
            order = {CheckStatus.SUCCESS: 0, CheckStatus.WARNING: 1,
                     CheckStatus.ERROR: 2}
            status = max((r.status for r in check_results.values()),
                         key=lambda s: order[s])

        if self._repository is not None and self._save_key is not None:
            self._repository.save(self._save_key, context)

        result = VerificationResult(status, check_results, context)

        # JSON file outputs (parity: VerificationSuite.scala:141-160
        # saveJsonOutputsToFilesystemIfNecessary)
        spark = self._spark or self._data.sparkSession
        if self._save_check_results_json_path is not None:
            _write_text_dfs(spark, self._save_check_results_json_path,
                            result.check_results_as_json(),
                            self._overwrite_output_files)
        if self._save_success_metrics_json_path is not None:
            _write_text_dfs(spark, self._save_success_metrics_json_path,
                            result.success_metrics_as_json(),
                            self._overwrite_output_files)

        return result


class VerificationSuite(CamelCaseMixin, metaclass=PyDeequCompatMeta):
    """Parity: VerificationSuite.scala:49-51. PyDeequ-compatible:
    ``VerificationSuite(spark).onData(df)`` runs verbatim (compat.py)."""

    __strip_leading_spark__ = True

    def on_data(self, data: DataFrame) -> VerificationRunBuilder:
        return VerificationRunBuilder(data)

    @staticmethod
    def run_on_aggregated_states(schema_source, analyzers=None,
                                 state_loaders=(), checks=None,
                                 metrics_repository=None,
                                 save_or_append_results_with_key=None):
        """Evaluate analyzers AND/OR whole checks purely from merged
        partition states — no data scan (parity:
        VerificationSuite.runOnAggregatedStates, the partitioned-table
        pattern in PartitionedTableIntegrationTest.scala:39-110). Returns
        a VerificationResult when checks are given, else the
        AnalyzerContext."""
        from .runners.analysis_runner import run_on_aggregated_states
        checks = list(checks or [])
        required = list(analyzers or [])
        for check in checks:
            required.extend(check.required_analyzers())
        context = run_on_aggregated_states(schema_source, required,
                                           state_loaders)
        if metrics_repository is not None \
                and save_or_append_results_with_key is not None:
            metrics_repository.save(save_or_append_results_with_key, context)
        if not checks:
            return context
        check_results = {c: c.evaluate(context.metric_map) for c in checks}
        order = {CheckStatus.SUCCESS: 0, CheckStatus.WARNING: 1,
                 CheckStatus.ERROR: 2}
        status = max((r.status for r in check_results.values()),
                     key=lambda s: order[s])
        return VerificationResult(status, check_results, context)
