"""deequ_spark — a PySpark-native data-quality engine with the capabilities
of awslabs/deequ (reference at /root/reference), rebuilt Spark-first.

Core idea: analyzers compile to ``pyspark.sql`` aggregate expressions and
are fused into minimal Spark jobs (one scan for all scan-shareable
analyzers; one shuffle per distinct GROUP BY). States are mergeable
sufficient statistics enabling incremental computation. Zero JVM code,
zero Python UDFs on the hot path.
"""

from .analyzers.base import (Analyzer, CorrelationState, FourthMomentState,
                             MaxState, MeanState, MinState, NumMatches,
                             NumMatchesAndCount, ScanShareableAnalyzer,
                             StandardDeviationState, State, SumState,
                             ThirdMomentState)
from .analyzers.grouping import (CountDistinct, Distinctness,
                                 DuplicateRowCount, Entropy,
                                 FrequenciesAndNumRows, Histogram,
                                 HistogramBinned, MutualInformation,
                                 Uniqueness, UniqueValueRatio,
                                 compute_frequencies)
from .analyzers.scan import (AggregatedMetricState, AnalyzerOptions,
                             ApproxCountDistinct,
                             ApproxQuantile, ApproxQuantiles, ColumnCount,
                             ColumnExists, ColumnRange, Completeness,
                             Compliance, Correlation, CustomAggregator,
                             CustomSql, DataType, DataTypeInstances,
                             ExactQuantile, FilteredRowOutcome,
                             InterquartileRange, Kurtosis, Maximum,
                             MaxLength, Mean, Minimum, MinLength,
                             NullBehavior, PatternMatch, Patterns,
                             RatioOfSums, Size, Skewness, StandardDeviation,
                             Sum, Variance, ZerosCount, determine_type)
from .analyzers.corpus import NearDuplicateRatio, NearDupState
from .analyzers.robust import (MADState, MedianAbsoluteDeviation,
                               RobustOutlierCount, mad_outlier_flags)
from .analyzers.embedding import EmbeddingQuality, EmbeddingStatsState
from .analyzers.kll import (BucketDistribution, BucketValue, KLLMetric,
                            KLLParameters, KLLSketch, KLLState,
                            compute_kll_states)
from .checks import (Check, CheckLevel, CheckResult, CheckStatus,
                     ConstrainableDataTypes)
from .constraints import (AnalysisBasedConstraint, Constraint,
                          ConstraintResult, ConstraintStatus)
from .metrics import (Distribution, DistributionValue, DoubleMetric, Entity,
                      HistogramMetric, KeyedDoubleMetric, Metric)
from .runners.analysis_runner import (AnalysisRunBuilder, AnalysisRunner,
                                      AnalyzerContext, do_analysis_run,
                                      run_on_aggregated_states)
from .verification import (VerificationResult, VerificationRunBuilder,
                           VerificationSuite)
from .repository import (FileSystemMetricsRepository,
                         InMemoryMetricsRepository,
                         SparkTableMetricsRepository, ResultKey)
from .states import (FileSystemStateProvider, InMemoryStateProvider,
                     StateProvider)
from .anomaly import (AbsoluteChangeStrategy, Anomaly, AnomalyCheckConfig,
                      AnomalyDetector, BatchNormalStrategy, DataPoint,
                      DetectionResult, HoltWinters, MADStrategy,
                      OnlineNormalStrategy,
                      RateOfChangeStrategy, RelativeRateOfChangeStrategy,
                      SimpleThresholdStrategy)
from .comparison import (ComparisonResult, DataSynchronization,
                         table_diff,
                         DatasetMatchAnalyzer, DatasetMatchState,
                         ReferentialIntegrity, RowCountMatch, SchemaMatch)
from .profiles import (ColumnProfile, ColumnProfilerRunner,
                       column_profiles_to_json, profile_columns)
from .suggestions import (DEFAULT_RULES, EXTENDED_RULES, NUMERICAL_RULES,
                          STRING_RULES, ConfidenceInterval,
                          ConfidenceIntervalStrategy, ConstraintSuggestion,
                          ConstraintSuggestionRunner, WaldIntervalStrategy,
                          WilsonScoreIntervalStrategy)
from .schema_validation import (RowLevelSchema, RowLevelSchemaValidationResult,
                                validate_schema)
from .distance import (categorical_distance, chi_square_p_value,
                       chi_square_statistic, ks_distance,
                       l_infinity_distance, numerical_distance, psi)
from .streaming import (StreamingBatchResult, StreamingVerification,
                        streaming_deduplicate, streaming_deduplicate_exact,
                        streaming_fingerprint_deduplicate, verify_stream)
from .dqdl import EvaluateDataQuality
from .windowed import windowed_agg_plan, windowed_metrics
from .diagnostics import (file_report, key_skew_report, partition_report,
                          salted_agg, suggest_skew_mitigation)
from .bloom import (bloom_anti_join, bloom_might_contain,
                    bloom_semi_join, bloom_shape, build_bloom,
                    merge_blooms)
from .joins import asof_join, interval_join, rolling_stats
from .slicing import (sliced_grouped_metrics, sliced_metrics,
                      sliced_verification)
from .applicability import Applicability, ApplicabilityResult

__version__ = "0.1.0"
