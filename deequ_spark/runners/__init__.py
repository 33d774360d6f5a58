from .analysis_runner import (AnalyzerContext, do_analysis_run,  # noqa: F401
                              run_on_aggregated_states)
