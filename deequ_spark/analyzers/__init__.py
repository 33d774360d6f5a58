from .base import Analyzer, ScanShareableAnalyzer, State  # noqa: F401
