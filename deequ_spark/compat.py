"""PyDeequ-style camelCase compatibility layer.

The reference's Python audience uses PyDeequ, whose fluent API is
camelCase (``Check(spark, CheckLevel.Warning, "desc").hasSize(...)``,
``VerificationSuite(spark).onData(df).addCheck(c).run()`` — see
pydeequ README / pydeequ/checks.py in the public package).  This repo's
native surface is snake_case; the mixin below forwards any camelCase
attribute to its snake_case twin at lookup time, so PyDeequ examples run
verbatim against ``deequ_spark`` — no wrapper classes, no duplicated
method lists, nothing to keep in sync when builders gain methods.

Also mirrored: PyDeequ constructors take a leading ``SparkSession``
(``Check(spark, level, desc)``, ``VerificationSuite(spark)``) which the
JVM-gateway wrapper needed and pure PySpark does not — the shims accept
and ignore it.
"""

from __future__ import annotations

import re

# split lower→Upper boundaries AND the end of capital runs (acronyms):
# containsURL -> contains_url, hasApproxCountDistinct -> has_approx_…
_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")


def camel_to_snake(name: str) -> str:
    return _CAMEL_RE.sub("_", name).lower()


def snake_candidates(name: str):
    """camelCase -> candidate snake_case names. 'DataFrame' splits to
    data_frame but this codebase (like PySpark) writes 'dataframe' —
    try both."""
    snake = camel_to_snake(name)
    if snake != name:
        yield snake
        alt = snake.replace("_data_frame", "_dataframe")
        if alt != snake:
            yield alt


class CamelCaseMixin:
    """Resolve ``obj.someCamelName`` to ``obj.some_camel_name``.

    ``__getattr__`` only fires when normal lookup fails, so native
    snake_case access pays nothing and nothing is shadowed."""

    def __getattr__(self, name: str):
        if not name.startswith("_"):
            for snake in snake_candidates(name):
                try:
                    # full normal lookup (instance + class, bound methods)
                    return object.__getattribute__(self, snake)
                except AttributeError:
                    pass
        raise AttributeError(
            f"{type(self).__name__!r} object has no attribute {name!r}")


class PyDeequCompatMeta(type):
    """Two class-level PyDeequ conventions:

    * camelCase STATIC access — ``AnalysisRunner.onData(df)`` resolves
      to ``AnalysisRunner.on_data`` (instance access is handled by
      :class:`CamelCaseMixin`; this covers the classes PyDeequ calls
      without instantiating).
    * leading ``SparkSession`` constructor argument — PyDeequ's
      JVM-gateway wrappers all take ``spark`` first
      (``Check(spark, level, desc)``, ``VerificationSuite(spark)``,
      ``FileSystemMetricsRepository(spark, path)``); pure PySpark does
      not need it, so classes opting in via
      ``__strip_leading_spark__ = True`` accept and drop it.  Classes
      that genuinely consume a SparkSession (SparkTableMetricsRepository)
      simply don't opt in.
    """

    def __getattr__(cls, name):
        if not name.startswith("_"):
            for snake in snake_candidates(name):
                try:
                    return super().__getattribute__(snake)
                except AttributeError:
                    pass
        raise AttributeError(
            f"type {cls.__name__!r} has no attribute {name!r}")

    def __call__(cls, *args, **kwargs):
        if args and getattr(cls, "__strip_leading_spark__", False):
            from pyspark.sql import SparkSession
            if isinstance(args[0], SparkSession):
                args = args[1:]
        return super().__call__(*args, **kwargs)
