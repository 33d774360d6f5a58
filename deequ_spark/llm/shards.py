"""WebDataset-style tar shard export/import — how prepared corpora
actually reach a training job: fixed-size ``.tar`` shards, each sample
a group of same-stem files (``{key}.txt``, ``{key}.json``,
``{key}.jpg``, ...) so a loader can stream samples sequentially with
no index.

Spark-first shape: shard assignment is a pure expression, shard
construction is one ``applyInPandas`` over the shard groups (one tar
built in memory per task — bounded by the shard size you chose, the
same bound the READER needs), and the manifest (shard, samples, bytes)
comes back as the result DataFrame. Import is ``binaryFile`` +
``mapInPandas`` tar parsing — the exact mirror of the WARC reader, one
non-splittable file per task.

Writes land through Python ``open()`` — a POSIX path visible to every
executor (local disk, NFS, fuse mounts). That matches how shard
pipelines typically operate (write local, sync to object storage);
a direct-to-HDFS/S3 writer would swap the ``open`` for an fsspec/
Hadoop-FS handle at the documented seam.
"""

from __future__ import annotations

import io
import tarfile
from typing import Dict, Optional

import pandas  # noqa: F401 — mapInPandas type hints resolve at module scope
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_webdataset", "read_webdataset"]


def write_webdataset(df: DataFrame, path: str, key_col: str,
                     columns: Dict[str, str],
                     n_shards: int = 16,
                     shard_expr=None) -> DataFrame:
    """Write ``df`` as ``{path}/shard-{id:05d}.tar``; one tar entry per
    (row, column): ``{key}.{ext}`` with ``columns`` mapping column →
    extension. String columns encode UTF-8; binary columns pass
    through. Samples inside a shard are sorted by key and the tar is
    written with GNU-default 10240-byte blocking — byte-deterministic
    output for a given (data, sharding).

    ``shard_expr`` overrides the default ``pmod(key, n_shards)``-style
    assignment (e.g. a hash for non-numeric keys). Returns the manifest
    ``(shard, n_samples, n_bytes)`` — the write happens as the manifest
    evaluates (one action).
    """
    import os
    os.makedirs(path, exist_ok=True)
    if shard_expr is None:
        shard_expr = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
    cols = list(columns)
    data = df.select(F.col(key_col).cast("string").alias("__key"),
                     shard_expr.cast("int").alias("__shard"), *cols)

    def build(pdf):
        import pandas as pd
        shard = int(pdf["__shard"].iloc[0])
        pdf = pdf.sort_values("__key")
        buf = io.BytesIO()
        # uname/uid/mtime pinned so shard bytes are reproducible
        with tarfile.open(fileobj=buf, mode="w",
                          format=tarfile.USTAR_FORMAT) as tar:
            # zip over column arrays, not iterrows(): per-row Series
            # construction is 10-50x slower in this per-shard hot loop
            for key, *vals in zip(pdf["__key"],
                                  *(pdf[c] for c in cols)):
                for c, v in zip(cols, vals):
                    if v is None:
                        continue
                    blob = (v.encode("utf-8") if isinstance(v, str)
                            else bytes(v))
                    info = tarfile.TarInfo(f"{key}.{columns[c]}")
                    info.size = len(blob)
                    info.mtime = 0
                    tar.addfile(info, io.BytesIO(blob))
        payload = buf.getvalue()
        with open(f"{path}/shard-{shard:05d}.tar", "wb") as fh:
            fh.write(payload)
        return pd.DataFrame({"shard": [shard],
                             "n_samples": [len(pdf)],
                             "n_bytes": [len(payload)]})

    return (data.groupBy("__shard")
            .applyInPandas(build, "shard int, n_samples long, n_bytes long"))


def read_webdataset(spark: SparkSession, path: str,
                    columns: Dict[str, str],
                    binary_cols=(),
                    min_partitions: Optional[int] = None) -> DataFrame:
    """Read shards back into one row per sample: ``columns`` maps output
    column → extension (the inverse of :func:`write_webdataset`);
    extensions in ``binary_cols`` stay ``binary``, everything else
    decodes UTF-8. Map-only — a shard is the unit of parallelism."""
    # accept either column NAMES or extensions in binary_cols (the
    # docstring promises extensions; both now work)
    binset = {c for c in columns
              if c in set(binary_cols) or columns[c] in set(binary_cols)}
    schema = "__key string, " + ", ".join(
        f"{c} {'binary' if c in binset else 'string'}" for c in columns)

    def parse(batches):
        import pandas as pd
        for pdf in batches:
            rows = {"__key": []}
            for c in columns:
                rows[c] = []
            for blob in pdf["content"]:
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tar:
                    samples = {}
                    for m in tar.getmembers():
                        # externally produced tars carry directories /
                        # links / pax entries (extractfile -> None) and
                        # extension-less names — skip, don't crash
                        if not m.isfile():
                            continue
                        stem, dot, ext = m.name.rpartition(".")
                        if not dot or not stem:
                            continue
                        samples.setdefault(stem, {})[ext] = \
                            tar.extractfile(m).read()
                    for key in sorted(samples):
                        rows["__key"].append(key)
                        for c, ext in columns.items():
                            raw = samples[key].get(ext)
                            if raw is None:
                                rows[c].append(None)
                            elif c in binset:
                                rows[c].append(raw)
                            else:
                                rows[c].append(raw.decode("utf-8"))
            yield pd.DataFrame(rows)

    files = spark.read.format("binaryFile").load(f"{path}/*.tar")
    if min_partitions:
        files = files.repartition(min_partitions)
    return (files.select("content").mapInPandas(parse, schema)
            .withColumnRenamed("__key", "key"))
