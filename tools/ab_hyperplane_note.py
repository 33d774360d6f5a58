"""Warm interleaved A/B: per-plane aggregate(zip_with) subtrees (r4 impl)
vs single-fold signature (r5 impl) at planes in {8, 16, 26}.

Protocol of tools/AB_B7_NOTE.md: ONE JVM, warm both variants first, then
interleave A/B/A/B... and report medians. Writes AB_HYPERPLANE_NOTE.md."""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from deequ_spark.llm.similarity import (_hyperplane_matrix,
                                        _hyperplane_signature)


def old_signature(vec: Column, W) -> Column:
    sig = None
    for p, row in enumerate(W):
        dot = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(w)) for w in row]),
                       lambda x, w: x.cast("double") * w),
            F.lit(0.0), lambda acc, x: acc + x)
        bit = F.when(dot >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long"))
        term = F.shiftleft(bit, p)
        sig = term if sig is None else sig.bitwiseOR(term)
    return sig


def main():
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    df = (spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
          .select("vec_id", F.col("embedding").alias("vec")).cache())
    n = df.count()
    dims = len(df.first()["vec"])

    def run(impl, planes):
        W = _hyperplane_matrix(dims, planes, seed=42)
        t0 = time.perf_counter()
        df.select(F.sum(impl(F.col("vec"), W))).collect()
        return time.perf_counter() - t0

    lines = [f"# Hyperplane-signature A/B (n={n}, dims={dims}, local[8], warm)",
             "", "Interleaved in one JVM; 5 reps each after 2 warmups.", ""]
    for planes in (8, 16, 26):
        for impl in (old_signature, _hyperplane_signature):
            run(impl, planes); run(impl, planes)          # warm
        olds, news = [], []
        for _ in range(5):
            olds.append(run(old_signature, planes))
            news.append(run(_hyperplane_signature, planes))
        o, nw = statistics.median(olds), statistics.median(news)
        lines.append(f"- planes={planes}: old {o:.3f}s, new {nw:.3f}s "
                     f"({(o - nw) / o * 100:+.0f}% change, + = new faster)")
        print(lines[-1], flush=True)
    # equivalence spot-check
    W = _hyperplane_matrix(dims, 26, seed=42)
    eq = df.select((old_signature(F.col("vec"), W)
                    == _hyperplane_signature(F.col("vec"), W)).alias("e"))
    assert eq.where(~F.col("e")).count() == 0
    lines.append("")
    lines.append("Signatures bit-identical across impls at planes=26 "
                 "(full-table equality check).")
    with open("/root/repo/tools/AB_HYPERPLANE_NOTE.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
