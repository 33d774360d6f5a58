"""sf1.0 bench datapoint: synthesize a 10x (sf1.0-equivalent) dataset from
the sf0.1 tables, run the FULL bench suite against it, and emit
BENCH_SF1_r04-style JSON with per-query times, the sf0.1-vs-sf1.0 ratio
per query, and the b6/b11 candidate-pair counts at both scales.

Synthesis (DuckDB, deterministic):
* lineitem/orders/customer — 10 key-shifted copies (copy c shifts every
  join/uniqueness key by c*1e8), preserving uniqueness ratios, the
  orders->customer FK, and per-copy value distributions;
* documents — copy 0 = originals, copies 1..9 remap every word to
  md5(word|copy): an intra-copy isomorphism (identical shingle/LSH pair
  structure per copy) with cross-copy-DISJOINT vocabularies, so 10x
  candidates ≈ 10 × 1x candidates (same trick as tools/scale_check.py;
  the earlier word-shuffle collapsed similar word bags into an
  artifactual cross-copy near-dup soup — 327k spurious pairs at 10x);
* embeddings — 20k fresh seeded uniform vectors (near-dup structure of
  random vectors is density-driven; fresh draws keep it realistic).

Usage: python tools/bench_sf1.py [workdir] [out_json]
       (defaults /tmp/deequ_sf1.0 and BENCH_SF1.json)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"


def synthesize(workdir: str) -> None:
    import duckdb
    os.makedirs(workdir, exist_ok=True)
    con = duckdb.connect()
    shift = 100_000_000
    con.execute(f"""
COPY (
  SELECT c * {shift} + l_orderkey AS l_orderkey, l_partkey, l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{SF01}/lineitem.parquet', (SELECT unnest(range(10)) AS c)
) TO '{workdir}/lineitem.parquet' (FORMAT PARQUET)
""")
    con.execute(f"""
COPY (
  SELECT c * {shift} + o_orderkey AS o_orderkey,
         c * {shift} + o_custkey AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SF01}/orders.parquet', (SELECT unnest(range(10)) AS c)
) TO '{workdir}/orders.parquet' (FORMAT PARQUET)
""")
    con.execute(f"""
COPY (
  SELECT c * {shift} + c_custkey AS c_custkey,
         c_name || '_' || c AS c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM '{SF01}/customer.parquet', (SELECT unnest(range(10)) AS c)
) TO '{workdir}/customer.parquet' (FORMAT PARQUET)
""")
    con.execute(f"""
COPY (
  WITH base AS (SELECT * FROM '{SF01}/documents.parquet'),
  copies AS (SELECT unnest(range(10)) AS c)
  SELECT c * 1000000 + doc_id AS doc_id,
         CASE WHEN c = 0 THEN text
              ELSE array_to_string(
                     list_transform(string_split(text, ' '),
                       w -> substr(md5(w || '|' || c), 1, 8)), ' ')
         END AS text,
         lang, source, n_chars
  FROM base, copies
) TO '{workdir}/documents.parquet' (FORMAT PARQUET)
""")
    # events: ten user-shifted copies (key cardinality scales WITH data,
    # the honest shape for keyed-window/temporal-join scale tests) —
    # needed by b19-b21 since r8
    con.execute(f"""
COPY (
  SELECT c * 10000000000 + event_id AS event_id,
         c * {shift} + user_id AS user_id,
         ts, event_type, value
  FROM '{SF01}/events.parquet', (SELECT unnest(range(10)) AS c)
) TO '{workdir}/events.parquet' (FORMAT PARQUET)
""")
    con.execute("SELECT setseed(0.42)")
    con.execute(f"""
COPY (
  SELECT CAST(i AS BIGINT) AS vec_id,
         [CAST(random() * 2 - 1 AS FLOAT) for j in range(64)] AS embedding,
         CAST(i % 10 AS BIGINT) AS label
  FROM range(20000) t(i)
) TO '{workdir}/embeddings.parquet' (FORMAT PARQUET)
""")


def candidate_counts(workdir: str) -> dict:
    """b6/b11 candidate + verified pair counts at 1x and 10x — evidence
    the bucketed plans stay ~linear instead of quadratic."""
    from pyspark.sql import SparkSession

    from deequ_spark.llm import embedding_near_duplicates, minhash_lsh_pairs

    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("sf1-candidates").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for label, d in (("sf0.1", SF01), ("sf1.0", workdir)):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        out[label] = {
            "b6_candidate_pairs": minhash_lsh_pairs(
                docs, "doc_id", "text", threshold=0.8,
                verify_exact=False).count(),
            "b6_verified_pairs": minhash_lsh_pairs(
                docs, "doc_id", "text", threshold=0.8).count(),
            "b11_verified_pairs": embedding_near_duplicates(
                emb, "vec_id", "embedding", threshold=0.9,
                auto_tune=True).count(),
            "documents_rows": docs.count(),
            "embeddings_rows": emb.count(),
        }
        # linearity telemetry: the asserted gate lives in
        # tools/scale_check.py (candidate_pairs ≤ 3·docs); surface the
        # per-doc rate here so round-over-round growth is visible
        rate = (out[label]["b6_candidate_pairs"]
                / max(out[label]["documents_rows"], 1))
        out[label]["b6_candidates_per_doc"] = round(rate, 3)
        out[label]["b6_linear_ok"] = rate <= 3.0
    spark.stop()
    return out


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/deequ_sf1.0"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SF1.json"
    t0 = time.time()
    if not all(os.path.exists(f"{workdir}/{t}.parquet")
               for t in ("embeddings", "events")):
        synthesize(workdir)
    synth_sec = round(time.time() - t0, 1)

    def run_bench(sf_dir):
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
        p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                           capture_output=True, text=True, env=env, cwd=REPO)
        last = [ln for ln in p.stdout.strip().splitlines()
                if ln.startswith("{")][-1]
        return json.loads(last)

    b01 = run_bench(SF01)
    b10 = run_bench(workdir)
    ratios = {q: round(b10["queries"][q] / max(b01["queries"][q], 1e-9), 2)
              for q in b10["queries"]}
    result = {
        "metric": "deequ_spark_suite_seconds_sf1",
        "value": b10["value"],
        "unit": "sec",
        "sf01_value": b01["value"],
        "queries_sf1": b10["queries"],
        "queries_sf01": b01["queries"],
        "ratio_10x": ratios,
        "synthesize_sec": synth_sec,
        "candidates": candidate_counts(workdir),
    }
    with open(os.path.join(REPO, out_json), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
