"""Benchmark harness — headline queries + the two-parallelism scaling run.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "throughput": {...}, "scaling": {"local[8]": ..., "local[32]": ...,
                                    "efficiency": ...}}

The scaling block evidences the north-rule two-cluster-size criterion in
this sandbox: the same end-to-end pipeline job at local[N] and local[4N]
over identical input, throughput in M rows/s at both, efficiency =
(rate_4N) / (4 * rate_N).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opentelemetry_collector_contrib_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PIPELINE_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "20000000"))
SCALE_LOW = max(CPUS // 4, 1)


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


TOKENS_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data_cache")


def ensure_tokens_parquet(spark, n_rows: int) -> str:
    """Materialize the deterministic tokens table once (untimed setup — the
    north-rule metric is pipeline throughput over a stored table, the
    Iceberg-scan stand-in)."""
    from opentelemetry_collector_contrib_spark.sources.tokengen import tokens_df

    path = os.path.join(TOKENS_CACHE, f"tokens_{n_rows}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tokens_df(spark, n_rows, num_partitions=64).write.mode("overwrite").parquet(path)
    return path


def run_pipeline_job(spark, path: str, n_rows: int) -> tuple[float, int]:
    """End-to-end tokens pipeline (scan → render → vectorized grok parse
    → severity → broadcast enrich → route → aggregate); returns (sec, rows)."""
    from opentelemetry_collector_contrib_spark.plans.pipeline import full_pipeline
    from opentelemetry_collector_contrib_spark.sources.tokengen import tokens_df

    # warm the Python UDF workers (one-time ~0.5s/worker import cost is
    # session setup, not pipeline throughput)
    warm = tokens_df(spark, 50_000, num_partitions=spark.sparkContext.defaultParallelism)
    full_pipeline(warm, spark, match_once=True)[1].count()

    tokens = spark.read.parquet(path)
    best = float("inf")
    for _ in range(2):  # best-of-2: absorbs sandbox scheduling noise
        t0 = time.time()
        _, aggs = full_pipeline(tokens, spark, match_once=True)
        n = aggs.count()  # forces the whole pipeline
        best = min(best, time.time() - t0)
        assert n > 0
    return best, n_rows


def main() -> None:
    results: dict[str, float] = {}

    spark = get_spark(master=f"local[{CPUS}]", app_name="bench")
    spark.range(10).count()  # warmup

    # headline driver queries at SF_DIR
    from opentelemetry_collector_contrib_spark.driver_queries import REGISTRY

    headline = {
        "tokenize", "parse_severity", "parse_severity_vectorized",
        "agg_counts", "route_multicast", "sampler",
        "window_rank", "running_sum", "tpch_q1", "join_agg",
    }
    for q in REGISTRY:
        if q.name not in headline:
            continue
        t0 = time.time()
        df = q.fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        results[q.name] = round(time.time() - t0, 3)

    # end-to-end pipeline at full parallelism
    tok_path = ensure_tokens_parquet(spark, PIPELINE_ROWS)
    t_pipe, n_rows = run_pipeline_job(spark, tok_path, PIPELINE_ROWS)
    results["pipeline_e2e"] = round(t_pipe, 3)
    rate_hi = n_rows / t_pipe / 1e6
    spark.stop()

    # scaling run at low parallelism (same job, same input size)
    spark_lo = get_spark(
        master=f"local[{SCALE_LOW}]",
        app_name="bench-scale",
        shuffle_partitions=SCALE_LOW * 2,
    )
    spark_lo.range(10).count()
    t_lo, _ = run_pipeline_job(spark_lo, tok_path, PIPELINE_ROWS)
    spark_lo.stop()
    rate_lo = n_rows / t_lo / 1e6

    factor = CPUS / SCALE_LOW
    efficiency = rate_hi / (factor * rate_lo)

    out = {
        "metric": "end-to-end parse→enrich→route→aggregate + headline query suite",
        "value": round(sum(results.values()), 3),
        "unit": "sec",
        "queries": results,
        "sf": _sf_of(SF_DIR),
        "throughput": {
            "pipeline_rows": n_rows,
            f"local[{CPUS}]_mrows_per_s": round(rate_hi, 3),
            f"local[{SCALE_LOW}]_mrows_per_s": round(rate_lo, 3),
        },
        "scaling": {
            "low_parallelism": SCALE_LOW,
            "high_parallelism": CPUS,
            "factor": factor,
            "efficiency": round(efficiency, 3),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
