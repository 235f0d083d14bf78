"""One-shot throughput measurement of sink marshal paths at bench scale
(20M rows) — evidence that the pure-Python byte assembly, which is
row-iterating by necessity (wire codecs, same sink boundary as the
webdataset tar writer), still clears the reference's 10k items/s testbed
gate by orders of magnitude when Arrow-fed and sharded (`splits` bounds
per-message size AND gives the stage its parallelism).

Modes: ``kafka`` (otlp_proto messages, default), ``es`` (elasticsearch
bulk NDJSON), ``loki`` (translator JSON entries), ``hec`` (splunk HEC
events) — the last three are pure maps, no grouping exchange at all.

The flat input is STAGED TO PARQUET first and the timed window starts at
the parquet scan (the dup_spans-runner discipline: staging excluded, so
the number is marshal + honest scan IO, not synthetic-generation cost —
measured: chaining the tokengen mapInPandas python stage directly into
the marshal python stage costs ~5× at 1M rows because every ~1 KB body
crosses the JVM↔Python Arrow pipe twice in one task).

Usage: python tools/marshal_throughput.py [rows] [splits] [kafka|es|loki|hec]
(``splits`` only applies to kafka — the pure-map modes ignore it and
report splits=null). Prints one MARSHAL json line.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
SPLITS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
MODE = sys.argv[3] if len(sys.argv) > 3 else "kafka"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.operators.kafka_exporter import (
        kafka_messages,
    )
    from opentelemetry_collector_contrib_spark.session import get_spark
    from opentelemetry_collector_contrib_spark.sources.render import row_idx_col
    from opentelemetry_collector_contrib_spark.sources.tokengen import tokens_df

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=256)
    spark.range(10).count()
    t = tokens_df(spark, N, num_partitions=256).withColumn(
        "idx", row_idx_col(F.col("doc_id"))
    )
    flat = t.select(
        (F.lit(1704067200_000_000_000) + F.col("idx") * 1000).alias(
            "time_unix_nano"
        ),
        (F.col("idx") % 24 + 1).cast("int").alias("severity_number"),
        F.lit("info").alias("severity_text"),
        F.concat_ws(" ", F.transform("tokens", lambda x: x.cast("string")))
        .alias("body"),
        F.create_map(F.lit("k"), (F.col("idx") % 7).cast("string")).alias(
            "attributes"
        ),
        F.create_map(F.lit("service.name"), F.col("source")).alias("resource"),
        F.lit("recv/filelog").alias("scope_name"),
        F.lit("").alias("trace_id"),
        F.lit("").alias("span_id"),
    )
    import shutil
    import tempfile

    stage_dir = tempfile.mkdtemp(prefix="marshal_stage_")
    import atexit

    atexit.register(shutil.rmtree, stage_dir, ignore_errors=True)
    flat.write.mode("overwrite").parquet(stage_dir)
    flat = spark.read.parquet(stage_dir)
    t0 = time.time()
    if MODE == "es":
        from opentelemetry_collector_contrib_spark.operators.es_exporter import (
            es_bulk_messages,
        )

        msgs = es_bulk_messages(flat)
    elif MODE == "loki":
        from opentelemetry_collector_contrib_spark.operators.loki_exporter import (
            loki_entries,
        )

        msgs = loki_entries(flat).select(F.col("line").alias("value"))
    elif MODE == "hec":
        from opentelemetry_collector_contrib_spark.operators.splunk_exporter import (
            hec_events,
        )

        msgs = hec_events(flat)
    else:
        msgs = kafka_messages(
            flat, "otel-logs", encoding="otlp_proto", splits=SPLITS
        )
    row = msgs.agg(
        F.count(F.lit(1)).alias("messages"),
        F.sum(F.length("value")).alias("bytes"),
    ).collect()[0]
    wall = time.time() - t0
    print("MARSHAL " + json.dumps({
        "mode": MODE,
        "rows": N,
        "splits": SPLITS if MODE == "kafka" else None,
        "messages": row["messages"],
        "marshaled_bytes": int(row["bytes"]),
        "wall_s": round(wall, 1),
        "rows_per_s": round(N / wall),
        "mb_per_s": round(row["bytes"] / wall / 1e6, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
