"""One-shot throughput measurement of the kafka otlp_proto marshal path
at bench scale (20M rows) — evidence that the pure-Python wire codec,
which is row-iterating by necessity (protobuf byte assembly, same sink
boundary as the webdataset tar writer), still clears the reference's
10k items/s testbed gate by orders of magnitude when Arrow-fed and
sharded (`splits` bounds per-message size AND gives the stage its
parallelism).

Usage: python tools/marshal_throughput.py [rows] [splits]
Prints one MARSHAL json line.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
SPLITS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
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
    t0 = time.time()
    msgs = kafka_messages(flat, "otel-logs", encoding="otlp_proto", splits=SPLITS)
    row = msgs.agg(
        F.count(F.lit(1)).alias("messages"),
        F.sum(F.length("value")).alias("bytes"),
    ).collect()[0]
    wall = time.time() - t0
    print("MARSHAL " + json.dumps({
        "rows": N,
        "splits": SPLITS,
        "messages": row["messages"],
        "marshaled_bytes": int(row["bytes"]),
        "wall_s": round(wall, 1),
        "rows_per_s": round(N / wall),
        "mb_per_s": round(row["bytes"] / wall / 1e6, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
