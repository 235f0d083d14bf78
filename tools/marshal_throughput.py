"""One-shot throughput measurement of sink marshal paths at bench scale
(20M rows) — evidence that the pure-Python byte assembly, which is
row-iterating by necessity (wire codecs, same sink boundary as the
webdataset tar writer), still clears the reference's 10k items/s testbed
gate by orders of magnitude when Arrow-fed and sharded (`splits` bounds
per-message size AND gives the stage its parallelism).

Modes: ``kafka`` (otlp_proto messages, default), ``es`` (elasticsearch
bulk NDJSON), ``loki`` (translator JSON entries), ``hec`` (splunk HEC
events) — the last three are pure maps, no grouping exchange at all —
and ``fluent``, which measures the RECEIVE direction: forward-protocol
event streams (forward mode, 32 entries/event) are staged to parquet as
blobs and the timed window is scan + ``fluent_log_records`` msgpack
decode back to flat records.

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


def _stage_fluent_blobs(spark, t, stage_dir: str) -> None:
    """Stage forward-mode fluent event blobs to parquet: 32 entries per
    event, one event per output row (the reference's default chunk shape;
    `fluentforwardreceiver` sees one stream per connection — here one per
    row, which is the same decode surface). Staging is EXCLUDED from the
    timed window, so this can be a plain python encode pass."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from opentelemetry_collector_contrib_spark.sources.fluentforward import (
        encode_event,
    )

    flat = t.select(
        (F.lit(1704067200) + F.col("idx") % 86400).cast("long").alias("ts"),
        F.concat_ws(" ", F.transform("tokens", lambda x: x.cast("string")))
        .alias("log"),
        F.col("source").alias("src"),
    )
    schema = T.StructType([T.StructField("value", T.BinaryType())])

    def enc(batches):
        pending: list = []

        def drain(rows: list) -> bytes:
            entries = [
                (int(ts), {"log": log, "source": src})
                for ts, log, src in rows
            ]
            return encode_event("bench.tokens", entries, mode="forward")

        for pdf in batches:
            pending.extend(zip(pdf["ts"], pdf["log"], pdf["src"]))
            blobs = []
            while len(pending) >= 32:
                blobs.append(drain(pending[:32]))
                pending = pending[32:]
            if blobs:
                yield pd.DataFrame({"value": blobs})
        if pending:
            yield pd.DataFrame({"value": [drain(pending)]})

    flat.mapInPandas(enc, schema).write.mode("overwrite").parquet(stage_dir)


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
    if MODE == "fluent":
        _stage_fluent_blobs(spark, t, stage_dir)
        blobs = spark.read.parquet(stage_dir)
        from opentelemetry_collector_contrib_spark.sources.fluentforward import (
            fluent_log_records,
        )

        t0 = time.time()
        recs = fluent_log_records(blobs)
        row = recs.agg(
            F.count(F.lit(1)).alias("messages"),
            F.sum(F.length("body")).alias("bytes"),
        ).collect()[0]
        wall = time.time() - t0
        print("MARSHAL " + json.dumps({
            "mode": MODE,
            "rows": N,
            "splits": None,
            "messages": row["messages"],
            "decoded_body_bytes": int(row["bytes"]),
            "wall_s": round(wall, 1),
            "rows_per_s": round(N / wall),
            "mb_per_s": round(row["bytes"] / wall / 1e6, 1),
        }))
        spark.stop()
        return
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
