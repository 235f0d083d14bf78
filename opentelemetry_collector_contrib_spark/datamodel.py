"""Canonical schemas for the rebuilt log pipeline.

The reference's row model is a dynamic tree (plog.Logs → ResourceLogs →
ScopeLogs → LogRecord with `any`-typed body/attributes —
`pkg/stanza/entry/entry.go:14-26`, `pkg/ottl/contexts/ottllog/log.go:153-222`).
Per SURVEY §1.2 we flatten it to a fixed columnar StructType: everything the
pipeline touches repeatedly is a real column; truly dynamic residue lives in a
`map<string,string>` attributes column.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The north-rule input table: pre-tokenized training sequences.
TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)

# Envelope of a parsed log record (stanza Entry / plog.LogRecord analog).
LOG_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), True),  # event time (time parser)
        T.StructField("observed_ts", T.TimestampType(), True),  # ingest time
        T.StructField("severity_text", T.StringType(), True),
        T.StructField("severity_number", T.IntegerType(), True),
        T.StructField("body", T.StringType(), True),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("resource", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("trace_id", T.StringType(), True),
        T.StructField("span_id", T.StringType(), True),
    ]
)

# Broadcast enrich dimension (k8sattributes / resource processor analog,
# FIXTURES.md §2). `src-cold-9` is deliberately absent → left-join null path.
SOURCE_LOOKUP_ROWS = [
    # (source, team, region, tier, sample_pct)
    ("src-hot", "core", "us", "prod", 100.0),
    ("src-warm", "core", "eu", "prod", 100.0),
    ("src-cold-0", "search", "us", "prod", 100.0),
    ("src-cold-1", "search", "eu", "staging", 50.0),
    ("src-cold-2", "ads", "us", "prod", 100.0),
    ("src-cold-3", "ads", "eu", "dev", 25.0),
    ("src-cold-4", "infra", "ap", "prod", 100.0),
    ("src-cold-5", "infra", "eu", "staging", 50.0),
    ("src-cold-6", "ml", "us", "prod", 100.0),
    ("src-cold-7", "ml", "ap", "dev", 25.0),
    ("src-cold-8", "data", "eu", "prod", 100.0),
    # src-cold-9 intentionally missing (GetPod-miss analog)
]

SOURCE_LOOKUP_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("team", T.StringType(), True),
        T.StructField("region", T.StringType(), True),
        T.StructField("tier", T.StringType(), True),
        T.StructField("sample_pct", T.DoubleType(), True),
    ]
)

# written by plans/checkpoint.py CheckpointedRunner._append — keep in sync
CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("chunk_id", T.StringType(), False),
        T.StructField("rows", T.LongType(), False),
        T.StructField("tokens", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("rows_out", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
    ]
)
