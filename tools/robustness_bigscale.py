"""Large-scale robustness runs for the round-3 heavy operators
(VERDICT r03 next-round #6): line_dedup, duplicated_spans, curate_corpus
at 100M rows — 5x the bench's 20M-row scale.

Each op runs in its OWN subprocess/SparkSession so shuffle scratch is
reclaimed between ops (the sandbox has ~74 GB free; a single app keeps
its shuffle files until exit). Wall time plus executor shuffle-write /
shuffle-read / spill bytes are read from the Spark REST API before the
session stops, and one JSON line per op is printed for BASELINE.md.

Sandbox disk note (documented, not hidden): the full-length corpus at
100M rows averages 134 tokens/doc = 13.4B tokens; duplicated_spans
explodes one packed int64 window per token (~13.1B x ~18 B raw
~= 220 GB shuffle) and line_dedup moves the rendered text through two
exchanges (~2 x 80 GB) — both beyond the sandbox's free disk, fine on a
cluster with per-node TB-scale scratch. For those two ops the run keeps
100M ROWS (the shuffle-machinery scale under test: task counts, skew,
partial-agg behavior, AQE coalescing) and caps doc length; curate_corpus
runs full-length. Measured per-row shuffle bytes below let the 100 TB
operator size cluster scratch directly.

Measured scratch (this sandbox, first attempt): at a 32-token cap
dup_spans' three live shuffles (window index 29 GB + window agg 27 GB +
doc reassembly ~21 GB — Spark keeps all of an app's shuffle files until
app exit) plus transient sort spill overran the ~75 GB free scratch at
stage 7/9, so the dup_spans default cap is 16 tokens (1.3B windows,
~34 GB of live shuffle + spill headroom); override with
SPARK_GRAFT_ROBUST_DUP_CAP. line_dedup completed at cap 32 with 19.8 GB
shuffle and zero spill.

Usage:
    python tools/robustness_bigscale.py            # run all three
    python tools/robustness_bigscale.py line_dedup # one op (subprocess target)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ROWS = int(os.environ.get("SPARK_GRAFT_ROBUST_ROWS", "100000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CAP_TOKENS = 32  # doc cap for line_dedup (see module doc)
# dup_spans explodes ~(cap-3) int64 windows/doc across three live shuffles;
# 16 fits the sandbox's scratch, 32 does not (measured — module doc)
DUP_CAP = int(os.environ.get("SPARK_GRAFT_ROBUST_DUP_CAP", "16"))
DUP_PASSES = int(os.environ.get("SPARK_GRAFT_ROBUST_DUP_PASSES", "1"))
LINE_TOKENS = 8  # tokens per rendered line for line_dedup


def _rest_metrics(spark) -> dict:
    """Sum executor/stage shuffle + spill bytes from the local REST API."""
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return {}
    try:
        apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages", timeout=10)
        )
        agg = {
            "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in stages),
            "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in stages),
            "disk_spill_bytes": sum(s.get("diskBytesSpilled", 0) for s in stages),
            "memory_spill_bytes": sum(s.get("memoryBytesSpilled", 0) for s in stages),
            "input_bytes": sum(s.get("inputBytes", 0) for s in stages),
            "n_stages": len(stages),
        }
        return agg
    except Exception as exc:  # metrics are evidence, not the run itself
        return {"metrics_error": str(exc)}


def _tokens(spark, cap: int | None):
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.sources.tokengen import tokens_df

    # 512 generator partitions bound per-task memory at 100M rows
    t = tokens_df(spark, N_ROWS, num_partitions=512)
    if cap:
        t = t.select(
            "doc_id",
            F.slice("tokens", 1, cap).alias("tokens"),
            "source",
        )
    return t


def run_line_dedup(spark) -> dict:
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.operators.dedup import line_dedup

    t = _tokens(spark, CAP_TOKENS)
    nlines = F.ceil(F.size("tokens") / LINE_TOKENS).cast("int")
    lined = t.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.transform(
                F.sequence(F.lit(0), nlines - 1),
                lambda j: F.concat_ws(
                    " ",
                    F.transform(
                        F.slice("tokens", j * LINE_TOKENS + 1, LINE_TOKENS),
                        lambda x: x.cast("string"),
                    ),
                ),
            ),
        ).alias("text"),
    )
    out = line_dedup(lined, "doc_id", "text")
    row = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_lines").alias("lines"),
        F.sum("n_kept").alias("kept"),
    ).collect()[0]
    return {"docs": row["docs"], "lines": row["lines"], "kept": row["kept"]}


def run_dup_spans(spark) -> dict:
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.operators.dedup import duplicated_spans
    from opentelemetry_collector_contrib_spark.sources.render import row_idx_col

    t = _tokens(spark, DUP_CAP).select(
        row_idx_col(F.col("doc_id")).alias("doc_id"), "tokens"
    )
    # DUP_PASSES > 1 = the scratch-bounded hash-range iteration (round-5):
    # pass k shuffles ~1/passes of the inverted index, localCheckpoints its
    # doc-bounded partials, and the prior pass's shuffle files are GC'd —
    # the strategy that makes cap-32 fit the sandbox's 75 GB scratch where
    # the single-pass round-4 run spilled 71.6 GB at cap-16.
    # The multi-pass trade is K input re-SCANS — which on a real corpus
    # means re-reading the Iceberg/parquet table, not re-running the
    # synthetic generator. Stage the capped tokens to parquet once so the
    # measured per-pass cost is the honest one (IO scan + pack), exactly
    # what a 100 TB deployment would pay.
    if DUP_PASSES > 1:
        staging = os.path.join(
            REPO, "data_cache", f"robust_tokens_cap{DUP_CAP}_{N_ROWS}"
        )
        if not os.path.exists(os.path.join(staging, "_SUCCESS")):
            t.write.mode("overwrite").parquet(staging)
        t = spark.read.parquet(staging)
    out = duplicated_spans(
        t, "doc_id", "tokens", n=4, min_docs=2, passes=DUP_PASSES
    )
    row = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("npos").alias("windows"),
        F.sum("dup_pos").alias("dup_windows"),
    ).collect()[0]
    return {
        "docs": row["docs"],
        "windows": row["windows"],
        "dup_windows": row["dup_windows"],
        "passes": DUP_PASSES,
    }


def run_curate(spark) -> dict:
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.plans.curate import curate_corpus
    from opentelemetry_collector_contrib_spark.sources.render import row_idx_col

    t = _tokens(spark, None).select(  # full-length tokens
        row_idx_col(F.col("doc_id")).alias("doc_id"),
        "tokens",
        "source",
    )
    weights = {"src-hot": 0.4, "src-warm": 0.3, "src-cold-0": 0.2, "src-cold-1": 0.1}
    out = curate_corpus(
        t, "doc_id", "tokens", "source",
        weights, target_total=20_000_000, num_shards=256, seed=11,
    )
    row = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.count_distinct("shard_id").alias("shards"),
        F.sum(F.size("tokens")).alias("tokens_out"),
    ).collect()[0]
    return {"docs": row["docs"], "shards": row["shards"], "tokens_out": row["tokens_out"]}


def run_lm(spark) -> dict:
    """Round-4 op: bigram-LM train + score at 100M rows.

    The synthetic tokens are UNIFORM over the 50257 vocab — the WORST
    case for a bigram model: distinct observed bigrams are corpus-bounded
    (≈2.3B at full length), not Zipf-concentrated like real text, so the
    weight table cannot broadcast (the first full-length attempt died
    exactly there — rc=1, driver broadcast OOM). This run therefore
    exercises the operator's documented big-vocabulary path:
    broadcast_weights=False (shuffle-hash join on the packed bigram key;
    contexts stay broadcast — vocab-bounded by construction) at cap 16
    (≈0.6B distinct bigrams, sized to the sandbox's 75 GB scratch like
    dup_spans' cap; override with SPARK_GRAFT_ROBUST_LM_CAP)."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.operators.lm import (
        bigram_counts,
        context_counts,
        lm_score,
    )

    t = _tokens(spark, LM_CAP)
    train = t.filter(F.col("source") == "src-hot")
    bg = bigram_counts(train, "tokens")
    cx = context_counts(bg)
    out = lm_score(t, bg, cx, tokens_col="tokens", id_col="doc_id",
                   broadcast_weights=False)
    row = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_big").alias("bigrams"),
        F.sum("score_mean").alias("mean_total"),
    ).collect()[0]
    return {"docs": row["docs"], "bigrams": row["bigrams"],
            "mean_total": row["mean_total"]}


def run_bpe(spark) -> dict:
    """Round-4 op: 3 BPE merge steps at 100M rows — each step one full
    pair-count pass (vocab-bounded exchange) + the JVM rewrite fold.
    checkpoint=False: materializing 100M rewritten rows ×3 would need
    ~160 GB of local storage (fine on a cluster, beyond this sandbox's
    scratch); a 3-deep fold lineage recomputes cheaply instead."""
    from opentelemetry_collector_contrib_spark.operators.bpe import bpe_learn

    t = _tokens(spark, BPE_CAP).select("doc_id", "tokens")
    merges, _ = bpe_learn(t, "tokens", num_merges=3, new_id_start=50257,
                          checkpoint=False)
    return {"merges": [
        {k: m[k] for k in ("step", "a", "b", "cnt")} for m in merges
    ]}


def run_kmeans(spark) -> dict:
    """Round-4 op: distributed Lloyd k-means at 10M × dim-64 embeddings
    (deterministic synthetic vectors from the mix32 hash — uniform
    directions, the balanced-cells case that maximizes assignment
    compute). k=64 cells, 3 iterations + final assignment = 4 passes over
    the cached (id, qe) projection; the only exchange per pass is the
    64-row partial-agg rollup, so wall time is pure scan/codegen — the
    quantity this run sizes. Embedding row count is 1/10th of the token
    ops' 100M because a dim-64 vector row is ~60× a token row's bytes."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.functions.hashing import mix32_col
    from opentelemetry_collector_contrib_spark.operators.similarity import (
        kmeans_train_quantized,
    )

    df = spark.range(0, KMEANS_ROWS, 1, 256).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda d: ((mix32_col(F.col("id") * 64 + d, seed=3) % 2001 - 1000)
                       / 1000.0).cast("float"),
        ).alias("embedding"),
    )
    assignments, cents = kmeans_train_quantized(df, k=64, iters=3)
    row = assignments.agg(
        F.count(F.lit(1)).alias("rows_assigned"),
        F.countDistinct("cell").alias("cells_used"),
        F.sum("cell").alias("cell_sum"),
    ).collect()[0]
    return {
        "rows": KMEANS_ROWS,  # overrides the token ops' N_ROWS in the JSON line
        "rows_assigned": row["rows_assigned"],
        "cells_used": row["cells_used"],
        "cell_sum": row["cell_sum"],
        "centroid0_head": cents[0][:4],
    }


def run_boilerplate(spark) -> dict:
    """Round-4 op: per-source boilerplate strip at 100M rows, same
    8-token line rendering as line_dedup (cap 32 → ~4 lines/doc,
    ~400M lines through the two line-keyed doc-frequency exchanges +
    the strip join + the id reassembly)."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.operators.dedup import (
        boilerplate_strip,
    )

    t = _tokens(spark, CAP_TOKENS)
    nlines = F.ceil(F.size("tokens") / LINE_TOKENS).cast("int")
    lined = t.select(
        "doc_id", "source",
        F.concat_ws(
            "\n",
            F.transform(
                F.sequence(F.lit(0), nlines - 1),
                lambda j: F.concat_ws(
                    " ",
                    F.transform(
                        F.slice("tokens", j * LINE_TOKENS + 1, LINE_TOKENS),
                        lambda x: x.cast("string"),
                    ),
                ),
            ),
        ).alias("text"),
    )
    out = boilerplate_strip(lined, "doc_id", "text", "source",
                            frac_num=1, frac_den=1000, min_docs=2)
    row = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_lines").alias("lines"),
        F.sum("n_kept").alias("kept"),
    ).collect()[0]
    return {"docs": row["docs"], "lines": row["lines"], "kept": row["kept"]}


def run_chunking(spark) -> dict:
    """Round-4 op: RAG sliding-window chunking at 100M full-length rows —
    a zero-shuffle pure-map op; this run measures the scan+explode
    throughput ceiling (the op adds no exchanges to size)."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.operators.packing import (
        chunk_documents,
    )

    t = _tokens(spark, None).select("doc_id", "tokens")
    out = chunk_documents(t, "tokens", "doc_id", window=64, stride=48)
    row = out.agg(
        F.count(F.lit(1)).alias("chunks"),
        F.sum("chunk_len").alias("chunk_tokens"),
    ).collect()[0]
    return {"chunks": row["chunks"], "chunk_tokens": row["chunk_tokens"]}


def run_source_overlap(spark) -> dict:
    """Round-4 op: cross-source contamination matrix at 100M rows.

    Cap 16 sizes the one corpus-scale exchange — ~1.4B exploded
    (source, shingle) rows ≈ 28 GB keyed by shingle — to the sandbox's
    75 GB scratch (the same cap rule as dup_spans/lm_score); uniform
    tokens make nearly every shingle unique, the worst case for the
    groupBy(shingle) width."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.operators.dedup import source_overlap

    t = _tokens(spark, OVERLAP_CAP)
    out = source_overlap(t, "source", "tokens", n=3)
    row = out.agg(
        F.count(F.lit(1)).alias("pairs"),
        F.sum("inter_size").alias("inter_total"),
        F.max("union_size").alias("max_union"),
    ).collect()[0]
    return {"pairs": row["pairs"], "inter_total": row["inter_total"],
            "max_union": row["max_union"]}


def run_winnow(spark) -> dict:
    """Round-4 op: winnowing fingerprint pair candidates at 100M rows.

    Cap 16 → ~14 hashes/doc → ~5 fingerprints/doc at w=4 (density
    2/(w+1)); the inverted-index self-join exchanges ~0.5B (fp, id)
    rows per side. max_fp_freq=50 prunes stop-fingerprints so the
    per-key fan-out stays ≤ 50² regardless of corpus size."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.operators.dedup import winnow_pairs

    t = _tokens(spark, WINNOW_CAP).select("doc_id", "tokens")
    out = winnow_pairs(t, "doc_id", "tokens", n=3, w=4, min_shared=2,
                       max_fp_freq=50)
    row = out.agg(
        F.count(F.lit(1)).alias("pairs"),
        F.max("shared_fp").alias("max_shared"),
    ).collect()[0]
    return {"pairs": row["pairs"], "max_shared": row["max_shared"]}


BPE_CAP = int(os.environ.get("SPARK_GRAFT_ROBUST_BPE_CAP", "32"))
LM_CAP = int(os.environ.get("SPARK_GRAFT_ROBUST_LM_CAP", "16"))
KMEANS_ROWS = int(os.environ.get("SPARK_GRAFT_ROBUST_KMEANS_ROWS", "10000000"))
OVERLAP_CAP = int(os.environ.get("SPARK_GRAFT_ROBUST_OVERLAP_CAP", "16"))
WINNOW_CAP = int(os.environ.get("SPARK_GRAFT_ROBUST_WINNOW_CAP", "16"))

OPS = {
    "line_dedup": (run_line_dedup, CAP_TOKENS),
    "dup_spans": (run_dup_spans, DUP_CAP),
    "curate_corpus": (run_curate, None),
    "lm_score": (run_lm, LM_CAP),
    "bpe_learn": (run_bpe, BPE_CAP),
    "kmeans_train": (run_kmeans, None),
    "source_overlap": (run_source_overlap, OVERLAP_CAP),
    "winnow_pairs": (run_winnow, WINNOW_CAP),
    "boilerplate_strip": (run_boilerplate, CAP_TOKENS),
    "chunk_documents": (run_chunking, None),
}


def _run_one(name: str) -> None:
    from opentelemetry_collector_contrib_spark.session import get_spark

    fn, cap = OPS[name]
    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name=f"robust-{name}",
        # ~54 GB of shuffle at 100M rows / 512 partitions ≈ 100 MB per
        # reduce task — the maxPartitionBytes-scale sizing rule; AQE
        # coalesces the small stages back down
        shuffle_partitions=512,
        # get_spark disables the UI by default; the REST API is the
        # shuffle/spill evidence source for this run, so turn it on
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.range(10).count()  # JVM warm
    t0 = time.time()
    stats = fn(spark)
    wall = time.time() - t0
    metrics = _rest_metrics(spark)
    spark.stop()
    print("ROBUST " + json.dumps({
        "op": name, "rows": N_ROWS, "token_cap": cap,
        "wall_s": round(wall, 1), **stats, **metrics,
    }))


def main() -> None:
    if len(sys.argv) > 1:
        _run_one(sys.argv[1])
        return
    for name in OPS:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name],
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        for ln in r.stdout.splitlines():
            if ln.startswith("ROBUST "):
                print(ln)
        if r.returncode != 0:
            print(f"ROBUST {json.dumps({'op': name, 'rc': r.returncode})}")


if __name__ == "__main__":
    main()
