"""Data-selection operators: DSIR importance resampling, per-source token
budgets, and deterministic stratified splits.

These are the selection stages of an LLM training-data pipeline — after
dedup/quality gates decide what MAY go in, these decide what DOES:

- DSIR (Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling"): estimate hashed-n-gram bag models for a target
  domain and the raw pool, weight every raw document by its likelihood
  ratio under the two models, and resample toward the target. §2.2's
  features are hashed n-grams (we hash packed bigrams into B buckets);
  §2.3's weights are log λ_target(b) − log λ_raw(b) summed over a doc's
  features. Following the repo's oracle rule (no libm logs — not
  bit-portable), each occurrence scores the FIXED-POINT likelihood ratio

      w(b) = (SCALE · (c_t(b)+1) DIV (c_r(b)+1)) · R DIV T

  (add-one smoothing, R/T = raw/target total feature counts), and a
  document's importance score is the integer SUM of its occurrences'
  ratios — arithmetic instead of geometric aggregation, the same
  monotone signal, bit-exact in any engine (the lm.py precedent).
  Selection is deterministic top-k by (score desc, doc_id) — the
  importance-RANKED analog of DSIR's sampling-without-replacement.

  Overflow bounds (documented, not hoped): SCALE·(c_t+1) < 2^63 needs
  c_t < 2^43 per bucket at SCALE = 2^20; the second step needs
  q·R < 2^63 where q ≤ SCALE·(c_t+1). Within a 10^12-token corpus both
  hold unless one bucket absorbs ≳2^42 target n-grams — raise B (more
  buckets) or lower SCALE if a corpus approaches that.

- Token budgets ("epoching" / per-domain caps, as in The Pile / LLaMA
  mixture tables): keep documents from each source, in a deterministic
  pseudo-random order, until the source's token budget is exhausted.
  The order is mix32(doc_idx) — stable across cluster sizes — and a doc
  is kept iff the tokens BEFORE it (exclusive running sum) fit the
  budget, so one over-long doc can close out a budget exactly the same
  way in both engines.

- Stratified split: train/val/test assignment from the HIGH bits of
  mix32(doc_idx, seed) (low multiplicative-hash bits depend only on
  doc_idx mod 2^k — hashing.py's documented weakness), so every
  (source, split) cell gets its expected share and membership is a pure
  function of the row — resumable, cluster-size-independent.

Physical shapes, sized for 10^12 sequences:
- dsir: ONE corpus exchange bounded by 2·B rows (groupBy bucket of the
  exploded hashed features, target/raw counted in the same pass via
  conditional sums); the 2B-row model table broadcasts back; per-doc
  score re-aggregate collapses map-side to ~one row per doc; top-k is
  TakeOrderedAndProject (no global sort).
- token_budget_cap: one hash exchange on source + per-source window sort
  (the canonical distributed budget scan — each source's docs sort
  within its partitions; skewed sources rely on the same salting/AQE
  notes as recombine).
- stratified_split: map-only assignment + a cell-bounded aggregate.

Reference anchor: the reference collector has no selection stage; these
are training-data-pipeline additions (prompt requirement) following the
cited papers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import mix32_col

DSIR_BUCKETS = 1024
DSIR_SCALE = 1 << 20
_M32 = 1 << 32


def _bucket_col(gram: F.Column, n_buckets: int, seed: int) -> F.Column:
    """HIGH-bits bucket of mix32 (low bits are the weak ones)."""
    return (mix32_col(gram, seed=seed) / F.lit(_M32 // n_buckets)).cast("int")


def dsir_feature_counts(
    df: DataFrame,
    tokens_col: str = "tokens",
    is_target: F.Column | None = None,
    vocab: int = 50257,
    n_buckets: int = DSIR_BUCKETS,
    seed: int = 7,
) -> DataFrame:
    """(bucket, c_t, c_r) hashed-bigram counts — ONE corpus pass.

    Target and raw are counted together with conditional sums, so the
    corpus is scanned once and the exchange carries ≤ n_buckets rows
    (map-side partial agg collapses each partition first). ``is_target``
    is any boolean Column over the input rows (e.g. source == 'wiki').
    """
    if is_target is None:
        is_target = F.lit(False)
    grams = F.expr(
        f"transform(slice({tokens_col}, 1, greatest(size({tokens_col}) - 1, 0)), "
        f"(x, i) -> cast(x as bigint) * {vocab} + {tokens_col}[i + 1])"
    )
    ex = df.filter(F.size(F.col(tokens_col)) >= 2).select(
        is_target.alias("__t"), F.explode(grams).alias("g")
    )
    b = _bucket_col(F.col("g"), n_buckets, seed)
    return (
        ex.select(b.alias("bucket"), "__t")
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("__t"), 1).otherwise(0)).cast("long").alias("c_t"),
            F.count(F.lit(1)).cast("long").alias("c_r"),
        )
    )


def dsir_scores(
    docs: DataFrame,
    feats: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    vocab: int = 50257,
    n_buckets: int = DSIR_BUCKETS,
    seed: int = 7,
    scale: int = DSIR_SCALE,
) -> DataFrame:
    """(doc_id, n_feat, score) — integer importance score per document.

    score = Σ_occurrences (scale·(c_t+1) DIV (c_r+1)) · R DIV T with
    R = Σ c_r, T = Σ c_t. Per-bucket weights are precomputed ON the
    model table (≤ n_buckets rows) so the corpus side is a single
    broadcast equi-join — no per-occurrence division, no 1-row
    cross-join (a BroadcastNestedLoopJoin the plan discipline bans).
    The totals are a 1-row driver-side collect (the bounded IVF-training
    pattern); unseen buckets (feats trained on a sample) fall back to
    the pure smoothing ratio scale·R DIV T, identically in both engines.
    """
    t_tot, r_tot = feats.agg(
        F.sum("c_t").cast("long"), F.sum("c_r").cast("long")
    ).collect()[0]
    if not t_tot or not r_tot:
        raise ValueError(
            "dsir_scores: feature table has no "
            + ("target" if not t_tot else "raw")
            + " counts — is_target matched nothing (or feats is empty); "
            "importance ratios are undefined"
        )
    model = feats.select(
        "bucket",
        F.expr(
            f"(({scale} * (c_t + 1)) DIV (c_r + 1)) * {r_tot} DIV {t_tot}"
        ).alias("w"),
    )
    unseen_w = scale * r_tot // t_tot
    grams = F.expr(
        f"transform(slice({tokens_col}, 1, greatest(size({tokens_col}) - 1, 0)), "
        f"(x, i) -> cast(x as bigint) * {vocab} + {tokens_col}[i + 1])"
    )
    ex = docs.filter(F.size(F.col(tokens_col)) >= 2).select(
        F.col(id_col), F.explode(grams).alias("g")
    )
    ex = ex.select(id_col, _bucket_col(F.col("g"), n_buckets, seed).alias("bucket"))
    j = ex.join(F.broadcast(model), on="bucket", how="left").select(
        id_col, F.coalesce(F.col("w"), F.lit(unseen_w)).alias("w")
    )
    return j.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_feat"),
        F.sum("w").cast("long").alias("score"),
    )


def dsir_select(scores: DataFrame, k: int, id_col: str = "doc_id") -> DataFrame:
    """Deterministic top-k by (score desc, doc_id) — TakeOrderedAndProject."""
    return scores.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def token_budget_cap(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    ntok_col: str = "n_tok",
    source_col: str = "source",
    seed: int = 11,
) -> DataFrame:
    """Add (prio, cum_before, kept) — keep docs per source until the token
    budget fills, in deterministic mix32 order.

    kept ⇔ the EXCLUSIVE per-source running token sum in (prio, id) order
    is < budget: the first doc that would start at/after the budget line
    is dropped, as is everything after it in the order. Pure function of
    the rows — identical on any partitioning, replayed exactly by a SQL
    window.
    """
    prio = mix32_col(F.col(id_col).cast("long"), seed=seed)
    w = Window.partitionBy(source_col).orderBy("prio", id_col)
    staged = df.withColumn("prio", prio).withColumn(
        "cum_before",
        F.coalesce(
            F.sum(ntok_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("long"),
    )
    return staged.withColumn("kept", F.col("cum_before") < F.lit(budget))


def curriculum_order(
    df: DataFrame,
    bucket_col: str = "bucket",
    id_col: str = "doc_id",
    num_shards: int = 8,
    seed: int = 19,
) -> DataFrame:
    """Add (shard_id, pos) — a deterministic quality-curriculum training
    order: global order = (bucket, shard_id, pos) lexicographic, i.e.
    all head-bucket docs before middle before tail (the consumer defines
    bucket precedence), pseudo-randomly shuffled WITHIN each bucket.

    No global sort: shard = mix32(id) % num_shards, pos = rank within
    (bucket, shard) by (mix32, id) — one exchange, per-(bucket, shard)
    local sorts, the deterministic_shuffle recipe applied per bucket.
    A pure function of the rows (cluster-size/partitioning invariant).
    """
    prio = mix32_col(F.col(id_col).cast("long"), seed=seed)
    staged = df.withColumn("__prio", prio).withColumn(
        "shard_id", F.pmod(F.col("__prio"), F.lit(num_shards)).cast("int")
    )
    w = Window.partitionBy(bucket_col, "shard_id").orderBy("__prio", id_col)
    return staged.withColumn(
        "pos", (F.row_number().over(w) - 1).cast("long")
    ).drop("__prio")


def stratified_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
    seed: int = 13,
) -> DataFrame:
    """Add a deterministic 'split' column (train/val/test) from the high
    bits of mix32(id, seed) mod 100."""
    cell = (mix32_col(F.col(id_col).cast("long"), seed=seed) / F.lit(1 << 16)).cast(
        "long"
    ) % 100
    return df.withColumn(
        "split",
        F.when(cell < train_pct, F.lit("train"))
        .when(cell < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )
