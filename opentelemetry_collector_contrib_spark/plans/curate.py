"""End-to-end training-data curation plan: the standard corpus
preprocessing chain (exact dedup → quality gate → domain-mixture
downsample → deterministic global shuffle) composed from the package's
operators into one declarative DataFrame plan.

This is the pipeline a 100 TB pre-training corpus actually runs before
packing: C4/Gopher-style filtering (Raffel et al. 2020; Rae et al. 2021
§A1) after exact dedup (Lee et al. 2021), then mixture weighting (The
Pile / GPT-3 recipe) and a reproducible shuffle whose (shard, pos) IS the
training order spec.

Physical shape (the whole chain plans 3 exchanges at any scale):
  1. exact_dedup shuffles (hash, id) only — payloads never move; the dup-id
     set broadcasts into an anti-join.
  2. the quality gate is pure whole-stage-codegen column math — no
     exchange, no Python.
  3. mixture_sample's per-domain counts are a partial-aggregated groupBy
     broadcast back (tiny); the keep decision is a deterministic bucket
     hash — no corpus exchange.
  4. deterministic_shuffle is ONE hash exchange by shard with per-shard
     sorts (never a global sort).

Every stage is deterministic in (row content, seed) so reruns, different
cluster sizes, and other engines produce byte-identical corpora — the
property the whole chain exists to guarantee.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import exact_dedup
from ..operators.packing import deterministic_shuffle
from ..operators.sampler import mixture_sample


def quality_gate(
    df: DataFrame,
    tokens_col: str = "tokens",
    min_tokens: int = 3,
    max_tokens: int = 1_000_000,
    max_top_bigram_frac_pct: int = 50,
) -> DataFrame:
    """Gopher-style keep/drop gate over token sequences, with reasons.

    Rules (integer arithmetic only, so any engine agrees exactly):
      - length: min_tokens ≤ n ≤ max_tokens (Gopher §A1 word-count bounds)
      - repetition: the most frequent bigram may cover at most
        max_top_bigram_frac_pct % of bigram positions (Gopher §A1.1
        duplicated-n-gram family; 100·top ≤ pct·npos avoids floats)

    Adds `keep` (boolean) and `drop_reason` (null when kept). The
    repetition counter is the same zero-shuffle sort+fold used by
    textstats.repetition_stats, inlined here for a single-pass plan.
    """
    from ..operators.textstats import repetition_stats

    n = F.size(F.col(tokens_col))
    scored = repetition_stats(df, tokens_col, ns=(2,))
    too_short = n < min_tokens
    too_long = n > max_tokens
    # top_2/npos_2 > pct/100  ⇔  100*top_2 > pct*npos_2 (npos_2 ≥ 1 when
    # enough tokens; short docs already failed the length rule)
    repetitive = (F.col("npos_2") > 0) & (
        F.col("top_2") * 100 > F.lit(max_top_bigram_frac_pct) * F.col("npos_2")
    )
    reason = (
        F.when(too_short, F.lit("too_short"))
        .when(too_long, F.lit("too_long"))
        .when(repetitive, F.lit("repetitive"))
    )
    return scored.withColumn("drop_reason", reason).withColumn(
        "keep", reason.isNull()
    )


def curate_corpus(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    domain_col: str,
    weights: dict[str, float],
    target_total: int,
    num_shards: int,
    seed: int = 0,
    min_tokens: int = 3,
    max_top_bigram_frac_pct: int = 50,
) -> DataFrame:
    """The full chain. Returns the curated corpus with (shard_id, pos) —
    the reproducible training order — plus the surviving id/domain/tokens.

    Stage order matters and mirrors practice: dedup before quality (a
    million copies of one good doc must count once), quality before
    mixture (rates are computed over what is actually eligible), shuffle
    last (positions are over the final corpus).
    """
    deduped = exact_dedup(df, [tokens_col], id_col, method="xxhash128")
    gated = quality_gate(
        deduped,
        tokens_col,
        min_tokens=min_tokens,
        max_top_bigram_frac_pct=max_top_bigram_frac_pct,
    ).filter(F.col("keep"))
    mixed = mixture_sample(
        gated, domain_col, F.col(id_col), weights, target_total, seed=seed
    )
    shuffled = deterministic_shuffle(
        mixed, F.col(id_col), num_shards, seed=seed + 1
    )
    return shuffled.select(id_col, domain_col, "shard_id", "pos", tokens_col)
