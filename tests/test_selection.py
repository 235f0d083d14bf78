"""Data-selection operators: DSIR importance scores, token budgets,
stratified splits — semantics + partition invariance (the determinism
the oracle and any resume path rely on)."""

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.selection import (
    dsir_feature_counts,
    dsir_scores,
    dsir_select,
    stratified_split,
    token_budget_cap,
)


def _docs(spark, parts=1):
    # target docs repeat the (1,2) bigram; background docs are strided
    rows = []
    for i in range(40):
        if i % 4 == 0:
            toks, src = [1, 2, 1, 2, 1, 2], "wiki"
        elif i % 4 == 1:
            toks, src = [1, 2, 1, 2, 9, 9], "cc"  # target-like crawl doc
        else:
            toks, src = [i * 3 % 50, i * 7 % 50, i * 11 % 50, 5], "cc"
        rows.append((i, toks, src))
    return spark.createDataFrame(
        rows, "doc_id long, tokens array<int>, source string"
    ).repartition(parts)


def test_dsir_prefers_target_like_docs(spark):
    docs = _docs(spark, parts=4)
    feats = dsir_feature_counts(
        docs, "tokens", is_target=F.col("source") == "wiki", vocab=64
    )
    pool = docs.filter(F.col("source") == "cc")
    scores = dsir_scores(pool, feats, "tokens", "doc_id", vocab=64)
    top = dsir_select(scores, 5, "doc_id").collect()
    # the target-like crawl docs (i % 4 == 1) must dominate the selection
    assert all(r.doc_id % 4 == 1 for r in top), [r.doc_id for r in top]
    # deterministic under repartitioning
    again = dsir_scores(
        pool.repartition(13), feats, "tokens", "doc_id", vocab=64
    )
    a = {(r.doc_id, r.score) for r in scores.collect()}
    b = {(r.doc_id, r.score) for r in again.collect()}
    assert a == b


def test_token_budget_exclusive_cumsum(spark):
    docs = spark.createDataFrame(
        [(i, 10, "s") for i in range(10)], "doc_id long, n_tok int, source string"
    )
    out = token_budget_cap(docs, budget=35, seed=11).collect()
    kept = sorted(r.doc_id for r in out if r.kept)
    # budget 35 / 10-token docs: docs starting at 0,10,20,30 fit (4 docs)
    assert len(kept) == 4
    # kept is exactly cum_before < budget
    for r in out:
        assert r.kept == (r.cum_before < 35)
    # order is the deterministic (prio, doc_id) order: cum_before strictly
    # increases along it within the source
    rows = sorted(out, key=lambda r: (r.prio, r.doc_id))
    assert [r.cum_before for r in rows] == [i * 10 for i in range(10)]


def test_token_budget_partition_invariance(spark):
    docs = spark.createDataFrame(
        [(i, (i * 13) % 29 + 1, "s%d" % (i % 3)) for i in range(200)],
        "doc_id long, n_tok int, source string",
    )
    a = {
        (r.doc_id, r.cum_before, r.kept)
        for r in token_budget_cap(docs.coalesce(1), 100).collect()
    }
    b = {
        (r.doc_id, r.cum_before, r.kept)
        for r in token_budget_cap(docs.repartition(16), 100).collect()
    }
    assert a == b


def test_stratified_split_fractions_and_purity(spark):
    docs = spark.createDataFrame(
        [(i, "s%d" % (i % 4)) for i in range(4000)], "doc_id long, source string"
    )
    out = stratified_split(docs, "doc_id")
    counts = {r.split: r.cnt for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 4000 - 0.90) < 0.03
    assert abs(counts["val"] / 4000 - 0.05) < 0.02
    assert abs(counts["test"] / 4000 - 0.05) < 0.02
    # membership is a pure row function: same assignment on any layout
    a = {(r.doc_id, r.split) for r in out.collect()}
    b = {
        (r.doc_id, r.split)
        for r in stratified_split(docs.repartition(32), "doc_id").collect()
    }
    assert a == b


def test_curriculum_order_semantics(spark):
    from opentelemetry_collector_contrib_spark.operators.selection import (
        curriculum_order,
    )

    docs = spark.createDataFrame(
        [(i, ["head", "middle", "tail"][i % 3]) for i in range(300)],
        "doc_id long, bucket string",
    )
    out = curriculum_order(docs, num_shards=4).collect()
    # pos is a dense 0..n-1 rank within each (bucket, shard)
    cells = {}
    for r in out:
        cells.setdefault((r.bucket, r.shard_id), []).append(r.pos)
    for cell, poss in cells.items():
        assert sorted(poss) == list(range(len(poss))), cell
    # pure row function: same assignment on any partitioning
    again = curriculum_order(docs.repartition(16), num_shards=4).collect()
    assert {(r.doc_id, r.shard_id, r.pos) for r in out} == {
        (r.doc_id, r.shard_id, r.pos) for r in again
    }
