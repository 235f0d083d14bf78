"""Hashed-token quality classifier: weight semantics, separation, plan."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.classifier import (
    SCALE,
    score_documents,
    train_token_classifier,
)


def _corpus(spark):
    # token 100 appears only in high-quality docs, 200 only in low, 7 in both
    rows = [
        Row(doc_id=0, tokens=[100, 7, 100], label=1),
        Row(doc_id=1, tokens=[100, 7], label=1),
        Row(doc_id=2, tokens=[200, 7], label=0),
        Row(doc_id=3, tokens=[200, 7, 200], label=0),
    ]
    return spark.createDataFrame(rows, "doc_id long, tokens array<int>, label int")


def test_weights_are_smoothed_posteriors(spark):
    w = {r.token: r.weight for r in train_token_classifier(_corpus(spark)).collect()}
    # token 100: pos=3, n=3 -> (3+1)*S/(3+2) = 0.8S
    assert w[100] == (3 + 1) * SCALE // (3 + 2)
    # token 200: pos=0, n=3 -> (0+1)*S/(3+2) = 0.2S
    assert w[200] == SCALE // 5
    # token 7: pos=2, n=4 -> 0.5S
    assert w[7] == (2 + 1) * SCALE // (4 + 2)
    assert all(0 <= v <= SCALE for v in w.values())


def test_scores_separate_classes(spark):
    docs = _corpus(spark)
    w = train_token_classifier(docs)
    out = {r.doc_id: r for r in score_documents(docs, w, threshold=SCALE // 2).collect()}
    assert out[0].keep and out[1].keep
    assert not out[2].keep and not out[3].keep
    # integer exactness: doc 0 = (800000 + 500000 + 800000) / 3
    assert out[0].score_sum == 2_100_000 and out[0].score_mean == 700_000


def test_unseen_tokens_default_or_drop(spark):
    docs = _corpus(spark)
    w = train_token_classifier(docs)
    fresh = spark.createDataFrame(
        [Row(doc_id=9, tokens=[100, 999])], "doc_id long, tokens array<int>"
    )
    inner = score_documents(fresh, w).collect()[0]
    assert inner.n_tok == 1  # unseen 999 dropped
    prior = score_documents(fresh, w, default_weight=SCALE // 2).collect()[0]
    assert prior.n_tok == 2 and prior.score_sum == inner.score_sum + SCALE // 2


def test_score_plan_broadcasts_weights(spark):
    docs = _corpus(spark)
    w = train_token_classifier(docs)
    plan = (
        score_documents(docs, w)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
