"""Bigram-LM fluency scoring (CCNet §4.3 analog): weights, smoothing, plan."""

from pyspark.sql import Row

from opentelemetry_collector_contrib_spark.operators.lm import (
    SCALE,
    bigram_counts,
    context_counts,
    lm_score,
)

V = 1000  # small vocab so smoothing effects are visible


def _train(spark):
    # transitions: 1->2 x3, 2->1 x2, 2->3 x1  (contexts: c(1)=3, c(2)=3)
    rows = [
        Row(doc_id=0, tokens=[1, 2, 1, 2, 3]),
        Row(doc_id=1, tokens=[2, 1, 2]),
    ]
    return spark.createDataFrame(rows, "doc_id long, tokens array<int>")


def _brute_counts(docs):
    bg, cx = {}, {}
    for _, toks in docs:
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
            cx[a] = cx.get(a, 0) + 1
    return bg, cx


def test_bigram_and_context_counts_match_brute_force(spark):
    df = _train(spark)
    got_bg = {
        (r.g // V, r.g % V): r.c_ab
        for r in bigram_counts(df, vocab=V).collect()
    }
    got_cx = {r.a: r.c_a for r in context_counts(bigram_counts(df, vocab=V), vocab=V).collect()}
    want_bg, want_cx = _brute_counts(
        [(0, [1, 2, 1, 2, 3]), (1, [2, 1, 2])]
    )
    assert got_bg == want_bg
    assert got_cx == want_cx


def test_scores_match_brute_force_including_unseen(spark):
    train = _train(spark)
    bg = bigram_counts(train, vocab=V)
    cx = context_counts(bg, vocab=V)
    score_docs = spark.createDataFrame(
        [
            Row(doc_id=10, tokens=[1, 2, 3]),     # seen, seen-context-unseen-pair
            Row(doc_id=11, tokens=[9, 9]),        # fully unseen
            Row(doc_id=12, tokens=[5]),           # <2 tokens: excluded
        ],
        "doc_id long, tokens array<int>",
    )
    out = {r.doc_id: r for r in lm_score(score_docs, bg, cx, vocab=V).collect()}
    want_bg, want_cx = _brute_counts([(0, [1, 2, 1, 2, 3]), (1, [2, 1, 2])])

    def w(a, b):
        return (want_bg.get((a, b), 0) + 1) * SCALE // (want_cx.get(a, 0) + V)

    assert 12 not in out
    assert out[10].n_big == 2 and out[10].score_sum == w(1, 2) + w(2, 3)
    assert out[10].score_mean == (w(1, 2) + w(2, 3)) // 2
    # unseen bigram + unseen context -> pure add-one floor(scale/V)
    assert out[11].score_sum == SCALE // V
    # in-domain transitions score well above the unseen floor
    assert out[10].score_mean > 2 * out[11].score_mean


def test_buckets(spark):
    train = _train(spark)
    bg = bigram_counts(train, vocab=V)
    cx = context_counts(bg, vocab=V)
    docs = spark.createDataFrame(
        [Row(doc_id=0, tokens=[1, 2, 1, 2]), Row(doc_id=1, tokens=[9, 9])],
        "doc_id long, tokens array<int>",
    )
    out = {
        r.doc_id: r.bucket
        for r in lm_score(
            docs, bg, cx, vocab=V, head_min=2 * (SCALE // V), tail_max=SCALE // V
        ).collect()
    }
    assert out[0] == "head" and out[1] == "tail"


def test_plan_shape(spark):
    """Scoring: 2 broadcast joins + one doc-keyed exchange; zero Python."""
    train = _train(spark)
    bg = bigram_counts(train, vocab=V)
    cx = context_counts(bg, vocab=V)
    plan = lm_score(_train(spark), bg, cx, vocab=V)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
