"""PLANS.md is the 100×-scale audit surface — keep it honest.

Asserts (VERDICT r02 §What's-wrong #3 / next-round #5):
- every driver-query in REGISTRY has a row (regenerate with
  `python tools/explain_plans.py` after registry changes);
- zero sort-merge joins and zero nested-loop/cartesian joins anywhere
  (every join in the system is broadcast or pre-bucketed — the invariant
  that used to live only in prose);
- `recombine_last` stays on the 1-shuffle single-window shape and the
  deliberate skew variant stays bounded.

Pure file parsing — no SparkSession.
"""

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rows():
    with open(os.path.join(REPO, "PLANS.md")) as f:
        text = f.read()
    rows = {}
    for line in text.splitlines():
        m = re.match(r"\| (\S+) \| (\d+) \| (\d+) \| (\d+) \| (\d+) \| (\d+) \|", line)
        if m:
            rows[m.group(1)] = dict(
                broadcast=int(m.group(2)),
                sortmerge=int(m.group(3)),
                nestedloop=int(m.group(4)),
                shuffles=int(m.group(5)),
                py=int(m.group(6)),
            )
    return rows, text


def test_plans_covers_registry():
    from opentelemetry_collector_contrib_spark.driver_queries import REGISTRY

    rows, text = _rows()
    names = {q.name for q in REGISTRY}
    missing = names - set(rows)
    assert not missing, (
        f"PLANS.md missing rows for {sorted(missing)} — "
        f"run `python tools/explain_plans.py`"
    )
    assert "ERR" not in text, "PLANS.md contains errored rows"


# brute_force_topk is the documented exact |Q|×N baseline: its only join
# predicate is an inequality, so a BroadcastNestedLoopJoin over the tiny
# broadcast query side IS the intended plan (the ANN paths it verifies —
# ivf_topk, lsh_topk_multi, embedding_neardup — must stay equi-join)
# embedding_topk: the documented exact brute-force baseline (BNLJ by design).
# bm25_topk: crossJoin(broadcast(stats)) of a ONE-ROW corpus-stats aggregate —
# the scalar-subquery idiom; a single-row broadcast build side is constant
# work per task regardless of corpus size.
NLJ_ALLOWED = {"embedding_topk", "bm25_topk"}


def test_no_sortmerge_or_nested_loop_joins():
    rows, _ = _rows()
    assert rows, "PLANS.md has no parseable rows"
    bad_smj = {n: r["sortmerge"] for n, r in rows.items() if r["sortmerge"]}
    bad_nlj = {
        n: r["nestedloop"]
        for n, r in rows.items()
        if r["nestedloop"] and n not in NLJ_ALLOWED
    }
    assert not bad_smj, f"sort-merge joins crept in: {bad_smj}"
    assert not bad_nlj, f"nested-loop/cartesian joins crept in: {bad_nlj}"


def test_recombine_shuffle_budget():
    rows, _ = _rows()
    if "recombine_last" not in rows:
        pytest.skip("PLANS.md predates recombine rows")
    assert rows["recombine_last"]["shuffles"] <= 2, rows["recombine_last"]
    assert rows["recombine"]["shuffles"] <= 2, rows["recombine"]
    if "recombine_skew" in rows:
        # the two-level prefix sum buys skew-safety with two extra SMALL
        # exchanges (per-chunk counts + offsets); bound it so it can't grow
        assert rows["recombine_skew"]["shuffles"] <= 5, rows["recombine_skew"]


def test_round3_op_shuffle_budgets():
    """Freeze the round-3 shuffle budgets (VERDICT r03 next-round #8):
    line_dedup reassembles with 2 exchanges (by line + by id), dup_spans
    plans 3 (inverted-index group, min_docs broadcast-back, per-doc
    reassembly; payloads never shuffle), the curation chain composes to 2,
    packing/shuffle move data once. Regenerate PLANS.md after any
    intentional change; a higher count is a regression."""
    rows, _ = _rows()
    budgets = {
        "line_dedup": 2,
        "dup_spans": 3,
        "curate_pipeline": 2,
        "pack_sequences": 1,
        "det_shuffle": 1,
    }
    missing = [n for n in budgets if n not in rows]
    assert not missing, f"PLANS.md missing rows {missing}"
    over = {
        n: (rows[n]["shuffles"], cap)
        for n, cap in budgets.items()
        if rows[n]["shuffles"] > cap
    }
    assert not over, f"shuffle budget exceeded (actual, cap): {over}"
