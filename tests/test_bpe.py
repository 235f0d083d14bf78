"""Distributed BPE training: greedy rewrite semantics + full replay."""

from pyspark.sql import Row

from opentelemetry_collector_contrib_spark.operators.bpe import (
    adjacent_pair_counts,
    apply_merge,
    bpe_apply,
    bpe_learn,
)


def _brute_merge(seq, a, b, nid):
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(nid)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _brute_learn(seqs, k, start):
    merges = []
    for step in range(k):
        counts = {}
        for s in seqs:
            for x, y in zip(s, s[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + 1
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        nid = start + step
        merges.append({"step": step, "a": a, "b": b, "new_id": nid, "cnt": cnt})
        seqs = [_brute_merge(s, a, b, nid) for s in seqs]
    return merges, seqs


def test_apply_merge_greedy_runs(spark):
    cases = [
        ([1, 1, 1], 1, 1, 9, [9, 1]),
        ([1, 1, 1, 1], 1, 1, 9, [9, 9]),
        ([2, 1, 1, 1], 1, 1, 9, [2, 9, 1]),
        ([1, 2, 1, 2, 1], 1, 2, 9, [9, 9, 1]),
        ([1, 2, 2, 3], 2, 3, 9, [1, 2, 9]),
        ([1], 1, 1, 9, [1]),
        ([], 1, 2, 9, []),
        ([5, 1], 5, 1, 9, [9]),
    ]
    rows = [Row(i=i, tokens=seq) for i, (seq, *_rest) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i int, tokens array<int>")
    for i, (seq, a, b, nid, want) in enumerate(cases):
        got = (
            df.filter(f"i = {i}")
            .select(apply_merge("tokens", a, b, nid).alias("t"))
            .collect()[0]["t"]
        )
        assert got == want, (seq, a, b, got, want)
        assert got == _brute_merge(seq, a, b, nid)


def test_pair_counts_match_brute(spark):
    seqs = [[1, 2, 1, 2], [2, 2, 2], [7]]
    df = spark.createDataFrame(
        [Row(tokens=s) for s in seqs], "tokens array<int>"
    )
    got = {(r.a, r.b): r.cnt for r in adjacent_pair_counts(df).collect()}
    want = {}
    for s in seqs:
        for x, y in zip(s, s[1:]):
            want[(x, y)] = want.get((x, y), 0) + 1
    assert got == want


def test_learn_matches_pure_python_replay(spark):
    # deterministic synthetic corpus with planted frequent pairs + runs
    seqs = []
    for i in range(60):
        s = [1, 2] * 10                   # dominant pair (1,2); after its
        s += [(i * 7 + j * 3) % 11 for j in range(8)]   # merge, (new,new) dominates
        if i % 3 == 0:
            s += [4, 4, 4, 4]             # plant an a==b run
        seqs.append(s)
    df = spark.createDataFrame([Row(doc_id=i, tokens=s) for i, s in enumerate(seqs)],
                               "doc_id long, tokens array<int>")
    merges, encoded = bpe_learn(df, num_merges=5, new_id_start=100)
    want_merges, want_seqs = _brute_learn(seqs, 5, 100)
    assert merges == want_merges
    got = {r.doc_id: r.tokens for r in encoded.collect()}
    assert got == {i: s for i, s in enumerate(want_seqs)}
    # new symbols participate in later merges (merge-of-merge really happens)
    assert any(m["a"] >= 100 or m["b"] >= 100 for m in merges)


def test_bpe_apply_replays_training_rewrite(spark):
    seqs = [[1, 2, 3, 1, 2], [2, 3, 2, 3]]
    df = spark.createDataFrame([Row(doc_id=i, tokens=s) for i, s in enumerate(seqs)],
                               "doc_id long, tokens array<int>")
    merges, encoded = bpe_learn(df, num_merges=3, new_id_start=50)
    re_applied = bpe_apply(df, merges)
    assert sorted(map(tuple, (r.tokens for r in encoded.collect()))) == sorted(
        map(tuple, (r.tokens for r in re_applied.collect()))
    )


def test_pair_count_plan_is_one_exchange_no_python(spark):
    df = spark.createDataFrame([Row(tokens=[1, 2, 3])], "tokens array<int>")
    plan = adjacent_pair_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "EvalPython" not in plan and "SortMergeJoin" not in plan
