"""Tokengen determinism + oracle parity (north-rule per-row token equality)."""

import numpy as np

from opentelemetry_collector_contrib_spark.sources.tokengen import (
    columns_for_ids,
    tokens_df,
    tokens_oracle,
)


def test_partition_invariance(spark):
    a = tokens_df(spark, 500, num_partitions=2).orderBy("doc_id").collect()
    b = tokens_df(spark, 500, num_partitions=7).orderBy("doc_id").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_matches_oracle_exactly(spark):
    got = {r.doc_id: r for r in tokens_df(spark, 300, num_partitions=3).collect()}
    want = tokens_oracle(300)
    assert len(got) == 300
    for row in want.itertuples(index=False):
        g = got[row.doc_id]
        assert g.n_tok == row.n_tok
        assert g.source == row.source
        assert list(g.tokens) == list(row.tokens)  # token-array equality
        assert len(g.tokens) == g.n_tok


def test_distribution_shape():
    cols = columns_for_ids(np.arange(20000, dtype=np.uint64))
    src = cols["source"]
    hot = float(np.mean(src == "src-hot"))
    warm = float(np.mean(src == "src-warm"))
    assert 0.40 < hot < 0.50  # skewed hot key
    assert 0.15 < warm < 0.25
    nt = cols["n_tok"]
    assert nt.min() >= 8 and nt.max() <= 512
    assert np.all(cols["n_tok"] == [len(t) for t in cols["tokens"]])
