"""gopher_rules (Rae et al. 2021 Appendix A heuristic filters) —
exact-integer threshold evaluation."""

from opentelemetry_collector_contrib_spark.operators.textstats import (
    gopher_rules,
)


def _run(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return gopher_rules(df).collect()[0]


def test_passing_document(spark):
    text = " ".join(
        ["the", "be", "to", "of", "and"] + ["word"] * 60
    )
    r = _run(spark, text)
    assert r["n_words"] == 65
    assert r["stopword_hits"] == 5
    assert r["alpha_words"] == 65
    assert r["gopher_pass"] is True


def test_word_count_and_length_bounds(spark):
    # too few words
    assert _run(spark, "the be short").__getitem__("gopher_pass") is False
    # mean word length > 10 fails even with enough words
    long_words = " ".join(["the", "be"] + ["x" * 30] * 60)
    assert _run(spark, long_words)["gopher_pass"] is False


def test_symbol_ellipsis_and_bullet_ratios(spark):
    base = ["the", "be"] + ["word"] * 58
    # >10% symbols: 10 hashes over 60 words
    sym = " ".join(base) + " " + "#" * 10
    r = _run(spark, sym)
    assert r["n_symbols"] >= 10 and r["gopher_pass"] is False

    # ellipsis-ending lines over 30%
    lines = "\n".join([" ".join(base), "done...", "also...", "and..."])
    r2 = _run(spark, lines)
    assert r2["n_lines"] == 4 and r2["ellipsis_lines"] == 3
    assert r2["gopher_pass"] is False

    # bullets: 3 of 4 lines bulleted is fine (<= 90%)
    blines = "\n".join(["- a", "- b", "• c", " ".join(base)])
    r3 = _run(spark, blines)
    assert r3["bullet_lines"] == 3 and r3["gopher_pass"] is True


def test_alpha_ratio_and_counts(spark):
    # 60 words, 20 numeric → alpha ratio 2/3 < 80% fails
    text = " ".join(["the", "be"] + ["word"] * 38 + ["123"] * 20)
    r = _run(spark, text)
    assert r["alpha_words"] == 40 and r["n_words"] == 60
    assert r["gopher_pass"] is False
    # unicode ellipsis counts as a symbol
    assert _run(spark, "a… b")["n_symbols"] == 1
