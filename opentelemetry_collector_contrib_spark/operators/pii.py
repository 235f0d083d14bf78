"""PII scrubbing over free-text document columns.

Text-domain counterpart of the redaction processor
(`processor/redactionprocessor/processor.go:83-175` masks blocked-value
regexes inside attribute MAPS; a training-data pipeline needs the same
masking over the raw document text before tokenization). Every pattern is
a pure `regexp_replace` / `regexp_count` column expression — no shuffle,
no Python; the whole scrub fuses into the scan stage and survives a
100 TB corpus unchanged.

Pattern notes: each regex is written in the common subset of Java regex
(Spark JVM) and RE2 (DuckDB oracle) — `\\b` word boundaries,
non-capturing groups, bounded repetition — so the dual-engine oracle can
run the identical pattern. Masks contain no `$`/`\\` (both engines treat
those specially in replacement strings).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: earlier patterns must not leave text a later pattern mis-hits.
# Cards run before SSN/phone so a 4-4-4-4 digit run is consumed whole.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "card": r"\b[0-9]{4}(?:[- ][0-9]{4}){3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+[0-9]{1,2}[- ][0-9]{3}[- ][0-9]{3}[- ][0-9]{4}",
}


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    kinds: list[str] | None = None,
    out_col: str | None = None,
    counts: bool = True,
) -> DataFrame:
    """Mask every PII match with ``<KIND>`` and (optionally) record per-kind
    match counts as ``n_<kind>`` int columns.

    Counts are taken against the ORIGINAL text (all patterns see the same
    input), then masks apply sequentially in PII_PATTERNS order — the order
    only matters for overlapping families (card before ssn/phone), and the
    count-first rule keeps the per-kind counts independent of mask order.
    """
    kinds = list(kinds) if kinds is not None else list(PII_PATTERNS)
    unknown = set(kinds) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    out_col = out_col or text_col
    src = F.col(text_col)
    if counts:
        for k in kinds:
            df = df.withColumn(f"n_{k}", F.regexp_count(src, F.lit(PII_PATTERNS[k])).cast("int"))
    masked: Column = src
    for k in PII_PATTERNS:  # canonical order regardless of `kinds` order
        if k in kinds:
            masked = F.regexp_replace(masked, PII_PATTERNS[k], f"<{k.upper()}>")
    return df.withColumn(out_col, masked)


def pii_scrub_sql(text_expr: str, kinds: list[str] | None = None) -> str:
    """The DuckDB expression equivalent of the masking chain (oracle
    helper): nested regexp_replace with the 'g' flag, same order."""
    kinds = list(kinds) if kinds is not None else list(PII_PATTERNS)
    expr = text_expr
    for k in PII_PATTERNS:
        if k in kinds:
            pat = PII_PATTERNS[k].replace("'", "''")
            expr = f"regexp_replace({expr}, '{pat}', '<{k.upper()}>', 'g')"
    return expr
