"""Tail-based sampling over completed traces — the batch rebuild of
``processor/tailsamplingprocessor``.

The reference buffers spans per trace ID for ``decision_wait`` seconds, then
runs every configured policy over the complete trace and combines the
per-policy decisions with a fixed precedence (``processor.go:237-291``
``makeDecision``). In a batch DataFrame the trace is complete by
construction, so the decision-wait machinery disappears and the processor
reduces to:

1. ONE ``groupBy(trace_key)`` producing the per-trace statistics every
   policy needs (span count, min/max timestamps, one any-span-matches flag
   per predicate policy) — map-side partial aggregation means only the
   reduced stats shuffle, never the spans;
2. per-policy decision expressions over that aggregate row
   (``internal/sampling/*.go``, file:line cited per policy below);
3. the reference's precedence switch: InvertNotSampled beats everything,
   then any Sampled wins, then InvertSampled wins unless some policy said
   NotSampled (``processor.go:281-291``);
4. a keep-join of the events against the sampled trace keys (AQE picks a
   broadcast when the sampled set is small).

Stateful policies (``rate_limiting.go``, ``composite.go``) consume a
spans-per-second budget in trace arrival order; the batch analog processes
each event-time second as one ``applyInPandas`` group in deterministic
(completion_ts, trace_key) order — groups are bounded by one second of
traffic, so the pandas pass is tiny and the shuffle key (second) is dense.

Decision codes follow ``internal/sampling/policy.go``:
0 NotSampled, 1 Sampled, 2 InvertSampled, 3 InvertNotSampled.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import SAMPLER_BUCKETS, sampler_bucket_col

NOT_SAMPLED = 0
SAMPLED = 1
INVERT_SAMPLED = 2
INVERT_NOT_SAMPLED = 3


@dataclass
class Policy:
    """One sampling policy (one entry of the reference's ``policies:`` list).

    ``kind`` selects the evaluator; ``params`` are evaluator-specific and
    mirror the reference config fields (``config.go``).
    """

    name: str
    kind: str
    params: dict = field(default_factory=dict)
    subs: list["Policy"] = field(default_factory=list)


# -- factory helpers (one per reference policy file) ------------------------

def always(name: str = "always") -> Policy:
    """always_sample.go: every trace → Sampled."""
    return Policy(name, "always")


def latency(name: str, threshold_ms: int, upper_threshold_ms: int = 0) -> Policy:
    """latency.go:33-57 — trace duration ≥ threshold (or within
    (threshold, upper] when an upper bound is set)."""
    return Policy(name, "latency", {"threshold_ms": threshold_ms,
                                    "upper_threshold_ms": upper_threshold_ms})


def probabilistic(name: str, percent: float, seed: int = 0) -> Policy:
    """probabilistic.go:45-53 — deterministic hash of the trace key under a
    threshold. The reference salts FNV-1a over the 16-byte trace ID; this
    rebuild uses the repo-wide Knuth multiplicative mix (functions/hashing)
    so the bucket is whole-stage-codegen arithmetic reproducible by the SQL
    oracle — same guarantee (fixed key ⇒ fixed decision on any cluster)."""
    return Policy(name, "probabilistic", {"percent": percent, "seed": seed})


def span_count(name: str, min_spans: int, max_spans: int = 0) -> Policy:
    """span_count_sampler.go:32-44 — span count within [min, max]
    (max 0 = unbounded)."""
    return Policy(name, "span_count", {"min_spans": min_spans, "max_spans": max_spans})


def status_code(name: str, col: str, values: list[str]) -> Policy:
    """status_code.go:52-66 — any span whose status column is in the set.
    For the log scope the column is the severity/event-type field."""
    return Policy(name, "status_code", {"col": col, "values": values})


def string_attr(name: str, col: str, values: list[str], *,
                regex: bool = False, invert: bool = False) -> Policy:
    """string_tag_filter.go:93-140 — any span attribute in the value set
    (or matching any regex). invert_match returns InvertNotSampled on a
    match and InvertSampled when nothing matches."""
    return Policy(name, "string_attr",
                  {"col": col, "values": values, "regex": regex, "invert": invert})


def numeric_attr(name: str, col: str, min_value: int | float,
                 max_value: int | float, *, invert: bool = False) -> Policy:
    """numeric_tag_filter.go — any span attribute within [min, max]."""
    return Policy(name, "numeric_attr",
                  {"col": col, "min": min_value, "max": max_value, "invert": invert})


def boolean_attr(name: str, col: str, value: bool, *, invert: bool = False) -> Policy:
    """boolean_tag_filter.go — any span attribute equal to the value."""
    return Policy(name, "boolean_attr", {"col": col, "value": value, "invert": invert})


def trace_state(name: str, col: str, key: str, values: list[str]) -> Policy:
    """trace_state_filter.go:46-61 — any span whose W3C tracestate header
    (``k1=v1,k2=v2``) carries ``key`` with a value in the set."""
    return Policy(name, "trace_state", {"col": col, "key": key, "values": values})


def ottl_condition(name: str, conditions: list[str]) -> Policy:
    """ottl.go — sample when any span satisfies any OTTL boolean condition
    (compiled by this repo's OTTL compiler to a native column)."""
    return Policy(name, "ottl_condition", {"conditions": conditions})


def and_(name: str, subs: list[Policy]) -> Policy:
    """and.go:31-45 — Sampled iff no sub-policy returns NotSampled /
    InvertNotSampled."""
    return Policy(name, "and", subs=subs)


def rate_limiting(name: str, spans_per_second: int) -> Policy:
    """rate_limiting.go:33-47 — per event-time second, traces are accepted
    in completion order while accepted-spans + trace-spans < limit;
    rejected traces do not consume budget."""
    return Policy(name, "rate_limiting", {"spans_per_second": spans_per_second})


def composite(name: str, max_total_sps: int,
              subs: list[tuple[Policy, int]]) -> Policy:
    """composite.go:79-126 — ordered sub-policies with per-policy
    spans-per-second allocations under a shared total; the first sub-policy
    that votes Sampled/InvertSampled decides: Sampled if its allocation and
    the total both fit, else NotSampled."""
    p = Policy(name, "composite", {"max_total_sps": max_total_sps,
                                   "allocations": [a for _, a in subs]})
    p.subs = [s for s, _ in subs]
    return p


# -- evaluation --------------------------------------------------------------

_STATEFUL = {"rate_limiting", "composite"}


def _flag_exprs(p: Policy) -> dict[str, Column]:
    """Per-span boolean predicates the policy needs aggregated to
    any-span-matches flags (max(bool) under the trace groupBy)."""
    out: dict[str, Column] = {}
    c = p.params.get("col")
    if p.kind == "status_code":
        out[f"_f_{p.name}"] = F.col(c).isin(p.params["values"]).cast("int")
    elif p.kind == "string_attr":
        col = F.col(c)
        if p.params["regex"]:
            m = F.lit(False)
            for pat in p.params["values"]:
                m = m | col.rlike(pat)
        else:
            m = col.isin(p.params["values"])
        # string_tag_filter.go:115 — empty strings never match
        out[f"_f_{p.name}"] = (col.isNotNull() & (F.length(col) > 0) & m).cast("int")
    elif p.kind == "numeric_attr":
        out[f"_f_{p.name}"] = F.col(c).between(
            F.lit(p.params["min"]), F.lit(p.params["max"])).cast("int")
    elif p.kind == "boolean_attr":
        out[f"_f_{p.name}"] = (F.col(c) == F.lit(p.params["value"])).cast("int")
    elif p.kind == "trace_state":
        val = F.element_at(
            F.str_to_map(F.coalesce(F.col(c), F.lit("")), F.lit(","), F.lit("=")),
            F.lit(p.params["key"]),
        )
        out[f"_f_{p.name}"] = val.isin(p.params["values"]).cast("int")
    elif p.kind == "ottl_condition":
        from ..ottl.compiler import compile_condition

        m = F.lit(False)
        for cond in p.params["conditions"]:
            m = m | compile_condition(cond)
        out[f"_f_{p.name}"] = m.cast("int")
    for s in p.subs:
        out.update(_flag_exprs(s))
    return out


def _decision_expr(p: Policy, trace_key: Column) -> Column:
    """Decision code column over the per-trace aggregate row."""
    if p.kind == "always":
        return F.lit(SAMPLED)
    if p.kind == "latency":
        thr, upper = p.params["threshold_ms"], p.params["upper_threshold_ms"]
        dur = F.col("_dur_ms")
        cond = (dur >= thr) if upper == 0 else ((dur > thr) & (dur <= upper))
        return F.when(cond, SAMPLED).otherwise(NOT_SAMPLED)
    if p.kind == "probabilistic":
        thr = p.params["percent"] * SAMPLER_BUCKETS / 100.0
        keep = sampler_bucket_col(trace_key, p.params["seed"]) < F.lit(thr)
        return F.when(keep, SAMPLED).otherwise(NOT_SAMPLED)
    if p.kind == "span_count":
        lo, hi = p.params["min_spans"], p.params["max_spans"]
        n = F.col("_n_spans")
        cond = (n >= lo) if hi == 0 else ((n >= lo) & (n <= hi))
        return F.when(cond, SAMPLED).otherwise(NOT_SAMPLED)
    if p.kind in ("status_code", "string_attr", "numeric_attr",
                  "boolean_attr", "ottl_condition", "trace_state"):
        hit = F.coalesce(F.col(f"_f_{p.name}"), F.lit(0)) == 1
        if p.params.get("invert"):
            return F.when(hit, INVERT_NOT_SAMPLED).otherwise(INVERT_SAMPLED)
        return F.when(hit, SAMPLED).otherwise(NOT_SAMPLED)
    if p.kind == "and":
        bad = F.lit(False)
        for s in p.subs:
            d = _decision_expr(s, trace_key)
            bad = bad | d.isin(NOT_SAMPLED, INVERT_NOT_SAMPLED)
        return F.when(bad, NOT_SAMPLED).otherwise(SAMPLED)
    if p.kind in _STATEFUL:
        # placeholder; overwritten by the per-second pandas pass
        return F.lit(NOT_SAMPLED)
    raise ValueError(f"unknown policy kind {p.kind!r}")


def _final_decision(decision_cols: list[str]) -> Column:
    """processor.go:281-291 — InvertNotSampled > Sampled >
    (InvertSampled and no NotSampled)."""
    def any_eq(code: int) -> Column:
        e = F.lit(False)
        for c in decision_cols:
            e = e | (F.col(c) == code)
        return e

    return (
        F.when(any_eq(INVERT_NOT_SAMPLED), F.lit(0))
        .when(any_eq(SAMPLED), F.lit(1))
        .when(any_eq(INVERT_SAMPLED) & ~any_eq(NOT_SAMPLED), F.lit(1))
        .otherwise(F.lit(0))
    )


def trace_decisions(
    events: DataFrame,
    trace_col: str,
    ts_col: str,
    policies: list[Policy],
) -> DataFrame:
    """Per-trace decision table: one row per trace key with the policy
    decision codes (``d_<name>``), ``n_spans``, ``duration_ms``, and the
    combined ``sampled`` (0/1).

    ``trace_col`` must be numeric (the probabilistic policy hashes it); the
    log scope derives it deterministically from its grouping columns.
    """
    flags = _flag_exprs_all(policies)
    aggs = [
        F.count(F.lit(1)).alias("_n_spans"),
        F.min(ts_col).alias("_min_ts"),
        F.max(ts_col).alias("_max_ts"),
    ] + [F.max(expr).alias(name) for name, expr in flags.items()]
    agg = events.groupBy(F.col(trace_col).alias("trace_key")).agg(*aggs)
    # cast handles TIMESTAMP_NTZ parquet columns (session TZ pinned UTC by
    # the callers, same convention as every other time-based operator here)
    max_us = F.unix_micros(F.col("_max_ts").cast("timestamp"))
    min_us = F.unix_micros(F.col("_min_ts").cast("timestamp"))
    agg = agg.withColumn("_max_us", max_us).withColumn(
        "_dur_ms", ((max_us - min_us) / 1000).cast("long")
    )

    key = F.col("trace_key")
    out = agg
    stateless_cols: list[str] = []
    for p in policies:
        if p.kind in _STATEFUL:
            continue
        out = out.withColumn(f"d_{p.name}", _decision_expr(p, key))
        stateless_cols.append(f"d_{p.name}")

    stateful = [p for p in policies if p.kind in _STATEFUL]
    if stateful:
        # composite sub-policy votes are ordinary stateless decisions the
        # pandas budget pass reads as inputs — materialize them first
        for p in stateful:
            for s in p.subs:
                out = out.withColumn(f"d_{s.name}", _decision_expr(s, key))
        out = _apply_stateful(out, stateful)

    decision_cols = stateless_cols + [f"d_{p.name}" for p in stateful]
    out = out.withColumn("sampled", _final_decision(decision_cols))
    keep = (
        ["trace_key", F.col("_n_spans").alias("n_spans"),
         F.col("_dur_ms").alias("duration_ms")]
        + decision_cols + ["sampled"]
    )
    return out.select(*keep)


def _flag_exprs_all(policies: list[Policy]) -> dict[str, Column]:
    flags: dict[str, Column] = {}
    for p in policies:
        flags.update(_flag_exprs(p))
    return flags


def _apply_stateful(agg: DataFrame, stateful: list[Policy]) -> DataFrame:
    """rate_limiting / composite: replay each event-time second's traces in
    (completion_ts, trace_key) order against the spans-per-second budgets.
    One applyInPandas group per second — bounded by one second of traffic."""
    import pandas as pd

    specs = []
    for p in stateful:
        if p.kind == "rate_limiting":
            specs.append(("rate", p.name, p.params["spans_per_second"], None, None))
        else:
            sub_cols = [f"d_{s.name}" for s in p.subs]
            specs.append(("composite", p.name, p.params["max_total_sps"],
                          p.params["allocations"], sub_cols))

    base = agg.withColumn("_sec", F.floor(F.col("_max_us") / 1_000_000))
    from pyspark.sql import types as T

    # StructType.add mutates in place — copy so base.schema stays intact
    out_schema = T.StructType(list(base.schema.fields))
    for _, name, *_ in specs:
        out_schema = T.StructType(
            out_schema.fields + [T.StructField(f"d_{name}", T.IntegerType())]
        )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_max_ts", "trace_key"]).reset_index(drop=True)
        for kind, name, limit, allocs, sub_cols in specs:
            dec = []
            if kind == "rate":
                counter = 0
                for n in pdf["_n_spans"]:
                    # rate_limiting.go:41-46 (strict <; rejected traces
                    # do not consume budget)
                    if counter + n < limit:
                        counter += int(n)
                        dec.append(SAMPLED)
                    else:
                        dec.append(NOT_SAMPLED)
            else:
                counters = [0] * len(sub_cols)
                total = 0
                for i in range(len(pdf)):
                    n = int(pdf["_n_spans"].iloc[i])
                    d = NOT_SAMPLED
                    for j, sc in enumerate(sub_cols):
                        sd = int(pdf[sc].iloc[i])
                        if sd in (SAMPLED, INVERT_SAMPLED):
                            # composite.go:107-126 (inclusive <=; first
                            # sampling sub-policy decides)
                            if counters[j] + n <= allocs[j] and total + n <= limit:
                                counters[j] += n
                                total += n
                                d = SAMPLED
                            break
                    dec.append(d)
            pdf[f"d_{name}"] = pd.array(dec, dtype="int32")
        return pdf

    res = base.groupBy("_sec").applyInPandas(run, schema=out_schema)
    return res.drop("_sec")


def tail_sample(
    events: DataFrame,
    trace_col: str,
    ts_col: str,
    policies: list[Policy],
) -> DataFrame:
    """Keep only the events of sampled traces — the processor's output
    surface. Equi-join against the sampled key set (AQE broadcasts it when
    small); the events themselves shuffle at most once."""
    dec = trace_decisions(events, trace_col, ts_col, policies)
    keys = dec.where(F.col("sampled") == 1).select("trace_key")
    return events.join(keys, events[trace_col] == keys["trace_key"], "left_semi")
