"""Count connector — logs → metrics. `connector/countconnector/connector.go:165-201`.

Reference: per configured metric {conditions (ORed), attributes [{key,
default_value}]}, count records matching the conditions grouped by the
extracted attribute values (+ resource attrs); default metric
``log.record.count``. BASELINE adds token totals, so every aggregate also
emits ``sum(n_tok)``.

Spark: one ``groupBy(dims).agg(count_if(cond), sum_if(n_tok, cond))`` —
Catalyst plans partial (map-side) + final aggregation, which is the scalable
form of the reference's in-memory counter map (`counter.go:38-101`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class CountMetric:
    name: str
    condition: Column | None = None  # None → count all (log.record.count)
    token_col: str | None = "n_tok"  # also sum tokens (BASELINE metric)


def count_logs(
    df: DataFrame,
    dims: list[str],
    metrics: list[CountMetric] | None = None,
    attr_defaults: dict[str, str] | None = None,
) -> DataFrame:
    """Group by dims and emit one (count, token_sum) pair per metric.

    attr_defaults mirrors countconnector's ``default_value`` for missing
    attributes (`config.go:43-51`): null dim values are coalesced before the
    grouping so they form their own bucket instead of being dropped.
    """
    metrics = metrics or [CountMetric("log_record_count")]
    out = df
    for d in dims:
        dv = (attr_defaults or {}).get(d)
        if dv is not None:
            out = out.withColumn(d, F.coalesce(F.col(d), F.lit(dv)))

    aggs: list[Column] = []
    for m in metrics:
        cond = m.condition if m.condition is not None else F.lit(True)
        cond = F.coalesce(cond, F.lit(False))
        aggs.append(F.count(F.when(cond, 1)).alias(f"{m.name}"))
        if m.token_col:
            aggs.append(
                F.coalesce(
                    F.sum(F.when(cond, F.col(m.token_col))), F.lit(0)
                ).cast("long").alias(f"{m.name}_tokens")
            )
    return out.groupBy(*dims).agg(*aggs)
