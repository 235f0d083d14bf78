"""prometheusexporter rendering parity — the text exposition the
reference's /metrics endpoint serves for the log pipeline's metric
outputs (count connector counts, metric-state operators' gauges/sums,
histogram operator buckets).

Reference behavior (`exporter/prometheusexporter/collector.go` + the
prometheus client semantics it delegates to):

- metric names pass through BuildCompliantName's simple path — forbidden
  runes dropped/underscored, optional ``namespace_`` prefix, leading
  digit prefixed ``_`` (`pkg/translator/prometheus/normalize_name.go:
  83-105`; the unit-suffix path is feature-gated full normalization,
  out of scope here);
- datapoint attribute keys are prometheus-normalized labels; ``job`` =
  service.namespace "/" service.name and ``instance`` =
  service.instance.id ride as labels when present
  (`collector.go:112-137,321-334`);
- monotonic sums render as counters, non-monotonic sums and gauges as
  gauges; histograms render cumulative ``_bucket{le=...}`` series plus
  ``_sum`` and ``_count`` (`collector.go:99-108,161-218`);
- the client's text exposition: ``# HELP``/``# TYPE`` headers, label
  values escaped (``\\\\``, ``\\"``, ``\\n``), labels name-sorted,
  series within a family sorted by label values (client_golang
  registry.Gather + expfmt).

Spark shape: rendering is a PURE MAP over an already-aggregated metrics
DataFrame — the exchanges happened in the aggregation that produced it
(count connector / histogram operators), so the sink adds zero. The
scrape endpoint half is the HTTP boundary (a driver-side handler over
``collect()`` of a bounded series set — metric cardinality, not data
rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .loki_exporter import normalize_label

__all__ = [
    "build_compliant_name",
    "escape_label_value",
    "prometheus_series_lines",
    "prometheus_histogram_lines",
    "prometheus_text",
]


def build_compliant_name(name: str, namespace: str = "") -> str:
    """BuildCompliantName's simple path (`normalize_name.go:83-105`):
    forbidden runes → ``_`` (prometheus names allow [a-zA-Z0-9_:]),
    namespace prefix, leading-digit guard."""
    cleaned = "".join(
        ch if (ch.isascii() and (ch.isalnum() or ch in "_:")) else "_"
        for ch in name
    )
    if namespace:
        return f"{namespace}_{cleaned}"
    if cleaned and cleaned[0].isdigit():
        cleaned = "_" + cleaned
    return cleaned


def escape_label_value(v: str) -> str:
    """Text-exposition label-value escaping (expfmt): backslash, quote,
    newline."""
    return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def _fmt_value(v) -> str:
    """Go ``strconv.FormatFloat(v, 'g', -1, 64)`` — shortest digits,
    and (the Go shortest-'g' quirk, ftoa.go ``eprec = 6``) scientific
    notation exactly when the decimal exponent is < -4 or >= 6, with a
    two-digit exponent. expfmt renders ``le`` bounds and values through
    this, so 1e6 is ``1e+06``, not ``1000000``."""
    f = float(v)
    if f != f:
        return "NaN"
    if f == float("inf"):
        return "+Inf"
    if f == float("-inf"):
        return "-Inf"
    if f == 0:
        return "0"
    from decimal import Decimal

    sign = "-" if f < 0 else ""
    d = Decimal(repr(abs(f))).normalize()
    digits, exp = "".join(map(str, d.as_tuple().digits)), d.as_tuple().exponent
    x = exp + len(digits) - 1  # decimal exponent of the leading digit
    if -4 <= x < 6:
        if exp >= 0:
            return sign + digits + "0" * exp
        if x >= 0:
            ip, fp = digits[: x + 1], digits[x + 1:]
            return sign + ip + "." + fp
        return sign + "0." + "0" * (-x - 1) + digits
    mant = digits[0] + ("." + digits[1:] if len(digits) > 1 else "")
    return f"{sign}{mant}e{'+' if x >= 0 else '-'}{abs(x):02d}"


def _escape_expr(col):
    """Column-level text-exposition label-value escaping (expfmt):
    backslash, quote, newline."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(col, r"\\", r"\\\\"), '"', '\\\\"'
        ),
        "\n", r"\\n",
    )


def _label_pairs_expr(pairs: dict):
    """Name-sorted ``k="escaped-v"`` pairs joined with commas — the
    label block shared by the series and histogram renderers."""
    return F.concat_ws(
        ",",
        *[
            F.concat(F.lit(f'{k}="'), _escape_expr(pairs[k]), F.lit('"'))
            for k in sorted(pairs)
        ],
    )


def prometheus_series_lines(
    df: DataFrame,
    metric_name: str,
    *,
    metric_type: str = "counter",
    namespace: str = "",
    const_labels: dict | None = None,
    label_cols: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Aggregated series → one exposition line per series:
    ``name{labels} value`` with name-sorted, escaped labels. Pure
    codegen (concat/sort over the label struct) — no Python at all.

    ``label_cols`` name the columns holding label values (label name =
    prometheus-normalized column name); ``const_labels`` are appended to
    every series (the exporter config's const_labels)."""
    if metric_type not in ("counter", "gauge"):
        raise ValueError(f"unsupported metric type {metric_type!r}")
    name = build_compliant_name(metric_name, namespace)
    label_cols = label_cols or []
    consts = dict(const_labels or {})

    pairs = {normalize_label(c): F.col(c).cast("string") for c in label_cols}
    for k, v in consts.items():
        pairs[normalize_label(k)] = F.lit(str(v))
    label_expr = _label_pairs_expr(pairs)
    val = F.col(value_col).cast("double")
    val_str = F.when(
        val == val.cast("long").cast("double"),
        val.cast("long").cast("string"),
    ).otherwise(val.cast("string"))
    line = (
        F.concat(F.lit(name + "{"), label_expr, F.lit("} "), val_str)
        if pairs
        else F.concat(F.lit(name + " "), val_str)
    )
    return df.select(line.alias("line"))


def prometheus_histogram_lines(
    df: DataFrame,
    metric_name: str,
    *,
    dims: list[str],
    bounds: list[float],
    namespace: str = "",
    out_prefix: str = "le_",
) -> DataFrame:
    """Histogram exposition over `metrics.histogram_buckets` output
    (wide cumulative columns ``le_<b>…le_inf`` + ``value_sum``):
    ``name_bucket{dims...,le="b"}`` per bound plus ``+Inf``, then
    ``name_sum`` / ``name_count`` (`collector.go:226-261` renders the
    same three families via the client). Pure codegen — explode over a
    literal bound array, zero Python."""
    name = build_compliant_name(metric_name, namespace)
    buckets = [
        (_fmt_value(b), f"{out_prefix}{b}".replace(".", "_")) for b in bounds
    ] + [("+Inf", f"{out_prefix}inf")]
    arr = F.array(
        *[
            F.struct(
                F.lit(le).alias("le"),
                F.col(c).cast("double").alias("cnt"),
            )
            for le, c in buckets
        ]
    )

    def dim_pairs(extra: dict | None = None):
        pairs = {normalize_label(c): F.col(c).cast("string") for c in dims}
        for k, v in (extra or {}).items():
            pairs[k] = v
        return _label_pairs_expr(pairs)

    bucket_lines = (
        df.withColumn("__b", F.explode(arr))
        .select(
            F.concat(
                F.lit(name + "_bucket{"),
                dim_pairs({"le": F.col("__b.le")}),
                F.lit("} "),
                F.col("__b.cnt").cast("long").cast("string"),
            ).alias("line")
        )
    )
    vs = F.col("value_sum").cast("double")
    vs_str = F.when(
        vs == vs.cast("long").cast("double"),
        vs.cast("long").cast("string"),
    ).otherwise(vs.cast("string"))
    sum_lines = df.select(
        F.concat(
            F.lit(name + "_sum{"), dim_pairs(), F.lit("} "), vs_str
        ).alias("line")
    )
    count_lines = df.select(
        F.concat(
            F.lit(name + "_count{"), dim_pairs(), F.lit("} "),
            F.col(f"{out_prefix}inf").cast("string"),
        ).alias("line")
    )
    return bucket_lines.unionAll(sum_lines).unionAll(count_lines)


def prometheus_text(
    df: DataFrame,
    metric_name: str,
    *,
    metric_type: str = "counter",
    help_text: str = "",
    namespace: str = "",
    const_labels: dict | None = None,
    label_cols: list[str] | None = None,
    value_col: str = "value",
) -> str:
    """The full text-exposition block for one metric family: HELP/TYPE
    headers + label-value-sorted series (client_golang Gather order).
    Driver-side assembly — the series set is metric CARDINALITY, which
    the reference also materializes in one process to serve /metrics;
    this is the scrape boundary, not a data-scale path."""
    name = build_compliant_name(metric_name, namespace)
    lines = [
        r["line"]
        for r in prometheus_series_lines(
            df,
            metric_name,
            metric_type=metric_type,
            namespace=namespace,
            const_labels=const_labels,
            label_cols=label_cols,
            value_col=value_col,
        ).collect()
    ]
    head = []
    if help_text:
        head.append(f"# HELP {name} {help_text}")
    head.append(f"# TYPE {name} {metric_type}")
    return "\n".join(head + sorted(lines)) + "\n"
