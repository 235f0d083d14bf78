"""Carbon exporter parity — metric datapoints → Carbon plaintext
lines (the carbon receiver's inverse; the pair round-trips).

Reference behavior
(`exporter/carbonexporter/metricdata_to_plaintext.go`):

- gauge/sum number points: one line ``<path> <value> <ts_sec>`` —
  int values via FormatInt, doubles via ``FormatFloat('f', -1)``
  (never scientific), empty-valued points skipped;
- histogram points: ``<name>.count`` (count), ``<name>`` (sum), then
  one ``<name>.bucket;...;upper_bound=<bound>`` line per bucket with
  the label-formatted bound (``FormatFloat('g', -1)`` — scientific
  when the decimal exponent is < −4 or ≥ 6) and ``inf`` for the
  implicit last bound; points with no explicit bounds emit only
  count+sum;
- summary points: count+sum the same way, then
  ``<name>.quantile;...;quantile=<q*100>`` per quantile with the
  label float format;
- path = ``name[;key=value...]`` in attribute order; tag KEYS are
  sanitized (``;!^=`` → ``_``) but tag VALUES are passed through
  unsanitized — the reference defines ``sanitizeTagValue`` and never
  calls it in this path (quirk preserved); empty values become
  ``<empty>``;
- metrics with an empty name are skipped; timestamps truncate ns→s.

Spark shape: zero-shuffle ``mapInPandas`` over flat datapoint rows;
one output row per emitted line so the carbon RECEIVER parses the
result straight back (round-trip pinned in the driver query).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, types as T

__all__ = [
    "build_path",
    "carbon_lines",
    "go_format_float_f",
    "go_format_float_g",
    "sanitize_tag_key",
]

_KEY_BAD = set(";!^=")


def sanitize_tag_key(key: str) -> str:
    return "".join("_" if c in _KEY_BAD else c for c in key)


def _shortest(f: float) -> tuple[str, str, int]:
    """(sign, shortest digits, dp) with value = sign 0.<digits> × 10^dp."""
    s = repr(float(f))
    sign = ""
    if s.startswith("-"):
        sign, s = "-", s[1:]
    if "e" in s:
        mant, exp = s.split("e")
        exp = int(exp)
    else:
        mant, exp = s, 0
    if "." in mant:
        intp, frac = mant.split(".")
    else:
        intp, frac = mant, ""
    stripped_int = intp.lstrip("0")
    if stripped_int:
        dp = len(stripped_int) + exp
        digits = (stripped_int + frac).rstrip("0") or "0"
    else:
        lead = len(frac) - len(frac.lstrip("0"))
        dp = -lead + exp
        digits = frac.lstrip("0").rstrip("0") or "0"
    if digits == "0":
        dp = 1
    return sign, digits, dp


def go_format_float_f(f: float) -> str:
    """``strconv.FormatFloat(f, 'f', -1, 64)`` — shortest round-trip
    digits, never scientific."""
    f = float(f)
    if f != f:
        return "NaN"
    if f in (float("inf"), float("-inf")):
        return "+Inf" if f > 0 else "-Inf"
    sign, digits, dp = _shortest(f)
    if f == 0:
        return sign + "0"
    if dp >= len(digits):
        return sign + digits + "0" * (dp - len(digits))
    if dp > 0:
        return sign + digits[:dp] + "." + digits[dp:]
    return sign + "0." + "0" * (-dp) + digits


def go_format_float_g(f: float) -> str:
    """``strconv.FormatFloat(f, 'g', -1, 64)`` — scientific when the
    printed exponent is < −4 or ≥ 6 (Go's shortest-mode eprec)."""
    f = float(f)
    if f != f:
        return "NaN"
    if f in (float("inf"), float("-inf")):
        return "+Inf" if f > 0 else "-Inf"
    if f == 0:
        return "-0" if repr(f).startswith("-") else "0"
    sign, digits, dp = _shortest(f)
    e = dp - 1
    if e < -4 or e >= 6:
        mant = digits[0]
        if len(digits) > 1:
            mant += "." + digits[1:]
        return f"{sign}{mant}e{'+' if e >= 0 else '-'}{abs(e):02d}"
    return go_format_float_f(f)


def build_path(name: str, attributes: Optional[dict]) -> str:
    """`metricdata_to_plaintext.go:252-277` — keys sanitized, values
    NOT (reference quirk), empty values → ``<empty>``."""
    if not attributes:
        return name
    parts = [name]
    for k, v in attributes.items():
        value = str(v) if v is not None and str(v) != "" else "<empty>"
        parts.append(";" + sanitize_tag_key(str(k)) + "=" + value)
    return "".join(parts)


def _opt(v):
    """None for SQL NULLs, which pandas renders as None OR float NaN."""
    if v is None:
        return None
    if isinstance(v, float) and v != v:
        return None
    return v


def _dp_lines(rec: dict) -> list[str]:
    name = str(rec.get("metric_name") or "")
    if not name:
        return []  # empty-name metric skipped
    mtype = str(rec.get("metric_type") or "")
    attrs = dict(rec.get("attributes") or {})
    ts = str(int(rec.get("time_unix_nano") or 0) // 1_000_000_000)
    out: list[str] = []

    def line(path: str, value: str) -> None:
        out.append(f"{path} {value} {ts}")

    if mtype in ("gauge", "sum"):
        vi, vd = _opt(rec.get("value_int")), _opt(rec.get("value_double"))
        if vi is None and vd is None:
            return []  # empty-valued number point skipped
        value = (
            str(int(vi)) if vi is not None else go_format_float_f(float(vd))
        )
        line(build_path(name, attrs), value)
        return out

    if mtype in ("histogram", "summary"):
        count = int(_opt(rec.get("count")) or 0)
        total = float(_opt(rec.get("sum")) or 0.0)
        line(build_path(name + ".count", attrs), str(count))
        line(build_path(name, attrs), go_format_float_f(total))
        if mtype == "histogram":
            b_raw = rec.get("bounds")
            bounds = [] if b_raw is None else list(b_raw)
            c_raw = rec.get("bucket_counts")
            buckets = [] if c_raw is None else list(c_raw)
            if not bounds:
                return out
            labels = [go_format_float_g(b) for b in bounds] + ["inf"]
            bucket_path = build_path(name + ".bucket", attrs)
            for j, c in enumerate(buckets):
                line(
                    bucket_path + ";upper_bound=" + labels[j],
                    str(int(c)),
                )
        else:
            q_raw = rec.get("quantiles")
            quantiles = [] if q_raw is None else list(q_raw)
            if not quantiles:
                return out
            qpath = build_path(name + ".quantile", attrs)
            for q in quantiles:
                qv = q if isinstance(q, dict) else q.asDict()
                line(
                    qpath + ";quantile="
                    + go_format_float_g(float(qv["quantile"]) * 100),
                    go_format_float_f(float(qv["value"])),
                )
        return out
    return []


_SCHEMA = T.StructType([T.StructField("line", T.StringType())])


def carbon_lines(df: DataFrame) -> DataFrame:
    """Flat metric-datapoint rows → Carbon plaintext lines (one row
    per line). Zero-shuffle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines: list[str] = []
            for _, row in pdf.iterrows():
                lines.extend(_dp_lines({c: row[c] for c in pdf.columns}))
            yield pd.DataFrame({"line": lines})

    return df.mapInPandas(gen, _SCHEMA)
