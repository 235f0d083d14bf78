"""Parsers — stanza ParserOperator analogs (`pkg/stanza/operator/parser/*`).

Shared semantics (`pkg/stanza/operator/helper/parser.go:97-190`): read
``parse_from``, produce fields, write to ``parse_to``; failed parses follow
``on_error``: ``send``/``send_quiet`` pass the row through with null parsed
fields, ``drop``/``drop_quiet`` remove it (`helper/transformer.go:97-110`).

The grok/regex parser is the one parser with no adequate JVM builtin for
multi-group named captures, so it is a **vectorized pandas UDF** — Arrow
batches in, one compiled regex, ``pd.Series.str.extract`` (C-loop, no
per-row Python) — per the north rule. Every other parser maps to a native
Catalyst expression (from_json / from_csv / str_to_map / parse_url /
to_timestamp), which whole-stage codegen fuses into the surrounding plan.
"""

from __future__ import annotations

import re
from typing import Iterable

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import arrow_udf, pandas_udf

ON_ERROR = ("send", "send_quiet", "drop", "drop_quiet")


def _group_names(pattern: str) -> list[str]:
    return list(re.compile(pattern).groupindex.keys())


def regex_parser(
    df: DataFrame,
    pattern: str,
    parse_from: str = "line",
    prefix: str = "",
    on_error: str = "send",
    engine: str = "arrow",
) -> DataFrame:
    """regex_parser (`parser/regex/parser.go:46-74`): named capture groups →
    one column each.

    engine='arrow' (default): vectorized Arrow UDF over
    ``pyarrow.compute.extract_regex`` — the regex runs in Arrow's C++ RE2
    kernel and no per-row Python objects are ever created (Arrow→pandas
    string conversion materializes a Python str per row, which caps the
    pandas path at ~100-200k rows/s/task; the Arrow kernel does ~600k/s/core
    with near-zero transfer overhead).

    engine='pandas': ``pd.Series.str.extract`` fallback.

    Non-matching rows yield null groups (on_error=send passthrough,
    `helper/parser.go:103-110`); on_error=drop filters them. The reference
    optionally memoizes raw→parsed with an LRU cache (parser.go:46-51);
    vectorized execution makes that unnecessary.
    """
    if on_error not in ON_ERROR:
        raise ValueError(f"on_error must be one of {ON_ERROR}")
    names = _group_names(pattern)
    if not names:
        raise ValueError("pattern must use named capture groups (?P<name>...)")
    out_schema = T.StructType([T.StructField(n, T.StringType(), True) for n in names])

    if engine == "arrow":

        @arrow_udf(out_schema)
        def extract(arr: pa.Array) -> pa.Array:
            return pc.extract_regex(arr, pattern)

    elif engine == "pandas":

        @pandas_udf(out_schema)
        def extract(s: pd.Series) -> pd.DataFrame:
            res = s.str.extract(pattern)
            res.columns = names
            return res

    else:
        raise ValueError(f"unknown engine {engine!r}")

    struct_col = f"__parsed_{parse_from}"
    out = df.withColumn(struct_col, extract(F.col(parse_from)))
    for n in names:
        out = out.withColumn(prefix + n, F.col(f"{struct_col}.{n}"))
    out = out.drop(struct_col)
    if on_error.startswith("drop"):
        # a row failed iff every capture group is null
        any_ok = F.lit(False)
        for n in names:
            any_ok = any_ok | F.col(prefix + n).isNotNull()
        out = out.filter(any_ok)
    return out


def regex_parser_native(
    df: DataFrame, pattern: str, names: list[str], parse_from: str = "line", prefix: str = ""
) -> DataFrame:
    """JVM-only variant using regexp_extract per group index (for patterns
    simple enough that running the regex G times beats one Arrow round-trip).
    Names must align with group order (group i+1). Python named-group
    syntax ``(?P<n>`` is stripped to plain groups for the JVM regex engine."""
    jvm_pattern = re.sub(r"\(\?P<[^>]+>", "(", pattern)
    out = df
    for i, n in enumerate(names):
        v = F.regexp_extract(F.col(parse_from), jvm_pattern, i + 1)
        out = out.withColumn(prefix + n, F.when(v != "", v))
    return out


def json_parser(df: DataFrame, schema, parse_from: str, parse_to: str = "parsed") -> DataFrame:
    """json_parser (`parser/json/parser.go`) → from_json."""
    return df.withColumn(parse_to, F.from_json(F.col(parse_from), schema))


def xml_parser(
    df: DataFrame, schema: str, parse_from: str, parse_to: str = "parsed"
) -> DataFrame:
    """XML parse → struct via from_xml (`pkg/ottl/ottlfuncs/func_parse_xml.go`
    flattening semantics under a declared schema; attributes address as
    ``_name`` fields). For ad-hoc single-value extraction see
    ``xml_xpath``."""
    return df.withColumn(parse_to, F.from_xml(F.col(parse_from), schema))


def xml_xpath(
    df: DataFrame, parse_from: str, paths: dict[str, str], on_error: str = "send"
) -> DataFrame:
    """Targeted XPath extraction (one output column per path) — the
    schema-free escape hatch for documents too irregular to declare.

    on_error='send' nulls rows that don't look like XML (xpath_string
    RAISES on unparseable input, unlike from_xml); a row that passes the
    cheap '<'-prefix guard but is still malformed propagates the task
    error — use xml_parser (null-safe from_xml) when inputs are dirty."""
    col = F.col(parse_from)
    looks_xml = col.rlike(r"^\s*<")
    out = df
    for name, xp in paths.items():
        v = F.xpath_string(col, F.lit(xp))
        if on_error == "send":
            v = F.when(looks_xml, v)
        out = out.withColumn(name, v)
    return out


def csv_parser(
    df: DataFrame, schema: str, parse_from: str, parse_to: str = "parsed", sep: str = ","
) -> DataFrame:
    """csv_parser (`parser/csv/parser.go`) → from_csv."""
    return df.withColumn(
        parse_to, F.from_csv(F.col(parse_from), schema, {"sep": sep})
    )


def jsonarray_parser(
    df: DataFrame, element_schema: str, parse_from: str, parse_to: str = "parsed"
) -> DataFrame:
    """jsonarray_parser (`parser/jsonarray/parser.go`) → from_json ArrayType."""
    return df.withColumn(
        parse_to, F.from_json(F.col(parse_from), f"array<{element_schema}>")
    )


# RFC3164: "<PRI>MMM dd HH:mm:ss HOST TAG: MSG" — pri = facility*8 + severity
SYSLOG_3164 = (
    r"^<(?P<pri>\d+)>(?P<ts3164>\w{3}\s+\d+ \d{2}:\d{2}:\d{2}) "
    r"(?P<host>\S+) (?P<tag>[^:\[]+)(?:\[(?P<pid>\d+)\])?: ?(?P<msg>.*)$"
)
# RFC5424: "<PRI>1 ISO8601 HOST APP PROCID MSGID SD MSG"
SYSLOG_5424 = (
    r"^<(?P<pri>\d+)>1 (?P<ts5424>\S+) (?P<host>\S+) (?P<app>\S+) "
    r"(?P<procid>\S+) (?P<msgid>\S+) (?P<sd>(?:-|\[.*?\])) ?(?P<msg>.*)$"
)


def syslog_parser(
    df: DataFrame, parse_from: str = "line", protocol: str = "rfc3164",
    year: int = 2024, multiline_msg: bool = False
) -> DataFrame:
    """syslog_parser (`parser/syslog/parser.go:58-160`): RFC3164/RFC5424
    structured parse; PRI splits into facility/severity per the RFC.

    ``multiline_msg`` lets the RFC 5424 MSG span newlines — the
    go-syslog machine accepts any octets there, which matters exactly
    for octet-counted TCP frames (`sources/syslog_framing`); the
    default stays line-oriented for the line-reader paths."""
    pat = SYSLOG_3164 if protocol == "rfc3164" else SYSLOG_5424
    if multiline_msg and protocol == "rfc5424":
        pat = pat.replace("(?P<msg>.*)$", "(?P<msg>(?s:.*))$")
    names = _group_names(pat)
    out = regex_parser_native(df, pat, names, parse_from=parse_from)
    pri = F.col("pri").cast("int")
    out = out.withColumn("facility", (pri / 8).cast("int")).withColumn(
        "syslog_severity", F.pmod(pri, F.lit(8)).cast("int")
    )
    if protocol == "rfc3164":
        ts = F.to_timestamp(
            F.concat(F.lit(f"{year} "), F.regexp_replace(F.col("ts3164"), r"\s+", " ")),
            "yyyy MMM d HH:mm:ss",
        )
    else:
        ts = F.to_timestamp(F.col("ts5424"), "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]X")
    return out.withColumn("ts", ts)


def key_value_parser(
    df: DataFrame,
    parse_from: str,
    parse_to: str = "attributes",
    pair_delim: str = " ",
    kv_delim: str = "=",
) -> DataFrame:
    """key_value_parser (`parser/keyvalue/parser.go:37-48`) → str_to_map."""
    return df.withColumn(
        parse_to, F.str_to_map(F.col(parse_from), F.lit(pair_delim), F.lit(kv_delim))
    )


def uri_parser(df: DataFrame, parse_from: str, prefix: str = "uri_") -> DataFrame:
    """uri_parser (`parser/uri/parser.go:37-115`) → parse_url parts."""
    col = F.col(parse_from)
    return (
        df.withColumn(prefix + "scheme", F.lower(F.parse_url(col, F.lit("PROTOCOL"))))
        .withColumn(prefix + "host", F.parse_url(col, F.lit("HOST")))
        .withColumn(prefix + "path", F.parse_url(col, F.lit("PATH")))
        .withColumn(prefix + "query", F.parse_url(col, F.lit("QUERY")))
    )


# Go reference-time components → Spark datetime pattern, longest-first so
# "2006" wins over "06" and "01" over "1" (`operator/helper/time.go` gotime
# layout_type; Go layouts are the collector's native flavor).
_GOTIME_TABLE = [
    ("2006", "yyyy"), ("January", "MMMM"), ("Jan", "MMM"), ("Monday", "EEEE"),
    ("Mon", "EEE"), ("15", "HH"), ("002", "DDD"), ("01", "MM"), ("02", "dd"),
    ("03", "hh"), ("04", "mm"), ("05", "ss"), ("06", "yy"),
    (".000000000", ".SSSSSSSSS"), (".000000", ".SSSSSS"), (".000", ".SSS"),
    ("PM", "a"),
    ("Z07:00", "XXX"), ("Z0700", "XX"), ("-07:00", "xxx"), ("-0700", "xx"),
    ("MST", "zz"), ("1", "M"), ("2", "d"), ("3", "h"), ("4", "m"), ("5", "s"),
]

# Go directives with no Spark-datetime equivalent: rejecting loudly beats a
# silent null parse (on_error='send' would otherwise swallow it).
_GOTIME_UNSUPPORTED = {
    "__2": "space-padded day-of-year",
    "_2": "space-padded day ('Jan _2' syslog layout)",
    "pm": "lowercase am/pm marker (Spark 'a' matches uppercase only)",
}


def gotime_to_spark(layout: str) -> str:
    """'2006-01-02 15:04:05' → 'yyyy-MM-dd HH:mm:ss' (greedy left-to-right,
    longest component first). Unrecognized LETTERS are single-quoted — Spark
    treats bare letters as pattern chars, so the 'T' in an ISO layout must
    become 'T'; punctuation/digits pass through bare.

    Go's space-padded directives (`_2`, `__2`) and lowercase `pm` have no
    Spark pattern equivalent and raise ValueError — normalize the input
    instead (``regexp_replace(col, '  +', ' ')`` + layout '2'; ``upper()``
    + layout 'PM'). `002` (day-of-year) maps to 'DDD'."""
    out, i = [], 0
    while i < len(layout):
        for go, why in _GOTIME_UNSUPPORTED.items():
            if layout.startswith(go, i):
                raise ValueError(
                    f"gotime directive {go!r} ({why}) is not representable as a "
                    f"Spark datetime pattern; normalize the input column instead"
                )
        for go, spark in _GOTIME_TABLE:
            if layout.startswith(go, i):
                out.append(spark)
                i += len(go)
                break
        else:
            ch = layout[i]
            out.append(f"'{ch}'" if ch.isalpha() else ch)
            i += 1
    return "".join(out)


def time_parser(
    df: DataFrame,
    parse_from: str,
    layout: str | None = None,
    layout_type: str = "strptime",
    parse_to: str = "ts",
    on_error: str = "send",
) -> DataFrame:
    """time_parser (`operator/helper/time.go:19-26,131-200`).

    layout_type: 'strptime' → %-directives (or a native Spark pattern)
    converted via the ctime table; 'gotime' → Go reference-time layout
    ("2006-01-02 15:04:05") converted via gotime_to_spark;
    'epoch' → layout one of s/ms/us/ns over numeric input.

    on_error='send' (default) tolerates unparseable strings → null ts
    (try_to_timestamp; Spark 4 ANSI would otherwise fail the task, which is
    exactly ErrorMode=propagate — pass on_error='propagate' for that).
    """
    col = F.col(parse_from)
    if layout_type == "epoch":
        unit = layout or "s"
        if unit == "s":
            ts = F.timestamp_seconds(col.cast("double"))
        elif unit == "ms":
            ts = F.timestamp_millis(col.cast("long"))
        elif unit == "us":
            ts = F.timestamp_micros(col.cast("long"))
        elif unit == "ns":
            ts = F.timestamp_micros((col.cast("long") / 1000).cast("long"))
        else:
            raise ValueError(f"unknown epoch unit {unit}")
        return df.withColumn(parse_to, ts)
    fn = F.to_timestamp if on_error == "propagate" else F.try_to_timestamp
    if layout is None:
        return df.withColumn(parse_to, fn(col))
    if layout_type == "gotime":
        layout = gotime_to_spark(layout)
    elif layout_type == "strptime" and "%" in layout:
        from ..ottl.compiler import _strptime_to_spark

        layout = _strptime_to_spark(layout)
    return df.withColumn(parse_to, fn(col, F.lit(layout)))


def trace_parser(df: DataFrame, trace_from: str = "trace_id_hex", span_from: str | None = "span_id_hex") -> DataFrame:
    """trace_parser (`parser/trace`): hex strings → binary ids."""
    out = df.withColumn("trace_id", F.unhex(F.col(trace_from)))
    if span_from:
        out = out.withColumn("span_id", F.unhex(F.col(span_from)))
    return out


def journald_parser(df: DataFrame, parse_from: str = "line", body_to: str = "body") -> DataFrame:
    """journald export-stream parse — one ``journalctl -o json`` JSON object
    per line (`pkg/stanza/operator/input/journald/input.go:172-214`):
    timestamp comes from ``__REALTIME_TIMESTAMP`` (microseconds since epoch,
    deleted from the body — input.go:194,211), the resume token from
    ``__CURSOR`` (persisted per line by the reference, input.go:196-204; it
    STAYS in the body there, so it stays here), and the remaining fields are
    the entry body. The reference shells out to journalctl and parses its
    stdout; the journald wire format itself is out of sandbox reach, but the
    export format is plain JSON lines, so the parse half is fully faithful.

    Export-format values are strings; binary-valued fields (emitted as JSON
    byte arrays) are kept as their raw JSON text under the declared
    ``map<string,string>`` schema (Spark's JacksonParser string-coerces
    non-string scalars and containers), so no record is lost — a
    schema-specific re-parse can decode them from either the map value or
    the preserved ``parse_from`` line.
    """
    m = F.from_json(F.col(parse_from), "map<string,string>")
    return (
        df.withColumn("_jd", m)
        # try_element_at: ANSI-safe — a record missing the field yields null
        # (the reference warns and skips such lines, input.go:148-152)
        .withColumn(
            "ts_unix_us",
            F.try_element_at("_jd", F.lit("__REALTIME_TIMESTAMP")).cast("long"),
        )
        .withColumn("cursor", F.try_element_at("_jd", F.lit("__CURSOR")))
        .withColumn(
            body_to,
            F.map_filter("_jd", lambda k, _: k != F.lit("__REALTIME_TIMESTAMP")),
        )
        .drop("_jd")
    )


_WINEVENT_SCHEMA = """
    System struct<
        Provider struct<_Name string, _Guid string, _EventSourceName string>,
        EventID struct<_Qualifiers int, _VALUE bigint>,
        Level string, Task string, Opcode string,
        TimeCreated struct<_SystemTime string>,
        EventRecordID bigint,
        Channel string, Computer string,
        Security struct<_UserID string>,
        Execution struct<_ProcessID bigint, _ThreadID bigint>
    >,
    EventData struct<Data array<struct<_Name string, _VALUE string>>>,
    RenderingInfo struct<Message string, Level string>
"""


def wineventlog_parser(df: DataFrame, parse_from: str = "line") -> DataFrame:
    """Windows Event Log rendered-XML parse
    (`pkg/stanza/operator/input/windows/xml.go`). The reference subscribes via
    the Windows API and renders each event to this XML; at rest (forwarded /
    exported logs) the same XML is what a backfill parses, so — like journald
    — the wire subscription is host-specific but the parse half is fully
    faithful:

    - timestamp: ``System>TimeCreated@SystemTime`` RFC3339Nano (xml.go:37-42)
    - rendered-falls-back-to-raw for level (xml.go:82-90 — same rule as
      task/opcode; rendered strings win when RenderingInfo is present)
    - severity: rendered ``Critical/Error/Warning/Information`` else numeric
      ``1/2/3/4`` → FATAL/ERROR/WARN/INFO, default otherwise (xml.go:45-77)
    - ``EventData>Data[@Name]`` name/value pairs → map (event.go parseEventData)
    """
    from ..ottl.compiler import _map_entries_last_win

    # Materialize the parsed struct once so nested paths resolve through the
    # analyzer (Column.getField treats "a.b" as one literal field name).
    parsed = df.withColumn("_ev", F.from_xml(F.col(parse_from), f"struct<{_WINEVENT_SCHEMA}>"))
    level_raw = F.col("_ev.System.Level")
    level_rendered = F.col("_ev.RenderingInfo.Level")
    level = F.coalesce(level_rendered, level_raw)
    sev = (
        F.when(level_rendered == "Critical", "FATAL")
        .when(level_rendered == "Error", "ERROR")
        .when(level_rendered == "Warning", "WARN")
        .when(level_rendered == "Information", "INFO")
        .when(level_rendered.isNotNull(), "DEFAULT")
        .when(level_raw == "1", "FATAL")
        .when(level_raw == "2", "ERROR")
        .when(level_raw == "3", "WARN")
        .when(level_raw == "4", "INFO")
        .otherwise("DEFAULT")
    )
    data = F.col("_ev.EventData.Data")
    return parsed.select(
        *[c for c in df.columns],
        F.try_to_timestamp(
            F.col("_ev.System.TimeCreated._SystemTime"),
            F.lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSSSSS]X"),
        ).alias("ts"),
        F.col("_ev.System.EventRecordID").alias("record_id"),
        F.col("_ev.System.EventID._VALUE").alias("event_id_win"),
        F.col("_ev.System.EventID._Qualifiers").alias("qualifiers"),
        F.col("_ev.System.Provider._Name").alias("provider"),
        F.col("_ev.System.Computer").alias("computer"),
        F.col("_ev.System.Channel").alias("channel"),
        level.alias("level"),
        sev.alias("severity_text"),
        F.coalesce(F.col("_ev.RenderingInfo.Message"), F.lit("")).alias("message"),
        F.when(
            data.isNotNull(),
            # last-win on duplicate Data[@Name] keys, like Go's map assignment
            # in parseEventData (event.go) — plain map_from_entries would
            # throw under spark.sql.mapKeyDedupPolicy=EXCEPTION
            _map_entries_last_win(
                F.transform(
                    data,
                    lambda d: F.struct(
                        d["_Name"].alias("key"), d["_VALUE"].alias("value")
                    ),
                )
            ),
        ).alias("event_data"),
    )
