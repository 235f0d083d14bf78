"""Pure-Python/pandas oracle for the log pipeline.

Plays the role of the reference's golden files + plogtest comparisons
(`pkg/golden/golden.go`, `pkg/pdatatest/plogtest`): recomputes every stage
row-by-row, independently of Spark, from the deterministic tokengen.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

import pandas as pd

from opentelemetry_collector_contrib_spark.sources.tokengen import tokens_oracle
from opentelemetry_collector_contrib_spark.sources.render import (
    EPOCH_2024,
    LEVELS,
    LEVEL_NUMBERS,
    LINE_PATTERN,
)
from opentelemetry_collector_contrib_spark.datamodel import SOURCE_LOOKUP_ROWS
from opentelemetry_collector_contrib_spark.functions.hashing import (
    _KNUTH,
    SAMPLER_BUCKETS,
)

LOOKUP = {r[0]: {"team": r[1], "region": r[2], "tier": r[3], "sample_pct": r[4]} for r in SOURCE_LOOKUP_ROWS}


def render_line(row) -> str:
    if row.tokens[1] % 97 == 0:
        return f"MALFORMED {row.doc_id} x={row.tokens[0]}"
    idx = int(row.doc_id[4:])
    ts = datetime.fromtimestamp(EPOCH_2024 + idx % (30 * 86400), tz=timezone.utc)
    level = LEVELS[row.tokens[0] % 7]
    return (
        f'ts={ts.strftime("%Y-%m-%dT%H:%M:%SZ")} level={level} src={row.source} '
        f'ntok={row.n_tok} msg="seq {row.doc_id} head={row.tokens[0]} tail={row.tokens[-1]}"'
    )


def pipeline_oracle(n_rows: int, match_once: bool = True, with_sampling: bool = False):
    """Returns (routed_rows DataFrame, agg DataFrame) matching
    plans.pipeline.full_pipeline output (subset of columns)."""
    base = tokens_oracle(n_rows)
    pat = re.compile(LINE_PATTERN)
    out_rows = []
    for row in base.itertuples(index=False):
        line = render_line(row)
        m = pat.match(line)
        if m:
            g = m.groupdict()
            sev_text = g["level"]
            sev_num = LEVEL_NUMBERS.get(sev_text, 0)
            ts = datetime.strptime(g["ts_str"], "%Y-%m-%dT%H:%M:%SZ")
        else:
            sev_text, sev_num, ts = "default", 0, None
        enr = LOOKUP.get(row.source, {})
        rec = {
            "doc_id": row.doc_id,
            "tokens": list(row.tokens),
            "n_tok": int(row.n_tok),
            "source": row.source,
            "ts": ts,
            "severity_text": sev_text,
            "severity_number": sev_num,
            "team": enr.get("team"),
            "region": enr.get("region"),
            "tier": enr.get("tier"),
            "sample_pct": enr.get("sample_pct"),
        }
        if with_sampling:
            idx = int(row.doc_id[4:])
            pct = rec["sample_pct"] if rec["sample_pct"] is not None else 100.0
            # split-multiply modular mix, high 14 bits (functions/hashing.py)
            h = (idx + 0) % (1 << 32)
            mixed = (h % 65536 * _KNUTH + (h // 65536 * _KNUTH % 65536) * 65536) % (1 << 32)
            bucket = mixed // (1 << 18)
            if not (bucket < pct * SAMPLER_BUCKETS / 100.0):
                continue
        # routing (FIXTURES §3)
        matches = []
        if rec["tier"] == "prod":
            matches.append("acme")
        if rec["region"] == "eu" and rec["n_tok"] > 128:
            matches.append("globex")
        if match_once:
            routes = [matches[0]] if matches else ["default"]
        else:
            routes = matches if matches else ["default"]
        for r in routes:
            out_rows.append({**rec, "route": r})

    routed = pd.DataFrame(out_rows)
    agg = (
        routed.groupby(["route", "source", "severity_text"], dropna=False)
        .agg(row_count=("doc_id", "size"), token_count=("n_tok", "sum"))
        .reset_index()
    )
    return routed, agg
