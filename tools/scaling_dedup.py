"""Two-parallelism scaling evidence for the DEDUP path (minhash_dedup —
signature kernel + single-exchange LSH pairs + connected components + keep
join), complementing bench.py's pipeline scaling matrix: the north rule's
two-cluster-size criterion applied to the heaviest training-data operator.

Same methodology as bench.py's matrix, reduced to its essentials: fresh
process per measurement pinned to N cores via ``taskset -c 0..N-1`` (the
N-core executor-fleet analog), interleaved levels so host drift hits both
levels alike, MIN statistic over rounds (contention is one-sided), every
raw sample reported. Input = the bench's cached 20M-row tokens parquet
(run ``python bench.py`` once to create it).

Usage:
    python tools/scaling_dedup.py              # levels 8,32 x 2 rounds
    python tools/scaling_dedup.py --child 8    # internal: one pinned run
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "20000000"))
TOKENS = os.path.join(REPO, "data_cache", f"tokens_{ROWS}")
LEVELS = [int(x) for x in os.environ.get("SPARK_GRAFT_DEDUP_LEVELS", "8,32").split(",")]
ROUNDS = int(os.environ.get("SPARK_GRAFT_DEDUP_ROUNDS", "2"))


def _child(cores: int) -> None:
    from opentelemetry_collector_contrib_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_dedup,
        minhash_signature,
    )
    from opentelemetry_collector_contrib_spark.session import get_spark

    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores * 2,
                      app_name=f"dedup-scale-{cores}")
    tokens = spark.read.parquet(TOKENS).select("doc_id", "tokens")
    spark.range(10).count()  # JVM warm
    # phase 1: the corpus-scale-shaped stage (signature kernel + the single
    # pair exchange) — throughput-bound, what a 100 TB run spends its time in
    t0 = time.time()
    sig = minhash_signature(tokens, "tokens", num_perms=8)
    lsh_candidate_pairs(sig, "doc_id", 8, 4).write.format("noop") \
        .mode("overwrite").save()
    lsh_sec = time.time() - t0
    spark.catalog.clearCache()
    # phase 2: the full operator incl. connected components (iterative,
    # driver-coordinated rounds — latency-bound on one box; see BASELINE)
    t0 = time.time()
    minhash_dedup(tokens, "tokens", "doc_id", num_perms=8, rows_per_band=4) \
        .write.format("noop").mode("overwrite").save()
    full_sec = time.time() - t0
    spark.stop()
    print(f"LSH_SEC={lsh_sec:.3f}")
    print(f"DEDUP_SEC={full_sec:.3f}")


def _run(cores: int) -> tuple[float, float]:
    cmd = [sys.executable, os.path.abspath(__file__), "--child", str(cores)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600, cwd=REPO)
    got = {}
    for line in out.stdout.splitlines():
        if "=" in line and line.split("=")[0] in ("LSH_SEC", "DEDUP_SEC"):
            got[line.split("=")[0]] = float(line.split("=")[1])
    if len(got) != 2:
        raise RuntimeError(f"child cores={cores} failed: {out.stderr[-2000:]}")
    return got["LSH_SEC"], got["DEDUP_SEC"]


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        _child(int(sys.argv[2]))
        return
    if not os.path.isdir(TOKENS):
        sys.exit(f"missing {TOKENS} — run `python bench.py` once to build it")
    samples: dict[str, dict[int, list[float]]] = {
        "lsh": {c: [] for c in LEVELS}, "dedup": {c: [] for c in LEVELS},
    }
    for r in range(ROUNDS):
        for c in LEVELS:  # interleaved: drift hits both levels alike
            lsh, full = _run(c)
            samples["lsh"][c].append(lsh)
            samples["dedup"][c].append(full)
            print(f"round {r} cores={c}: lsh={lsh:.1f}s dedup={full:.1f}s",
                  file=sys.stderr)
    lo, hi = min(LEVELS), max(LEVELS)
    out = {"rows": ROWS, "levels": LEVELS,
           "stat": "min over interleaved rounds (one-sided contention)"}
    for op, per in samples.items():
        best = {c: min(v) for c, v in per.items()}
        rates = {c: ROWS / s / 1e6 for c, s in best.items()}
        out[op] = {
            "samples_sec": {str(c): v for c, v in per.items()},
            "best_sec": {str(c): round(s, 2) for c, s in best.items()},
            "mrows_per_s": {str(c): round(v, 3) for c, v in rates.items()},
            "scaling_efficiency": {
                f"{lo}->{hi}": round(rates[hi] / rates[lo] / (hi / lo), 3)
            },
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
