"""Two-parallelism throughput evidence for the line-protocol receivers
(statsd parse+flush, carbon parse, wavefront parse).

Same methodology as bench.py's scaling matrix: each level runs in a
FRESH process pinned to N cores (``taskset -c 0..N-1``) with
``local[N]``, same input (20M synthesized lines, a pure function of row
id so generation is JVM-side concat and never dominates), 2 runs per
level keeping the min. Efficiency(8→32) = rate32 / (4 × rate8).

Usage: python tools/bench_line_receivers.py            # parent, prints JSON
       python tools/bench_line_receivers.py --child N OP   # internal
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

ROWS = int(os.environ.get("SPARK_GRAFT_LINE_ROWS", 20_000_000))
LEVELS = (8, 32)
OPS = ("statsd", "carbon", "wavefront")


def _lines(spark, op: str):
    from pyspark.sql import functions as F

    df = spark.range(ROWS).select(F.col("id"))
    eid = F.col("id")
    if op == "statsd":
        line = (
            F.when(
                eid % 3 == 0,
                F.concat(
                    F.lit("c"), (eid % 64).cast("string"), F.lit(":"),
                    (eid % 10).cast("string"), F.lit("|c"),
                    F.when(eid % 2 == 0, F.lit("|@0.5")).otherwise(F.lit("")),
                ),
            )
            .when(
                eid % 3 == 1,
                F.concat(
                    F.lit("g"), (eid % 64).cast("string"), F.lit(":"),
                    F.when(eid % 5 < 2, F.lit("+"))
                    .when(eid % 5 == 2, F.lit("-")).otherwise(F.lit("")),
                    (eid % 7).cast("string"), F.lit("|g"),
                ),
            )
            .otherwise(
                F.concat(
                    F.lit("lat"), (eid % 16).cast("string"), F.lit(":"),
                    (eid % 100).cast("string"), F.lit("|ms|#k:"),
                    (eid % 5).cast("string"),
                )
            )
        )
    elif op == "carbon":
        line = F.concat(
            F.lit("svc"), (eid % 32).cast("string"),
            F.lit(".h"), (eid % 16).cast("string"), F.lit(".cpu.seconds"),
            F.when(eid % 2 == 0, F.lit(";env=prod")).otherwise(F.lit("")),
            F.lit(" "), (eid % 100).cast("string"),
            F.when(eid % 4 == 0, F.lit(".5")).otherwise(F.lit("")),
            F.lit(" "), (F.lit(1704067200) + eid % 86400).cast("string"),
        )
    else:
        line = F.concat(
            F.lit("m"), (eid % 32).cast("string"), F.lit(".load "),
            (eid % 100).cast("string"),
            F.when(eid % 4 == 0, F.lit(".5")).otherwise(F.lit("")),
            F.lit(" "), (F.lit(1704067200) + eid % 86400).cast("string"),
            F.lit(" source=h"), (eid % 16).cast("string"),
            F.when(eid % 2 == 0, F.lit(" env=prod")).otherwise(F.lit("")),
        )
    return df.select(eid.alias("line_id"), line.alias("line"))


def _child(cores: int, op: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from opentelemetry_collector_contrib_spark.session import get_spark
    from opentelemetry_collector_contrib_spark.sources.carbon_receiver import (
        carbon_datapoints,
    )
    from opentelemetry_collector_contrib_spark.sources.statsd_receiver import (
        statsd_datapoints,
        statsd_flush,
    )
    from opentelemetry_collector_contrib_spark.sources.wavefront_receiver import (
        wavefront_datapoints,
    )

    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores)
    lines = _lines(spark, op)
    # Warm the PYTHON path (worker daemons + imports) with a small slice
    # through the same operator — steady-state throughput is the claim,
    # not interpreter startup. repartition(cores) touches every worker.
    warm = _lines(spark, op).limit(50_000).repartition(cores)
    if op == "statsd":
        from opentelemetry_collector_contrib_spark.sources.statsd_receiver import (  # noqa: E501
            statsd_datapoints as _sd,
        )
        _sd(warm).count()
    elif op == "carbon":
        carbon_datapoints(warm).count()
    else:
        wavefront_datapoints(warm).count()
    t0 = time.time()
    if op == "statsd":
        n = statsd_flush(
            statsd_datapoints(lines), 0, 60_000_000_000
        ).count()
    elif op == "carbon":
        n = carbon_datapoints(lines).count()
    else:
        n = wavefront_datapoints(lines).count()
    sec = time.time() - t0
    print(f"CHILD_SEC={sec:.3f} CHILD_OUT={n}")
    spark.stop()


def _spawn(cores: int, op: str) -> float:
    cmd = [sys.executable, os.path.abspath(__file__), "--child", str(cores), op]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=3600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    for ln in out.stdout.splitlines():
        if ln.startswith("CHILD_SEC="):
            return float(ln.split()[0].split("=")[1])
    raise RuntimeError(f"child cores={cores} op={op}: {out.stderr[-1500:]}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(int(sys.argv[2]), sys.argv[3])
        return
    result: dict = {"rows": ROWS, "ops": {}}
    for op in OPS:
        rates = {}
        for cores in LEVELS:
            sec = min(_spawn(cores, op) for _ in range(2))
            rates[cores] = ROWS / sec
            print(
                f"{op} local[{cores}]: {sec:.1f}s"
                f" ({rates[cores] / 1e6:.2f} M lines/s)",
                file=sys.stderr,
            )
        eff = rates[LEVELS[1]] / (
            (LEVELS[1] // LEVELS[0]) * rates[LEVELS[0]]
        )
        result["ops"][op] = {
            "rate_8": round(rates[8], 0),
            "rate_32": round(rates[32], 0),
            "eff_8_32": round(eff, 3),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
