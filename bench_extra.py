"""Per-query isolation bench + plan capture (guide §1.1/§1.4/§7.2).

NOT the driver bench — bench.py is frozen for measurement. This file
exists for optimization-round archaeology:

    python bench_extra.py <key> [key ...]      # time + plan per key
    python bench_extra.py --plans-dir plans/r07 --suffix _before <keys>
    python bench_extra.py --noop <keys>        # noop sink (all columns)
    ITER=5 python bench_extra.py <key>

Prints per-key wall seconds (median of ITER, after one warm-up) using
the SAME _force methodology as bench.py (final count agg) so numbers
are comparable with the driver's; --noop switches to the noop sink
which materializes every column (guide §1.4). With --plans-dir the
query's explain("formatted") is written to
<plans-dir>/<key><suffix>.txt.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ITER = int(os.environ.get("ITER", "3"))


def _force(df) -> int:
    from pyspark.sql import functions as F

    return df.agg(F.count(F.lit(1))).collect()[0][0]


def _force_noop(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return -1


def main(argv: list[str]) -> int:
    plans_dir = None
    suffix = ""
    noop = False
    keys: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--plans-dir":
            plans_dir = argv[i + 1]
            i += 2
        elif a == "--suffix":
            suffix = argv[i + 1]
            i += 2
        elif a == "--noop":
            noop = True
            i += 1
        else:
            keys.append(a)
            i += 1

    from opentelemetry_collector_spark import fixtures
    from opentelemetry_collector_spark.session import get_spark
    import __spark_entry__ as entry

    fixtures.ensure_transcripts(SF_DIR)
    spark = get_spark("otelcol-bench-extra", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    force = _force_noop if noop else _force
    # same JVM warm-up as bench.py
    from opentelemetry_collector_spark.plans import pipeline

    _force(pipeline.flagship(spark, "/root/testdata/sf0.001"))

    out = {}
    for k in keys:
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = qs[k](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{k}{suffix}.txt"), "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(f"bench_extra:{k}:warmup")
        force(qs[k](spark, SF_DIR))
        samples = []
        for it in range(ITER):
            spark.sparkContext.setJobDescription(f"bench_extra:{k}:{it}")
            t0 = time.perf_counter()
            force(qs[k](spark, SF_DIR))
            samples.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        out[k] = {
            "median": round(statistics.median(samples), 4),
            "min": round(min(samples), 4),
            "samples": [round(s, 4) for s in samples],
        }
        print(f"{k}: median={out[k]['median']} min={out[k]['min']} "
              f"samples={out[k]['samples']}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
