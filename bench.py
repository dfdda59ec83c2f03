"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line.

    python bench.py              # driver mode: one JSON line to stdout
    python bench.py --scaling    # flagship at two parallelism levels
                                 # (separate JVMs, alternating rounds);
                                 # prints the efficiency JSON — numbers
                                 # are recorded manually in
                                 # BENCH/BASELINE.md

Metric: end-to-end wall seconds of the flagship parse→enrich→route→
aggregate DAG (value/unit per driver contract), plus turns/sec and
per-query seconds.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ITERATIONS = int(os.environ.get("BENCH_ITERATIONS", "3"))


def _force(df) -> int:
    """Execute the full DAG; return row count without driver collect of
    payload (a final global agg keeps the action cheap)."""
    from pyspark.sql import functions as F

    return df.agg(F.count(F.lit(1))).collect()[0][0]


def _bench_queries(spark, sf_dir: str) -> tuple[dict[str, float], dict[str, int]]:
    from opentelemetry_collector_spark.plans import pipeline
    from opentelemetry_collector_spark.sources import tables
    import __spark_entry__ as entry

    qs = entry.queries()
    bench_keys = [
        "pipeline_e2e",
        "pipeline_e2e_arrow",
        "parse_turns",
        "routed_rows",
        "batch_counts",
        "batch_bytes",
        "dedup_exact",
        "minhash_signatures",
        "simhash_pairs",
        "text_stats",
        "ann_topk_bruteforce",
        "events_hourly",
        "turn_gaps",
        "trace_spans",
        "metrics_histogram",
        "neardup_minhash",
        "docs_clean_pipeline",
        # LLM-data-operator family (r3): regressions here must be
        # visible to the per-round driver bench, not just pytest
        "text_winnow",
        "neardup_winnow",
        "ann_topk_ivf",
        "embedding_dedup",
        "enrich_asof",
        "vocab_topk",
        "tfidf_topterms",
        "text_repetition",
        "lm_score",
        "profile_hot_functions",
        "dedup_incremental",
        # r5: the production path — per-increment cost against the
        # disk-backed bucketed store (built once in the warm-up)
        "dedup_incremental_bucketed",
        # r4: per-signal wire formats (pmetric/ptrace codecs)
        "spans_roundtrip",
        "metrics_roundtrip",
        "spans_otlp_json",
        "metrics_otlp_json",
        "metrics_histogram_otlp",
        # r5: the remaining three metric-type envelope branches
        "metrics_sum_otlp",
        "metrics_exp_otlp",
        "metrics_summary_otlp",
        "logs_anyvalue_otlp",
        "profile_pprof_roundtrip",
        # r5: exemplars, pprofile links/attr-units, star components
        "metrics_exemplars",
        "profile_span_hotspots",
        "profile_attr_units",
        "neardup_components_star",
        # r4: corpus-shaping family
        "docs_quality",
        "sample_mix",
        "contamination_check",
        "sequence_pack",
        "bpe_segment",
        "neardup_components",
        "corpus_pipeline",
        # r6: profiles envelope + dictionary + mapping rollup, entity
        # write path — the new signal surface must be perf-visible
        "profiles_otlp_json",
        "profiles_dictionary_otlp",
        "profile_mapping_rollup",
        "resource_entities_writeback",
        "metrics_exp_signed_otlp",
    ]
    # warm-up: JVM, codegen, parquet footers (small sf)
    _force(pipeline.flagship(spark, "/root/testdata/sf0.001"))

    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    for k in bench_keys:
        try:
            _force(qs[k](spark, sf_dir))  # per-query warm-up: codegen + page cache
            samples = []
            for _ in range(ITERATIONS):
                t0 = time.perf_counter()
                n = _force(qs[k](spark, sf_dir))
                samples.append(time.perf_counter() - t0)
            times[k] = round(statistics.median(samples), 4)
            rows[k] = n
        except Exception as e:  # one broken query must not sink the report
            times[k] = -1.0
            rows[k] = -1
            print(f"BENCH_QUERY_ERROR {k}: {type(e).__name__}", file=sys.stderr)
        finally:
            # deterministic storage cleanup: LSH queries persist their
            # minhash intermediate; without this the 4×-iterated bench
            # accumulates cached shingle arrays until driver GC happens
            # to trigger the ContextCleaner
            spark.catalog.clearCache()
    return times, rows


def run_once(sf_dir: str = SF_DIR, cpus: str = CPUS) -> dict:
    from opentelemetry_collector_spark import fixtures
    from opentelemetry_collector_spark.session import get_spark

    path = fixtures.ensure_transcripts(sf_dir)
    import pyarrow.parquet as pq

    n_turns = pq.read_metadata(path).num_rows
    spark = get_spark("otelcol-spark-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    times, rows = _bench_queries(spark, sf_dir)
    e2e = times["pipeline_e2e"]
    if e2e <= 0:
        # the headline metric failing must be LOUD, not a plausible-
        # looking negative measurement in an otherwise-valid report
        raise RuntimeError("flagship pipeline_e2e failed during bench")
    return {
        "metric": "pipeline_e2e_wall_seconds",
        "value": e2e,
        "unit": "sec",
        "queries": times,
        "sf": fixtures.sf_value_of(sf_dir),
        "turns": n_turns,
        "turns_per_sec": round(n_turns / e2e, 1),
        "cpus": int(cpus),
        "rows_out": rows,
    }


def _flagship_seconds_subprocess(cpus: int, sf_dir: str) -> tuple[float, int]:
    """Time the flagship in a fresh JVM at the given parallelism."""
    code = f"""
import json, sys, time, statistics
sys.path.insert(0, "/root/repo")
from opentelemetry_collector_spark.session import get_spark
from opentelemetry_collector_spark.plans import pipeline
from pyspark.sql import functions as F
spark = get_spark("scaling-{cpus}", master="local[{cpus}]",
                  shuffle_partitions={cpus})
spark.sparkContext.setLogLevel("ERROR")
def force(df):
    return df.agg(F.count(F.lit(1))).collect()[0][0]
force(pipeline.flagship(spark, "/root/testdata/sf0.001"))  # warm-up
force(pipeline.flagship(spark, {sf_dir!r}))  # target-scale warm-up
samples = []
for _ in range({ITERATIONS}):
    t0 = time.perf_counter()
    n = force(pipeline.flagship(spark, {sf_dir!r}))
    samples.append(time.perf_counter() - t0)
print("RESULT " + json.dumps({{"sec": statistics.median(samples), "rows": n}}))
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1200
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            d = json.loads(line[len("RESULT "):])
            return d["sec"], d["rows"]
    raise RuntimeError(f"scaling subprocess failed:\n{out.stdout}\n{out.stderr}")


def run_scaling(
    sf_dir: str = SF_DIR,
    low: int | None = None,
    high: int | None = None,
    rounds: int = 3,
) -> dict:
    """Alternating-JVM protocol: (low, high) × rounds, median of per-JVM
    medians — so transient machine load contaminates both levels
    equally instead of whichever level ran during the spike."""
    from opentelemetry_collector_spark import fixtures
    import pyarrow.parquet as pq

    # default pair N=2 → 4N=8: both levels below the single-box
    # memory-bandwidth saturation knee (see BENCH/BASELINE.md) — the
    # fair sandbox proxy for separate-machine executors. Precedence:
    # explicit argument > env var > default.
    if low is None:
        low = int(os.environ.get("SCALING_LOW", 2))
    if high is None:
        high = int(os.environ.get("SCALING_HIGH", 8))
    path = fixtures.ensure_transcripts(sf_dir)
    n_turns = pq.read_metadata(path).num_rows
    lows, highs = [], []
    rows_low = rows_high = None
    for _ in range(rounds):
        s, rows_low = _flagship_seconds_subprocess(low, sf_dir)
        lows.append(s)
        s, rows_high = _flagship_seconds_subprocess(high, sf_dir)
        highs.append(s)
    sec_low = statistics.median(lows)
    sec_high = statistics.median(highs)
    assert rows_low == rows_high, "results differ across parallelism levels!"
    tp_low, tp_high = n_turns / sec_low, n_turns / sec_high
    eff = (tp_high / tp_low) / (high / low)
    return {
        "sf_dir": sf_dir,
        "turns": n_turns,
        "low_cpus": low,
        "high_cpus": high,
        "sec_low": round(sec_low, 4),
        "sec_high": round(sec_high, 4),
        "turns_per_sec_low": round(tp_low, 1),
        "turns_per_sec_high": round(tp_high, 1),
        "scaling_efficiency": round(eff, 4),
        "rows_out": rows_low,
        "samples_low": [round(x, 3) for x in lows],
        "samples_high": [round(x, 3) for x in highs],
    }


def run_scale_growth(base_docs: int = 5000, base_vecs: int = 2000) -> dict:
    """Two-scale candidate-growth evidence for the dedup/ANN family
    (plans/scale_growth.py): candidate-pair counts + wall seconds for
    every generator at 1× and 4× corpora. Recorded per-round in
    BENCH/BASELINE.md; the pytest gate (tests/test_scale_growth.py)
    pins the ratio at CI scale."""
    from opentelemetry_collector_spark.plans import scale_growth
    from opentelemetry_collector_spark.session import get_spark

    spark = get_spark("otelcol-scale-growth", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    return scale_growth.growth_report(spark, base_docs, base_vecs)


# The driver keeps only a ~2,000-char TAIL of bench stdout; a full
# 86-query map (~3.4 KB) truncates the HEAD of the line and the parse
# fails (r4/r5 artifacts both came back `parsed: null`).  Stdout gets a
# compact headline capped well under the window; the full per-query
# detail always lands in BENCH_RESULT.json.
_STDOUT_BUDGET = 1900
# Headline queries worth carrying in the compact line, most important
# first — trimmed from the end if the budget is ever threatened.
_HEADLINE_KEYS = [
    "pipeline_e2e", "pipeline_e2e_arrow", "pipeline_e2e_salted",
    "parse_turns", "routed_rows", "batch_counts", "dedup_exact",
    "neardup_minhash", "simhash_pairs", "ann_topk_bruteforce",
    "corpus_pipeline", "dedup_incremental_bucketed", "spans_roundtrip",
    "metrics_roundtrip", "proto_roundtrip", "events_hourly",
]


def _compact(res: dict) -> str:
    """One JSON line guaranteed under the driver's capture window."""
    slim = {k: v for k, v in res.items() if k not in ("queries", "rows_out")}
    queries = res.get("queries")
    if isinstance(queries, dict):
        slim["n_queries"] = len(queries)
        slim["detail"] = "BENCH_RESULT.json"
        keep = [k for k in _HEADLINE_KEYS if k in queries]
        while keep:
            slim["queries"] = {k: queries[k] for k in keep}
            line = json.dumps(slim)
            if len(line) <= _STDOUT_BUDGET:
                return line
            keep.pop()
        slim.pop("queries", None)
    line = json.dumps(slim)
    if len(line) > _STDOUT_BUDGET:
        # scaling/scale-growth payloads are small; if one ever grows past
        # the window, degrade to the bare metric rather than truncating
        line = json.dumps({k: slim[k] for k in
                           ("metric", "value", "unit", "sf", "cpus")
                           if k in slim})
    return line


def _emit(res: dict) -> None:
    """Full result → BENCH_RESULT.json; compact headline → stdout (the
    ONLY stdout line — fd-1 is routed to stderr during the run)."""
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_RESULT.json"), "w") as f:
            f.write(json.dumps(res) + "\n")
    except OSError:
        pass
    print(_compact(res))


if __name__ == "__main__":
    # While the benchmark runs, route fd-1 to fd-2 so JVM/py4j/fixture
    # chatter cannot precede (or truncate away) the result line; restore
    # stdout only for the single JSON emit.
    saved_stdout = os.dup(1)
    os.dup2(2, 1)
    try:
        if "--scaling" in sys.argv:
            res = run_scaling()
        elif "--scale-growth" in sys.argv:
            res = run_scale_growth()
        else:
            res = run_once()
    finally:
        sys.stdout.flush()
        os.dup2(saved_stdout, 1)
        os.close(saved_stdout)
    _emit(res)
