"""spark-submit entry point for the training-corpus pipeline.

The LLM-data sibling of tools/submit_pipeline.py: run the composed
quality → decontamination → mix sampling → componentwise dedup →
sequence packing DAG (plans/corpus_pipeline.py) over a documents
table and write the survivors' chunk placements (plus optionally the
cleaned documents themselves) as parquet.

Cluster usage (the production shape):

    zip -r otelcol_spark.zip opentelemetry_collector_spark
    spark-submit --master <cluster> \
        --py-files otelcol_spark.zip \
        tools/run_corpus_pipeline.py \
        --docs <documents parquet> --out-dir <dir> \
        --rate src0=1.0 --rate src1=0.25 --default-rate 0.5

No SparkSession config beyond the app name — master/executors/memory
come from spark-submit, as on a real cluster. Prints one JSON line of
run stats (docs in/out, chunks, per-stage drop counts).
"""

from __future__ import annotations

import argparse
import json


def _parse_rate(entry: str) -> tuple[str, int]:
    src, sep, val = entry.partition("=")
    if not sep:
        raise SystemExit(f"--rate expects source=fraction, got {entry!r}")
    f = float(val)
    if not 0.0 <= f <= 1.0:
        raise SystemExit(f"--rate {entry!r}: fraction must be in [0, 1]")
    return src, int(round(f * 1_000_000))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet path")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--budget-tokens", type=int, default=256)
    ap.add_argument("--neardup-threshold", type=float, default=0.5)
    ap.add_argument("--rate", action="append", default=[], dest="rates",
                    metavar="SRC=FRACTION",
                    help="per-source keep fraction (repeatable)")
    ap.add_argument("--default-rate", type=float, default=1.0,
                    help="keep fraction for sources with no --rate "
                         "(NULL sources included)")
    ap.add_argument("--write-docs", action="store_true",
                    help="also write the cleaned documents (not just "
                         "the chunk placements)")
    args = ap.parse_args()
    if not 0.0 <= args.default_rate <= 1.0:
        raise SystemExit(
            f"--default-rate must be in [0, 1], got {args.default_rate}"
        )

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators import corpus
    from opentelemetry_collector_spark.plans import corpus_pipeline as cpl

    spark = SparkSession.builder.appName("otelcol-spark-corpus").getOrCreate()
    docs = spark.read.parquet(args.docs)
    rates = dict(_parse_rate(r) for r in args.rates)
    default_ppm = int(round(args.default_rate * 1_000_000))

    # default_ppm flows through clean_corpus into mix_sample's own
    # fallthrough, which covers unknown AND NULL sources — no
    # observed-source scan or rates-dict splicing needed
    handle: list = []
    kept = cpl.clean_corpus(
        docs,
        rates,
        neardup_threshold=args.neardup_threshold,
        default_ppm=default_ppm,
        persist_handle=handle,
    ).persist()
    # persist: the write and the chunk-count agg both consume the full
    # two-pass packing shuffle — without the cache it runs twice
    placements = corpus.pack_sequences(kept, args.budget_tokens).persist()
    placements.write.mode("overwrite").parquet(f"{args.out_dir}/placements")
    if args.write_docs:
        kept.write.mode("overwrite").parquet(f"{args.out_dir}/documents")

    n_in = docs.count()
    n_out = kept.count()
    n_chunks = placements.agg(
        (F.max(F.col("chunk_id") + F.col("chunks_spanned"))).alias("n")
    ).first()["n"]
    placements.unpersist()
    kept.unpersist()
    for frame in handle:
        frame.unpersist()
    print(json.dumps({
        "docs_in": n_in,
        "docs_kept": n_out,
        "drop_fraction": round(1 - n_out / max(n_in, 1), 4),
        "budget_tokens": args.budget_tokens,
        "training_chunks": int(n_chunks or 0),
        "out_dir": args.out_dir,
    }))


if __name__ == "__main__":
    main()
