"""opentelemetry_collector_spark — a PySpark-native log/telemetry pipeline.

A brand-new, Spark-first reimplementation of the semantics of the
OpenTelemetry Collector (reference: open-telemetry/opentelemetry-collector,
read-only at /root/reference) as a batch/incremental parse → enrich →
route → aggregate pipeline over tables of multi-turn conversation
transcripts.

Design (see SURVEY.md):
- the reference's receiver → processor → exporter DAG becomes a lazy
  composition of DataFrame transformations (plans/pipeline.py);
- pdata nested batches become flat columnar rows (resource/scope context
  as ordinary columns);
- the fan-out consumer's clone-on-mutate discipline
  (internal/fanoutconsumer/logs.go:21-78) vanishes under DataFrame
  immutability — a single .persist() before fan-out replaces it;
- the persistent queue's durable-resume contract
  (exporter/exporterhelper/internal/queue/persistent_queue.go:50-73)
  becomes a per-partition lineage manifest + idempotent per-sink
  overwrite commits (state/checkpoint.py);
- obsreport accepted/refused/dropped counters
  (receiver/receiverhelper/obsreport.go:181-201) become per-stage
  counts derived from the same DAG (state/metrics.py).
"""

__version__ = "0.1.0"

from opentelemetry_collector_spark.session import get_spark  # noqa: F401

__all__ = [
    "get_spark",
    # primary user entry points (imported lazily to keep import cheap):
    #   plans.pipeline.flagship / routed_frame   — the flagship DAG
    #   plans.runner.run_pipeline                — fan-out + resume + metrics
    #   plans.config.load_yaml / build_frame     — config-driven assembly
    #   plans.docs_pipeline.clean_documents      — corpus cleaning
    #   streaming.micro.run_to_sinks             — incremental mode
]
