"""datax_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch rebuild of the capability set of fenquen/DataX (a plugin-based
reader→channel→writer bulk-sync framework, see SURVEY.md) re-expressed on the
Spark DataFrame / Structured Streaming stack:

- ``datax_spark.lake``       — ACID snapshot table (Iceberg-shaped: manifests,
                               atomic commit, bucketed layout, schema evolution,
                               time travel). The MERGE target.
- ``datax_spark.cdc``        — the CDC core: change-feed normalization,
                               per-key dedup by max LSN, idempotent MERGE apply,
                               per-partition lineage + exactly-once replay.
- ``datax_spark.sources``    — readers (files, JDBC split planning, synthetic
                               generator, change-feed) ≈ DataX Reader plugins.
- ``datax_spark.sinks``      — writers (files, JDBC batching, quarantine)
                               ≈ DataX Writer plugins.
- ``datax_spark.functions``  — the transformer registry (dx_substr, dx_pad,
                               dx_replace, dx_filter, dx_digest, pandas-UDF
                               escape hatch) ≈ DataX Transformers.
- ``datax_spark.operators``  — large-scale pipeline operators beyond the
                               reference: dedup (exact/minhash/simhash/jaccard),
                               similarity search, text analysis, multimodal.
- ``datax_spark.streaming``  — Structured Streaming runners (AvailableNow
                               bounded replay, foreachBatch apply).
- ``datax_spark.plans``      — physical-plan assertions (no per-row Python,
                               pushdown/pruning checks).

Design rule (BASELINE.json): DataFrame + native Column expressions everywhere;
vectorized pandas/Arrow UDFs are the only per-row escape hatch.
"""

__version__ = "0.1.0"

from datax_spark.session import get_session  # noqa: F401
