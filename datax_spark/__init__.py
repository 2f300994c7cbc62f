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
- ``datax_spark.sources``    — readers/writers ≈ DataX Reader/Writer plugins:
                               file.py (delimited/ORC with the reference's
                               column-spec + writeMode semantics), split.py
                               (PK-range/ASCII split planning → JDBC
                               predicates), debezium.py (CDC envelope
                               normalization), plus fixtures.py (synthetic
                               generator ≈ streamreader).
- ``datax_spark.transforms`` — the transformer registry (dx_substr, dx_pad,
                               dx_replace, dx_filter, dx_digest, pandas-UDF
                               escape hatch) ≈ DataX Transformers.
- ``datax_spark.functions``  — large-scale pipeline operators beyond the
                               reference: dedup (exact/minhash/simhash/
                               jaccard), similarity search, text analysis,
                               multimodal plumbing.
- ``datax_spark.streaming``  — Structured Streaming runners (AvailableNow
                               bounded replay, foreachBatch apply, stateful
                               applyInPandasWithState operators).
- ``datax_spark.plans``      — physical-plan assertions (no per-row Python,
                               pushdown/pruning checks).
- ``datax_spark.cdc.quarantine`` — dirty-record routing + error limits.
- ``datax_spark.jobspec`` / ``datax_spark.cli`` — DataX-job.json-style
                               config-driven runs, preCheck dry-run, and
                               table maintenance (compact/vacuum/report).
- ``datax_spark.metrics``    — streaming progress listener + lineage-derived
                               job report ≈ Communication counters.

Design rule (BASELINE.json): DataFrame + native Column expressions everywhere;
vectorized pandas/Arrow UDFs are the only per-row escape hatch.
"""

__version__ = "0.1.0"

from datax_spark.session import get_session  # noqa: F401
