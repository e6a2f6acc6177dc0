"""cga_logs_to_kinesis_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-realization of the capabilities of
``govau/cga-logs-to-kinesis`` (a Cloud Foundry log-forwarding pipeline:
tail → dropsonde Envelope → batched, key-partitioned Kinesis sink with
retry/drop/stats), extended with the relational/analytic surface and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) that a 100 TB training-data pipeline needs.

Architecture: everything is declared through the DataFrame / Spark SQL
API so Catalyst + Tungsten pick the physical plan (predicate pushdown,
column pruning, broadcast-vs-sort-merge join selection, AQE).  Python
UDFs appear only where built-ins genuinely cannot express the
semantics, and then always as Arrow-batched pandas UDFs.

Layout:
    sources/    fixture-table + log-file readers (ns-timestamp handling)
    operators/  relational, dedup, similarity, text, multimodal ops
    functions/  reusable column-expression builders (no UDFs unless noted)
    streaming/  the reference pipeline: envelope projection, batching
                sink with retry/drop policy, tumbling delivery stats
    plans/      plan-inspection helpers used by tests to assert
                pushdown / broadcast / codegen properties
    queries.py  the registry binding every operator to a DuckDB oracle
"""

__version__ = "0.1.0"
