"""hbase_observer_es_spark — a PySpark-native engine with the capabilities of
langyalzy/hbase-observer-es (reference at /root/reference, read-only).

The reference is an HBase-coprocessor CDC pipeline that mirrors row mutations into
Elasticsearch (see /root/repo/SURVEY.md). This package re-expresses those semantics —
keyed upsert/tombstone materialization, cell-flatten pivot, micro-batch triggers — as
idiomatic DataFrame / Structured Streaming code, plus the analytics surface the
reference delegates to Elasticsearch (filters, joins, aggregations, windows, top-k,
full-text-ish term queries) and LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns), all designed for partitioned columnar execution at
100 TB scale.
"""

__version__ = "0.1.0"
