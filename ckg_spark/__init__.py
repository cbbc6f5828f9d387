"""ckg_spark — a from-scratch PySpark-native knowledge-graph construction engine.

Re-expresses the query & data-processing capabilities of metabdel/CKG
(reference at /root/reference, studied for semantics only) as idiomatic
Spark DataFrame/SQL plans over snapshot-committed parquet tables.

Layout
------
corpus/       deterministic synthetic web-page + vocabulary generators
extract/      Arrow-vectorized HTML -> text extraction (byte-identical per url)
tag/          Aho-Corasick dictionary mention tagging (broadcast automaton)
link/         entity-link scoring + triple emission (mention / co-mention / is-a)
canon/        MinHash-LSH blocking + connected-components canonicalization
materialize/  idempotent MERGE into nodes/edges tables, FK validation, metrics
ops/          training-data pipeline operators (dedup, simsearch, text stats, multimodal)
queries/      named analytics query catalog over the graph tables
lakehouse.py  snapshot-committed table layer (Iceberg-shaped: MERGE, time travel)
pipeline.py   checkpoint-resumable stage DAG
oracle.py     single-process reference oracle for golden triples
"""

__version__ = "0.1.0"
