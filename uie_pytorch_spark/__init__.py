"""uie_pytorch_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
reference UIE implementation (HUSTAI/uie_pytorch, read-only at
/root/reference).

This is NOT a port: the reference is a single-process eager Python
dataflow around a BERT-style pointer-network kernel; this package
re-expresses the same dataflow as Spark DataFrame algebra plus
Arrow-vectorized pandas UDFs, and adds the web-scale layers the
reference lacks (canonicalization/dedup, lineage/resume, skew
handling, graph materialization).

Layout
------
core/       pure-NumPy kernel math (span decode, tokenizer, tiny model)
schema.py   extraction-schema -> stage-tree compiler
engine.py   multi-stage distributed extraction executor
sources/    web-page / annotation readers + fixture generators
operators/  relational + training-data-pipeline operators
kg/         canonicalization, graph materialization, lineage/resume
"""

__version__ = "0.1.0"
