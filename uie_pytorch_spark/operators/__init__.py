"""Relational + training-data-pipeline operators.

Every operator here is expressed in native Spark SQL expressions
(JVM-side, whole-stage codegen) unless noted; each has a matching
ANSI-SQL oracle in __spark_entry__.py so the driver's DuckDB harness
verifies values, not just row counts.
"""
