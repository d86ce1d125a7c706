"""mbai_gdb_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference graph-ingestion engine (lorenzoliuzzo/MBAI-gdb,
surveyed in SURVEY.md).  The reference implements relational/dataflow
operators in Cypher + pandas; this package implements the same *semantics*
as declarative DataFrame pipelines so Catalyst/AQE pick the physical plan.

Layout
------
- ``session``    — SparkSession construction with scale-oriented defaults.
- ``io``         — parquet fixture readers / insert-if-absent writers.
- ``ops``        — reusable operator library (windows, chains, interval and
                   as-of joins, gaps-and-islands, running sums, dedup,
                   similarity, text analysis, multimodal plumbing).
- ``pipeline``   — the NBA-domain pipeline (periods → lineup stints →
                   actions → score chain → plus-minus), reference parity.
- ``streaming``  — Structured Streaming variants of the stateful operators.
- ``export``     — graph-to-tensor export (dense index maps, edge indices).
"""

__version__ = "0.1.0"
