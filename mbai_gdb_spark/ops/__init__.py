"""Reusable operator library.

Each module re-expresses one family from the reference's operator
inventory (SURVEY.md §2) as a pure DataFrame→DataFrame function:

- ``chain``      — NEXT-chain / lead-lag sequence operators (W1-W9).
- ``intervals``  — point-in-interval joins (J3), as-of joins with
                   tolerance (J7), gaps-and-islands sessionization (W5).
- ``windows``    — running totals with reset (W8), top-1-per-key (W10),
                   priority ordering (W7).
- ``dedup``      — exact / minhash-LSH / simhash / n-gram-Jaccard
                   deduplication (training-data pipeline ops).
- ``similarity`` — cosine ANN over embedding columns.
- ``text``       — language-ID, quality scoring, token counting,
                   fingerprinting.
- ``multimodal`` — binary-column decode/feature plumbing (mapInPandas).
"""

from mbai_gdb_spark.ops.chain import chain_next
from mbai_gdb_spark.ops.intervals import asof_join, interval_join, sessionize
from mbai_gdb_spark.ops.windows import running_sum, top1_per_key

__all__ = [
    "chain_next",
    "interval_join",
    "asof_join",
    "sessionize",
    "running_sum",
    "top1_per_key",
]
