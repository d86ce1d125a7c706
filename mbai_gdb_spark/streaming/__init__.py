"""Structured Streaming variants of the stateful operators.

The reference is batch-only (SURVEY §2.10); its one nod to incrementality
is idempotent deterministic-id MERGE.  These modules expose the engine's
sessionization and running aggregations over ``readStream`` sources with
watermarked event time — the shape a live play-by-play feed would use.
"""
