"""Eval-set decontamination: flag corpus documents sharing n-grams with
a held-out evaluation set.

Training pipelines must remove (or at least mark) training documents
that leak benchmark/eval content; the standard method (GPT-3 appendix C,
PaLM, Llama) is long-n-gram collision — any shared k-gram (k≈8..13)
between a training doc and an eval doc is treated as contamination.

Scale shape: the eval side is tiny relative to the corpus (benchmarks
are thousands of docs, the corpus is billions), so its shingle set is
**broadcast** — the corpus-side scan streams map-side against the
broadcast hash set with no shuffle of corpus shingles at all; only the
(rare) hits are shuffled for the per-(doc, eval-doc) count.  The corpus
is read once, projection-pruned to (id, text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mbai_gdb_spark.ops.dedup import shingle_set


def contamination_hits(
    corpus: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    eval_id_col: str = "eval_doc_id",
    text_col: str = "text",
    k: int = 8,
    min_common: int = 1,
) -> DataFrame:
    """(doc_id, eval_doc_id, n_common, overlap_frac) for every corpus
    document sharing >= ``min_common`` distinct k-gram shingles with an
    eval document.  ``overlap_frac`` = shared / eval-doc shingles — the
    fraction of the *benchmark* item present in the training doc, which
    is the quantity decontamination policies threshold on.
    """
    ev = shingle_set(eval_set, eval_id_col, text_col, k=k)
    ev_sizes = ev.groupBy(eval_id_col).agg(F.count(F.lit(1)).alias("__ne__"))
    co = shingle_set(corpus, id_col, text_col, k=k)
    hits = (
        co.join(F.broadcast(ev), "shingle")
        .groupBy(id_col, eval_id_col)
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    return hits.join(F.broadcast(ev_sizes), eval_id_col).select(
        id_col,
        eval_id_col,
        "n_common",
        (F.col("n_common").cast("double") / F.col("__ne__")).alias("overlap_frac"),
    )
