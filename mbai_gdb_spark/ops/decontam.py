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

Two membership structures, chosen by eval-set size:

- :func:`contamination_hits` broadcasts the eval *shingle strings* —
  exact, and keeps (doc, eval-doc) attribution.  Right when the eval
  side is thousands of benchmark items.
- :func:`bloom_contamination` broadcasts a packed Bloom **bitmap**
  instead — `m` bits for however many eval shingles, independent of
  shingle byte length, so a 100M-shingle eval union (every benchmark
  ever published) still broadcasts in a few MB.  Probabilistic: no
  false negatives, deterministic false positives at a chosen rate.
  The bit positions come from an integer LCG family over the same
  char-polynomial shingle ids the rest of the repo uses, so the whole
  structure — including which false positives fire — is bit-for-bit
  reproducible in plain SQL and the oracle can hold it to exact
  equality.
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


# --- Bloom-filter membership (broadcast bitmap) ----------------------------

MERSENNE31 = 2_147_483_647
_BLOOM_MULT = 2_654_435_761  # Knuth multiplicative constant, also kmv's
_BLOOM_ADD = 97
_BLOOM_STRIDE = 77  # per-hash-function offset on the input side
WORD_BITS = 32  # 32-bit words keep pow(2, bit) exact in double SQL


def _bloom_pos(sh_id, j: int, m_bits: int):
    """Bit position for hash function ``j`` of shingle id ``sh_id``.

    ``(((id + j*77) % p) * 2654435761 + 97) % p % m`` — every
    intermediate fits in int64 ((p-1) * mult < 2^63) and the expression
    is plain integer SQL on any engine.
    """
    h = ((sh_id + F.lit(j * _BLOOM_STRIDE)) % MERSENNE31 * _BLOOM_MULT + _BLOOM_ADD) % MERSENNE31
    return h % m_bits


def bloom_bitmap(
    shingle_ids: DataFrame, id_col: str = "sh_id", m_bits: int = 1 << 20, k: int = 4
) -> DataFrame:
    """Packed Bloom bitmap of a shingle-id set: (word_idx, word).

    ``m_bits / 32`` rows of 32 set-bit flags each — the broadcastable
    form of the eval membership set.  Built with one hash-groupBy
    (``bit_or`` has a map-side partial), so the eval side never
    concentrates on one task however large the benchmark union is.
    """
    positions = shingle_ids.select(
        F.explode(
            F.array(*[_bloom_pos(F.col(id_col), j, m_bits) for j in range(k)])
        ).alias("pos")
    )
    return (
        positions.distinct()
        .select(
            F.floor(F.col("pos") / WORD_BITS).cast("long").alias("word_idx"),
            F.pow(F.lit(2.0), F.col("pos") % WORD_BITS).cast("long").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_contamination(
    corpus_shingle_ids: DataFrame,
    eval_shingle_ids: DataFrame,
    doc_col: str = "doc_id",
    id_col: str = "sh_id",
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Per-document probable-contamination profile via a broadcast Bloom
    bitmap: (doc_id, n_flagged, n_shingles, flag_frac) for documents
    with at least one probably-contaminated shingle.

    Plan shape: the corpus side is map-only against the broadcast
    bitmap — each (doc, shingle) explodes to its ``k`` probe positions,
    broadcast-hash-joins the ≤ ``m_bits/32``-row bitmap on word index
    (no corpus shuffle), and a shingle is flagged iff all ``k`` probed
    bits are set.  Superset guarantee: every truly-shared shingle is
    flagged (no false negatives); false positives are deterministic
    given (m_bits, k) and the LCG family.
    """
    bitmap = bloom_bitmap(eval_shingle_ids, id_col=id_col, m_bits=m_bits, k=k)
    probes = corpus_shingle_ids.select(
        doc_col,
        id_col,
        F.explode(
            F.array(*[_bloom_pos(F.col(id_col), j, m_bits) for j in range(k)])
        ).alias("pos"),
    ).select(
        doc_col,
        id_col,
        F.floor(F.col("pos") / WORD_BITS).cast("long").alias("word_idx"),
        F.pow(F.lit(2.0), F.col("pos") % WORD_BITS).cast("long").alias("bit"),
    )
    hits = (
        probes.join(F.broadcast(bitmap), "word_idx")
        .filter(F.col("word").bitwiseAND(F.col("bit")) != 0)
        .groupBy(doc_col, id_col)
        .agg(F.count(F.lit(1)).alias("__nbits__"))
        .filter(F.col("__nbits__") == k)
    )
    flagged = hits.groupBy(doc_col).agg(F.count(F.lit(1)).alias("n_flagged"))
    sizes = corpus_shingle_ids.groupBy(doc_col).agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    return flagged.join(sizes, doc_col).select(
        doc_col,
        "n_flagged",
        "n_shingles",
        (F.col("n_flagged").cast("double") / F.col("n_shingles")).alias("flag_frac"),
    )
