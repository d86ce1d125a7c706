"""Text analysis operators for training-data pipelines.

Language-ID (marker-word heuristic), quality scoring, token counting,
and document fingerprinting — all pure column algebra (JVM-side,
whole-stage-codegen) over a whitespace tokenizer.  No Python UDFs in the
hot path; everything scales as a map-only stage plus one groupBy where
stated.

These extend the reference's surface (it has no text ops) per the
training-data-pipeline mandate; they reuse its id-recipe style of
deterministic derived columns (reference: src/queries/game.py:17,84).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_SPLIT_RE = r"\s+"

# Tiny embedded stopword/marker lists — deterministic, dependency-free.
STOPWORDS = ("the", "a", "of", "and", "in", "to", "is", "it")
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
}


def tokens(col: str | Column) -> Column:
    """Whitespace tokens of trimmed text (empty-string-safe)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(col), TOKEN_SPLIT_RE)


def _count_in(arr_sql: str, words: tuple[str, ...]) -> Column:
    """Occurrence count of ``words`` in the array column named ``arr_sql``."""
    lst = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter({arr_sql}, x -> x IN ({lst})))")


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token counts and exact mean token length.

    Integer-exact: mean = sum(len)/n as a single double division, so the
    value is bit-identical across engines.
    """
    toks = tokens(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        (
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
            .cast("double")
            / F.size(toks)
        ).alias("mean_token_len"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features: stopword ratio, alpha ratio, length.

    Mirrors standard LLM-corpus quality filters (length / stopword /
    symbol ratios); all ratios are exact-integer divisions.
    """
    t = F.col(text_col)
    toks = tokens(text_col)
    with_toks = df.select(F.col(id_col), t.alias("__text__"), toks.alias("__toks__"))
    stop_cnt = _count_in("__toks__", STOPWORDS)
    n_tok = F.size("__toks__")
    n_chars = F.length("__text__")
    alpha_chars = F.length(F.regexp_replace("__text__", r"[^A-Za-z]", ""))
    return with_toks.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        stop_cnt.alias("n_stopwords"),
        (stop_cnt.cast("double") / n_tok).alias("stopword_ratio"),
        (alpha_chars.cast("double") / n_chars).alias("alpha_ratio"),
        ((n_tok >= 5) & (stop_cnt > 0)).cast("int").alias("passes_quality"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """N-gram/marker-word language heuristic: per-language marker hit
    counts, argmax with a fixed priority tie-break (en>es>de>fr, then
    'und' = undetermined when no marker hits)."""
    toks = tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("__toks__"))
    scored = base.select(
        F.col(id_col),
        *[
            _count_in("__toks__", words).alias(f"score_{lang}")
            for lang, words in LANG_MARKERS.items()
        ],
    )
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties → apply last
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.select(
        id_col, *[f"score_{lang}" for lang in langs], pred.alias("pred_lang")
    )


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Every per-document text feature — token stats, quality ratios,
    language-ID — in ONE map-only select over ONE scan (the separate
    ``token_stats``/``quality_score``/``lang_id`` helpers each re-scan
    the corpus; at 100 TB you want the fused single pass)."""
    t = F.col(text_col)
    base = df.select(
        F.col(id_col), t.alias("__text__"), tokens(text_col).alias("__toks__")
    )
    n_tok = F.size("__toks__")
    stop_cnt = _count_in("__toks__", STOPWORDS)
    n_chars = F.length("__text__")
    alpha_chars = F.length(F.regexp_replace("__text__", r"[^A-Za-z]", ""))
    mean_len = (
        F.aggregate(
            F.col("__toks__"), F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).cast("double")
        / n_tok
    )
    langs = list(LANG_MARKERS)
    scores = {
        lang: _count_in("__toks__", words) for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties → apply last
        pred = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return base.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct(F.col("__toks__"))).alias("n_distinct_tokens"),
        mean_len.alias("mean_token_len"),
        n_chars.alias("n_chars"),
        stop_cnt.alias("n_stopwords"),
        (stop_cnt.cast("double") / n_tok).alias("stopword_ratio"),
        (alpha_chars.cast("double") / n_chars).alias("alpha_ratio"),
        ((n_tok >= 5) & (stop_cnt > 0)).cast("int").alias("passes_quality"),
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
        pred.alias("pred_lang"),
    )


def repetition_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-token
    fraction and the share of the most frequent bigram — the standard
    boilerplate/spam filters of an LLM-corpus pipeline.

    Map-only (zero shuffle): the top-bigram count is computed WITHOUT
    exploding — sort the doc's bigram array, then the longest equal-run
    via change-point positions (``F.get`` is 0-based and null-safe, so
    the expression stays ANSI-clean).  O(n log n) per document, bounded
    by doc length — the shape that survives 100 TB, unlike a global
    explode + groupBy(doc, bigram) shuffle of every token.

    All ratios are exact integer divisions evaluated identically in the
    DuckDB oracle (guarded to NULL when a doc has < 2 tokens; note
    Spark's ``sequence(1, 0)`` yields ``[1, 0]`` — descending — rather
    than an empty array, hence the explicit ``when`` guards).
    """
    toks = tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("__toks__"))
    nt = F.size("__toks__")
    ndist = F.size(F.array_distinct("__toks__"))
    bigrams = F.transform(
        F.sequence(F.lit(1), nt - 1),
        lambda i: F.concat_ws(
            " ", F.get(F.col("__toks__"), i - 1), F.get(F.col("__toks__"), i)
        ),
    )
    s = F.array_sort(F.when(nt >= 2, bigrams).otherwise(F.array().cast("array<string>")))
    staged = base.select(F.col(id_col), nt.alias("__nt__"), ndist.alias("__nd__"), s.alias("__s__"))
    nb = F.size("__s__")
    # Change-point positions (1-based) in the sorted bigram list; the
    # longest run is the max gap between consecutive change points.
    bnd = F.filter(
        F.sequence(F.lit(1), nb),
        lambda i: (i == 1)
        | ~F.get(F.col("__s__"), i - 1).eqNullSafe(F.get(F.col("__s__"), i - 2)),
    )
    staged = staged.select(
        F.col(id_col), "__nt__", "__nd__", nb.alias("__nb__"),
        F.when(nb > 0, bnd).otherwise(F.array().cast("array<int>")).alias("__bnd__"),
    )
    best = F.array_max(
        F.transform(
            F.sequence(F.lit(1), F.size("__bnd__")),
            lambda k: F.coalesce(F.get(F.col("__bnd__"), k), F.col("__nb__") + 1)
            - F.get(F.col("__bnd__"), k - 1),
        )
    )
    top_cnt = F.when(F.col("__nb__") > 0, best)
    return staged.select(
        F.col(id_col),
        F.col("__nt__").alias("n_tokens"),
        ((F.col("__nt__") - F.col("__nd__")).cast("double") / F.col("__nt__")).alias(
            "frac_dup_tokens"
        ),
        F.col("__nb__").alias("n_bigrams"),
        top_cnt.alias("top_bigram_count"),
        (top_cnt.cast("double") / F.col("__nb__")).alias("top_bigram_frac"),
    )


def fingerprint(
    token_ids: DataFrame,
    id_col: str = "doc_id",
    pos_col: str = "pos",
    tok_id_col: str = "tok_id",
    mod: int = 2_147_483_647,
    mult: int = 31,
) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint over integer
    token ids: ``h = (h*mult + tok_id) % mod`` in position order.

    Input is (doc, pos, tok_id) rows; output (doc, fingerprint).  The
    groupBy collects one document's tokens — bounded state per doc, one
    shuffle on the doc id.  At 100 TB keep documents < a few MB or
    pre-chunk; the hash composes over chunks if needed.
    """
    ordered = token_ids.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct(pos_col, tok_id_col))).alias("__seq__")
    )
    rolled = F.aggregate(
        F.transform("__seq__", lambda s: s[tok_id_col]),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * mult + x) % F.lit(mod),
    )
    return ordered.select(F.col(id_col), rolled.alias("fingerprint"))


# Conservative, engine-portable detectors.  Patterns avoid lookarounds
# and backreferences so the same strings work under Java regex (Spark)
# and RE2 (DuckDB) if ever promoted to an oracle query.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


def pii_profile(
    df: DataFrame, id_col: str, text_col: str, redact: bool = True
) -> DataFrame:
    """Per-document PII scan: match counts per category and (optionally)
    a redacted text with each match replaced by ``<CATEGORY>``.

    Map-only (regexp_count / regexp_replace are JVM-side codegen — no
    Python in the path), so the scan rides along with any other per-doc
    pass for free.  The test fixture corpus carries no PII, so this op
    is test-covered rather than oracle-declared; the patterns are the
    point where a production deny-list would plug in.
    """
    cols = [F.col(id_col)]
    for name, pat in PII_PATTERNS.items():
        cols.append(F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}"))
    if redact:
        red = F.col(text_col)
        for name, pat in PII_PATTERNS.items():
            red = F.regexp_replace(red, pat, f"<{name.upper()}>")
        cols.append(red.alias("redacted_text"))
    out = df.select(*cols)
    n_total = sum(F.col(f"n_{name}") for name in PII_PATTERNS)
    return out.withColumn("n_pii_total", n_total.cast("long"))


def hashed_linear_score(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """Model-as-data document scoring: the hashed-bag-of-words linear
    classifier (the fastText-style quality-filter shape production
    pipelines apply after heuristic gates).  ``weights`` is a DataFrame
    (bucket long, w_micros long) — a TRAINED model shipped as a table,
    broadcast-joined against the exploded token stream; swapping models
    means swapping tables, no code change.

    Weights are integer micro-units and the per-document accumulation is
    an integer SUM — associative, so the score is bit-identical under
    any partitioning (the fixed-point convention; a double-weight sum
    would depend on merge order).  Output: (id, n_scored_tokens,
    score_micros, score).

    Scale shape: explode → hash-bucket (map-only) → broadcast join on
    bucket (weights are KB-sized) → one count/sum shuffle on the doc id.
    Documents with no tokens score NULL (left join keeps them)."""
    from mbai_gdb_spark.ops.dedup import char_poly_id

    toks = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("__tok__"))
        # split("") yields one empty-string token; an empty doc scores NULL
        .filter(F.col("__tok__") != "")
        .withColumn("__bkt__", char_poly_id("__tok__") % n_buckets)
    )
    scored = (
        toks.join(F.broadcast(weights), toks["__bkt__"] == weights["bucket"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_scored_tokens"),
            F.sum("w_micros").alias("score_micros"),
        )
    )
    return docs.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_scored_tokens", F.lit(0)).cast("long").alias("n_scored_tokens"),
        F.col("score_micros").cast("long").alias("score_micros"),
        (F.col("score_micros").cast("double") / 1_000_000).alias("score"),
    )


def stub_classifier_weights(spark, n_buckets: int = 4096) -> DataFrame:
    """Deterministic stand-in weight table (bucket, w_micros) in
    [-0.5, 0.5) micro-units — the shape a trained export would ship;
    the LCG is only a placeholder for real learned values."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (((F.col("id") * 2654435761 + 97) % 1_000_001) - 500_000)
        .cast("long")
        .alias("w_micros"),
    )


def search_topk_invdf(
    docs: DataFrame,
    queries_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    k: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Inverted-index keyword search: top-``k`` documents per query by
    summed tf × inverse-df term weights — (query_id, rank, doc_id,
    score).

    Weighting is the integer-rational ``idf = (N * scale) div df``
    rather than the classical ``ln(N/df)``: same monotone
    rare-terms-win ordering, but every score is an exact BIGINT an
    external engine reproduces bit-for-bit (ln() is not guaranteed
    correctly rounded across libms, so a float idf could flip
    near-tied ranks between engines).  Swap in a log idf for
    production relevance if cross-engine exactness is not needed.

    Plan shape at scale: postings (term, doc, tf) are one explode +
    hash-groupBy over the corpus — the classic inverted index, built
    once and reusable across query batches.  The query term set is
    tiny and BROADCAST, so scoring touches only postings of queried
    terms (map-side semi-join) and the per-(query, doc) aggregation
    shuffles only those hits.  Document frequencies come from one
    additional groupBy on the postings' term key (reuses the same
    partitioning).  Top-k is a per-query row_number window — the
    number of live queries bounds the window's key count.  Ties break
    by doc_id for a deterministic, hashable ranking.
    """
    from pyspark.sql import Window as W

    postings = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()  # bounded scalar: one number for the idf literal
    qterms = (
        queries_df.select(
            F.col(query_id_col), F.explode(tokens(query_text_col)).alias("term")
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    scores = (
        postings.join(F.broadcast(qterms), "term")
        .join(df_t, "term")
        .withColumn("idf", F.expr(f"CAST({n_docs} AS BIGINT) * {scale} div df"))
        .groupBy(query_id_col, id_col)
        .agg(F.sum(F.col("tf") * F.col("idf")).alias("score"))
    )
    w = W.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, F.col("score").cast("long").alias("score"))
    )


def bm25_topk(
    docs: DataFrame,
    queries_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    k: int = 10,
    idf_scale: int = 1_000_000,
) -> DataFrame:
    """Okapi BM25 ranked retrieval (k1=1.2, b=0.75) over the same
    inverted index as :func:`search_topk_invdf` — (query_id, rank,
    doc_id, score) — in EXACT integer arithmetic so an external engine
    reproduces every score bit-for-bit.

    The float formulation ``idf(t) * tf*(k1+1) / (tf + k1*(1-b +
    b*dl/avgdl))`` becomes, after multiplying through by 10 (k1, b and
    their products are then integral):

    - ``idf_i   = ((2N - 2df + 1) * idf_scale) div (2df + 1)``
      (Robertson's ``ln((N-df+.5)/(df+.5))`` ARGUMENT as a scaled
      rational — no libm in the ranking).  Per-term this preserves
      the log-idf ordering exactly (x > y ⟺ ln x > ln y), but the
      SUM across a multi-term query weights rare terms linearly in
      the ratio where true Okapi BM25 weights them logarithmically —
      so multi-term AGGREGATE rankings can diverge from standard
      BM25 despite the Okapi label: rare terms dominate harder here.
      This is a deliberate trade (bit-exact cross-engine
      reproducibility over fidelity to float BM25); the oracle SQL
      implements the identical rational, so parity is unaffected.  A
      fixed-point integer log (e.g. scaled bit-length + polynomial
      correction) would restore log weighting at the cost of a far
      hairier cross-engine contract;
    - ``norm_d  = (9 * dl * N) div T``  — the per-document length term
      ``10*k1*b*dl/avgdl`` with ``avgdl = T/N``, quantized once per
      document (floor; deterministic in any engine);
    - ``score  += (idf_i * 22 * tf) div (10*tf + 3 + norm_d)`` per
      matched term (``22 = 10*(k1+1)``, ``3 = 10*k1*(1-b)``).

    Plan shape at scale — identical to the tf-idf search: postings are
    one explode + hash-groupBy (built once, reusable), the query term
    set broadcasts so only queried postings are touched, document
    lengths join the (tiny) hit set on doc_id, and top-k is a
    per-query row_number window.  N and T are two bounded driver
    scalars folded into the plan as literals."""
    from pyspark.sql import Window as W

    toks = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    postings = toks.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))
    # r14 (guide §2.4): EVERYTHING downstream derives from the postings
    # subtree so the corpus is tokenized ONCE (the (term, doc) exchange
    # is reused by every branch).  Before: doc_len aggregated the raw
    # token stream (second tokenize pass) and N/T were fetched by a
    # separate eager full-corpus agg job (third pass).  dl = Σ tf per
    # doc is the identical count; T = Σ tf overall likewise; N is a
    # column-pruned count-star that never touches the text column.
    # N/T ride as a 1-row broadcast frame (the allowlisted 1-row
    # scalar-subquery-broadcast BNLJ shape) instead of driver
    # literals, so no action runs at plan-construction time at all.
    doc_len = postings.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    df_t = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scalars = (
        postings.agg(F.coalesce(F.sum("tf"), F.lit(1)).alias("__T__"))
        .crossJoin(F.broadcast(docs.agg(F.count(F.lit(1)).alias("__N__"))))
    )
    qterms = (
        queries_df.select(
            F.col(query_id_col), F.explode(tokens(query_text_col)).alias("term")
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    hits = (
        postings.join(F.broadcast(qterms), "term")
        .join(df_t, "term")
        .join(doc_len, id_col)
        .crossJoin(F.broadcast(scalars))
    )
    return _bm25_score_rank(hits, None, None, idf_scale, query_id_col, id_col, k)




def _bm25_score_rank(
    hits: DataFrame,
    n_docs: int | None,
    total_toks: int | None,
    idf_scale: int,
    query_id_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """The shared BM25 scoring tail: hits carrying (tf, df, dl) columns
    per (query, doc, term) → exact-integer contributions → per-(query,
    doc) sum → deterministic top-k.  Used by both the in-memory
    :func:`bm25_topk` and the persisted-index probe, so the two paths
    cannot drift.

    ``n_docs``/``total_toks`` may be ints (persisted probes: bounded
    `_meta` scalars) or None, in which case ``hits`` carries them as
    ``__N__``/``__T__`` columns from a 1-row broadcast frame — the r14
    in-memory path, which derives them from the postings subtree
    instead of paying a separate full-corpus tokenize job (guide §2.4:
    same exchange, reused).  The integer algebra is identical either
    way."""
    from pyspark.sql import Window as W

    n_expr = f"CAST({n_docs} AS BIGINT)" if n_docs is not None else "__N__"
    t_expr = str(total_toks) if total_toks is not None else "__T__"
    scored = (
        hits.withColumn(
            "idf_i",
            F.expr(
                f"(2 * {n_expr} - 2*df + 1) * {idf_scale}"
                " div (2*df + 1)"
            ),
        )
        .withColumn(
            "norm_d",
            F.expr(f"9 * dl * {n_expr} div {t_expr}"),
        )
        .withColumn(
            "contrib",
            F.expr("idf_i * 22 * tf div (10*tf + 3 + norm_d)"),
        )
    )
    scores = scored.groupBy(query_id_col, id_col).agg(
        F.sum("contrib").alias("score")
    )
    w = W.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col, "rank", id_col, F.col("score").cast("long").alias("score")
        )
    )


def phrase_bm25_topk(
    docs: DataFrame,
    queries_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    k: int = 10,
    idf_scale: int = 1_000_000,
) -> DataFrame:
    """Exact-PHRASE ranked retrieval: documents containing the query as
    a CONSECUTIVE token run, ranked by the same exact-integer Okapi
    BM25 (:func:`bm25_topk`) over the phrase's terms — (query_id, rank,
    doc_id, score), engine-exact.

    Phrase matching needs no positional UDF, only an offset trick over
    positional postings: explode (doc, pos, term), join the broadcast
    (query, qpos, term) phrase tokens, and group by the candidate START
    ``s = pos - qpos`` — a (query, doc, s) group covering ALL m
    distinct qpos values means the tokens at s..s+m-1 spell the phrase
    exactly.  Repeated phrase terms ("batch batch batch") fall out for
    free: each corpus position contributes one s per qpos it could
    anchor, and only true runs cover every offset.

    Plan shape at scale: the position explode is the same single pass
    every postings build does; phrase-candidate work is confined to
    postings of QUERIED terms (broadcast join), the start-aggregation
    keys on (query, doc, s) within those, and the BM25 tail scores only
    phrase-matched documents (broadcast semi-join).  All integer
    arithmetic — positions, offsets, coverage counts, scores — so an
    external engine reproduces every rank bit-for-bit."""
    cleaned = F.filter(tokens(text_col), lambda x: x != F.lit(""))
    tok_pos = docs.select(
        F.col(id_col), F.posexplode(cleaned).alias("pos", "term")
    )
    qcleaned = F.filter(tokens(query_text_col), lambda x: x != F.lit(""))
    qtoks = queries_df.select(
        F.col(query_id_col), F.posexplode(qcleaned).alias("qpos", "term")
    )
    m_per_q = qtoks.groupBy(query_id_col).agg(
        (F.max("qpos") + 1).alias("__m__")
    )
    starts = tok_pos.join(F.broadcast(qtoks), "term").select(
        query_id_col, id_col, (F.col("pos") - F.col("qpos")).alias("s"), "qpos"
    )
    phrase_docs = (
        starts.groupBy(query_id_col, id_col, "s")
        .agg(F.count_distinct("qpos").alias("__c__"))
        .join(F.broadcast(m_per_q), query_id_col)
        .filter(F.col("__c__") == F.col("__m__"))
        .select(query_id_col, id_col)
        .distinct()
    )
    # The standard BM25 pieces (same shapes as bm25_topk), scored only
    # for phrase-matched documents.  r14: doc_len and the N/T scalars
    # derive from the postings subtree (see bm25_topk) — the corpus is
    # position-exploded once for the phrase candidates and once for the
    # postings exchange, instead of four tokenize passes (the separate
    # doc_len aggregation and the eager stats job are gone).
    postings = tok_pos.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))
    doc_len = postings.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    df_t = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scalars = (
        postings.agg(F.coalesce(F.sum("tf"), F.lit(1)).alias("__T__"))
        .crossJoin(F.broadcast(docs.agg(F.count(F.lit(1)).alias("__N__"))))
    )
    qterms = qtoks.select(query_id_col, "term").distinct()
    hits = (
        postings.join(F.broadcast(qterms), "term")
        .join(df_t, "term")
        .join(doc_len, id_col)
        .join(F.broadcast(phrase_docs), [query_id_col, id_col], "leftsemi")
        .crossJoin(F.broadcast(scalars))
    )
    return _bm25_score_rank(
        hits, None, None, idf_scale, query_id_col, id_col, k
    )


def _term_bucket(term_col, n_buckets: int):
    """Deterministic term → bucket id: pmod of the char-polynomial
    rolling hash (the repo's engine-portable token id)."""
    from mbai_gdb_spark.ops.dedup import char_poly_id

    return F.pmod(char_poly_id(term_col), F.lit(n_buckets)).cast("int")


# --- driver-side twins of the query-tokenize expressions (r14) -------------
#
# A probe's QUERY frame is bounded by contract (a handful of literal
# strings), yet computing its term set / bucket list through Spark cost
# two scheduled jobs per probe (distinct + collect over a shuffle).
# For ASCII query text the whitespace tokenizer and the char-polynomial
# hash are reproduced below EXACTLY (Java \s is [ \t\n\x0B\f\r]; trim()
# strips only ' '; char_poly_id is h = (h*31 + codepoint) % (2^31-1) —
# all pure ASCII-safe integer algebra).  Non-ASCII text falls back to
# the Spark expressions, where e.g. Java vs Python whitespace classes
# could diverge.  Guide §7.3: cut sequential driver round-trips on the
# serving path.

_PY_TOKEN_SPLIT = None  # compiled lazily (re import kept out of hot module load)


def _py_tokens(text):
    """Driver twin of ``tokens()`` = split(trim(x), '\\s+'), Java
    semantics, for ASCII input; returns None for NULL text."""
    global _PY_TOKEN_SPLIT
    if text is None:
        return None
    import re

    if _PY_TOKEN_SPLIT is None:
        _PY_TOKEN_SPLIT = re.compile(r"[ \t\n\x0b\f\r]+")
    return [t for t in _PY_TOKEN_SPLIT.split(text.strip(" ")) if t != ""]


def _py_char_poly(token: str, mod: int = 2**31 - 1, mult: int = 31) -> int:
    """Driver twin of ``ops.dedup.char_poly_id`` (ASCII input)."""
    h = 0
    for ch in token:
        h = (h * mult + ord(ch)) % mod
    return h


def _py_query_plan(qrows, qid_key: str, text_key: str):
    """Tokenize collected query rows driver-side.  Returns
    ``{query_id: [tokens...]}`` (queries with NULL text map to []), or
    None when the caller must fall back to the Spark expressions:
    any non-ASCII text (the exact-twin guarantee is only proven for
    ASCII), a NULL query id, or a duplicated query id (advice r14: the
    dict silently collapsed duplicates to the LAST row's tokens where
    the Spark fallback unions terms across duplicates, and None ids
    made the callers' sorted() over (qid, term) raise TypeError —
    both corner cases keep their original Spark-defined semantics by
    falling back)."""
    out = {}
    for r in qrows:
        qid = r[qid_key]
        text = r[text_key]
        if text is not None and any(ord(c) > 127 for c in text):
            return None
        if qid is None or qid in out:
            return None
        out[qid] = _py_tokens(text) or []
    return out


def bm25_index_persist(
    docs: DataFrame,
    path: str,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    positions: bool = False,
) -> None:
    """Write the BM25 inverted index as a parquet layout PARTITIONED BY
    term-hash bucket — the text-search counterpart of the persisted IVF
    layout (ops.similarity.ivf_persist): a probe reads ONLY the bucket
    directories its query terms hash to (partition pruning), so query
    cost is |queried buckets|/n_buckets of the index regardless of
    corpus size.

    Each posting row carries (term, doc_id, tf, dl, bucket); the two
    corpus scalars (N docs, T tokens) land in a ``_meta`` side-car
    (underscore-hidden from the posting scan).  ``df`` is deliberately
    NOT stored: the probe reads every posting of each queried term
    anyway (that is what probing a term means), so df is an exact
    count over rows it already holds — zero extra scan — while STORING
    df is what would force every future :func:`bm25_index_append` to
    rewrite whole buckets to keep it current (measured in
    tools/index_maintenance_experiment.py: the rewrite-based append
    cost tracked the index, not the delta, because broad-vocabulary
    deltas touch every bucket).  Normalizing df out makes the append a
    pure O(delta) insert.  A probe still performs zero corpus-wide
    work: no df join against the corpus, no length join, no count().
    Index build is one explode + two hash aggregations over the
    corpus; rebuilds overwrite atomically per partition dir (parquet
    overwrite semantics).

    ``positions=True`` adds a sorted ``positions`` array (token offsets
    of the term in the doc) to each posting row — the standard
    positional-postings extension, making the SAME layout serve
    exact-phrase retrieval from its buckets
    (:func:`phrase_bm25_probe_persisted`).  Parquet is columnar, so
    non-phrase probes never read the column; the cost is index bytes
    (one int per token instead of per distinct (term, doc)), the trade
    every positional index makes.  The flag rides in ``_meta`` so
    appends reproduce the layout and phrase probes can refuse a
    position-less index loudly."""
    toks = _doc_term_positions(docs, id_col, text_col)
    postings = _postings_from_toks(toks, id_col, positions)
    doc_len = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.size(F.filter(tokens(text_col), lambda x: x != F.lit("")))
        ).alias("t"),
    ).first()
    # TRUE total, no floor: a token-less corpus stores total_toks=0 —
    # safe (norm_d only evaluates on hit rows, and a token-less index
    # has no postings to hit) and REQUIRED for append exactness (the
    # running sum in _meta must start from the truth, or every later
    # merge is off by the floor).
    n_docs, total_toks = stats["n"], stats["t"] or 0
    rows = postings.join(doc_len, id_col).withColumn(
        "bucket", _term_bucket(F.col("term"), n_buckets)
    )
    from mbai_gdb_spark.io import write_partitioned

    # sort_cols engages write_partitioned's repartition path: ONE file
    # per bucket directory (and term-clustered row groups for the
    # probe's term scans).  Without it every input partition sprays a
    # file into every bucket it touches — measured as a probe wall that
    # tracked FILE COUNT in tools/lsh_maintenance_experiment.py (the
    # same layout shape; fixed across all three persisted families).
    write_partitioned(rows, path, ["bucket"], sort_cols=["term", id_col])
    spark = docs.sparkSession
    _write_bm25_meta(
        spark,
        path,
        n_docs=int(n_docs),
        total_toks=int(total_toks),
        n_buckets=int(n_buckets),
        last_tag=None,
        id_type=docs.schema[id_col].dataType.simpleString(),
        has_positions=bool(positions),
    )


def _doc_term_positions(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, term) rows over the non-empty token stream — the one
    corpus pass every index build/append/delete derives from.  ``pos``
    indexes the CLEANED stream (empty tokens dropped first), matching
    :func:`phrase_bm25_topk`'s convention exactly."""
    cleaned = F.filter(tokens(text_col), lambda x: x != F.lit(""))
    return docs.select(F.col(id_col), F.posexplode(cleaned).alias("pos", "term"))


def _postings_from_toks(toks: DataFrame, id_col: str, positions: bool) -> DataFrame:
    """(term, id, tf[, positions]) from the (id, pos, term) stream; the
    positions array is sorted so layouts are deterministic (append ≡
    rebuild compares bit-exact)."""
    aggs = [F.count(F.lit(1)).alias("tf")]
    if positions:
        aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    return toks.groupBy("term", id_col).agg(*aggs)


def _write_bm25_meta(spark, path: str, **kw) -> None:
    """The one writer of the ``_meta`` side-car, so every mutation
    (build, append, delete) carries the full column set: corpus scalars,
    layout parameters (n_buckets, has_positions), the replay tag, and
    the id column's Spark DDL type (so an empty probe can synthesize
    the exact result schema — a layout with zero posting rows has no
    file to infer it from)."""
    meta = spark.createDataFrame(
        [
            (
                int(kw["n_docs"]),
                int(kw["total_toks"]),
                int(kw["n_buckets"]),
                kw.get("last_tag"),
                kw.get("id_type"),
                bool(kw.get("has_positions", False)),
            )
        ],
        "n_docs long, total_toks long, n_buckets int, last_tag string,"
        " id_type string, has_positions boolean",
    )
    meta.coalesce(1).write.mode("overwrite").parquet(path + "/_meta")


def _meta_field(meta, name: str, default=None):
    """Read an optional ``_meta`` column with a legacy-tolerant default
    (indexes persisted before the column existed lack it).  Accepts
    both a Spark Row and the plain dict ``io.read_sidecar_row``
    returns (r14: probes read `_meta` driver-side, no Spark job)."""
    if isinstance(meta, dict):
        return meta.get(name, default)
    return meta[name] if name in meta.__fields__ else default


def _empty_probe_result(spark, meta, queries_df, query_id_col, id_col):
    """The typed empty result every probe of a posting-less index
    returns: the id column's type comes from the ``id_type`` DDL stored
    in `_meta` at build time (falling back to bigint for legacy
    indexes), NOT a hard-coded guess — so schema-sensitive callers
    (unions, checkpointed sinks) see one schema whether the probe hit
    postings or not."""
    qid_ddl = queries_df.schema[query_id_col].dataType.simpleString()
    id_ddl = _meta_field(meta, "id_type") or "bigint"
    return spark.createDataFrame(
        [],
        f"`{query_id_col}` {qid_ddl}, rank int, `{id_col}` {id_ddl}, score long",
    )


def bm25_index_append(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    tag: str | None = None,
) -> None:
    """Incrementally merge NEW documents into a persisted
    :func:`bm25_index_persist` layout — the text-search counterpart of
    the incremental LSH twin (ops.dedup.lsh_append): corpus growth no
    longer forces a full index rebuild.

    Exactness contract: after the append, a :func:`bm25_probe_persisted`
    returns results BIT-IDENTICAL to a from-scratch build over the
    union corpus (property-tested append ≡ rebuild).  That holds
    because the layout stores NO derived corpus statistics in the
    posting rows: ``tf``/``dl`` are per-(doc, term) facts that ride in
    with the delta, ``df`` is recomputed exactly by the probe from the
    postings it reads anyway, and the two corpus scalars are plain
    sums in ``_meta``.  The merge is therefore a PURE INSERT —
    O(delta), like ``ops.similarity.ivfpq_append`` — with no bucket
    rewrite at all.  (The first design denormalized df into the rows;
    tools/index_maintenance_experiment.py showed that made append cost
    track the INDEX, since broad-vocabulary deltas touch every bucket
    and each touched bucket had to be rewritten to refresh df.)

    Appended ``doc_id``s must be NEW (append, not upsert).  The guard
    is complete for re-added documents: every term of a duplicated doc
    is in the delta, so all of its existing postings live in touched
    buckets, where the overlap check runs.  (A doc re-added with a
    completely disjoint token set evades the guard — that is an
    update, use a rebuild.)

    ``tag`` (optional) makes the merge REPLAY-IDEMPOTENT for exactly-
    once pipelines: the tag is stored inside ``_meta`` atomically with
    the corpus scalars, and a call whose tag equals the stored one
    returns without merging — covering even token-less deltas, where
    the duplicate guard has no postings to collide on.  The streaming
    applier passes its micro-batch id here.

    Plan shape at scale: one explode + two hash aggregations over the
    DELTA only; the duplicate guard scans only the buckets the delta's
    terms hash to; the insert adds new files inside those partition
    directories and NO existing file is ever rewritten (tested on
    sizes+mtimes).  Crash-evidence: ``_meta`` is removed before the
    insert and rewritten after, so a failure anywhere inside leaves an
    index that completeness checks (meta presence) correctly refuse
    instead of serving new postings under stale corpus scalars.  The
    accumulated small-files debt is paid down by
    ``io.compact_partitioned`` (the off-peak segment-merge tick)."""
    import os
    import shutil

    from mbai_gdb_spark.io import check_serving_safe

    # Appends must not merge into a layout holding crashed-maintenance
    # evidence (compaction residue / in-flight delete): the dup guard
    # would read a layout with a partition dir missing or half-filtered,
    # and the merge would compound damage the probes correctly refuse.
    # A full rebuild (mode overwrite) is the documented recovery.
    check_serving_safe(path)
    spark = docs.sparkSession
    meta = spark.read.parquet(path + "/_meta").first()
    # Replay idempotence: a caller-supplied tag rides INSIDE _meta, so
    # its check-and-update commits atomically with the corpus scalars
    # (one side-car write).  This closes the one window the
    # duplicate-doc_id guard cannot see — a replayed delta whose docs
    # all tokenize to nothing would otherwise double-count n_docs with
    # no postings to collide on.
    last_tag = _meta_field(meta, "last_tag")
    if tag is not None and last_tag == tag:
        return  # this exact merge is already reflected in _meta
    n_buckets = int(meta["n_buckets"])
    # Layout parameters come from _meta, the source of truth: the delta
    # must reproduce the persisted schema (positional layouts get
    # positional delta rows), and the rewritten _meta must preserve the
    # id type the empty-probe path synthesizes schemas from.
    has_positions = bool(_meta_field(meta, "has_positions", False))
    id_type = _meta_field(meta, "id_type")
    toks = _doc_term_positions(docs, id_col, text_col)
    delta_post = _postings_from_toks(toks, id_col, has_positions)
    delta_dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.size(F.filter(tokens(text_col), lambda x: x != F.lit("")))
        ).alias("t"),
    ).first()
    d_docs, d_toks = int(stats["n"] or 0), int(stats["t"] or 0)
    if d_docs == 0:
        return  # empty delta: nothing to merge, meta unchanged

    value_cols = ["term", id_col, "tf"] + (
        ["positions"] if has_positions else []
    )
    delta_rows = (
        delta_post.join(delta_dl, id_col)
        .withColumn("bucket", _term_bucket(F.col("term"), n_buckets))
        .select(*value_cols, "dl", "bucket")
    )
    # Bounded driver scalar (≤ n_buckets, itself small) — the same
    # folded-into-the-scan shape the probe uses.
    touched = sorted(
        {r["bucket"] for r in delta_rows.select("bucket").distinct().collect()}
    )
    if touched:
        # A just-built index over a token-less corpus holds _meta but
        # zero bucket dirs — read.parquet would fail to infer a schema,
        # and there is nothing to guard against.
        has_data = any(n.startswith("bucket=") for n in os.listdir(path))
        if has_data:
            existing_ids = (
                spark.read.parquet(path)
                .filter(F.col("bucket").isin(touched))
                .select(id_col)
            )
            dup = existing_ids.join(
                delta_dl.select(id_col), id_col, "leftsemi"
            ).limit(1)
            if dup.count() > 0:
                raise ValueError(
                    "bm25_index_append: delta contains doc_ids already in "
                    "the index — append is insert-only; rebuild for updates"
                )
        # Crash-evidence protocol: remove _meta BEFORE the insert and
        # rewrite it after — a failure anywhere inside leaves an index
        # WITHOUT _meta, which every caller's completeness convention
        # (meta presence marks a complete index) correctly reports as
        # incomplete instead of serving partially inserted postings
        # under stale corpus scalars.  The dup-guard read above is
        # fully materialized (count) before any write starts.
        shutil.rmtree(os.path.join(path, "_meta"), ignore_errors=True)
        # One new file per touched bucket per merge (not |input
        # partitions| x |touched| fragments); compaction still owns the
        # one-file-per-append debt.
        (
            delta_rows.repartition(max(len(touched), 1), F.col("bucket"))
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(path)
        )
    else:
        # Meta-only merge (token-less delta): same crash-evidence — no
        # window where old meta survives alongside any partial state.
        shutil.rmtree(os.path.join(path, "_meta"), ignore_errors=True)
    # _meta written last: its presence marks a complete merge (see the
    # crash-evidence note above).
    _write_bm25_meta(
        spark,
        path,
        n_docs=int(meta["n_docs"]) + d_docs,
        total_toks=int(meta["total_toks"]) + d_toks,
        n_buckets=n_buckets,
        last_tag=tag,
        id_type=id_type,
        has_positions=has_positions,
    )


def bm25_index_delete(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    tag: str | None = None,
) -> None:
    """Physically DELETE documents from a persisted
    :func:`bm25_index_persist` layout — the path an LLM-data pipeline
    needs routinely (dedup verdicts, takedowns) and the missing half of
    the update story: update = delete + re-append, which also closes
    the disjoint-token re-add hole the append docstring documents.

    Delete-by-DOCUMENT, not by id: the caller passes the exact indexed
    (id, text) rows.  That is what makes the operation O(touched
    buckets) instead of O(index) — the doc's terms name exactly the
    bucket directories its postings live in, so identification needs no
    index scan — and it is verifiable: within those buckets the stored
    postings of the deleted ids must equal the recomputed delta
    postings (term-for-term, tf-for-tf) and each stored ``dl`` must
    equal the recomputed length.  Since every doc's stored tf sums to
    its stored dl across ALL buckets, a full match proves no posting of
    a deleted doc survives outside the touched set — the delete is
    EXACT, and a wrong-text delete raises instead of corrupting.
    Token-less documents are rejected (they have no postings to verify
    against; remove them with a rebuild).

    Exactness contract (property-tested over random delete sets): after
    the delete, :func:`bm25_probe_persisted` is bit-identical to a
    from-scratch build over the corpus WITHOUT the deleted docs — the
    touched buckets are rewritten filtered, ``_meta``'s scalars
    decrement by the delta's exact contributions, and df self-corrects
    because the probe recounts it from the surviving postings.

    Crash story: same protocol as the append (``_meta`` removed before
    any mutation, rewritten last) plus a ``_delete_inflight`` sentinel
    across the partition-directory swaps — a crash anywhere leaves an
    index every probe loudly refuses, and under a generation-managed
    root (:mod:`mbai_gdb_spark.indexgen`) the crashed generation is
    simply never published.  ``tag`` gives replay idempotence exactly
    as in :func:`bm25_index_append`."""
    import os
    import shutil

    from mbai_gdb_spark.io import DELETE_SENTINEL, check_serving_safe

    check_serving_safe(path)
    spark = docs.sparkSession
    meta = spark.read.parquet(path + "/_meta").first()
    last_tag = _meta_field(meta, "last_tag")
    if tag is not None and last_tag == tag:
        return  # replay: this exact delete is already reflected
    n_buckets = int(meta["n_buckets"])
    toks = _doc_term_positions(docs, id_col, text_col)
    del_post = toks.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))
    del_dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(id_col)).alias("nd"),
    ).first()
    d_docs = int(stats["n"] or 0)
    if d_docs == 0:
        return  # empty delta: nothing to delete, meta unchanged
    if int(stats["nd"]) != d_docs:
        raise ValueError(
            "bm25_index_delete: delta contains duplicate doc_ids — each "
            "deleted document must appear exactly once"
        )
    # Bounded driver scalars: the delta's token total (for _meta) and
    # its touched buckets (≤ n_buckets, the same folded-filter shape
    # append and probe use).
    agg = toks.agg(
        F.count(F.lit(1)).alias("t"),
        F.count_distinct(F.col(id_col)).alias("docs_with_toks"),
    ).first()
    d_toks = int(agg["t"] or 0)
    if int(agg["docs_with_toks"] or 0) != d_docs:
        raise ValueError(
            "bm25_index_delete: delta contains token-less documents, "
            "which have no postings to verify the delete against — "
            "remove token-less docs with a rebuild"
        )
    touched = sorted(
        {
            r["b"]
            for r in del_post.select(
                _term_bucket(F.col("term"), n_buckets).alias("b")
            )
            .distinct()
            .collect()
        }
    )
    has_data = any(n.startswith("bucket=") for n in os.listdir(path))
    if not has_data:
        raise ValueError(
            "bm25_index_delete: index holds no postings — the delta's "
            "documents are not in it"
        )
    # Verify stored-vs-recomputed EXACTLY (see the docstring's argument
    # for why touched buckets suffice): any missing/extra posting, tf
    # mismatch, or dl mismatch means the caller's text is not the
    # indexed text — refuse rather than corrupt.
    stored = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(touched))
        .join(F.broadcast(del_dl.select(id_col)), id_col, "leftsemi")
        .select(
            "term",
            id_col,
            F.col("tf").alias("__stf__"),
            F.col("dl").alias("__sdl__"),
        )
    )
    delta_cmp = del_post.join(del_dl, id_col).select(
        "term", id_col, F.col("tf").alias("__dtf__"), F.col("dl").alias("__ddl__")
    )
    mismatch = (
        stored.join(delta_cmp, ["term", id_col], "full_outer")
        .filter(
            F.col("__stf__").isNull()
            | F.col("__dtf__").isNull()
            | (F.col("__stf__") != F.col("__dtf__"))
            | (F.col("__sdl__") != F.col("__ddl__"))
        )
        .limit(1)
    )
    if mismatch.count() > 0:
        raise ValueError(
            "bm25_index_delete: delta does not match the indexed "
            "documents exactly (posting/tf/dl mismatch) — delete-by-"
            "document requires the EXACT indexed (id, text) rows; a "
            "doc absent from the index, or passed with different text, "
            "refuses loudly instead of corrupting the layout"
        )
    # Materialize the filtered survivors BEFORE mutating anything.
    staging = os.path.join(path, "_delete_staging")
    keep = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(touched))
        .join(F.broadcast(del_dl.select(id_col)), id_col, "left_anti")
    )
    (
        keep.repartition(max(len(touched), 1), F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(staging)
    )
    # Crash-evidence: _meta out first, sentinel across the swaps, _meta
    # (with decremented scalars) back last.
    shutil.rmtree(os.path.join(path, "_meta"), ignore_errors=True)
    sentinel = os.path.join(path, DELETE_SENTINEL)
    with open(sentinel, "w"):
        pass
    for b in touched:
        src = os.path.join(staging, f"bucket={b}")
        dst = os.path.join(path, f"bucket={b}")
        aside = os.path.join(path, f"_compact_old_bucket={b}")
        shutil.rmtree(aside, ignore_errors=True)
        if os.path.isdir(dst):
            os.replace(dst, aside)  # atomic: old bytes preserved, hidden
        if os.path.isdir(src):
            os.replace(src, dst)  # atomic: filtered replacement in
        # A bucket whose every posting belonged to deleted docs has no
        # staged dir: the directory simply goes away.
        shutil.rmtree(aside, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    os.remove(sentinel)
    _write_bm25_meta(
        spark,
        path,
        n_docs=int(meta["n_docs"]) - d_docs,
        total_toks=int(meta["total_toks"]) - d_toks,
        n_buckets=n_buckets,
        last_tag=tag,
        id_type=_meta_field(meta, "id_type"),
        has_positions=bool(_meta_field(meta, "has_positions", False)),
    )


def bm25_index_update(
    old_docs: DataFrame,
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    tag: str | None = None,
) -> None:
    """FUSED in-place update of documents in a persisted
    :func:`bm25_index_persist` layout: semantically delete(old) +
    append(new), but executed as ONE mutation — each touched bucket
    directory is rewritten exactly once with (survivors ∪ new
    postings), and ``_meta`` commits once.  Under a generation-managed
    root (:func:`mbai_gdb_spark.indexgen.bm25_gen_update`) that means
    ONE published generation per update instead of the two (and two
    bucket rewrites) the composed path pays — the round-10 verdict's
    "no fused update" gap.

    Contract: ``old_docs`` are the EXACT indexed (id, text) rows of the
    documents being updated (verified stored-vs-recomputed before any
    mutation, same proof as :func:`bm25_index_delete` — so a wrong-text
    update refuses instead of corrupting), and ``new_docs`` carries the
    SAME id set with the replacement text (update, not upsert — id-set
    equality is enforced; use append/delete for membership changes).  A
    new text may be token-less: the document keeps its n_docs slot and
    simply has no postings, exactly as a fresh build would store it.

    Exactness contract (property-tested over random update sets):
    probes after the update are bit-identical to a from-scratch build
    over the corpus with the new texts, and to delete(old)+append(new).

    Scale shape: touched = buckets(old terms) ∪ buckets(new terms) —
    identification and verification scan only those directories; the
    rewrite stages survivors+new once and swaps each directory once.
    Crash story and ``tag`` replay idempotence exactly as in the delete.
    """
    import os
    import shutil

    from mbai_gdb_spark.io import DELETE_SENTINEL, check_serving_safe

    check_serving_safe(path)
    spark = old_docs.sparkSession
    meta = spark.read.parquet(path + "/_meta").first()
    if tag is not None and _meta_field(meta, "last_tag") == tag:
        return  # replay: this exact update is already reflected
    n_buckets = int(meta["n_buckets"])
    has_positions = bool(_meta_field(meta, "has_positions", False))
    id_type = _meta_field(meta, "id_type")

    # --- old side: the delete's validation + exact verification ---
    o_toks = _doc_term_positions(old_docs, id_col, text_col)
    o_post = o_toks.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))
    o_dl = o_toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    o_stats = old_docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(id_col)).alias("nd"),
    ).first()
    u_docs = int(o_stats["n"] or 0)
    if u_docs == 0:
        return  # empty update set: nothing to do, meta unchanged
    if int(o_stats["nd"]) != u_docs:
        raise ValueError(
            "bm25_index_update: old_docs contains duplicate doc_ids — "
            "each updated document must appear exactly once"
        )
    o_agg = o_toks.agg(
        F.count(F.lit(1)).alias("t"),
        F.count_distinct(F.col(id_col)).alias("docs_with_toks"),
    ).first()
    old_toks = int(o_agg["t"] or 0)
    if int(o_agg["docs_with_toks"] or 0) != u_docs:
        raise ValueError(
            "bm25_index_update: old_docs contains token-less documents, "
            "which have no postings to verify the update against — "
            "replace token-less docs with a rebuild"
        )

    # --- new side: the append's delta shaping ---
    n_toks = _doc_term_positions(new_docs, id_col, text_col)
    n_post = _postings_from_toks(n_toks, id_col, has_positions)
    n_dl = n_toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    n_stats = new_docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(id_col)).alias("nd"),
        F.sum(
            F.size(F.filter(tokens(text_col), lambda x: x != F.lit("")))
        ).alias("t"),
    ).first()
    if int(n_stats["nd"] or 0) != int(n_stats["n"] or 0):
        raise ValueError(
            "bm25_index_update: new_docs contains duplicate doc_ids"
        )
    new_toks = int(n_stats["t"] or 0)
    id_mismatch = (
        old_docs.select(F.col(id_col).alias("__o__"))
        .join(
            new_docs.select(F.col(id_col).alias("__n__")),
            F.col("__o__") == F.col("__n__"),
            "full_outer",
        )
        .filter(F.col("__o__").isNull() | F.col("__n__").isNull())
        .limit(1)
    )
    if id_mismatch.count() > 0:
        raise ValueError(
            "bm25_index_update: old_docs and new_docs must carry the "
            "SAME id set (update, not upsert) — use bm25_index_append / "
            "bm25_index_delete for membership changes"
        )

    # --- touched buckets: old terms ∪ new terms ---
    value_cols = ["term", id_col, "tf"] + (
        ["positions"] if has_positions else []
    )
    new_rows = (
        n_post.join(n_dl, id_col)
        .withColumn("bucket", _term_bucket(F.col("term"), n_buckets))
        .select(*value_cols, "dl", "bucket")
    )
    touched = sorted(
        {
            r["b"]
            for r in o_post.select(
                _term_bucket(F.col("term"), n_buckets).alias("b")
            )
            .unionAll(new_rows.select(F.col("bucket").alias("b")))
            .distinct()
            .collect()
        }
    )
    has_data = any(n.startswith("bucket=") for n in os.listdir(path))
    if not has_data:
        raise ValueError(
            "bm25_index_update: index holds no postings — the update's "
            "documents are not in it"
        )
    # Stored-vs-recomputed exactness for the OLD side (the delete's
    # proof: full tf/dl match within touched buckets + the per-doc
    # "tf sums to dl" invariant ⇒ no posting survives outside).
    stored = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(touched))
        .join(F.broadcast(o_dl.select(id_col)), id_col, "leftsemi")
        .select(
            "term",
            id_col,
            F.col("tf").alias("__stf__"),
            F.col("dl").alias("__sdl__"),
        )
    )
    delta_cmp = o_post.join(o_dl, id_col).select(
        "term", id_col, F.col("tf").alias("__dtf__"), F.col("dl").alias("__ddl__")
    )
    mismatch = (
        stored.join(delta_cmp, ["term", id_col], "full_outer")
        .filter(
            F.col("__stf__").isNull()
            | F.col("__dtf__").isNull()
            | (F.col("__stf__") != F.col("__dtf__"))
            | (F.col("__sdl__") != F.col("__ddl__"))
        )
        .limit(1)
    )
    if mismatch.count() > 0:
        raise ValueError(
            "bm25_index_update: old_docs does not match the indexed "
            "documents exactly (posting/tf/dl mismatch) — the update "
            "requires the EXACT indexed (id, text) rows as old_docs; "
            "refusing loudly instead of corrupting the layout"
        )
    # --- stage (survivors ∪ new postings) once, swap each dir once ---
    staging = os.path.join(path, "_delete_staging")
    survivors = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(touched))
        .join(F.broadcast(o_dl.select(id_col)), id_col, "left_anti")
        .select(*value_cols, "dl", "bucket")
    )
    (
        survivors.unionAll(new_rows)
        .repartition(max(len(touched), 1), F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(staging)
    )
    shutil.rmtree(os.path.join(path, "_meta"), ignore_errors=True)
    sentinel = os.path.join(path, DELETE_SENTINEL)
    with open(sentinel, "w"):
        pass
    for b in touched:
        src = os.path.join(staging, f"bucket={b}")
        dst = os.path.join(path, f"bucket={b}")
        aside = os.path.join(path, f"_compact_old_bucket={b}")
        shutil.rmtree(aside, ignore_errors=True)
        if os.path.isdir(dst):
            os.replace(dst, aside)  # atomic: old bytes preserved, hidden
        if os.path.isdir(src):
            os.replace(src, dst)  # atomic: rewritten replacement in
        shutil.rmtree(aside, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    os.remove(sentinel)
    _write_bm25_meta(
        spark,
        path,
        n_docs=int(meta["n_docs"]),  # membership unchanged by contract
        total_toks=int(meta["total_toks"]) + new_toks - old_toks,
        n_buckets=n_buckets,
        last_tag=tag,
        id_type=id_type,
        has_positions=has_positions,
    )


def bm25_probe_persisted(
    spark,
    path: str,
    queries_df: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    id_col: str = "doc_id",
    idf_scale: int = 1_000_000,
) -> DataFrame:
    """BM25 top-k against a persisted :func:`bm25_index_persist` layout
    — bit-identical to :func:`bm25_topk` over the same corpus (shared
    scoring tail), but touching only the bucket directories the query
    terms hash to.  The bucket id list is a bounded driver scalar
    (≤ distinct query terms) folded into the scan as a partition
    filter, so unprobed buckets are NEVER read — physically proven by
    the delete-unprobed-dirs test, the same standard the persisted IVF
    index meets.  An index over a token-less corpus (complete `_meta`,
    zero bucket dirs) probes to the empty result — typed from the
    ``id_type`` recorded in `_meta` (there is no posting file to infer
    it from), so the empty and non-empty paths return the same schema."""
    import os

    from mbai_gdb_spark.io import check_serving_safe, read_sidecar_row

    check_serving_safe(path)
    meta = read_sidecar_row(path + "/_meta")  # r14: no Spark job
    if not any(n.startswith("bucket=") for n in os.listdir(path)):
        return _empty_probe_result(
            spark, meta, queries_df, query_id_col, id_col
        )
    # r14 (guide §7.3): the query frame is bounded, so its term set and
    # bucket list are computed DRIVER-SIDE for ASCII queries — one
    # local-relation collect instead of a distinct+collect shuffle job,
    # and the qterms join side becomes a local frame.  Non-ASCII query
    # text keeps the original Spark expressions (exact-twin guarantee
    # only proven for ASCII).
    qrows = queries_df.select(query_id_col, query_text_col).collect()
    plan = _py_query_plan(qrows, query_id_col, query_text_col)
    if plan is not None:
        pairs = sorted({(qid, t) for qid, toks in plan.items() for t in toks})
        buckets = sorted(
            {_py_char_poly(t) % meta["n_buckets"] for _, t in pairs}
        )
        qid_t = queries_df.schema[query_id_col].dataType
        qterms = spark.createDataFrame(
            pairs,
            T.StructType(
                [
                    T.StructField(query_id_col, qid_t),
                    T.StructField("term", T.StringType()),
                ]
            ),
        )
    else:
        qterms = (
            queries_df.select(
                F.col(query_id_col), F.explode(tokens(query_text_col)).alias("term")
            )
            .filter(F.col("term") != "")
            .distinct()
            .withColumn("bucket", _term_bucket(F.col("term"), meta["n_buckets"]))
        )
        buckets = sorted(
            {r["bucket"] for r in qterms.select("bucket").distinct().collect()}
        )
        qterms = qterms.drop("bucket")
    lists = spark.read.parquet(path).filter(F.col("bucket").isin(buckets))
    hits = lists.join(F.broadcast(qterms), "term")
    # df computed EXACTLY from the hit set: probing a term reads every
    # posting of that term (they all live in its bucket), so the row
    # count per (query, term) IS its document frequency — one window
    # over rows already in hand, zero extra scan.  Not storing df is
    # what lets bm25_index_append stay a pure O(delta) insert; a
    # legacy index that does carry a df column is simply overridden
    # with the (identical) recount.
    from pyspark.sql import Window as W

    w = W.partitionBy(query_id_col, "term")
    hits = hits.withColumn("df", F.count(F.lit(1)).over(w))
    return _bm25_score_rank(
        hits, meta["n_docs"], meta["total_toks"], idf_scale, query_id_col, id_col, k
    )


def phrase_bm25_probe_persisted(
    spark,
    path: str,
    queries_df: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    id_col: str = "doc_id",
    idf_scale: int = 1_000_000,
) -> DataFrame:
    """Exact-phrase BM25 top-k SERVED from a persisted positional index
    (:func:`bm25_index_persist` with ``positions=True``) — bit-identical
    to :func:`phrase_bm25_topk` over the same corpus, but touching only
    the bucket directories the phrase's terms hash to.  This is what
    makes phrase retrieval scale like its non-phrase siblings: the
    in-memory query re-explodes the CORPUS per call (corpus-bound at
    100 TB), while this probe reads |queried buckets|/n_buckets of the
    index — the positions arrays ride in the very posting rows the BM25
    tail needs anyway, so phrase matching costs ZERO extra scan.

    The offset trick runs unchanged over exploded stored positions:
    candidate start ``s = pos - qpos`` must be covered by all m phrase
    offsets (repeated-term phrases fall out for free).  df is the same
    recount-over-hit-rows window the non-phrase probe uses — computed
    BEFORE the phrase semi-join, since df counts every doc containing
    the term, phrase-matched or not.  Raises on a position-less layout
    (``has_positions`` in ``_meta`` is the source of truth) instead of
    silently degrading to non-phrase ranking."""
    import os

    from pyspark.sql import Window as W

    from mbai_gdb_spark.io import check_serving_safe, read_sidecar_row

    check_serving_safe(path)
    meta = read_sidecar_row(path + "/_meta")  # r14: no Spark job
    if not bool(_meta_field(meta, "has_positions", False)):
        raise ValueError(
            "phrase_bm25_probe_persisted: index at "
            f"{path} stores no positions — rebuild with "
            "bm25_index_persist(..., positions=True) to serve phrase "
            "queries from the index"
        )
    if not any(n.startswith("bucket=") for n in os.listdir(path)):
        return _empty_probe_result(
            spark, meta, queries_df, query_id_col, id_col
        )
    # r14 (guide §7.3): bounded query frame → tokenize + bucket the
    # phrase terms driver-side for ASCII queries (one local collect, no
    # distinct/collect shuffle jobs); qtoks / m_per_q / qterms become
    # local frames.  Non-ASCII text keeps the Spark expressions.
    qrows = queries_df.select(query_id_col, query_text_col).collect()
    plan = _py_query_plan(qrows, query_id_col, query_text_col)
    if plan is not None:
        qid_t = queries_df.schema[query_id_col].dataType
        qtok_rows = [
            (qid, i, t) for qid, toks in plan.items() for i, t in enumerate(toks)
        ]
        qtoks = spark.createDataFrame(
            qtok_rows,
            T.StructType(
                [
                    T.StructField(query_id_col, qid_t),
                    T.StructField("qpos", T.IntegerType(), False),
                    T.StructField("term", T.StringType()),
                ]
            ),
        )
        m_per_q = spark.createDataFrame(
            [(qid, len(toks)) for qid, toks in plan.items() if toks],
            T.StructType(
                [
                    T.StructField(query_id_col, qid_t),
                    T.StructField("__m__", T.IntegerType(), False),
                ]
            ),
        )
        pairs = sorted({(qid, t) for qid, _i, t in qtok_rows})
        qterms = spark.createDataFrame(
            pairs,
            T.StructType(
                [
                    T.StructField(query_id_col, qid_t),
                    T.StructField("term", T.StringType()),
                ]
            ),
        )
        buckets = sorted(
            {_py_char_poly(t) % meta["n_buckets"] for _, t in pairs}
        )
    else:
        qcleaned = F.filter(tokens(query_text_col), lambda x: x != F.lit(""))
        qtoks = queries_df.select(
            F.col(query_id_col), F.posexplode(qcleaned).alias("qpos", "term")
        )
        m_per_q = qtoks.groupBy(query_id_col).agg(
            (F.max("qpos") + 1).alias("__m__")
        )
        qterms = (
            qtoks.select(query_id_col, "term")
            .distinct()
            .withColumn("bucket", _term_bucket(F.col("term"), meta["n_buckets"]))
        )
        buckets = sorted(
            {r["bucket"] for r in qterms.select("bucket").distinct().collect()}
        )
        qterms = qterms.drop("bucket")
    lists = spark.read.parquet(path).filter(F.col("bucket").isin(buckets))
    hits = lists.join(F.broadcast(qterms), "term")
    # Phrase candidates from the STORED positions of hit rows only.
    starts = (
        hits.select(
            query_id_col, id_col, "term", F.explode("positions").alias("pos")
        )
        .join(F.broadcast(qtoks), [query_id_col, "term"])
        .select(
            query_id_col, id_col, (F.col("pos") - F.col("qpos")).alias("s"), "qpos"
        )
    )
    phrase_docs = (
        starts.groupBy(query_id_col, id_col, "s")
        .agg(F.count_distinct("qpos").alias("__c__"))
        .join(F.broadcast(m_per_q), query_id_col)
        .filter(F.col("__c__") == F.col("__m__"))
        .select(query_id_col, id_col)
        .distinct()
    )
    # df BEFORE the phrase filter (a doc need not contain the phrase to
    # count toward a term's document frequency) — the same
    # recount-from-rows-in-hand window as bm25_probe_persisted.
    w = W.partitionBy(query_id_col, "term")
    scored_hits = hits.withColumn("df", F.count(F.lit(1)).over(w)).join(
        F.broadcast(phrase_docs), [query_id_col, id_col], "leftsemi"
    )
    return _bm25_score_rank(
        scored_hits,
        meta["n_docs"],
        meta["total_toks"],
        idf_scale,
        query_id_col,
        id_col,
        k,
    )


def rrf_fuse(
    rank_lists: "list[DataFrame]",
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    k_rrf: int = 60,
    scale: int = 1_000_000,
) -> DataFrame:
    """Reciprocal-rank fusion of retrieval rank lists — (query_id,
    rank, doc_id, rrf_score) — the standard hybrid-retrieval combiner
    (Cormack/Clarke/Buettcher RRF: score = sum over lists of
    1/(k_rrf + rank)).

    Each contribution is computed as ``scale div (k_rrf + rank)`` — an
    exact BIGINT, so fused scores (and therefore ranks) are
    reproducible bit-for-bit in any engine; only the input RANKS
    matter, never the underlying float scores, which is precisely why
    RRF is the robust way to fuse a lexical list with an embedding
    list whose score scales are incomparable.

    Plan shape: a unionAll of the (already tiny: k-bounded per query)
    rank lists, one hash aggregation on (query, doc), and the same
    WindowGroupLimit-pruned top-k window every other ranked query
    uses.  Cost is bounded by queries x lists x list length — never by
    corpus size."""
    from functools import reduce

    from pyspark.sql import Window as W

    parts = [
        rl.select(
            F.col(query_id_col),
            F.col(id_col),
            F.expr(
                f"CAST({scale} AS BIGINT) div ({k_rrf} + {rank_col})"
            ).alias("__c__"),
        )
        for rl in rank_lists
    ]
    allc = reduce(lambda a, b: a.unionByName(b), parts)
    scores = allc.groupBy(query_id_col, id_col).agg(
        F.sum("__c__").alias("rrf_score")
    )
    w = W.partitionBy(query_id_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            "rank",
            id_col,
            F.col("rrf_score").cast("long").alias("rrf_score"),
        )
    )


def mlm_mask(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask_pct: int = 15,
    mod: int = 2_147_483_647,
) -> DataFrame:
    """Deterministic BERT-style MLM masking plan: one row per MASKED
    position — (doc_id, pos, token, action, out_token).

    Selection and the 80/10/10 action split (mask / random-replace /
    keep) are driven by an integer LCG over (doc_id, pos), so the same
    corpus always yields the same masking plan — reproducible training
    batches without storing a random state, re-derivable by any engine
    (the oracle replays it in SQL).  The random replacement token is
    drawn from the document's own token list by a second hash — a
    self-contained stand-in for a vocabulary draw that needs no
    dictionary broadcast.

    Map-only: posexplode over the token array with the array carried
    alongside, so the replacement lookup is an element_at, not a join.
    Scale shape: zero shuffles, zero collects — pure narrow pipeline.
    """
    h1 = (
        (F.col(id_col).cast("long") * 1_000_003 + F.col("pos")) * 48271 + 11
    ) % mod
    h2 = (h1 * 2_654_435_761 + 97) % mod
    arr = tokens(text_col)
    exploded = (
        docs.select(F.col(id_col), arr.alias("__toks__"))
        .filter(F.size("__toks__") > 0)
        .select(
            id_col,
            "__toks__",
            F.posexplode("__toks__").alias("pos0", "token"),
        )
        .filter(F.col("token") != "")
        .select(
            id_col, "__toks__", (F.col("pos0") + 1).alias("pos"), "token"
        )
    )
    roll = h2 % 10
    rpos = (h2 / 10).cast("long") % F.size("__toks__") + 1
    action = (
        F.when(roll <= 7, F.lit("mask"))
        .when(roll == 8, F.lit("random"))
        .otherwise(F.lit("keep"))
    )
    out_token = (
        F.when(roll <= 7, F.lit("[MASK]"))
        .when(roll == 8, F.element_at("__toks__", rpos.cast("int")))
        .otherwise(F.col("token"))
    )
    return (
        exploded.filter(h1 % 100 < mask_pct)
        .select(
            id_col,
            "pos",
            "token",
            action.alias("action"),
            out_token.alias("out_token"),
        )
    )


def _merge_pair_in(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right single-rule BPE merge inside a symbol array:
    every adjacent (left, right) becomes left||right, non-overlapping,
    leftmost-first — as an aggregate() fold (JVM-side, no UDF).

    The fold appends each symbol unless the accumulator's last element
    is ``left`` and the current is ``right``, in which case the last
    element is replaced by the merged token.  This reproduces the
    sequential scan exactly: a merged token is strictly longer than
    ``left``, so it can never be re-matched as ``left`` by the next
    element — no lookahead or flag needed.

    The input array is referenced exactly ONCE (empty-array init; the
    first-element seeding happens inside the lambda via the size(acc)=0
    branch, which CaseWhen evaluates strictly in order).  This matters
    when folds are CHAINED (bpe_apply): a formulation that slices the
    input in three places quadruples the expression tree per rule —
     4^8 ≈ 65k subtree copies for an 8-rule tokenizer, measured 46 s
    vs sub-second at sf0.01."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(F.size(acc) == 0, F.array(x))
        .when(
            (F.element_at(acc, -1) == F.lit(left)) & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        )
        .otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    checkpoint_every: int = 4,
) -> list[tuple[str, str, int]]:
    """Byte-pair-encoding merge training, distributed: learn the
    ``n_merges`` most frequent adjacent symbol pairs.  Returns
    [(left, right, pair_count), ...] in merge order.

    The classic trainer trick makes this tractable at corpus scale:
    iterate over the DISTINCT-WORD table weighted by word frequency,
    not the corpus — pair statistics are identical, and the working
    set shrinks from tokens to vocabulary.  Each iteration is one
    explode (adjacent pairs) + one weighted count + a single-row argmax
    collect (the same bounded-scalar pattern as the PageRank/CC
    convergence checks), then a map-only fold applies the new rule to
    every word.  Ties break lexicographically, so the learned merge
    list is deterministic on any engine and partitioning.

    Lineage is truncated with localCheckpoint every
    ``checkpoint_every`` merges (iterative-plan hygiene, same as
    ops.graph).
    """
    words = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    cur = words.select(
        "freq", F.filter(F.split("w", ""), lambda c: c != "").alias("syms")
    ).localCheckpoint(eager=False)
    merges: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        pairs = cur.filter(F.size("syms") >= 2).select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda j: F.struct(
                        F.element_at("syms", j).alias("l"),
                        F.element_at("syms", (j + 1).cast("int")).alias("r"),
                    ),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .first()
        )
        if best is None:
            break
        merges.append((best.l, best.r, best.cnt))
        cur = cur.withColumn("syms", _merge_pair_in(F.col("syms"), best.l, best.r))
        if (i + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=False)
    return merges


def bpe_train_reference(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str, int]]:
    """Pure-Python reference BPE trainer (same greedy-left semantics and
    lexicographic tie-break) — the test oracle for :func:`bpe_train`."""
    vocab = {w: list(w) for w in word_freqs}
    out: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((l, r, c))
        for w, syms in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            vocab[w] = merged
    return out


def bpe_apply(
    syms: Column, merges: list[tuple[str, str]]
) -> Column:
    """Apply an ordered BPE merge-rule list to a symbol array — the
    tokenizer-APPLICATION half of :func:`bpe_train`: rules are a fixed
    broadcast-sized artifact (trained once, applied corpus-wide), each
    applied as one greedy left-to-right aggregate() fold
    (:func:`_merge_pair_in` — JVM-side, no UDF).  Run it on the
    DISTINCT-WORD table and join back to token positions rather than
    per occurrence: same trainer trick, the fold cost scales with
    vocabulary, not corpus."""
    for left, right in merges:
        syms = _merge_pair_in(syms, left, right)
    return syms


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Sliding-window document chunking — the training-prep step between
    raw documents and :mod:`ops.packing`: split each document's token
    stream into windows of ``max_len`` tokens with ``overlap`` tokens
    of context carried between consecutive windows (stride =
    ``max_len - overlap``).

    Window starts are ``1 + i*stride`` for
    ``i in 0..ceil(max(0, n - max_len) / stride)`` — the last window
    always reaches the final token (no tail loss), every window except
    possibly the last has exactly ``max_len`` tokens, and a document
    with ``n <= max_len`` yields one window.

    Map-only: one explode per document, no shuffle, no UDF — chunk
    counts scale the row count by ~n/stride, the same fan-out shape as
    token explodes elsewhere.  Output: (id, chunk_id, start_pos,
    n_chunk_tokens, chunk_text).
    """
    if not 0 <= overlap < max_len:
        raise ValueError("need 0 <= overlap < max_len")
    stride = max_len - overlap
    toks = tokens(text_col)
    base = df.select(
        F.col(id_col),
        F.filter(toks, lambda t: t != "").alias("__toks__"),
    ).withColumn("__n__", F.size("__toks__"))
    n_chunks = (
        F.ceil(
            F.greatest(F.lit(0), F.col("__n__") - max_len) / F.lit(stride)
        ).cast("int")
        + 1
    )
    exploded = base.filter(F.col("__n__") > 0).select(
        id_col,
        "__toks__",
        "__n__",
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id", "__i__"),
    )
    start = F.col("__i__") * stride + 1
    piece = F.slice("__toks__", start, max_len)
    return exploded.select(
        id_col,
        F.col("chunk_id"),
        start.alias("start_pos"),
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def normalize_documents(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    casefold: bool = False,
    out_col: str | None = None,
) -> DataFrame:
    """Unicode-normalize a text column (Arrow-batched mapInPandas over
    ``unicodedata.normalize``) — the canonicalization step ahead of
    dedup/fingerprinting: visually-identical strings with different
    codepoint sequences (precomposed é vs e+combining-acute, ligature
    ﬁ under NFKC, fullwidth forms) otherwise hash apart and defeat
    exact dedup.  ``casefold=True`` additionally applies str.casefold
    (aggressive lowercase, ß→ss).  Map-only; output schema = input
    with ``out_col`` (default: replace ``text_col``)."""
    import unicodedata

    import pandas as pd

    from pyspark.sql import types as T

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError("form must be NFC/NFD/NFKC/NFKD")
    target = out_col or text_col
    cols = df.columns
    out_cols = cols if target in cols else cols + [target]
    fields = []
    for c in out_cols:
        if c == target:
            fields.append(T.StructField(target, T.StringType()))
        else:
            fields.append(df.schema[c])
    schema = T.StructType(fields)

    def norm(batches):
        for pdf in batches:
            s = pdf[text_col].map(
                lambda t: None
                if t is None
                else (
                    unicodedata.normalize(form, t).casefold()
                    if casefold
                    else unicodedata.normalize(form, t)
                )
            )
            out = pdf.copy()
            out[target] = s
            yield out[list(out_cols)]

    return df.mapInPandas(norm, schema)
