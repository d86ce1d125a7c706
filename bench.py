"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is fully executed JVM-side via the noop sink (no driver
collect), so the timing reflects the distributed plan, not Python
serialization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_session_attribution",
    "a1_pricing_summary",
    "j1_region_revenue",
    "j5_local_supplier_revenue",
    "j3_purchases_in_sessions",
    "j7_asof_click_to_view",
    "w5_sessionize_events",
    "w8_running_total_reset",
    "o3_top10_customers_by_revenue",
    "sim_cosine_top5",
    "text_fingerprint",
    # Round-2 north-star breadth (regression gate on the dedup/ANN path)
    "dedup_minhash_lsh",
    "sim_ivf_top5",
    "text_profile",
    # Training-pipeline additions: packing, decontamination, sketches
    "pack_sequences",
    "decontam_eval_overlap",
    "sketch_kmv_distinct",
    "text_repetition",
    # Curation additions: cross-doc span dedup signal, domain mixing
    "text_dup_spans",
    "mix_source_weights",
    # Embedding-quality eval: fixed-point centroids + nearest-centroid
    "emb_centroid_classify",
    # Round-3 additions: real media decode, end-to-end curation, sinks
    "mm_decode_image",
    "mm_decode_audio",
    "curate_corpus",
    "io_merge_idempotent",
    # Round-4 additions: vectorized brute top-k, deterministic shuffle
    # sharding, JL random projection
    "sim_matmul_top5",
    "shuffle_shards",
    "emb_random_projection",
    # Round-4 tail: Bloom decontamination, triangle counting, inverted-
    # index search, CMS-candidate heavy hitters
    "decontam_bloom",
    "graph_triangle_count",
    "search_tfidf_topk",
    "sketch_heavy_hitters",
    "text_mlm_mask",
    "w15_gap_fill",
    "w16_rolling_7d",
    "emb_pq_codes",
    "sim_pq_adc_top5",
    "a12_cube_revenue",
    "a13_pivot_order_matrix",
    "u2_set_ops_customers",
    "a14_corr_qty_price",
    "text_quality_tiers",
    "w17_scd2_user_value",
    "sample_negatives",
    "dedup_typo_pairs",
    "a15_mode_order_priority",
    "a16_revenue_share",
    "graph_kcore_profile",
    # Round-5 additions: semantic dedup, HLL, tokenizer application,
    # z-order layout, IVF-PQ
    "dedup_semantic",
    "sketch_hll_distinct",
    "text_bpe_encode",
    "io_zorder_profile",
    "sim_ivfpq_top5",
    "text_chunk_windows",
    "io_incremental_rollup",
    "w18_ohlc_bars",
    "w19_time_weighted_value",
    "mm_decode_gif",
    "mm_gif_frame_sample",
    "mm_resize_roundtrip",
    "text_bigram_surprise",
    "sample_weighted_docs",
    "a17_month_over_month",
    # Round-6 additions: residual IVF-PQ, baseline + progressive JPEG
    "sim_ivfpq_residual_top5",
    "mm_decode_jpeg",
    "mm_decode_jpeg_progressive",
    "j13_bloom_pruned_revenue",
    "io_table_stats",
    "dq_orders_constraints",
    "cdc_apply_changelog",
    "text_unicode_profile",
    "dedup_exact_normalized",
    # Round-7 additions: Bloom prune in its sort-merge regime
    "j13_bloom_smj_revenue",
    # Round-8 additions: integer-exact Okapi BM25 ranked retrieval, the
    # RRF hybrid (BM25 ⊕ embedding-cosine) built on it, and the
    # persisted term-bucket inverted index (build + pruned probe)
    "search_bm25_topk",
    "search_hybrid_rrf",
    "search_bm25_persisted",
    # Round-9 additions: incremental index maintenance — BM25 postings
    # merged bucket-locally, IVF-PQ codes inserted with frozen
    # quantizers (cold = build+append+probe, warm = probe only) — and
    # exact-phrase BM25 (offset-trick positional matching)
    "search_bm25_appended",
    "sim_ivfpq_appended_top5",
    "search_phrase_bm25",
    # Round-10 additions: generation-managed lifecycle (build → append →
    # physical delete → pointer-served probe; cold = whole lifecycle,
    # warm = probe only) for both layouts, and exact-phrase retrieval
    # served bucket-pruned from the persisted POSITIONAL index
    "search_bm25_deleted",
    "sim_ivfpq_deleted_top5",
    "search_phrase_persisted",
    # Round-11 additions: the plain-IVF lifecycle (late r10), the
    # bucketed-LSH lifecycle, and the FUSED updates (cold = build +
    # mutations + probe, warm = pointer-served probe only)
    "sim_ivf_deleted_top5",
    "dedup_lsh_deleted",
    "search_bm25_updated",
    "sim_ivf_updated_top5",
    "sim_ivfpq_updated_top5",
    # Round-12 additions: the fused-update lifecycle served through the
    # object-store manifest backend, and the four-family takedown (cold
    # = stand up 4 indexes + one takedown_documents call + 4 probes;
    # warm = the 4 pointer-served probes only)
    "search_bm25_updated_manifest",
    "takedown_multi_index",
    # Round-13 addition: streaming ingest published through the manifest
    # backend (cold = write the feed + drain it micro-batch by
    # micro-batch with compaction ticks + probe; warm = the
    # manifest-view probe only)
    "search_bm25_stream_manifest",
]


def _stage_nba_corpus(spark, n_games: int, base: str) -> None:
    """Write an n-game fixture corpus to parquet in chunks — data GEN and
    serialization are staged OUTSIDE the timed window, so the pipeline
    figures measure the engine, not the driver-side row generator (a
    round-2 verdict note)."""
    from mbai_gdb_spark.pipeline.fixtures import PBP_DDL, STARTERS_DDL, make_game

    chunk = 250
    for start in range(0, n_games, chunk):
        pbp_rows, starter_rows, home_rows = [], [], []
        for i in range(start, min(start + chunk, n_games)):
            gid = 9000 + i
            pbp, st = make_game(
                game_id=gid, home_team=10, away_team=20, n_ot=i % 2, seed=i
            )
            pbp_rows += pbp
            starter_rows += st
            home_rows.append((gid, 10))
        spark.createDataFrame(pbp_rows, PBP_DDL).write.mode("append").parquet(
            base + "/pbp"
        )
        spark.createDataFrame(starter_rows, STARTERS_DDL).write.mode(
            "append"
        ).parquet(base + "/starters")
        spark.createDataFrame(
            home_rows, "game_id long, home_team_id long"
        ).write.mode("append").parquet(base + "/home")


def _bench_nba_pipeline(spark, n_games: int) -> float:
    """Time the full EP2 game pipeline (periods → lineup kernel → stints →
    actions → scores → plus-minus) across a multi-game parquet corpus."""
    import shutil
    import tempfile
    import time as _time

    from mbai_gdb_spark.pipeline.plus_minus import game_pipeline, materialize_outputs

    base = tempfile.mkdtemp(prefix=f"bench_nba_{n_games}_")
    try:
        _stage_nba_corpus(spark, n_games, base)
        pbp_df = spark.read.parquet(base + "/pbp")
        st_df = spark.read.parquet(base + "/starters")
        home_df = spark.read.parquet(base + "/home")

        t0 = _time.perf_counter()
        tables = game_pipeline(pbp_df, st_df, home_df)
        materialize_outputs(
            tables, ("lineup_plus_minus", "player_plus_minus", "scores", "action_next")
        )
        return _time.perf_counter() - t0
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _full_battery_path(repo: str, for_merge: bool = False) -> str:
    """Resolve the round's BENCH_full_r{N}.json target ONCE, shared by
    the plain-battery persist and the --isolate/--compaction-probe
    merges so the two can never disagree (advice-r10: deriving the
    round as max(BENCH_r*)+1 in both places let a merge that ran AFTER
    the driver wrote the current round's BENCH_rN.json skip ahead to
    BENCH_full_r{N+1}.json, detaching the evidence from its battery).

    Plain runs target max(BENCH_r*) + 1 — a full battery always runs
    before the driver records that round's BENCH_r file, so the
    derivation is stable for them.  MERGES instead prefer the newest
    EXISTING full battery whenever its round is >= max(BENCH_r*):
    isolate/compaction evidence always belongs with the battery that
    measured the same HEAD, even if the driver's BENCH_r record (or
    the next round's start) has already moved the max forward.
    $SPARK_GRAFT_BENCH_FULL overrides everything."""
    import glob

    env = os.environ.get("SPARK_GRAFT_BENCH_FULL")
    if env:
        return env
    bench_rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    nxt = max(bench_rounds, default=0) + 1
    if for_merge:
        fulls = [
            int(m.group(1))
            for p in glob.glob(os.path.join(repo, "BENCH_full_r*.json"))
            if (m := re.search(r"BENCH_full_r(\d+)\.json$", p))
        ]
        newest = max(fulls, default=0)
        if newest >= max(bench_rounds, default=0):
            return os.path.join(repo, f"BENCH_full_r{newest:02d}.json")
    return os.path.join(repo, f"BENCH_full_r{nxt:02d}.json")


def _persist_full_battery(out: dict) -> None:
    """Write the COMPLETE battery JSON to BENCH_full_r{N}.json in the
    repo.  The driver's BENCH_r{N}.json artifact preserves only a 2 KB
    tail of stdout, which loses the battery head and makes
    round-over-round comparison impossible past ~18 entries (a round-6
    verdict finding) — this file is the machine-readable record
    ``tools/bench_compare.py`` diffs instead.  Target resolution is
    shared with the merge path (:func:`_full_battery_path`).  Override
    the destination with $SPARK_GRAFT_BENCH_FULL; failures to write
    never fail the bench (the stdout line is the contract)."""
    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        path = _full_battery_path(repo)
        # Preserve the round's isolated record across overwrites: the
        # builder runs `--isolate` mid-round, the driver's own plain
        # run then rewrites this file — without the carry the isolated
        # key (the drift-vs-regression evidence verdicts ask for)
        # would be silently lost (this is what erased the r8 record).
        if os.path.exists(path):
            try:
                with open(path) as f:
                    prev = json.load(f)
                if isinstance(prev, dict):
                    # Carry EVERY evidence key a rewrite would otherwise
                    # drop (isolated verdicts, compaction probes,
                    # experiment records like lsh_delete_vs_rebuild_*,
                    # builder-attached *_note adjudications) — only the
                    # battery's own per-run keys are volatile.  With
                    # auto-isolation both runs usually HAVE an isolated
                    # record, so that one merges per name (this run's
                    # fresh samples win a name collision; the other
                    # run's names survive).
                    volatile = {
                        "metric",
                        "value",
                        "unit",
                        "queries",
                        "queries_cold",
                        "scale_guard",
                        "sf",
                        "sf1",
                        "auto_isolated_movers",
                        "auto_isolation_unadjudicated",
                    }
                    out = dict(out)
                    for key, val in prev.items():
                        if key == "isolated":
                            merged = dict(val)
                            merged.update(out.get("isolated", {}))
                            out["isolated"] = merged
                        elif key not in volatile and key not in out:
                            out[key] = val
                    if "isolated" in prev and "isolated_note" not in out:
                        out["isolated_note"] = prev.get(
                            "isolated_note",
                            "carried/merged from this round's earlier "
                            "runs",
                        )
            # TypeError: a malformed prior file (e.g. "isolated" not a
            # dict) must not crash the battery's final persist after a
            # multi-hour run — drop the carry, keep this run's numbers.
            except (OSError, ValueError, TypeError):
                pass
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
    except OSError as exc:
        print(f"bench: full-battery persist skipped: {exc}", file=sys.stderr)


def _merge_into_full_battery(extra: dict) -> None:
    """Read-modify-write the round's BENCH_full file with extra keys
    (e.g. the --compaction-probe record) without disturbing an existing
    battery; creates a keys-only stub if no battery ran yet (the
    driver's plain run later merges over it via the carry logic)."""
    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        path = _full_battery_path(repo, for_merge=True)
        prev: dict = {}
        if os.path.exists(path):
            with open(path) as f:
                loaded = json.load(f)
            if isinstance(loaded, dict):
                prev = loaded
        for k, v in extra.items():
            # Accumulate the round's isolated records per query name —
            # a later --isolate-only of OTHER queries must not erase an
            # earlier one's evidence (re-measuring the same name still
            # replaces that name's entry).
            if k == "isolated" and isinstance(prev.get(k), dict):
                prev[k] = {**prev[k], **v}
            else:
                prev[k] = v
        with open(path, "w") as f:
            json.dump(prev, f, indent=1)
            f.write("\n")
    except (OSError, ValueError) as exc:
        print(f"bench: battery merge skipped: {exc}", file=sys.stderr)


def _run_compaction_probe(sf_dir: str) -> dict:
    """Measure what the compaction tick buys at serving time: build the
    BM25 index FRAGMENTED (1 build + 7 appends over doc_id slices — the
    shape a streaming drain leaves), time the warm probe, compact, time
    it again.  Records per-phase probe seconds (n=3), max parquet files
    per bucket directory before/after, and the compaction cost itself —
    the probe-latency-before/after evidence the r9 verdict asked to see
    in the battery."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from mbai_gdb_spark.io import compact_partitioned, read_table
    from mbai_gdb_spark.ops.text import (
        bm25_index_append,
        bm25_index_persist,
        bm25_probe_persisted,
    )
    from mbai_gdb_spark.queries_north import _SEARCH_QUERIES
    from mbai_gdb_spark.session import get_spark

    spark = get_spark("bench-compaction")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="mbai_bench_compact_")
    path = os.path.join(work, "idx")
    qs = spark.createDataFrame(_SEARCH_QUERIES, "query_id string, qtext string")

    def probe() -> float:
        t0 = time.perf_counter()
        bm25_probe_persisted(spark, path, qs, k=10).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    def max_files() -> int:
        return max(
            sum(
                1
                for f in os.listdir(os.path.join(path, d))
                if f.endswith(".parquet")
            )
            for d in os.listdir(path)
            if d.startswith("bucket=")
        )

    try:
        bm25_index_persist(
            docs.filter(F.pmod(F.col("doc_id"), F.lit(8)) == 0), path, n_buckets=64
        )
        for m in range(1, 8):
            bm25_index_append(
                docs.filter(F.pmod(F.col("doc_id"), F.lit(8)) == m), path
            )
        probe()  # JVM/codegen warm-up, excluded
        before = [probe() for _ in range(3)]
        files_before = max_files()
        t0 = time.perf_counter()
        n_dirs = len(compact_partitioned(spark, path, "bucket"))
        compact_secs = round(time.perf_counter() - t0, 3)
        files_after = max_files()
        after = [probe() for _ in range(3)]
        return {
            "layout": "bm25/bucket=64, 1 build + 7 appends",
            "probe_before": before,
            "probe_after": after,
            "max_files_per_dir_before": files_before,
            "max_files_per_dir_after": files_after,
            "dirs_compacted": n_dirs,
            "compact_secs": compact_secs,
            "sf_dir": sf_dir,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _isolated_single(name: str, sf_dir: str) -> None:
    """Run ONE named entry in THIS fresh process (new JVM: no battery
    residue, no shared codegen cache) and print {"name", "cold",
    "warm"}.  Supports every QUERIES entry plus the synthetic
    ``nba_game_pipeline_<n>`` tiers.  Invoked by --isolate via a
    subprocess per run; the same JVM warm-up the battery does (one
    throwaway query) is paid first so "cold" means cold QUERY, not
    cold JVM."""
    # Register the FULL registry — queries_nba / queries_tpch entries
    # (nba_possessions, q8_market_share, ...) are isolatable too, not
    # just the north-star module.
    import mbai_gdb_spark.queries_nba  # noqa: F401
    import mbai_gdb_spark.queries_north  # noqa: F401
    import mbai_gdb_spark.queries_tpch  # noqa: F401
    from mbai_gdb_spark.queries import QUERIES
    from mbai_gdb_spark.session import get_spark

    spark = get_spark("bench-isolated")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM with a query OTHER than the one under measurement —
    # warming with the target itself would make its reported "cold"
    # time a warm second run.
    warmup = "a1_pricing_summary"
    if name == warmup:
        warmup = "a7_distinct_segments"
    QUERIES[warmup](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    m = re.fullmatch(r"nba_game_pipeline_(\d+)", name)
    if m:
        n = int(m.group(1))
        cold = _bench_nba_pipeline(spark, n)
        warm = _bench_nba_pipeline(spark, n)
    else:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm = time.perf_counter() - t0
    print(json.dumps({"name": name, "cold": round(cold, 3), "warm": round(warm, 3)}))


def _run_isolated(names: list[str], runs: int, sf_dir: str) -> dict:
    """Fan each name out to ``runs`` fresh subprocesses (one cold+warm
    pair per process) and collect {"cold": [...], "warm": [...]} lists —
    the isolated counterpart the verdicts asked for so battery
    interference and genuine regressions can be told apart without
    manual A/Bs."""
    import subprocess

    out: dict[str, dict] = {}
    for name in names:
        colds: list[float] = []
        warms: list[float] = []
        for _ in range(runs):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--isolated-single", name],
                capture_output=True,
                text=True,
                env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
            )
            rec = None
            for ln in reversed(proc.stdout.strip().splitlines()):
                # Parse defensively: a stray '{'-prefixed log line (or a
                # truncated print from a dying subprocess) must cost one
                # sample, never the whole battery's output.
                if not ln.startswith("{"):
                    continue
                try:
                    cand = json.loads(ln)
                except ValueError:
                    continue
                if isinstance(cand, dict) and "cold" in cand and "warm" in cand:
                    rec = cand
                    break
            if rec is None:
                print(
                    f"bench: isolated run of {name} produced no usable JSON "
                    f"(rc={proc.returncode}): {proc.stderr[-500:]}",
                    file=sys.stderr,
                )
                continue
            colds.append(rec["cold"])
            warms.append(rec["warm"])
        out[name] = {"cold": colds, "warm": warms}
    return out


def _previous_full_battery(repo: str) -> dict | None:
    """The newest BENCH_full_r*.json that is NOT this round's target —
    the like-for-like comparison base the auto-isolation gate uses."""
    import glob

    target = os.path.abspath(_full_battery_path(repo))
    cands = []
    for p in glob.glob(os.path.join(repo, "BENCH_full_r*.json")):
        m = re.search(r"BENCH_full_r(\d+)\.json$", p)
        if m and os.path.abspath(p) != target:
            cands.append((int(m.group(1)), p))
    if not cands:
        return None
    try:
        with open(max(cands)[1]) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _auto_isolate_movers(
    timings: dict[str, float],
    sf_dir: str,
    threshold: float = 1.3,
    floor: float = 0.5,
    budget_s: float = 3600.0,
    runs: int = 3,
) -> tuple[dict, dict, dict]:
    """Drift defense (r11 verdict ask #4): two same-HEAD batteries
    disagreed 0.99x vs 1.14x in r11 — session-level JVM/machine drift
    larger than the deltas being adjudicated.  So the battery now
    SELF-DEFENDS: every query whose warm time moved >``threshold``x vs
    the previous round's battery (and is above the ``floor`` seconds
    noise band on at least one side) is automatically re-measured
    through the existing fresh-subprocess --isolate path before the
    numbers land in BENCH_full — a verdict can then read the isolated
    cold/warm samples next to the in-battery number and tell drift from
    regression without a manual A/B.  EVERY flagged mover is isolated,
    worst first, up to an estimated ``budget_s`` seconds of isolation
    wall-clock (r13 verdict ask #3: the old worst-6 count cap silently
    truncated the battery's own evidence when a whole-session drift
    flagged 20); movers past the budget are returned with an explicit
    skip reason so the record never pretends they were adjudicated.
    Returns ({name: ratio}, {name: {"cold": [...], "warm": [...]}},
    {name: skip_reason})."""
    if os.environ.get("SPARK_GRAFT_NO_AUTOISOLATE") == "1":
        return {}, {}, {}
    repo = os.path.dirname(os.path.abspath(__file__))
    prev = _previous_full_battery(repo)
    if not prev:
        return {}, {}, {}
    # Same-tier comparisons only: a previous battery measured at a
    # different sf would flag nearly every query (or mask real movers
    # below the floor) and burn a pointless isolation fleet.
    m = re.search(r"sf([0-9.]+)", sf_dir)
    cur_sf = float(m.group(1)) if m else -1.0
    if prev.get("sf") != cur_sf:
        print(
            f"bench: auto-isolation skipped — previous battery sf="
            f"{prev.get('sf')} != this run's sf={cur_sf}",
            file=sys.stderr,
        )
        return {}, {}, {}
    prev_q = prev.get("queries", {})
    # Exact ratios drive the sort/budget; rounding is display-only
    # (advice r13: round(r, 2) can hit 0.0 for an extreme speedup and
    # 1/0 in the sort key would crash the battery's final stretch).
    exact: dict[str, float] = {}
    for name, cur in timings.items():
        pv = prev_q.get(name)
        if not pv or pv <= 0 or max(pv, cur) < floor:
            continue
        r = cur / pv
        # Both directions: an apparent SPEEDUP of the same magnitude is
        # equally likely to be session drift (advice find) — without an
        # isolated re-measure it would land in BENCH_full and be
        # misread as a real improvement.
        if r > threshold or r < 1.0 / threshold:
            exact[name] = max(r, 1e-6)
    ratios = {n: round(r, 2) for n, r in exact.items()}
    ranked = sorted(
        exact, key=lambda n: max(exact[n], 1.0 / exact[n]), reverse=True
    )
    if not ranked:
        return ratios, {}, {}
    # Time-bounded, not count-bounded: estimate each mover's isolation
    # cost as runs x (JVM spin-up + cold+warm query walls) and take
    # movers worst-first until the estimate would exceed budget_s.  The
    # worst mover ALWAYS runs.  Anything past the budget is recorded as
    # explicitly unadjudicated rather than silently dropped.
    jvm_s = 25.0
    movers: list[str] = []
    skipped: dict[str, str] = {}
    est_total = 0.0
    for n in ranked:
        est = runs * (jvm_s + 2.0 * max(timings.get(n, 0.0), prev_q.get(n, 0.0)))
        if movers and est_total + est > budget_s:
            skipped[n] = (
                f"isolation budget exhausted: {round(est_total, 1)}s "
                f"estimated already queued of {budget_s}s; this mover "
                f"estimated +{round(est, 1)}s"
            )
            continue
        movers.append(n)
        est_total += est
    print(
        f"bench: auto-isolating {len(movers)}/{len(ranked)} >"
        f"{threshold}x mover(s) vs previous battery "
        f"(~{round(est_total)}s est of {round(budget_s)}s budget): "
        + ", ".join(f"{n} ({ratios[n]}x)" for n in movers),
        file=sys.stderr,
    )
    if skipped:
        print(
            f"bench: {len(skipped)} mover(s) past the isolation budget, "
            "recorded unadjudicated: " + ", ".join(sorted(skipped)),
            file=sys.stderr,
        )
    return ratios, _run_isolated(movers, runs, sf_dir), skipped


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # Optional flags (the driver's plain `python bench.py` sees none):
    #   --isolated-single NAME   internal: one fresh-JVM cold+warm run
    #   --isolate a,b[,...]      after the battery, re-run these names
    #                            isolated (fresh subprocess each) and
    #                            record both numbers under "isolated"
    #   --isolate-only a,b       skip the battery; isolated runs only
    #   --isolate-runs N         subprocesses per name (default 3)
    #   --compaction-probe       skip the battery; measure probe latency
    #                            before/after the compaction tick and
    #                            merge the record into BENCH_full
    argv = sys.argv[1:]
    isolate_names: list[str] = []
    isolate_only = False
    isolate_runs = 3
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--isolated-single":
            _isolated_single(argv[i + 1], sf_dir)
            return
        if a == "--compaction-probe":
            rec = _run_compaction_probe(sf_dir)
            _merge_into_full_battery({"compaction": rec})
            print(json.dumps({"metric": "compaction_probe", "value": 0.0,
                              "unit": "sec", "queries": {}, "compaction": rec,
                              "sf": sf}))
            return
        if a in ("--isolate", "--isolate-only"):
            isolate_names = [s for s in argv[i + 1].split(",") if s]
            isolate_only = a == "--isolate-only"
            i += 2
            continue
        if a == "--isolate-runs":
            isolate_runs = int(argv[i + 1])
            i += 2
            continue
        raise SystemExit(f"bench.py: unknown argument {a!r}")

    if isolate_names:
        # Validate names BEFORE any (long) battery work: a typo should
        # fail in milliseconds, not after 20 minutes of sweep.  All
        # three registry modules — the subprocess imports the same set.
        import mbai_gdb_spark.queries_nba  # noqa: F401
        import mbai_gdb_spark.queries_north  # noqa: F401
        import mbai_gdb_spark.queries_tpch  # noqa: F401
        from mbai_gdb_spark.queries import QUERIES as _Q

        unknown = [
            n
            for n in isolate_names
            if n not in _Q and not re.fullmatch(r"nba_game_pipeline_\d+", n)
        ]
        if unknown:
            raise SystemExit(f"bench.py --isolate: unknown entries {unknown}")

    if isolate_only:
        isolated = _run_isolated(isolate_names, isolate_runs, sf_dir)
        # Persist like the with-battery --isolate path does: merge into
        # the round's BENCH_full so the record survives the driver's
        # later plain run (the carry logic preserves it).  Only when
        # something was actually measured — a --isolate-runs 0
        # validation pass must stay side-effect-free (it used to clobber
        # the round's genuine record with empty lists).
        if any(rec["cold"] or rec["warm"] for rec in isolated.values()):
            _merge_into_full_battery({"isolated": isolated})
        print(
            json.dumps(
                {
                    "metric": "isolated_queries",
                    "value": 0.0,
                    "unit": "sec",
                    "queries": {},
                    "isolated": isolated,
                    "sf": sf,
                }
            )
        )
        return

    import mbai_gdb_spark.queries_north  # noqa: F401  (registers north-star queries)
    from mbai_gdb_spark.queries import QUERIES
    from mbai_gdb_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once (excluded from per-query times).
    QUERIES["a1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Each query runs twice; the reported figure is the SECOND run
    # (steady state).  The first run pays one-off whole-stage-codegen
    # compilation (~1-2 s), which at sf0.1 is the same order as the
    # query itself and pure noise w.r.t. 100 TB throughput; cold times
    # stay visible in "queries_cold" so the overhead is not hidden.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for qi, name in enumerate(HEADLINE):
        fn = QUERIES.get(name)
        if fn is None:
            continue
        if qi:
            # Per-query GC + cache clear (r14; was every-8 since r5):
            # residue from earlier queries (localCheckpoint blocks,
            # shuffle/broadcast state pending the context cleaner, JVM
            # garbage) inflates later entries — the every-8 cadence
            # left e.g. mm_decode_image at 3.98 s in-battery vs 2.24 s
            # with per-query cleanup vs ~2.0 s fresh-JVM isolated
            # (r14 A/B, tools/battery_prefix_experiment.py; full-
            # battery deltas in OPTIMIZATION_r14.md).  gc.collect()
            # drops unreferenced py4j handles so the JVM context
            # cleaner releases the backing RDD/broadcast/shuffle state.
            # Outside the timed windows: this isolates each query's own
            # cost, exactly what the fresh-subprocess --isolate path
            # measures, without changing what any query computes.
            import gc as _gc

            _gc.collect()
            spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    def _cleanup() -> None:
        # Release leftovers from the query sweep (localCheckpoint blocks,
        # cached fan-outs) so the pipeline entries time the PIPELINE, not
        # a major GC of 36 prior query executions' garbage — measured
        # skew without this: 18 s vs 6.5 s for the same 20-game run.
        import gc

        gc.collect()
        spark.catalog.clearCache()

    _cleanup()
    cold["nba_game_pipeline_20"] = round(_bench_nba_pipeline(spark, n_games=20), 3)
    _cleanup()
    timings["nba_game_pipeline_20"] = round(_bench_nba_pipeline(spark, n_games=20), 3)
    _cleanup()
    timings["nba_game_pipeline_200"] = round(
        _bench_nba_pipeline(spark, n_games=200), 3
    )
    _cleanup()
    # Full-season+ scale point (the reference's design target is ~1,230
    # games/season, docs/index.md:40): the kernel fans out on (game,
    # team), so wall-clock should grow FAR slower than data volume.
    timings["nba_game_pipeline_2000"] = round(
        _bench_nba_pipeline(spark, n_games=2000), 3
    )

    # Scale guard: 10× games must cost well under 10× wall.  Sub-linear
    # scaling is the whole point of the fan-out design; a super-linear
    # step means a shuffle/skew regression — fail the bench run.
    scale_guard = {
        "games_per_sec_20": round(20 / timings["nba_game_pipeline_20"], 1),
        "games_per_sec_200": round(200 / timings["nba_game_pipeline_200"], 1),
        "games_per_sec_2000": round(2000 / timings["nba_game_pipeline_2000"], 1),
        "wall_ratio_200_over_20": round(
            timings["nba_game_pipeline_200"] / timings["nba_game_pipeline_20"], 2
        ),
        "wall_ratio_2000_over_200": round(
            timings["nba_game_pipeline_2000"] / timings["nba_game_pipeline_200"], 2
        ),
    }
    # Linear would be 10.0; the kernel's constant overhead amortizes so
    # observed ratios sit well below that (sf0.01: 4.0).  6.0 leaves
    # headroom for machine noise while still catching a genuine
    # super-linear shuffle/skew regression.
    superlinear = scale_guard["wall_ratio_2000_over_200"] > 6.0
    scale_guard["superlinear"] = superlinear

    # sf1 tier (10× sf0.1, tools/gen_sf1.py): cold + WARM pass over the
    # 10 most expensive headline queries.  The wall ratio compares
    # sf1 WARM to this run's sf0.1 WARM numbers — cold/cold mixing
    # would let the sf0.1 denominator's one-off codegen compile (~1-2 s,
    # the same order as the sf0.1 queries) bias every ratio low and
    # mask a super-linear plan.  Linear-in-data plans should land near
    # 10× or below where fixed overhead dominates; far past the data
    # ratio means a shuffle/skew/quadratic surprise.  Skipped silently
    # when the tier has not been generated.
    sf1_dir = os.environ.get(
        "SPARK_GRAFT_SF1_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".localdata", "sf1"),
    )
    sf1_section = None
    if os.path.isdir(sf1_dir):
        SF1_QUERIES = [
            "graph_kcore_profile",
            "dedup_typo_pairs",
            "graph_triangle_count",
            "curate_corpus",
            "io_incremental_rollup",
            "dedup_minhash_lsh",
            "text_dup_spans",
            "decontam_bloom",
            "search_tfidf_topk",
            "io_merge_idempotent",
            # lifecycle family at 10x data (r11 verdict ask #3): cold =
            # the full multi-generation lifecycle (build + mutations +
            # probe), warm = the pointer-served probe — the wall ratio
            # below compares the WARM (serving) path across scales
            "search_bm25_updated",
            "sim_ivfpq_updated_top5",
            "dedup_lsh_deleted",
        ]
        sf1_cold: dict[str, float] = {}
        sf1_warm: dict[str, float] = {}
        ratios: dict[str, float] = {}
        for name in SF1_QUERIES:
            fn = QUERIES.get(name)
            if fn is None:
                continue
            _cleanup()
            t0 = time.perf_counter()
            fn(spark, sf1_dir).write.format("noop").mode("overwrite").save()
            sf1_cold[name] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            fn(spark, sf1_dir).write.format("noop").mode("overwrite").save()
            sf1_warm[name] = round(time.perf_counter() - t0, 3)
            if timings.get(name):
                ratios[name] = round(sf1_warm[name] / timings[name], 2)
        sf1_section = {
            "sf1_dir": sf1_dir,
            "data_ratio": 10.0,
            "queries_cold": sf1_cold,
            "queries": sf1_warm,
            "wall_ratio_warm_over_sf0.1_warm": ratios,
            "max_wall_ratio": max(ratios.values(), default=0.0),
        }

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_cold": cold,
        "scale_guard": scale_guard,
        "sf": sf,
    }
    if sf1_section is not None:
        out["sf1"] = sf1_section
    # Drift defense: >1.3x movers vs the previous round's battery get
    # an automatic fresh-subprocess re-measure recorded alongside the
    # in-battery number (see _auto_isolate_movers).  The explicit
    # --isolate list, when given, takes precedence over the auto gate.
    mover_ratios, auto_isolated, auto_skipped = (
        ({}, {}, {})
        if isolate_names
        else _auto_isolate_movers(timings, sf_dir)
    )
    if mover_ratios:
        out["auto_isolated_movers"] = mover_ratios
    if auto_isolated:
        out["isolated"] = auto_isolated
    if auto_skipped:
        # Every flagged mover either has an "isolated" entry or an
        # explicit reason here — the record never silently truncates
        # its own adjudication evidence (r13 verdict ask #3).
        out["auto_isolation_unadjudicated"] = auto_skipped
    if isolate_names:
        # After the battery: the same names re-measured in fresh
        # subprocesses, so future verdicts can separate battery
        # interference from a real regression with one run.
        out["isolated"] = _run_isolated(isolate_names, isolate_runs, sf_dir)
    print(json.dumps(out))
    _persist_full_battery(out)
    if superlinear:
        print(
            "SCALE GUARD FAILED: 10x games cost "
            f"{scale_guard['wall_ratio_2000_over_200']}x wall (limit 6.0)",
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
