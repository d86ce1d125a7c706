"""Graph analytics over typed vertex/edge DataFrames.

The engine models the property graph as one DataFrame per node type and
per edge type (SURVEY §1.6).  This module supplies the GraphFrames-style
analytics layer on that representation — motif chaining (J10 multi-hop
pattern joins, reference export reads src/managers/game.py:346-358,
463-481), aggregateMessages (edge-vertex join + groupBy), and the two
classic iterative algorithms (PageRank, connected components) as
driver-iterated DataFrame loops.

Scale notes: one iteration = one join + one shuffle on vertex id; lineage
is truncated every ``checkpoint_every`` iterations via
:func:`ops.lineage.truncate` — localCheckpoint on local[N], reliable
``checkpoint`` when a checkpoint dir is registered (set
``$SPARK_GRAFT_CHECKPOINT_DIR`` or call ``setCheckpointDir``; the
cluster-durability switch) — so plans stay bounded.
That is exactly how GraphFrames/GraphX execute Pregel-style steps —
nothing here is driver-side per-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from mbai_gdb_spark.ops.lineage import truncate as _ckpt, truncate_lazy as _ckpt_lazy


def motif_chain(edges: list[tuple[DataFrame, str, str]], start_alias: str = "v0") -> DataFrame:
    """Multi-hop pattern join: chain edge tables (df, src_col, dst_col)
    into paths.  Hop i's dst equi-joins hop i+1's src — a J10 5-way
    MATCH pattern is 4 chained hash joins Catalyst can reorder.

    Output columns: ``v0, v1, ..., vN`` (the path's vertex ids) plus any
    payload columns of each edge table prefixed ``e{i}_``.
    """
    out = None
    for i, (df, src, dst) in enumerate(edges):
        payload = [c for c in df.columns if c not in (src, dst)]
        sel = df.select(
            F.col(src).alias(f"v{i}"),
            F.col(dst).alias(f"v{i + 1}"),
            *[F.col(c).alias(f"e{i}_{c}") for c in payload],
        )
        out = sel if out is None else out.join(sel, f"v{i}")
    return out


def aggregate_messages(
    vertices: DataFrame,
    edges: DataFrame,
    msg,
    agg,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    to_dst: bool = True,
) -> DataFrame:
    """GraphX aggregateMessages as a join+groupBy: each edge sends
    ``msg`` (a Column over src-vertex attrs joined on the edge) to its
    dst (or src), aggregated by ``agg`` per receiving vertex."""
    sender, receiver = (src_col, dst_col) if to_dst else (dst_col, src_col)
    sv = vertices.select(
        F.col(id_col).alias("__sender__"),
        *[c for c in vertices.columns if c != id_col],
    )
    triplets = edges.join(sv, edges[sender] == sv["__sender__"])
    return (
        triplets.select(F.col(receiver).alias(id_col), msg.alias("__msg__"))
        .groupBy(id_col)
        .agg(agg(F.col("__msg__")).alias("agg_msg"))
    )


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    n_iter: int = 10,
    reset: float = 0.15,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 5,
) -> DataFrame:
    """Fixed-iteration PageRank.  Dangling mass is redistributed
    uniformly; returns (id, pagerank) summing to ~|V|."""
    v = vertices.select(id_col).distinct().transform(_ckpt)
    n = v.count()
    edges = edges.select(src_col, dst_col).transform(_ckpt)
    out_deg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("__deg__"))
    ranks = v.withColumn("rank", F.lit(1.0))
    for i in range(n_iter):
        contrib_src = (
            ranks.join(out_deg, ranks[id_col] == out_deg[src_col], "left")
            .select(
                ranks[id_col].alias("__vid__"),
                (F.col("rank") / F.col("__deg__")).alias("__share__"),
                F.when(F.col("__deg__").isNull(), F.col("rank")).otherwise(0.0).alias(
                    "__dangling__"
                ),
            )
        )
        dangling = contrib_src.agg(F.sum("__dangling__")).collect()[0][0] or 0.0
        msgs = (
            edges.join(contrib_src, edges[src_col] == F.col("__vid__"))
            .groupBy(dst_col)
            .agg(F.sum("__share__").alias("__in__"))
        )
        ranks = (
            v.join(msgs, v[id_col] == msgs[dst_col], "left")
            .select(
                v[id_col],
                (
                    F.lit(reset)
                    + F.lit(1 - reset)
                    * (F.coalesce(F.col("__in__"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.transform(_ckpt)
    return ranks.withColumnRenamed("rank", "pagerank")


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_iter: int = 40,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Min-label propagation WITH pointer doubling until fixpoint (or
    max_iter): each round a vertex adopts the smallest id among itself,
    its neighbours, and its current label's label
    (``label[label[v]]``).  Returns (id, component).

    The doubling step is what makes this safe at scale: plain
    neighbour-min needs O(diameter) rounds, so a transitive near-dup
    CHAIN longer than max_iter would silently return non-converged
    labels (and diverge from the recursive-CTE oracle).  With doubling
    the label distance halves each round — O(log diameter) — so the
    max_iter=40 ceiling covers any realistic diameter (~2^40) while
    costing nothing: the scalar convergence check exits the loop the
    round after the fixpoint.  `tests/test_graph.py` pins a 60-vertex
    chain (diameter > the old O(d) budget) to one component.

    Convergence is detected every iteration with a scalar aggregate:
    labels only ever decrease, so an unchanged sum(component) is exactly
    the fixpoint — one cheap agg on the just-checkpointed frame instead
    of a self-join diff, and no wasted blind iterations (a near-dup
    cluster graph typically converges in 3-5 rounds)."""
    sym = edges.select(src_col, dst_col).unionByName(
        edges.select(F.col(dst_col).alias(src_col), F.col(src_col).alias(dst_col))
    ).transform(_ckpt)  # joined every iteration — never recompute upstream
    comp = vertices.select(F.col(id_col), F.col(id_col).alias("component"))
    prev_sum = None
    for it in range(max_iter):
        nbr_min = (
            sym.join(comp, sym[src_col] == comp[id_col])
            .groupBy(dst_col)
            .agg(F.min("component").alias("__nbr_min__"))
        )
        new_comp = (
            comp.join(nbr_min, comp[id_col] == nbr_min[dst_col], "left")
            .select(
                comp[id_col],
                F.least(
                    F.col("component"), F.coalesce(F.col("__nbr_min__"), F.col("component"))
                ).alias("component"),
            )
        )
        if it > 0:
            # Pointer doubling: also adopt label[label[v]] — halves
            # label distance per round, so long chains converge in
            # O(log d).  Skipped in round 0 where comp is still the
            # identity map (label[label[v]] == label[v] by definition).
            lut = comp.select(
                F.col(id_col).alias("__lid__"), F.col("component").alias("__lcomp__")
            )
            new_comp = (
                new_comp.join(lut, new_comp["component"] == F.col("__lid__"), "left")
                .select(
                    new_comp[id_col],
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("__lcomp__"), F.col("component")),
                    ).alias("component"),
                )
            )
        comp = new_comp.transform(_ckpt)
        label_sum = comp.agg(F.sum("component")).collect()[0][0]
        if label_sum == prev_sum:
            break
        prev_sum = label_sum
    return comp


def bfs(
    vertices: DataFrame,
    edges: DataFrame,
    sources,
    max_hops: int = 5,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = True,
) -> DataFrame:
    """Breadth-first shortest hop counts from a set of source vertex ids.

    Frontier expansion: one join + groupBy-min per hop (the GraphFrames
    bfs shape).  Returns (id, hops) for reached vertices only; sources
    have hops = 0.  State per iteration is the visited set — partitioned
    on vertex id, lineage truncated per hop."""
    e = edges.select(src_col, dst_col)
    if not directed:
        e = e.unionByName(
            edges.select(
                F.col(dst_col).alias(src_col), F.col(src_col).alias(dst_col)
            )
        )
    e = e.transform(_ckpt)  # joined every hop — never recompute upstream
    visited = (
        vertices.select(id_col)
        .filter(F.col(id_col).isin(list(sources)))
        .withColumn("hops", F.lit(0))
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(frontier.select(F.col(id_col).alias("__f__")), e[src_col] == F.col("__f__"))
            .select(F.col(dst_col).alias(id_col))
            .distinct()
            .join(visited.select(id_col), id_col, "left_anti")
            .withColumn("hops", F.lit(hop))
        )
        nxt = nxt.transform(_ckpt)
        if not nxt.head(1):
            break
        visited = visited.unionByName(nxt).transform(_ckpt)
        frontier = nxt
    return visited


def pagerank_integer(
    vertices: DataFrame,
    edges: DataFrame,
    n_iter: int = 10,
    scale: int = 1_000_000_000,
    reset_pct: int = 15,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 5,
) -> DataFrame:
    """Fixed-iteration PageRank in SCALED INTEGER arithmetic: ranks are
    longs in units of 1/scale, shares are integer divisions, damping is
    ``(100-reset_pct) * inflow div 100``.  Every operation is an
    order-independent integer sum or a floor division, so the result is
    bit-identical across engines and partitionings — unlike float
    PageRank, it can sit behind a value-hash oracle.  Inner-join
    dynamics: nodes that receive no messages drop out (dangling mass
    evaporates rather than redistributing) — deterministic and mirrored
    exactly by the recursive-SQL formulation."""
    v = vertices.select(id_col).distinct()
    e = edges.select(src_col, dst_col).distinct().transform(_ckpt)
    deg = e.groupBy(src_col).agg(F.count(F.lit(1)).alias("__deg__"))
    ranks = v.select(F.col(id_col), F.lit(scale).cast("long").alias("rank"))
    base = reset_pct * scale // 100
    for i in range(n_iter):
        contrib = ranks.join(deg, ranks[id_col] == deg[src_col]).select(
            F.col(src_col).alias("__vid__"),
            F.expr("rank div __deg__").alias("__share__"),
        )
        msgs = (
            e.join(contrib, e[src_col] == F.col("__vid__"))
            .groupBy(dst_col)
            .agg(F.sum("__share__").alias("__in__"))
        )
        ranks = msgs.select(
            F.col(dst_col).alias(id_col),
            (
                F.lit(base)
                + F.expr(f"({100 - reset_pct} * __in__) div 100")
            ).cast("long").alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.transform(_ckpt)
    return ranks


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-vertex triangle counts: (vertex, n_triangles).

    Degree-ordered orientation (the MapReduce-era NodeIterator++ /
    Suri-Vassilvitskii scheme): canonicalize the undirected edge set,
    orient every edge from its lower-(degree, id) endpoint to the
    higher, enumerate wedges by self-joining oriented edges on their
    source, and close each wedge against the oriented edge set.  After
    orientation every vertex has out-degree <= O(sqrt(2m)), so the
    wedge join's per-key fan-out — the quantity that explodes on
    power-law graphs when you join on raw adjacency — is bounded by
    sqrt(m) whatever the degree skew; total wedge volume is <= m^1.5.
    Three hash equi-joins + one explode/groupBy; no iteration, no
    driver-side state.
    """
    u, v = F.col(src), F.col(dst)
    e = (
        edges.select(
            F.least(u, v).alias("u"), F.greatest(u, v).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        # Materialize the canonical edge set ONCE (lazy localCheckpoint
        # — computed on first use inside the query's own action, then
        # shared): `e` seeds the degree aggregation (twice, via the
        # union) AND the orientation join, and `oriented` below feeds
        # three branches — without the cuts Catalyst re-plans the whole
        # upstream edge build (typically a self-join + distinct) into
        # EVERY branch: the captured sf0.1 plan was 307 nodes / 154
        # Exchanges with zero ReusedExchange (plans/r14/
        # graph_triangle_count_before.txt), ~9 recomputations of the
        # edge subtree.  Guide §3.3: materialise the intermediate to
        # truncate the plan; r14 measured 7.7 s → see _after plan.
        .transform(_ckpt_lazy)
    )
    deg = (
        e.select(F.col("u").alias("vid"))
        .unionAll(e.select(F.col("v").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = (
        e.join(deg.withColumnRenamed("vid", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("vid", "v").withColumnRenamed("deg", "dv"), "v")
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ).transform(_ckpt_lazy)  # shared by o1 / o2 / closing (see `e` note)
    # SHUFFLE_HASH on the edge-sized build sides: the probe side of both
    # joins is wedge-volume-sized (up to m^1.5 rows) while the build
    # side is only edge-sized (m rows) — hashing the small side beats
    # sort-merge's sort of the huge probe side, and pins the strategy
    # so AQE's stats-dependent SMJ/broadcast flip-flopping (measured
    # 9.5-20 s swings on the same input; 5.6-5.8 s hinted) goes away.
    # The same asymmetry holds at any scale, so the hint is not a
    # local-mode tune.
    # r15: pin the self-join exchange's parallelism.  AQE's byte-blind
    # coalescing sized the post-shuffle partitions by the EDGE bytes
    # (~25 MB → 16 partitions) while the stage's real cost is the
    # wedge fan-out + closing probe now fused into it (measured 36 s
    # of CPU squeezed onto 16 of 32 cores after the broadcast change).
    # A user repartition is exempt from coalescing and scale-adaptive
    # (defaultParallelism = cluster cores, not a local constant); both
    # self-join sides reuse the ONE exchange.
    opart = oriented.repartition(
        oriented.sparkSession.sparkContext.defaultParallelism, "a"
    )
    o1 = opart.select(F.col("a"), F.col("b"), F.col("db"))
    o2 = opart.select(
        F.col("a"), F.col("b").alias("c"), F.col("db").alias("dc")
    )
    wedges = o1.join(o2.hint("SHUFFLE_HASH"), "a").filter(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    closing = oriented.select(F.col("a").alias("b"), F.col("b").alias("c"))
    # r15: LEFT SEMI instead of inner — `closing` is the distinct
    # canonical edge set with NO payload columns, so the inner join was
    # already an existence test (each (b, c) matches at most once);
    # semi keeps the identical row set while the build side stores
    # keys only.  Broadcasting `closing` was TRIED and measured WORSE
    # (guide §1.6 — re-measure): it did delete the wedge exchange
    # (433 MB → 0 at sf0.1) but every task then probed the FULL m-row
    # relation instead of a 1/P partition of it — stage CPU 34 s → 82 s
    # (cache-hostile random access), a net wall loss.  The partitioned
    # SHUFFLE_HASH probe keeps the per-partition build table
    # cache-resident and the same asymmetry (edge-sized build,
    # wedge-sized probe) holds at any scale.
    tri = wedges.join(closing.hint("SHUFFLE_HASH"), ["b", "c"], "left_semi")
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("vertex"))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
    checkpoint_every: int = 1,
) -> DataFrame:
    """The k-core: the maximal subgraph in which every vertex has degree
    >= k.  Output: (vertex, core_degree) — each member's degree WITHIN
    the core.

    Delta-based peel (see :func:`kcore_edges` for the formulation): at
    the fixpoint the surviving degree table IS the core-degree table —
    every removed neighbor decremented each survivor exactly once, so
    ``deg(v) = |neighbors of v still alive|`` — and the result needs
    no edge materialization or degree re-aggregation at all.  The
    k-core is unique, so the result is deterministic regardless of
    peel order."""
    adj, alive = _kcore_state(edges, src, dst)
    alive = _kcore_peel(adj, alive, k, max_iter, checkpoint_every)
    return alive.select(
        F.col("vid").alias("vertex"), F.col("deg").alias("core_degree")
    )


def _kcore_state(
    edges: DataFrame, src: str, dst: str, canonical: bool = False
) -> tuple[DataFrame, DataFrame]:
    """(adjacency, degree) state for the delta peel: the canonical
    edge set GROUPED per vertex — (vid, nbrs array), checkpointed —
    plus the initial (vid, deg) table.

    r14 (guide §2.3/§2.4): the previous state kept the bidirectional
    adjacency as 2m (vid, nbr) ROWS, so every peel round's
    delta-decrement join re-scanned 2m rows to hash-probe the (tiny)
    broadcast delta — profiled ~200 MB scanned per round at sf0.1,
    ~10× per profile.  Grouped per vertex the same information is |V|
    rows; a round now scans |V| rows and explodes ONLY the delta's
    own adjacency lists, making per-round work proportional to the
    delta's incident edges + |V| — the asymptotic the delta peel
    always claimed.  Same rows, same counts: the adjacency is
    symmetric, so counting dead-neighbor hits by exploding the DEAD
    rows' lists equals the old count over the survivor side.

    Degree-bound assumption (advice r14): collect_set packs each
    vertex's ENTIRE adjacency into one array row, so a single row is
    O(max degree).  That is the right trade for graphs whose hub
    degree is task-memory-bounded (the co-purchase graphs here cap a
    vertex's degree at Σ per-order C(basket,2) fan-ins — thousands,
    not millions); on a power-law web/social graph with 10^8-degree
    hubs, split hub rows into bounded segments first (e.g. group by
    (vid, nbr_hash % ceil(deg/seg))) or fall back to the pre-r14
    row-per-edge layout — the peel's counting logic is agnostic to
    the segmentation because decrements are summed per vid anyway."""
    if canonical:
        e = edges.select("u", "v")
    else:
        u, v = F.col(src), F.col(dst)
        # r15 (guide §2.4): NO pre-grouping distinct — the adjacency
        # groupBy below dedups via collect_set in the SAME exchange, so
        # the separate (u, v)-keyed distinct shuffle (whose
        # partitioning the vid-keyed grouping could never reuse) is
        # pure overhead.  Duplicate input pairs ride the one exchange
        # instead of paying their own; degrees (= set size) and the
        # reconstructed edge set are identical.
        e = edges.select(
            F.least(u, v).alias("u"), F.greatest(u, v).alias("v")
        ).filter(F.col("u") != F.col("v"))
    adj = (
        e.select(F.col("u").alias("vid"), F.col("v").alias("nbr"))
        .unionAll(e.select(F.col("v").alias("vid"), F.col("u").alias("nbr")))
        .groupBy("vid")
        .agg(F.collect_set("nbr").alias("nbrs"))
        .transform(_ckpt)
    )
    alive = (
        adj.select("vid", F.size("nbrs").alias("deg")).transform(_ckpt)
    )
    return adj, alive


def _kcore_peel(
    adj: DataFrame,
    alive: DataFrame,
    k: int,
    max_iter: int = 100,
    checkpoint_every: int = 1,
    n_alive: int | None = None,
) -> DataFrame:
    """Peel ``alive`` (vid, deg) to the k-core fixpoint against the
    immutable ``adj`` frame; returns the surviving degree table, whose
    ``deg`` equals each vertex's degree WITHIN the core.

    r15 (guide §1/§7.3 — driver gaps): ONE Spark job per round instead
    of two.  The old loop ran a ``newly.count()`` convergence job and
    then a separate eager-checkpoint job per round — at sf0.1 the
    profile showed ~1.9 s of pure inter-job driver gaps across ~33
    rounds of sub-150 ms stages.  Now the round's output is LAZILY
    checkpointed and a single ``count()`` both materializes it and
    yields the convergence signal: the row count changes iff the
    ``deg >= k`` filter removed something, and removing nothing also
    means the decrement side was empty, so count-unchanged ⟺ the old
    ``n_new == 0`` fixpoint test exactly.  ``n_alive`` (the incoming
    row count, if the caller already knows it — kcore_profile threads
    the previous k's count through) saves the one bootstrap count.
    The broadcast decision now uses ``n_alive`` as an upper bound for
    |newly| (newly ⊆ alive): below the 1M cutoff behavior is
    identical; above it the delta join is left to the optimizer's own
    threshold, which is where the old code's forced broadcast was
    already documented as not applying."""
    # Invariant across rounds — resolve once, not per iteration (the
    # alive plan tree grows between checkpoints).
    numeric_id = isinstance(
        alive.schema["vid"].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    )
    if n_alive is None:
        n_alive = alive.count()  # bootstrap: cheap, caller's frame is checkpointed
    converged = False
    for i in range(max_iter):
        newly = alive.filter(F.col("deg") < k).select("vid")
        # NUMERIC vertex-id deltas are <= 8 bytes each, so even a
        # full-graph cascade broadcasts a few MB and the map-side join
        # skips shuffling the adjacency frame entirely.  Wide ids
        # (UUID strings: 36+ bytes + JVM string overhead) would make a
        # forced 1M-row broadcast tens of MB per round — leave those
        # to the optimizer's own threshold.
        nd = F.broadcast(newly) if (numeric_id and n_alive <= 1_000_000) else newly
        # Explode ONLY the newly-dead vertices' adjacency lists (r14):
        # symmetric adjacency means each dead→survivor incidence is
        # counted exactly once from the dead side, identical to the
        # old survivor-side count, but the scan is |V| grouped rows
        # (hash-probed against the broadcast delta) instead of 2m
        # edge rows per round.
        dec = (
            adj.join(nd, "vid")
            .select(F.explode("nbrs").alias("vid"))
            .groupBy("vid")
            .agg(F.count(F.lit(1)).alias("dec"))
        )
        alive = alive.filter(F.col("deg") >= k).join(dec, "vid", "left").select(
            "vid",
            (F.col("deg") - F.coalesce(F.col("dec"), F.lit(0))).alias("deg"),
        )
        if (i + 1) % checkpoint_every == 0:
            alive = alive.transform(_ckpt_lazy)  # small vertex table
        n = alive.count()  # materializes the checkpoint AND checks convergence
        if n == n_alive:
            converged = True
            break
        n_alive = n
    if not converged:
        # Loop exhausted max_iter without reaching a fixpoint round.
        # Peel depth is linear in the graph (unlike CC's O(log d)
        # doubling), so a deep-cascade graph CAN outlast the budget —
        # and a silent return here would hand callers vertices with
        # deg < k and inflated core degrees.  One extra bounded scalar
        # on this path only, honoring the convergence contract.
        if alive.filter(F.col("deg") < k).limit(1).count() > 0:
            raise RuntimeError(
                f"k-core peel (k={k}) did not converge within "
                f"max_iter={max_iter} rounds; raise max_iter (peel "
                "depth is linear in cascade length)"
            )
    return alive


def kcore_profile(
    edges: DataFrame,
    ks: list[int],
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
) -> list[tuple[int, int, int]]:
    """(k, n_vertices, n_edges) for each k in ascending ``ks`` — ONE
    continuous peel: cores nest, so the k2-peel resumes from the
    k1-fixpoint's degree table over the SAME immutable adjacency
    frame.  No edge frame is ever rewritten or semi-joined and no
    degree is ever re-aggregated: ``n_edges = sum(deg) / 2`` because
    the fixpoint degrees are exactly the within-core degrees.  Driver
    traffic is one bounded scalar per peel round plus the two profile
    scalars per k."""
    if list(ks) != sorted(ks):
        raise ValueError("ks must be ascending (cores nest)")
    adj, alive = _kcore_state(edges, src, dst)
    rows = []
    n_alive = None  # first peel bootstraps its own count
    for k in ks:
        alive = _kcore_peel(adj, alive, k, max_iter, n_alive=n_alive)
        r = alive.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("deg"), F.lit(0)).alias("s"),
        ).first()
        n_alive = r.n  # the k2-peel resumes from this exact row count
        rows.append((k, r.n, r.s // 2))
    return rows


def kcore_edges(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
    checkpoint_every: int = 1,
    canonical: bool = False,
) -> DataFrame:
    """The k-core's EDGE set as canonical (u < v, distinct) pairs.

    Exposed separately from :func:`kcore` because cores NEST: for
    k2 > k1, the k2-core of G is the k2-core of the k1-core — so a
    profile over increasing k values should peel each core from the
    PREVIOUS core's (far smaller) edge frame, not from scratch
    (``canonical=True`` skips re-canonicalization on such re-peels).

    DELTA PEEL (round 7): the edge frame is IMMUTABLE through the
    peel.  State per round is only the small (vertex, degree) table:
    the round's newly-peeled set Δ joins the (bidirectional,
    checkpointed) adjacency frame ONCE to count, per surviving
    vertex, how many of its neighbors just left, and degrees are
    decremented by that count — the standard delta-based formulation
    of Matula–Beck peeling.  Per round that is one map-side broadcast
    join over the adjacency plus a tiny vertex-table update,
    replacing the old degree-reaggregation + two anti-joins + FULL
    edge-frame checkpoint.  Rounds still equal peeling depth, but
    each round's shuffle/checkpoint is proportional to |Δ's incident
    edges| and |vertices|, not |edges| — the term that made the old
    peel's cost compound with depth at 10x data (BENCH_r06 sf1:
    5.91x wall).  Δ sets are disjoint, so every removed neighbor
    decrements a survivor exactly once and the fixpoint is the same
    unique k-core.

    The returned core edge set (survivor semi-join, both endpoints)
    is eagerly checkpointed: callers scan it more than once, and its
    lineage otherwise carries the whole peel.  Callers needing only
    core DEGREES should use :func:`kcore` and profiles
    :func:`kcore_profile` — neither materializes edges at all.
    """
    adj, alive = _kcore_state(edges, src, dst, canonical=canonical)
    alive = _kcore_peel(adj, alive, k, max_iter, checkpoint_every)
    au = alive.select(F.col("vid").alias("u"))
    av = alive.select(F.col("vid").alias("v"))
    e = (
        adj.select("vid", F.explode("nbrs").alias("nbr"))
        .filter(F.col("vid") < F.col("nbr"))
        .select(F.col("vid").alias("u"), F.col("nbr").alias("v"))
    )
    return (
        e.join(au, "u", "left_semi")
        .join(av, "v", "left_semi")
        .transform(_ckpt)
    )
