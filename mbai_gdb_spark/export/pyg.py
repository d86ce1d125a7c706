"""Heterogeneous-graph tensor export (reference GameManager.to_pyg,
src/managers/game.py:324-656).

The reference reads each node/edge type over Bolt, builds Python dicts
mapping natural ids → dense indices, and assembles torch tensors.  Here
the dense index map is computed IN Spark (row_number over the node
frame — reference game.py:360-397 does this driver-side per type) and
only the final, already-dense arrays cross to the driver.  torch is an
optional dependency — absent (as in this container) the export emits
numpy arrays with identical shapes/dtypes, so the tensor step is a
zero-copy ``torch.from_numpy`` away.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional heavy dependency — absent in this environment
    import torch  # type: ignore
except Exception:  # pragma: no cover
    torch = None


def _as_list(cols: str | list[str]) -> list[str]:
    return [cols] if isinstance(cols, str) else list(cols)


def dense_index(
    nodes: DataFrame,
    id_cols: str | list[str],
    partition_col: str | None = None,
) -> DataFrame:
    """(key → 0-based dense index), deterministic by (partition, id)
    order.  ``id_cols`` may be composite — required for ids that are
    only unique per game (action_id, score_action_id): indexing those
    alone would collapse distinct nodes across games in a multi-game
    export.

    With ``partition_col`` (game_id) the rank window is partitioned and
    shifted by per-partition offsets (one driver-side count per game —
    the zipWithIndex recipe, same as ops.dedup.token_dictionary); no
    global single-partition sort at any node count."""
    ids = _as_list(id_cols)
    keys = ([partition_col] if partition_col and partition_col not in ids else []) + ids
    distinct = nodes.select(*keys).distinct()
    if partition_col is None:
        w = Window.orderBy(*ids)
        return distinct.withColumn("dense_idx", F.row_number().over(w) - 1)
    counts = sorted(
        (r[0], r[1])
        for r in distinct.groupBy(partition_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    offsets, acc = [], 0
    for p, n in counts:
        offsets.append((p, acc))
        acc += n
    spark = nodes.sparkSession
    # Explicit schema so an EMPTY nodes frame (zero offsets) still builds
    # a valid offsets side-table instead of failing schema inference.
    off_schema = T.StructType(
        [
            T.StructField(partition_col, distinct.schema[partition_col].dataType),
            T.StructField("__off__", T.LongType()),
        ]
    )
    off_df = spark.createDataFrame(offsets, off_schema)
    order = [c for c in ids if c != partition_col]
    w = Window.partitionBy(partition_col).orderBy(*order)
    return (
        distinct.join(F.broadcast(off_df), partition_col)
        .withColumn("dense_idx", F.row_number().over(w) - 1 + F.col("__off__"))
        .drop("__off__")
    )


def _keyed(index: DataFrame, prefix: str) -> tuple[DataFrame, list[str]]:
    keys = [c for c in index.columns if c != "dense_idx"]
    renamed = index.select(
        *[F.col(k).alias(f"{prefix}{i}") for i, k in enumerate(keys)],
        F.col("dense_idx").alias(f"{prefix}idx"),
    )
    return renamed, [f"{prefix}{i}" for i in range(len(keys))]


def edge_index(
    edges: DataFrame,
    src_cols: str | list[str],
    dst_cols: str | list[str],
    src_index: DataFrame,
    dst_index: DataFrame,
) -> np.ndarray:
    """[2, E] edge-index array in dense coordinates (the PyG contract,
    reference src/managers/game.py:435-457).  ``src_cols``/``dst_cols``
    pair positionally with the index's key columns (composite keys for
    per-game ids)."""
    src_cols, dst_cols = _as_list(src_cols), _as_list(dst_cols)
    s, s_keys = _keyed(src_index, "__s")
    d, d_keys = _keyed(dst_index, "__d")
    s_cond = [edges[c] == F.col(k) for c, k in zip(src_cols, s_keys)]
    d_cond = [edges[c] == F.col(k) for c, k in zip(dst_cols, d_keys)]
    resolved = (
        edges.join(s, on=_and_all(s_cond))
        .join(d, on=_and_all(d_cond))
        .select("__sidx", "__didx")
        .toPandas()
    )
    return resolved.to_numpy().T.astype(np.int64)


def _and_all(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def node_features(
    nodes: DataFrame,
    id_cols: str | list[str],
    feature_cols: list[str],
    index: DataFrame,
) -> np.ndarray:
    """[N, F] float feature matrix aligned with the dense index."""
    join_cols = [c for c in index.columns if c != "dense_idx"]
    pdf = (
        nodes.join(index, join_cols)
        .orderBy("dense_idx")
        .select(*feature_cols)
        .toPandas()
    )
    return pdf.to_numpy().astype(np.float64)


def to_hetero_tensors(tables: dict[str, DataFrame]) -> dict:
    """Assemble a HeteroData-shaped dict from the game-pipeline tables:
    node types with features + typed edge indices.  Returns numpy arrays
    (or torch tensors when torch is importable)."""
    lineup_stints = tables["lineup_stints"]
    player_stints = tables["player_stints"]
    edges = tables["stint_edges"]

    # Stint ids are game-prefixed strings (globally unique) but
    # action_id / score_action_id restart at 1 per game — every index is
    # therefore built on a composite (game_id, id) key with a
    # per-game-partitioned rank window, so multi-game table sets export
    # without node collapse and without a global single-partition sort.
    ls_idx = dense_index(lineup_stints, "stint_id", partition_col="game_id")
    ps_idx = dense_index(player_stints, "player_stint_id", partition_col="game_id")

    out = {
        "lineup_stint": {
            "x": node_features(
                tables["lineup_plus_minus"],
                ["game_id", "stint_id"],
                ["clock_duration", "points_scored", "points_conceded", "plus_minus"],
                ls_idx,
            ),
            "num_nodes": lineup_stints.count(),
        },
        "player_stint": {
            "x": node_features(
                player_stints,
                ["game_id", "player_stint_id"],
                ["clock_duration"],
                ps_idx,
            ),
            "num_nodes": player_stints.count(),
        },
        ("player_stint", "on_court_with", "lineup_stint"): edge_index(
            edges,
            ["game_id", "player_stint_id"],
            ["game_id", "stint_id"],
            ps_idx,
            ls_idx,
        ),
    }

    # Player node type + (Player)-[:ON_COURT]->(PlayerStint) edges
    # (reference export includes Player nodes in the stint topology
    # read, src/managers/game.py:346-358).  Bio features attach when a
    # players dimension table is supplied (S3); otherwise the node
    # carries height/weight-free unit features.
    p_idx = dense_index(player_stints, "player_id")
    if "players" in tables:
        # LEFT join from the index (all stint players) to the bio
        # dimension: a roster table missing a stint player must yield a
        # zero-filled feature row, NOT a shorter x that silently
        # misaligns every dense index after the gap.
        bio = (
            p_idx.join(
                tables["players"].select("player_id", "height_in", "weight_lb"),
                "player_id",
                "left",
            )
            .fillna(0.0, subset=["height_in", "weight_lb"])
            .orderBy("dense_idx")
            .select("height_in", "weight_lb")
            .toPandas()
        )
        out["player"] = {
            "x": bio.to_numpy().astype(np.float64),
            "num_nodes": p_idx.count(),
        }
    else:
        out["player"] = {"num_nodes": p_idx.count()}
    out[("player", "on_court", "player_stint")] = edge_index(
        player_stints,
        "player_id",
        ["game_id", "player_stint_id"],
        p_idx,
        ps_idx,
    )

    # Action node type + one typed edge tensor per relationship label
    # (reference export builds per-edge-type index tensors,
    # src/managers/game.py:435-457).
    if "actions" in tables and "action_edges" in tables:
        actions = tables["actions"]
        a_idx = dense_index(actions, "action_id", partition_col="game_id")
        out["action"] = {
            "x": node_features(
                actions.withColumn("made_f", F.col("is_made").cast("double")),
                ["game_id", "action_id"],
                ["points", "local_clock", "global_clock", "made_f"],
                a_idx,
            ),
            "num_nodes": actions.count(),
        }
        action_edges = tables["action_edges"]
        labels = [
            r.edge_type
            for r in action_edges.select("edge_type").distinct().collect()
        ]
        for label in sorted(labels):
            sub = action_edges.filter(
                (F.col("edge_type") == label) & (F.col("src_kind") == "player_stint")
            )
            if sub.head(1):
                out[("player_stint", label.lower(), "action")] = edge_index(
                    sub,
                    ["game_id", "src_id"],
                    ["game_id", "action_id"],
                    ps_idx,
                    a_idx,
                )
            sub_l = action_edges.filter(
                (F.col("edge_type") == label) & (F.col("src_kind") == "lineup_stint")
            )
            if sub_l.head(1):
                out[("lineup_stint", label.lower(), "action")] = edge_index(
                    sub_l,
                    ["game_id", "src_id"],
                    ["game_id", "action_id"],
                    ls_idx,
                    a_idx,
                )
    # Score node type + GENERATED_SCORE / NEXT edges (reference
    # MERGE_SCORES export path, src/queries/game.py:716-740).
    if "scores" in tables:
        scores = tables["scores"]
        s_idx = dense_index(scores, "score_action_id", partition_col="game_id")
        out["score"] = {
            "x": node_features(
                scores,
                ["game_id", "score_action_id"],
                ["home_score", "away_score", "margin", "global_clock"],
                s_idx,
            ),
            "num_nodes": scores.count(),
        }
        if "action" in out:
            out[("action", "generated_score", "score")] = edge_index(
                scores.select(
                    "game_id",
                    F.col("score_action_id").alias("__a__"),
                    F.col("score_action_id").alias("__s__"),
                ),
                ["game_id", "__a__"],
                ["game_id", "__s__"],
                a_idx,
                s_idx,
            )
        if "score_next" in tables:
            out[("score", "next", "score")] = edge_index(
                tables["score_next"],
                ["game_id", "score_action_id"],
                ["game_id", "next_score_action_id"],
                s_idx,
                s_idx,
            )

    if torch is not None:  # pragma: no cover
        out = {
            k: (
                {
                    kk: (torch.from_numpy(vv) if isinstance(vv, np.ndarray) else vv)
                    for kk, vv in v.items()
                }
                if isinstance(v, dict)
                else torch.from_numpy(v)
            )
            for k, v in out.items()
        }
    return out


def to_hetero_data(tensors: dict):
    """Materialize an actual ``torch_geometric.data.HeteroData`` from a
    :func:`to_hetero_tensors` result (reference GameManager.to_pyg
    returns the HeteroData object itself, src/managers/game.py:324-656).

    Mapping is 1:1 and lossless: string keys become node stores
    (``x`` → float tensor, ``num_nodes`` → int), 3-tuple keys become
    edge stores (``edge_index`` → int64 tensor).  Imports are local so
    the numpy-only export path (:func:`to_hetero_tensors`) keeps
    working in torch-free environments; calling THIS function without
    ``torch_geometric`` raises ImportError."""
    import torch as _torch  # local: optional heavy dependency
    from torch_geometric.data import HeteroData

    def _tensor(v):
        return _torch.from_numpy(v) if isinstance(v, np.ndarray) else v

    data = HeteroData()
    for key, val in tensors.items():
        if isinstance(key, tuple):
            data[key].edge_index = _tensor(val).long()
        else:
            store = data[key]
            if isinstance(val, dict):
                if "x" in val:
                    store.x = _tensor(val["x"])
                if "num_nodes" in val:
                    store.num_nodes = int(val["num_nodes"])
            else:
                store.x = _tensor(val)
    return data
