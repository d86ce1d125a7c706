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

try:  # optional heavy dependency — absent in this environment
    import torch  # type: ignore
except Exception:  # pragma: no cover
    torch = None


def dense_index(nodes: DataFrame, id_col: str) -> DataFrame:
    """(id → 0-based dense index), deterministic by id order.

    row_number over an id-ordered window: one pass, no driver dict.
    For billion-node types swap for zipWithIndex-style partition offsets;
    per-game node counts make the single window fine here."""
    w = Window.orderBy(id_col)
    return nodes.select(id_col).distinct().withColumn(
        "dense_idx", F.row_number().over(w) - 1
    )


def edge_index(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    src_index: DataFrame,
    dst_index: DataFrame,
) -> np.ndarray:
    """[2, E] edge-index array in dense coordinates (the PyG contract,
    reference src/managers/game.py:435-457)."""
    s = src_index.select(
        F.col(src_index.columns[0]).alias("__src_key__"),
        F.col("dense_idx").alias("__src_idx__"),
    )
    d = dst_index.select(
        F.col(dst_index.columns[0]).alias("__dst_key__"),
        F.col("dense_idx").alias("__dst_idx__"),
    )
    resolved = (
        edges.join(s, edges[src_col] == F.col("__src_key__"))
        .join(d, edges[dst_col] == F.col("__dst_key__"))
        .select("__src_idx__", "__dst_idx__")
        .toPandas()
    )
    return resolved.to_numpy().T.astype(np.int64)


def node_features(
    nodes: DataFrame, id_col: str, feature_cols: list[str], index: DataFrame
) -> np.ndarray:
    """[N, F] float feature matrix aligned with the dense index."""
    pdf = (
        nodes.join(index, id_col)
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

    ls_idx = dense_index(lineup_stints, "stint_id")
    ps_idx = dense_index(player_stints, "player_stint_id")

    out = {
        "lineup_stint": {
            "x": node_features(
                tables["lineup_plus_minus"],
                "stint_id",
                ["clock_duration", "points_scored", "points_conceded", "plus_minus"],
                ls_idx,
            ),
            "num_nodes": lineup_stints.count(),
        },
        "player_stint": {
            "x": node_features(
                player_stints, "player_stint_id", ["clock_duration"], ps_idx
            ),
            "num_nodes": player_stints.count(),
        },
        ("player_stint", "on_court_with", "lineup_stint"): edge_index(
            edges, "player_stint_id", "stint_id", ps_idx, ls_idx
        ),
    }

    # Action node type + one typed edge tensor per relationship label
    # (reference export builds per-edge-type index tensors,
    # src/managers/game.py:435-457).
    if "actions" in tables and "action_edges" in tables:
        actions = tables["actions"]
        a_idx = dense_index(actions, "action_id")
        out["action"] = {
            "x": node_features(
                actions.withColumn("made_f", F.col("is_made").cast("double")),
                "action_id",
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
                    sub, "src_id", "action_id", ps_idx, a_idx
                )
            sub_l = action_edges.filter(
                (F.col("edge_type") == label) & (F.col("src_kind") == "lineup_stint")
            )
            if sub_l.head(1):
                out[("lineup_stint", label.lower(), "action")] = edge_index(
                    sub_l, "src_id", "action_id", ls_idx, a_idx
                )
    # Score node type + GENERATED_SCORE / NEXT edges (reference
    # MERGE_SCORES export path, src/queries/game.py:716-740).
    if "scores" in tables:
        scores = tables["scores"]
        s_idx = dense_index(scores, "score_action_id")
        out["score"] = {
            "x": node_features(
                scores,
                "score_action_id",
                ["home_score", "away_score", "margin", "global_clock"],
                s_idx,
            ),
            "num_nodes": scores.count(),
        }
        if "action" in out:
            out[("action", "generated_score", "score")] = edge_index(
                scores.select(
                    F.col("score_action_id").alias("__a__"),
                    F.col("score_action_id").alias("__s__"),
                ),
                "__a__",
                "__s__",
                dense_index(tables["actions"], "action_id"),
                s_idx,
            )
        if "score_next" in tables:
            out[("score", "next", "score")] = edge_index(
                tables["score_next"],
                "score_action_id",
                "next_score_action_id",
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
