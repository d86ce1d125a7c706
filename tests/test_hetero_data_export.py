"""to_hetero_data: the tensor dict loads into a torch_geometric
HeteroData object UNCHANGED — same node stores, same edge stores, same
shapes (reference GameManager.to_pyg returns the HeteroData itself,
src/managers/game.py:324-656).

torch_geometric is not shipped in this container, so when the real
library is absent the test installs a minimal API-faithful stand-in
(``HeteroData()[key]`` returns an attribute store; tuple keys are edge
stores) and verifies the wrapper's mapping against it; with the real
library installed the very same assertions run against the genuine
object.  The stand-in mimics only documented public HeteroData
behavior used by the wrapper: item access and attribute assignment.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest


def _install_pyg_stub(monkeypatch):
    """Minimal torch + torch_geometric.data stand-ins (API subset)."""

    class FakeTensor:
        def __init__(self, arr):
            self.arr = np.asarray(arr)

        def long(self):
            return FakeTensor(self.arr.astype(np.int64))

        @property
        def shape(self):
            return self.arr.shape

        def numpy(self):
            return self.arr

    fake_torch = types.ModuleType("torch")
    fake_torch.from_numpy = lambda a: FakeTensor(a)

    class _Store:
        pass

    class HeteroData:
        def __init__(self):
            object.__setattr__(self, "stores", {})

        def __getitem__(self, key):
            return self.stores.setdefault(key, _Store())

    fake_tg = types.ModuleType("torch_geometric")
    fake_tg_data = types.ModuleType("torch_geometric.data")
    fake_tg_data.HeteroData = HeteroData
    fake_tg.data = fake_tg_data
    monkeypatch.setitem(sys.modules, "torch", fake_torch)
    monkeypatch.setitem(sys.modules, "torch_geometric", fake_tg)
    monkeypatch.setitem(sys.modules, "torch_geometric.data", fake_tg_data)
    return FakeTensor


def _unwrap(t):
    """numpy view of either a real torch tensor or the FakeTensor."""
    return t.numpy() if hasattr(t, "numpy") else np.asarray(t)


def test_hetero_data_loads_tensor_dict_unchanged(spark, monkeypatch):
    from mbai_gdb_spark.pipeline.fixtures import fixture_frames
    from mbai_gdb_spark.pipeline.plus_minus import game_pipeline
    from mbai_gdb_spark.export.pyg import to_hetero_data, to_hetero_tensors

    try:
        import torch_geometric  # noqa: F401 — real library present?
    except ImportError:
        _install_pyg_stub(monkeypatch)

    pbp, starters = fixture_frames(spark, game_id=1001, home_team=10, away_team=20)
    home = spark.createDataFrame([(1001, 10)], "game_id long, home_team_id long")
    tensors = to_hetero_tensors(game_pipeline(pbp, starters, home))
    data = to_hetero_data(tensors)

    for key, val in tensors.items():
        store = data[key]
        if isinstance(key, tuple):  # edge type → edge_index, int64, [2, E]
            got = _unwrap(store.edge_index)
            assert got.dtype == np.int64
            np.testing.assert_array_equal(got, np.asarray(val))
        else:  # node type → x (when present) + num_nodes
            if "x" in val:
                np.testing.assert_array_equal(_unwrap(store.x), np.asarray(val["x"]))
            assert store.num_nodes == int(val["num_nodes"])

    # every node/edge type made it across — nothing dropped or invented
    node_keys = {k for k in tensors if isinstance(k, str)}
    edge_keys = {k for k in tensors if isinstance(k, tuple)}
    assert {"lineup_stint", "player_stint", "player"} <= node_keys
    assert ("player_stint", "on_court_with", "lineup_stint") in edge_keys


def test_hetero_data_requires_torch_geometric():
    from mbai_gdb_spark.export.pyg import to_hetero_data

    try:
        import torch_geometric  # noqa: F401
        pytest.skip("torch_geometric installed — ImportError path untestable")
    except ImportError:
        pass
    with pytest.raises(ImportError):
        to_hetero_data({"player": {"num_nodes": 1}})
