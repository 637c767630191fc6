"""EdgeRoadNetwork — the raw-map lane graph (reference:
component/road_network/edge_road_network.py + scenario_lane.py:51-54)."""
import numpy as np

from metadrive_ped_tpu.mapgen.edge_network import (
    EdgeRoadNetwork, ScenarioLaneRec, build_edge_network
)
from metadrive_ped_tpu.scenario.description import ScenarioDescription as SD


def _lane(fid, p0, p1, n=10, entry=(), exit_=(), left=(), right=()):
    pts = np.linspace(p0, p1, n).astype(np.float32)
    return fid, {
        "type": "LANE_SURFACE_STREET", SD.POLYLINE: pts, "width": 3.5,
        SD.ENTRY: list(entry), SD.EXIT: list(exit_),
        SD.LEFT_NEIGHBORS: list(left), SD.RIGHT_NEIGHBORS: list(right),
    }


def _chain_sd():
    """a -> b -> d and a's right neighbor c -> d (two routes to d)."""
    feats = dict([
        _lane("a", (0, 0), (50, 0), exit_=("b",), right=({"id": "c"},)),
        _lane("b", (50, 0), (100, 0), entry=("a",), exit_=("d",)),
        _lane("c", (0, -3.5), (60, -3.5), exit_=("d",), left=({"id": "a"},)),
        _lane("d", (100, 0), (150, 0), entry=("b", "c")),
    ])
    # non-lane feature must be ignored
    feats["e"] = {"type": "ROAD_EDGE_BOUNDARY", SD.POLYLINE: np.zeros((4, 2))}
    return {SD.MAP_FEATURES: feats}


def test_build_and_lookup():
    net = build_edge_network(_chain_sd())
    assert set(net.graph) == {"a", "b", "c", "d"}
    lane = net.get_lane("a")
    assert isinstance(lane, ScenarioLaneRec)
    assert lane.length == 50.0
    assert net.graph["b"].entry_lanes == ["a"]
    assert net.graph["a"].exit_lanes == ["b"]


def test_shortest_path_and_neighbor_seeding():
    net = build_edge_network(_chain_sd())
    # BFS seeds the left/right neighbors BEFORE the start lane
    # (edge_road_network.py:72-74: lanes = left + right + [start]), so the
    # right neighbor's shorter route c->d wins the first yield
    assert net.shortest_path("a", "d") == ["c", "d"]
    paths = list(net.bfs_paths("a", "d"))
    assert ["c", "d"] in paths and ["a", "b", "d"] in paths
    # without a neighbor shortcut the chain route is the shortest path
    assert net.shortest_path("b", "d") == ["b", "d"]
    # unreachable -> empty
    assert net.shortest_path("d", "a") == []


def test_lane_geometry_queries():
    net = build_edge_network(_chain_sd())
    lane = net.get_lane("a")
    np.testing.assert_allclose(lane.position(25.0), [25.0, 0.0], atol=1e-5)
    long, lat = lane.local_coordinates((30.0, -2.0))
    assert abs(long - 30.0) < 1e-4
    assert abs(lat - 2.0) < 1e-4  # right of travel = positive
    x_min, x_max, y_min, y_max = net.get_bounding_box()
    assert x_min == 0.0 and x_max == 150.0
    assert y_min == -3.5 and y_max == 0.0


def test_peer_lanes_and_map_feature_roundtrip():
    net = build_edge_network(_chain_sd())
    peers = net.get_peer_lanes_from_index("a")
    assert {l.index for l in peers} == {"a", "c"}
    feats = net.get_map_features(interval=2.0)
    assert set(feats) == {"a", "b", "c", "d"}
    # exported polylines resample the lane at the requested interval
    pl = feats["a"][SD.POLYLINE]
    assert len(pl) >= 25
    np.testing.assert_allclose(pl[0], [0, 0], atol=1e-5)
    np.testing.assert_allclose(pl[-1], [50, 0], atol=1e-4)


def test_env_exposes_edge_network():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from metadrive_ped_tpu.envs.scenario_env import ScenarioEnv
    sd = _chain_sd()
    sd.update({
        SD.ID: "x", SD.VERSION: "v", SD.LENGTH: 10,
        SD.TRACKS: {
            "sdc": {
                "type": "VEHICLE",
                "state": {
                    "position": np.tile([0.0, 0.0], (10, 1)).astype(np.float32),
                    "heading": np.zeros(10, np.float32),
                    "valid": np.ones(10, bool),
                },
                "metadata": {"type": "VEHICLE", "object_id": "sdc",
                             "track_length": 10},
            }
        },
        SD.DYNAMIC_MAP_STATES: {},
        SD.METADATA: {"coordinate": "metadrive", "sdc_id": "sdc",
                      "ts": np.arange(10, dtype=np.float32) * 0.1},
    })
    env = ScenarioEnv(dict(num_envs=1, scenario_data=[sd], auto_reset=False))
    net = env.edge_network(0)
    assert net.shortest_path("b", "d") == ["b", "d"]
    assert set(net.graph) == {"a", "b", "c", "d"}
