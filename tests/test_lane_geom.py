"""Batched lane geometry vs the host (numpy) closed forms.

The host classes mirror the reference lane math
(straight_lane.py / circular_lane.py); the JAX ops must agree with them to
float32 precision everywhere the reference is defined."""
import numpy as np
import pytest

from metadrive_ped_tpu.core.structs import Scene
from metadrive_ped_tpu.mapgen import build_scene_pack
from metadrive_ped_tpu.mapgen.lanes import HostCircularLane, HostStraightLane
from metadrive_ped_tpu.mapgen.scene import compile_scene
from metadrive_ped_tpu.ops import lane_geom


@pytest.fixture(scope="module")
def scene_and_host():
    cfg = dict(map_config=dict(config="CSC", lane_num=3, lane_width=3.5, exit_length=50))
    from metadrive_ped_tpu.mapgen.big import generate_map
    network, blocks = generate_map(9, cfg["map_config"])
    host_lanes = []
    for start in network.graph:
        for end in network.graph[start]:
            host_lanes.extend(network.graph[start][end])
    pack = build_scene_pack([9], cfg)
    return Scene.from_pack(pack), host_lanes


def test_local_coordinates_match_host(scene_and_host):
    scene, host_lanes = scene_and_host
    rng = np.random.RandomState(0)
    for lid, lane in enumerate(host_lanes):
        long = rng.uniform(0, lane.length)
        lat = rng.uniform(-lane.width, lane.width)
        p = lane.position(long, lat)
        g = lane_geom.gather_lane(scene, np.array([0]), np.array([lid]))
        jl, jt = lane_geom.local_coordinates(g, np.asarray(p, np.float32)[None])
        assert abs(float(jl[0]) - long) < 1e-3, (lid, lane.kind)
        assert abs(float(jt[0]) - lat) < 1e-3, (lid, lane.kind)


def test_position_roundtrip(scene_and_host):
    scene, host_lanes = scene_and_host
    rng = np.random.RandomState(1)
    for lid, lane in enumerate(host_lanes):
        long = rng.uniform(0, lane.length)
        lat = rng.uniform(-lane.width / 2, lane.width / 2)
        g = lane_geom.gather_lane(scene, np.array([0]), np.array([lid]))
        p = lane_geom.position(g, np.array([long], np.float32), np.array([lat], np.float32))
        expected = lane.position(long, lat)
        np.testing.assert_allclose(np.asarray(p[0]), expected, atol=1e-3)


def test_heading_match(scene_and_host):
    scene, host_lanes = scene_and_host
    for lid, lane in enumerate(host_lanes):
        long = lane.length * 0.37
        g = lane_geom.gather_lane(scene, np.array([0]), np.array([lid]))
        h = float(lane_geom.heading_theta_at(g, np.array([long], np.float32))[0])
        expected = lane.heading_theta_at(long)
        diff = (h - expected + np.pi) % (2 * np.pi) - np.pi
        assert abs(diff) < 1e-3


def test_on_lane_bounds(scene_and_host):
    scene, host_lanes = scene_and_host
    lane = host_lanes[0]
    g = lane_geom.gather_lane(scene, np.array([0, 0, 0]), np.array([0, 0, 0]))
    longs = np.array([lane.length / 2, lane.length / 2, -5.0], np.float32)
    lats = np.array([0.0, lane.width, 0.0], np.float32)
    on = lane_geom.on_lane(g, longs, lats)
    assert bool(on[0]) and not bool(on[1]) and not bool(on[2])


def test_pallas_ray_segment_matches_xla():
    """ops/pallas_raycast.ray_segment_fraction_pallas is numerically
    identical to the XLA path (interpret mode off-TPU). The v5e A/B showed
    XLA at/above the Pallas kernel for every bench shape, so XLA stays the
    default; this pin keeps the escape hatch correct."""
    import numpy as np
    import jax.numpy as jnp
    from metadrive_ped_tpu.ops.raycast import ray_segment_fraction
    from metadrive_ped_tpu.ops.pallas_raycast import ray_segment_fraction_pallas
    rng = np.random.RandomState(7)
    E, R, B = 11, 12, 53
    origin = jnp.asarray(rng.uniform(-5, 5, (E, 2)), jnp.float32)
    angles = jnp.asarray(rng.uniform(-np.pi, np.pi, (E, R)), jnp.float32)
    p0 = jnp.asarray(rng.uniform(-30, 30, (E, B, 2)), jnp.float32)
    p1 = p0 + jnp.asarray(rng.uniform(-10, 10, (E, B, 2)), jnp.float32)
    valid = jnp.asarray(rng.rand(E, B) > 0.2)
    a = np.asarray(ray_segment_fraction(origin, angles, 50.0, p0, p1, valid))
    b = np.asarray(ray_segment_fraction_pallas(origin, angles, 50.0, p0, p1, valid))
    np.testing.assert_allclose(a, b, atol=1e-5)
