"""Map compiler invariants (mirrors the reference's determinism tests,
tests/test_functionality/test_random_engine.py)."""
import math

import numpy as np
import pytest

from metadrive_ped_tpu.mapgen import build_scene_pack, compile_scene


def _cfg(map_cfg, density=0.0):
    return dict(map_config=map_cfg, traffic_density=density)


def lane_pos(sc, i, long, lat):
    if sc["lane_kind"][i] == 1:
        d = sc["lane_arc_dir"][i]
        phi = d * long / sc["lane_radius"][i] + sc["lane_start_phase"][i]
        r = sc["lane_radius"][i] + lat * d
        return sc["lane_p0"][i] + r * np.array([math.cos(phi), math.sin(phi)])
    dirv = sc["lane_dir"][i]
    return sc["lane_p0"][i] + long * dirv + lat * np.array([dirv[1], -dirv[0]])


def test_same_seed_same_map():
    cfg = _cfg(dict(config=3, lane_num=3, lane_width=3.5, exit_length=50), 0.1)
    a, b = compile_scene(11, cfg), compile_scene(11, cfg)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_different_seed_different_map():
    cfg = _cfg(dict(config=3, lane_num=3, lane_width=3.5, exit_length=50))
    a, b = compile_scene(1, cfg), compile_scene(2, cfg)
    assert any(
        a[k].shape != b[k].shape or not np.array_equal(a[k], b[k]) for k in a
    )


@pytest.mark.parametrize("seed", range(5))
def test_lane_chain_continuity(seed):
    cfg = _cfg(dict(config=4, lane_num=3, lane_width=3.5, exit_length=50))
    _assert_chain_continuity(compile_scene(seed, cfg))


@pytest.mark.parametrize("letters", ["X", "T", "O", "r", "R", "XOTS", "rRC"])
def test_all_block_types_compile_and_chain(letters):
    cfg = _cfg(dict(config=letters, lane_num=2, lane_width=3.5, exit_length=50), 0.1)
    sc = compile_scene(3, cfg)
    assert int(sc["route_len"][0]) >= 2
    _assert_chain_continuity(sc)


def _assert_chain_continuity(sc):
    """Successor joints must be continuous; ramp/merge lanes may jump at most
    ~1.5 lane widths diagonally (the acc-lane merge, ramp.py:190-199)."""
    for lid in range(len(sc["lane_succ"])):
        s = sc["lane_succ"][lid]
        if s < 0:
            continue
        end = lane_pos(sc, lid, sc["lane_length"][lid], 0)
        start = lane_pos(sc, s, 0, 0)
        gap = np.linalg.norm(end - start)
        assert gap < 1.5 * sc["lane_width"][lid] + 0.3, (lid, s, gap)


def test_route_is_connected():
    cfg = _cfg(dict(config="CSC", lane_num=2, lane_width=3.5, exit_length=50))
    sc = compile_scene(3, cfg)
    rr = sc["route_roads"][0][: sc["route_len"][0]]  # slot 0 route
    for a, b in zip(rr[:-1], rr[1:]):
        assert sc["road_succ"][a] == b


def test_block_sequence_letters():
    cfg = _cfg(dict(config="SS", lane_num=3, lane_width=3.5, exit_length=50))
    sc = compile_scene(0, cfg)
    # first block (2 roads x2) + 2 straight blocks (1 road x2) = 8 roads
    assert len(sc["road_lane0"]) == 8


def test_unknown_block_letter_raises():
    with pytest.raises(ValueError):
        compile_scene(0, _cfg(dict(config="Q", lane_num=3, lane_width=3.5)))


def test_pack_padding():
    cfg = _cfg(dict(config=3, lane_num=3, lane_width=3.5, exit_length=50), 0.1)
    pack = build_scene_pack([0, 1, 2, 3], cfg)
    assert pack["lane_p0"].shape[0] == 4
    # padded lanes are marked invalid
    assert pack["lane_valid"].dtype == bool
    assert (pack["route_roads"] >= -1).all()


def test_traffic_density_scales_npcs():
    cfg0 = _cfg(dict(config=3, lane_num=3, lane_width=3.5, exit_length=50), 0.0)
    cfg1 = _cfg(dict(config=3, lane_num=3, lane_width=3.5, exit_length=50), 0.3)
    assert len(compile_scene(5, cfg0)["npc_lane"]) == 0
    assert len(compile_scene(5, cfg1)["npc_lane"]) > 3


@pytest.mark.parametrize("letters", ["Y", "SYyS", "B"])
def test_bottleneck_bidirection_blocks(letters):
    cfg = _cfg(dict(config=letters, lane_num=2, lane_width=3.5, exit_length=50), 0.1)
    sc = compile_scene(2, cfg)
    assert int(sc["route_len"][0]) >= 2
    _assert_chain_continuity(sc)
