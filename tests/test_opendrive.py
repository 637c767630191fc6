"""OpenDrive (.xodr) ingest (reference: utils/opendrive/ parser +
component/opendrive_block/, exercised by test_load_carla_town.py; here a
self-written minimal parser, mapgen/opendrive.py)."""
import numpy as np
import pytest

from metadrive_ped_tpu import MetaDriveEnv
from metadrive_ped_tpu.mapgen.opendrive import build_network_from_xodr, parse_xodr

SIMPLE_XODR = """<?xml version="1.0"?>
<OpenDRIVE>
  <header revMajor="1" revMinor="4"/>
  <road name="straight" length="100.0" id="1" junction="-1">
    <link><successor elementType="road" elementId="2" contactPoint="start"/></link>
    <planView>
      <geometry s="0" x="0" y="0" hdg="0" length="100.0"><line/></geometry>
    </planView>
    <lanes>
      <laneSection s="0">
        <left>
          <lane id="1" type="driving"><width sOffset="0" a="3.5" b="0" c="0" d="0"/></lane>
        </left>
        <center><lane id="0" type="none"/></center>
        <right>
          <lane id="-1" type="driving"><width sOffset="0" a="3.5" b="0" c="0" d="0"/></lane>
          <lane id="-2" type="driving"><width sOffset="0" a="3.5" b="0" c="0" d="0"/></lane>
        </right>
      </laneSection>
    </lanes>
  </road>
  <road name="bend" length="78.54" id="2" junction="-1">
    <link><predecessor elementType="road" elementId="1" contactPoint="end"/></link>
    <planView>
      <geometry s="0" x="100" y="0" hdg="0" length="78.54"><arc curvature="0.02"/></geometry>
    </planView>
    <lanes>
      <laneSection s="0">
        <left>
          <lane id="1" type="driving"><width sOffset="0" a="3.5" b="0" c="0" d="0"/></lane>
        </left>
        <center><lane id="0" type="none"/></center>
        <right>
          <lane id="-1" type="driving"><width sOffset="0" a="3.5" b="0" c="0" d="0"/></lane>
          <lane id="-2" type="driving"><width sOffset="0" a="3.5" b="0" c="0" d="0"/></lane>
        </right>
      </laneSection>
    </lanes>
  </road>
</OpenDRIVE>
"""


@pytest.fixture()
def xodr_path(tmp_path):
    p = tmp_path / "simple.xodr"
    p.write_text(SIMPLE_XODR)
    return str(p)


def test_parse_xodr(xodr_path):
    roads = parse_xodr(xodr_path)
    assert len(roads) == 2
    assert roads[0].succ == ("2", "start")
    x, y, h = roads[0].ref_line(50.0)
    assert abs(x - 50.0) < 1e-6 and abs(y) < 1e-6
    # arc road: after a full 90 degrees (s = pi/2 / 0.02) heading is pi/2
    x2, y2, h2 = roads[1].ref_line(78.54)
    assert abs(h2 - np.pi / 2) < 1e-2


def test_network_compiles_and_routes(xodr_path):
    network, spawn_road, info = build_network_from_xodr(xodr_path)
    lanes = spawn_road.get_lanes(network)
    assert len(lanes) == 2, "two right driving lanes"
    # lane centers: right lanes at t=-1.75 and t=-5.25 of the reference line
    np.testing.assert_allclose(lanes[0].position(0, 0), [0, -1.75], atol=1e-6)
    np.testing.assert_allclose(lanes[1].position(0, 0), [0, -5.25], atol=1e-6)
    # the two roads are linked: a route from road 1 reaches road 2's end
    dists = network.bfs_distances(spawn_road.start_node)
    assert any(n.startswith("od2") for n in dists), "link must join road 2"
    # left side drives the opposite direction
    assert any(n.startswith("-od1") for n in network.graph)


def test_opendrive_env_end_to_end(xodr_path):
    env = MetaDriveEnv(dict(
        num_envs=4, num_scenarios=1, traffic_density=0.2, traffic_mode="respawn",
        map_config=dict(xodr_file=xodr_path),
    ))
    obs, info = env.reset(seed=0)
    assert obs.shape == (4, 259)
    progressed = 0.0
    for _ in range(60):
        obs, r, te, tr, inf = env.step(np.tile([0.0, 1.0], (4, 1)))
        progressed += float(np.asarray(r).sum())
    assert np.isfinite(np.asarray(obs)).all()
    assert progressed > 5.0, "driving forward on an OpenDrive map must earn driving reward"
    assert int(np.asarray(env._state.npc.active).sum()) > 0, "IDM traffic on xodr map"
