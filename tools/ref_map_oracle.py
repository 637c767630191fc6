"""Golden generator: run the REFERENCE's PG map topology stack headlessly.

Imports /root/reference/metadrive's BIG + block classes with panda3d/shapely
stubbed out (they are only needed for rendering/physics-body creation, not
for topology sampling), monkeypatches construct/destruct to topology-only,
and dumps per-seed map skeletons: the block sequence (type, socket, seed,
trial count, sampled config) and node-level lane geometry.

The dumps are committed as goldens in tests/goldens/ref_maps.json and pinned
by tests/test_parity_reference.py — including seeds where check_lane_on_road
rejection and BIG backtracking fire, which is exactly where a re-implemented
overlap test can silently diverge.

Usage:  python tools/ref_map_oracle.py [--seeds 0:100] [--blocks 3]
                                       [--lane-num 3] [--lane-width 3.5]
                                       [--exit-length 50] [--out FILE]
"""
import argparse
import json
import sys
import types
from unittest import mock

REFERENCE = "/root/reference"


def _stub_modules():
    """Install stand-ins for the native deps the topology path never
    actually executes (panda3d scene graph / bullet, shapely) and for the
    metadrive.engine package (whose __init__ pulls the whole ShowBase
    stack). The topology chain only touches:
      engine.physics_node (type refs), engine.asset_loader (loader None ->
      render False), engine.logger (get_logger), engine.core.physics_world
      (type ref in BIG's signature), engine.engine_utils (unused at import).
    """
    import logging

    for name in [
        "panda3d", "panda3d.core", "panda3d.bullet",
        "shapely", "shapely.geometry", "shapely.ops", "shapely.strtree",
        "cv2",
    ]:
        if name not in sys.modules:
            sys.modules[name] = mock.MagicMock()

    eng = types.ModuleType("metadrive.engine")
    eng.__path__ = []

    asset_loader = types.ModuleType("metadrive.engine.asset_loader")

    class AssetLoader:
        loader = None

        @staticmethod
        def file_path(*a, **k):
            return ""

        @classmethod
        def get_loader(cls):
            return None

        @staticmethod
        def initialized():
            return False

    asset_loader.AssetLoader = AssetLoader
    asset_loader.initialize_asset_loader = lambda *a, **k: None

    logger_mod = types.ModuleType("metadrive.engine.logger")
    logger_mod.get_logger = lambda *a, **k: logging.getLogger("ref_oracle")
    logger_mod.set_log_level = lambda *a, **k: None

    physics_node = types.ModuleType("metadrive.engine.physics_node")
    physics_node.BaseRigidBodyNode = type("BaseRigidBodyNode", (), {})
    physics_node.BaseGhostBodyNode = type("BaseGhostBodyNode", (), {})

    core = types.ModuleType("metadrive.engine.core")
    core.__path__ = []
    physics_world = types.ModuleType("metadrive.engine.core.physics_world")
    physics_world.PhysicsWorld = type("PhysicsWorld", (), {})

    engine_utils = types.ModuleType("metadrive.engine.engine_utils")
    engine_utils.get_engine = lambda: None
    engine_utils.get_global_config = lambda: {}
    engine_utils.engine_initialized = lambda: False
    engine_utils.initialize_engine = lambda *a, **k: None
    engine_utils.close_engine = lambda *a, **k: None

    # bypass metadrive/__init__.py (it imports the env zoo -> sensors ->
    # engine internals); submodule imports still resolve via __path__
    meta = types.ModuleType("metadrive")
    meta.__path__ = [REFERENCE + "/metadrive"]
    sys.modules.setdefault("metadrive", meta)

    sys.modules.setdefault("metadrive.engine", eng)
    sys.modules.setdefault("metadrive.engine.asset_loader", asset_loader)
    sys.modules.setdefault("metadrive.engine.logger", logger_mod)
    sys.modules.setdefault("metadrive.engine.physics_node", physics_node)
    sys.modules.setdefault("metadrive.engine.core", core)
    sys.modules.setdefault("metadrive.engine.core.physics_world", physics_world)
    sys.modules.setdefault("metadrive.engine.engine_utils", engine_utils)


def load_reference():
    _stub_modules()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    from metadrive.component.block.base_block import BaseBlock

    def construct_block_topo(self, root_render_np, physics_world,
                             extra_config=None, no_same_node=True,
                             attach_to_world=True):
        # reference construct_block (base_block.py:95-130) minus
        # _create_in_world/attach_to_world — success only depends on
        # _sample_topology()
        self.sample_parameters()
        self._block_objects = []
        if extra_config:
            raw_config = self.get_config(copy=True)
            raw_config.update(extra_config)
            self.update_config(raw_config)
        self._clear_topology()
        success = self._sample_topology()
        self._global_network.add(self.block_network, no_same_node)
        return success

    def destruct_block_topo(self, physics_world):
        self._clear_topology()
        self._block_objects = None
        self.sidewalks = {}
        self.crosswalks = {}

    BaseBlock.construct_block = construct_block_topo
    BaseBlock.destruct_block = destruct_block_topo
    BaseBlock.destroy = lambda self: None
    # FirstPGBlock.__init__ calls these directly (first_block.py:99-107)
    BaseBlock._create_in_world = lambda self, *a, **k: None
    BaseBlock.attach_to_world = lambda self, *a, **k: None
    BaseBlock.detach_from_world = lambda self, *a, **k: None

    from metadrive.component.algorithm.BIG import BIG, BigGenerateMethod
    from metadrive.component.road_network.node_road_network import NodeRoadNetwork
    return BIG, BigGenerateMethod, NodeRoadNetwork


def lane_geom(lane):
    """Rounded geometric fingerprint of one reference lane."""
    import numpy as np
    rec = dict(
        kind=type(lane).__name__,
        width=round(float(lane.width), 6),
        length=round(float(lane.length), 6),
        start=[round(float(x), 5) for x in np.asarray(lane.position(0, 0))],
        end=[round(float(x), 5) for x in np.asarray(lane.position(lane.length, 0))],
        line_types=[str(t) for t in lane.line_types],
    )
    if type(lane).__name__ == "CircularLane":
        rec.update(
            radius=round(float(lane.radius), 6),
            start_phase=round(float(lane.start_phase), 6),
            # CircularLane stores direction; angle sign via end_phase
            end_phase=round(float(lane.end_phase), 6),
            clockwise=bool(lane.is_clockwise()),
        )
    return rec


def dump_seed(BIG, BigGenerateMethod, NodeRoadNetwork, seed, blocks_n,
              lane_num, lane_width, exit_length):
    net = NodeRoadNetwork()
    big = BIG(lane_num, lane_width, net, mock.MagicMock(), mock.MagicMock(),
              exit_length=exit_length, random_seed=seed)
    big.generate(BigGenerateMethod.BLOCK_NUM, blocks_n)
    blocks = []
    for blk in big.blocks[1:]:
        sock = blk.pre_block_socket
        # socket index within the previous block
        blocks.append(dict(
            id=blk.ID,
            socket=int(sock.index[-1]) if isinstance(sock.index, str) else int(sock.index),
            seed=int(blk._random_seed) if hasattr(blk, "_random_seed") else int(blk.random_seed),
            trials=int(blk.number_of_sample_trial),
            config={k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in blk.get_config(copy=True).get_dict().items()},
        ))
    roads = {}
    for frm, tos in net.graph.items():
        for to, lanes in tos.items():
            roads[f"{frm}->{to}"] = [lane_geom(l) for l in lanes]
    return dict(blocks=blocks, roads=roads)


def dump_city_seed(NRN, seed, blocks_n, lane_num, lane_width, exit_length):
    """Same dump via the reference's CityBIG (component/algorithm/blocks_prob_dist
    growth over ALL blocks' unused sockets, city_map.py:26-95)."""
    from metadrive.component.algorithm.BIG import BigGenerateMethod
    from metadrive.component.map.city_map import CityBIG
    net = NRN()
    # CityBIG takes no exit_length (city_map.py:29-47) — BIG's default 50
    big = CityBIG(lane_num, lane_width, net, mock.MagicMock(), mock.MagicMock(),
                  random_seed=seed)
    big.generate(BigGenerateMethod.BLOCK_NUM, blocks_n)
    blocks = []
    for blk in big.blocks[1:]:
        blocks.append(dict(
            id=blk.ID,
            seed=int(blk._random_seed) if hasattr(blk, "_random_seed") else int(blk.random_seed),
            trials=int(blk.number_of_sample_trial),
        ))
    roads = {}
    for frm, tos in net.graph.items():
        for to, lanes in tos.items():
            roads[f"{frm}->{to}"] = [round(float(l.length), 4) for l in lanes]
    return dict(blocks=blocks, roads=roads)


def watch_local_coordinates_raise():
    """Instrument CircularLane.local_coordinates to count its 'undetermined
    phase' ValueError (circular_lane.py:92-99) firing inside the reference's
    check_lane_on_road.

    Rationale (VERDICT r3 weak #6): the TPU port's _local_coordinates_total
    (mapgen/overlap.py:83-98) counts such samples off-lane instead of
    raising; check_lane_on_road has NO try/except, so in the reference the
    raise would abort map generation entirely. This sweep verifies the
    branch never fires on seeds that survive — i.e. the port can only
    diverge on seeds that crash the reference outright.

    Returns a counter dict updated live; swallows the raise and reports the
    sample as off-lane (inf, inf) so the sweep can continue past it and
    still record that the seed WOULD have crashed the reference.
    """
    from metadrive.component.lane.circular_lane import CircularLane

    counter = {"raises": 0, "calls": 0}
    orig = CircularLane.local_coordinates

    def wrapped(self, position, only_in_lane_point=False):
        counter["calls"] += 1
        try:
            return orig(self, position)
        except ValueError:
            counter["raises"] += 1
            return float("inf"), float("inf")

    CircularLane.local_coordinates = wrapped
    return counter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="0:20")
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--lane-num", type=int, default=3)
    ap.add_argument("--lane-width", type=float, default=3.5)
    ap.add_argument("--exit-length", type=float, default=50.0)
    ap.add_argument("--city", action="store_true",
                    help="dump via the reference CityBIG instead of BIG")
    ap.add_argument("--watch-raise", action="store_true",
                    help="count CircularLane.local_coordinates 'undetermined"
                         " phase' raises per seed (VERDICT r3 weak #6 sweep)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.seeds.split(":"))

    BIG, BGM, NRN = load_reference()
    counter = watch_local_coordinates_raise() if args.watch_raise else None
    out = {}
    for seed in range(lo, hi):
        before = counter["raises"] if counter else 0
        try:
            out[str(seed)] = (
                dump_city_seed(NRN, seed, args.blocks, args.lane_num,
                               args.lane_width, args.exit_length)
                if args.city else
                dump_seed(BIG, BGM, NRN, seed, args.blocks, args.lane_num,
                          args.lane_width, args.exit_length)
            )
        except Exception as e:  # pragma: no cover - oracle diagnostics
            out[str(seed)] = dict(error=f"{type(e).__name__}: {e}")
        if counter is not None and counter["raises"] > before:
            out[str(seed)]["local_coordinates_raises"] = counter["raises"] - before
        tr = out[str(seed)].get("blocks")
        trials = [b["trials"] for b in tr] if tr else None
        print(f"seed {seed}: "
              f"{''.join(b['id'] for b in tr) if tr else out[str(seed)]}"
              f" trials={trials}", file=sys.stderr)
    if counter is not None:
        hit = {s: v["local_coordinates_raises"] for s, v in out.items()
               if "local_coordinates_raises" in v}
        print(f"[watch-raise] {counter['raises']} raises / "
              f"{counter['calls']} local_coordinates calls; seeds with "
              f"raises: {hit if hit else 'NONE'}", file=sys.stderr)
    text = json.dumps(out, indent=None, separators=(",", ":"), sort_keys=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    else:
        print(text)


if __name__ == "__main__":
    main()
