"""Procedural PG block types (host-side).

Re-implements the reference block family
(metadrive/component/pgblock/*.py) without Panda3D/Bullet: each block only
mutates a NodeRoadNetwork of HostLanes; physical geometry (lane-line and
sidewalk segments) is derived later by the scene compiler.

Block construction protocol mirrors base_block.py:95-130: sample parameters
from PARAMETER_SPACE -> _try_plug_into_previous_block() -> merge into the
global network on success.
"""
import math
from collections import OrderedDict

import numpy as np

from metadrive_ped_tpu.constants import LINE_BROKEN, LINE_CONTINUOUS, LINE_NONE, LINE_SIDE
from metadrive_ped_tpu.mapgen.lanes import (
    HostStraightLane, create_bend_straight, extend_straight_lane
)
from metadrive_ped_tpu.mapgen.network import NodeRoadNetwork, Road
from metadrive_ped_tpu.mapgen import spaces
from metadrive_ped_tpu.mapgen.spaces import Parameter


class PGBlockSocket:
    """A pair of positive/negative roads (reference: pg_block.py:19-59)."""

    def __init__(self, positive_road, negative_road):
        self.positive_road = positive_road
        self.negative_road = negative_road
        self.index = None

    def get_positive_lanes(self, network):
        return self.positive_road.get_lanes(network)

    def get_negative_lanes(self, network):
        return self.negative_road.get_lanes(network)

    def is_socket_node(self, node):
        return node in (
            self.positive_road.start_node, self.positive_road.end_node,
            self.negative_road.start_node, self.negative_road.end_node
        )


def create_road_from(lane, lane_num, road, block_network, side_line_type=LINE_SIDE,
                     center_line_type=LINE_CONTINUOUS, inner_line_type=LINE_BROKEN):
    """Clone ``lane`` laterally into lane_num lanes on ``road``.

    Geometry matches CreateRoadFrom (create_pg_block_utils.py:50-176,
    toward_smaller_lane_index=True): the given lane becomes the LAST index
    (rightmost); clones stack at successive -width lateral offsets (leftward);
    lane 0 carries the center line on its left, the given lane the side line
    on its right. Collision checking (check_lane_on_road) is skipped here —
    overlap rejection happens in the BIG FSM via polyline tests.
    """
    lanes = [lane]
    cur = lane
    width = lane.width_at(0)
    for i in range(lane_num - 1, 0, -1):
        if isinstance(cur, HostStraightLane):
            side = HostStraightLane(
                cur.position(0, -width), cur.position(cur.length, -width), cur.width, list(cur.line_types)
            )
        else:
            # toward_smaller_lane_index: leftward stacking => clockwise arcs
            # grow, counter-clockwise arcs shrink
            # (reference: create_pg_block_utils.py:113-119)
            radius2 = cur.radius + width if cur.is_clockwise() else cur.radius - width
            from metadrive_ped_tpu.mapgen.lanes import HostCircularLane
            side = HostCircularLane(
                cur.center, radius2, cur.start_phase, cur.angle, cur.is_clockwise(), cur.width,
                list(cur.line_types)
            )
        if i == 1:
            side.line_types = [center_line_type, inner_line_type]
        else:
            side.line_types = [inner_line_type, inner_line_type]
        lanes.append(side)
        cur = side
    lanes.reverse()  # index 0 = leftmost (center-line side)
    lane.line_types = [inner_line_type if lane_num > 1 else center_line_type, side_line_type]
    for l in lanes:
        block_network.add_lane(road.start_node, road.end_node, l)
    return True


def create_adverse_road(positive_road, block_network, side_line_type=LINE_SIDE,
                        center_line_type=LINE_CONTINUOUS):
    """Mirror of CreateAdverseRoad (create_pg_block_utils.py:203-260)."""
    adverse = -positive_road
    lanes = positive_road.get_lanes(block_network)
    reference_lane = lanes[-1]
    num = len(lanes) * 2
    width = reference_lane.width_at(0)
    if isinstance(reference_lane, HostStraightLane):
        start_point = reference_lane.position(reference_lane.length, -(num - 1) * width)
        end_point = reference_lane.position(0, -(num - 1) * width)
        symmetric = HostStraightLane(start_point, end_point, width, list(reference_lane.line_types))
    else:
        from metadrive_ped_tpu.mapgen.lanes import HostCircularLane
        new_clockwise = not reference_lane.is_clockwise()
        if not new_clockwise:
            radius = reference_lane.radius + (num - 1) * width
        else:
            radius = reference_lane.radius - (num - 1) * width
        symmetric = HostCircularLane(
            reference_lane.center, radius, reference_lane.end_phase, reference_lane.angle,
            new_clockwise, width, list(reference_lane.line_types)
        )
    return create_road_from(
        symmetric, len(lanes), adverse, block_network,
        side_line_type=side_line_type, center_line_type=center_line_type
    )


class PGBlock:
    ID = None
    SOCKET_NUM = 1
    PARAMETER_SPACE = {}

    def __init__(self, block_index, pre_block_socket, global_network, random_seed):
        self.block_index = block_index
        self.pre_block_socket = pre_block_socket
        self.global_network = global_network
        self.np_random = np.random.RandomState(random_seed)
        self.number_of_sample_trial = 0
        self.block_network = None
        self._sockets = OrderedDict()
        self._respawn_roads = []
        self._node_cnt = 0
        self._part_idx = 0
        self.config = {}

    # -- naming ------------------------------------------------------------
    def set_part_idx(self, idx):
        self._part_idx = idx
        self._node_cnt = 0

    def add_road_node(self):
        name = f"{self.block_index}{self.ID}{self._part_idx}_{self._node_cnt}_"
        self._node_cnt += 1
        return name

    # -- sockets -----------------------------------------------------------
    def add_sockets(self, *sockets):
        for s in sockets:
            s.index = len(self._sockets)
            self._sockets[s.index] = s

    def get_socket(self, index):
        return self._sockets[index]

    def get_socket_indices(self):
        return list(self._sockets.keys())

    def get_socket_list(self):
        return list(self._sockets.values())

    @staticmethod
    def create_socket_from_positive_road(road):
        return PGBlockSocket(road, -road)

    # -- construction ------------------------------------------------------
    @property
    def positive_basic_lane(self):
        return self.pre_block_socket.get_positive_lanes(self.global_network)[-1]

    @property
    def positive_lane_num(self):
        return len(self.pre_block_socket.get_positive_lanes(self.global_network))

    def sample_parameters(self):
        # reference: base_runnable.py:81-93 (fresh RandomState per trial)
        seed = self.np_random.randint(0, int(1e6))
        rs = np.random.RandomState(seed)
        self.config = {k: space.sample(rs) for k, space in self.PARAMETER_SPACE.items()}

    def construct(self, config=None):
        """Sample + build + merge into the global network; returns success."""
        self.number_of_sample_trial += 1
        self.sample_parameters()
        if config:
            self.config.update(config)
        self.block_network = NodeRoadNetwork()
        self._sockets = OrderedDict()
        self._respawn_roads = []
        self._node_cnt = 0
        ok = self._try_plug_into_previous_block()
        if ok:
            ok = not self._intersects_existing()
        if ok:
            self.global_network.add(self.block_network)
        return ok

    def destruct(self):
        """Remove this block's roads from the global network."""
        for start, ends in self.block_network.graph.items():
            gstart = self.global_network.graph.get(start)
            if not gstart:
                continue
            for end in list(ends.keys()):
                gstart.pop(end, None)
            if not gstart:
                self.global_network.graph.pop(start, None)

    def get_respawn_roads(self):
        return self._respawn_roads

    def get_respawn_lanes(self, network):
        return [road.get_lanes(network) for road in self._respawn_roads]

    def get_intermediate_spawn_lanes(self):
        """Positive lanes of this block usable as traffic spawn points
        (reference: base_block.py get_intermediate_spawn_lanes)."""
        lanes = []
        for start, ends in self.block_network.graph.items():
            if start.startswith("-"):
                continue
            for end, road_lanes in ends.items():
                lanes.append(road_lanes)
        return lanes

    def _try_plug_into_previous_block(self):
        raise NotImplementedError

    # -- cheap polyline overlap rejection (replaces Bullet-based
    #    check_lane_on_road, utils/pg/utils.py:37-72) -----------------------
    def _centerline_points(self, network, spacing=6.0):
        pts = []
        for start, ends in network.graph.items():
            for end, lanes in ends.items():
                for lane in lanes:
                    n = max(2, int(lane.length / spacing))
                    for i in range(n + 1):
                        pts.append(lane.position(lane.length * i / n, 0.0))
        return np.asarray(pts) if pts else np.zeros((0, 2))

    def _intersects_existing(self):
        """True if the new block's lanes run over existing drivable area."""
        new_pts = self._centerline_points(self.block_network)
        if len(new_pts) == 0:
            return False
        old_pts = self._centerline_points(self.global_network)
        if len(old_pts) == 0:
            return False
        # Ignore points near the shared socket junction.
        joint = self.pre_block_socket.positive_road.get_lanes(self.global_network)
        joint_pos = np.asarray([l.end for l in joint] + [l.start for l in joint])
        d2 = ((new_pts[:, None, :] - old_pts[None, :, :]) ** 2).sum(-1)
        near = d2.min(axis=1) < 2.0 ** 2
        if not near.any():
            return False
        near_pts = new_pts[near]
        dj = ((near_pts[:, None, :] - joint_pos[None, :, :]) ** 2).sum(-1).min(axis=1)
        return bool((dj > 25.0 ** 2).any())


class FirstPGBlock(PGBlock):
    """Spawn block (reference: pgblock/first_block.py:13-117): a 10 m
    entrance road (> to >>) plus an exit_length-10 road (>> to >>>),
    both with adverse twins."""

    NODE_1 = ">"
    NODE_2 = ">>"
    NODE_3 = ">>>"
    ID = "I"
    ENTRANCE_LENGTH = 10.0

    def __init__(self, global_network, lane_width, lane_num, length=50.0):
        super().__init__(0, None, global_network, random_seed=0)
        self.block_network = NodeRoadNetwork()
        basic = HostStraightLane(
            [0.0, 0.0], [self.ENTRANCE_LENGTH, 0.0], width=lane_width,
            line_types=[LINE_BROKEN, LINE_SIDE]
        )
        spawn_road = Road(self.NODE_1, self.NODE_2)
        create_road_from(basic, lane_num, spawn_road, self.block_network)
        create_adverse_road(spawn_road, self.block_network)

        next_lane = extend_straight_lane(basic, length - self.ENTRANCE_LENGTH, [LINE_BROKEN, LINE_SIDE])
        other_road = Road(self.NODE_2, self.NODE_3)
        create_road_from(next_lane, lane_num, other_road, self.block_network)
        create_adverse_road(other_road, self.block_network)

        self.global_network.add(self.block_network)
        socket = self.create_socket_from_positive_road(other_road)
        self.add_sockets(socket)
        self._respawn_roads = [other_road]

    def _try_plug_into_previous_block(self):
        raise RuntimeError("FirstPGBlock cannot be re-constructed")


class Straight(PGBlock):
    """reference: pgblock/straight.py"""

    ID = "S"
    PARAMETER_SPACE = spaces.STRAIGHT_SPACE

    def _try_plug_into_previous_block(self):
        self.set_part_idx(0)
        length = self.config[Parameter.length]
        basic_lane = self.positive_basic_lane
        new_lane = extend_straight_lane(basic_lane, length, [LINE_BROKEN, LINE_SIDE])
        start = self.pre_block_socket.positive_road.end_node
        end = self.add_road_node()
        socket_road = Road(start, end)
        create_road_from(new_lane, self.positive_lane_num, socket_road, self.block_network)
        create_adverse_road(socket_road, self.block_network)
        self.add_sockets(PGBlockSocket(socket_road, -socket_road))
        return True


class Curve(PGBlock):
    """reference: pgblock/curve.py — bend + straight continuation pair."""

    ID = "C"
    PARAMETER_SPACE = spaces.CURVE_SPACE

    def _try_plug_into_previous_block(self):
        self.set_part_idx(0)
        para = self.config
        basic_lane = self.positive_basic_lane
        lane_num = self.positive_lane_num

        start_node = self.pre_block_socket.positive_road.end_node
        end_node = self.add_road_node()
        positive_road = Road(start_node, end_node)
        curve, straight = create_bend_straight(
            basic_lane,
            para[Parameter.length],
            para[Parameter.radius],
            math.radians(para[Parameter.angle]),
            bool(para[Parameter.dir]),
            width=basic_lane.width,
            line_types=[LINE_BROKEN, LINE_SIDE],
        )
        create_road_from(curve, lane_num, positive_road, self.block_network)
        create_adverse_road(positive_road, self.block_network)

        start_node = end_node
        end_node = self.add_road_node()
        positive_road2 = Road(start_node, end_node)
        create_road_from(straight, lane_num, positive_road2, self.block_network)
        create_adverse_road(positive_road2, self.block_network)

        self.add_sockets(self.create_socket_from_positive_road(positive_road2))
        return True


# Registry used by BIG + the "map string" sugar
# (reference: blocks_prob_dist.py + pg_map.py parse_map_config).
PG_BLOCKS = {
    "S": Straight,
    "C": Curve,
}

# reference: blocks_prob_dist.py:22-41 BLOCK_TYPE_DISTRIBUTION_V2.
# Types not yet ported are redistributed proportionally over the implemented
# set — documented divergence until intersections/ramps/roundabout land.
BLOCK_DIST_V2 = {
    "Curve": 0.3,
    "Straight": 0.1,
    "InRampOnStraight": 0.1,
    "OutRampOnStraight": 0.1,
    "StdInterSection": 0.15,
    "StdTInterSection": 0.15,
    "Roundabout": 0.1,
}
BLOCK_NAME_TO_CLASS = {
    "Curve": Curve,
    "Straight": Straight,
}
