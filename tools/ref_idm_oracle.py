"""Golden generator: execute the REFERENCE's IDMPolicy decision math.

Imports /root/reference/metadrive's ``IDMPolicy`` + ``FrontBackObjects``
(policy/idm_policy.py:10-174, 303-402) with panda3d/shapely stubbed (the
decision math is pure arithmetic over neighbor states), builds a grid of
constructed ego/front/back/adjacent-lane configurations on real reference
``StraightLane`` objects, and records:

- ``acceleration`` over a (speed, front-distance, front-speed) grid,
  including the no-front and CREEP-target cases (idm_policy.py:303-311);
- ``steering_control`` over a state sequence (heading PID + lateral PID,
  PID_controller.py:10-21), exercising the PID integrator/derivative;
- ``lane_change_policy`` decisions over forced-change (lane drop),
  overtake, and lane-follow configurations: which target lane is
  returned, the creep flag (target_speed == CREEP_SPEED), and the
  (front distance, front speed) pair fed to the acceleration model.

The dump is committed as tests/goldens/ref_idm.json and pinned by
tests/test_parity_reference.py against ops/idm.py's
``idm_acceleration`` / ``lane_change_decision`` / ``_pid``.

Usage: python tools/ref_idm_oracle.py [--out tests/goldens/ref_idm.json]
"""
import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_map_oracle import REFERENCE, _stub_modules  # noqa: E402

LANE_W = 3.5
LANE_LEN = 400.0
EGO_X = 200.0


def load_reference_trajectory_idm_constants():
    """TrajectoryIDMPolicy class constants (idm_policy.py:426-446): the
    scenario reactive-traffic twin pins TRAJ_NORMAL_SPEED/IDM_MAX_DIST/
    DEST_REGION_RADIUS against these."""
    _stub_modules()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from metadrive.policy.idm_policy import TrajectoryIDMPolicy
    return dict(
        NORMAL_SPEED=TrajectoryIDMPolicy.NORMAL_SPEED,
        IDM_MAX_DIST=TrajectoryIDMPolicy.IDM_MAX_DIST,
        DEST_REGION_RADIUS=TrajectoryIDMPolicy.DEST_REGION_RADIUS,
    )


def load_reference_idm():
    _stub_modules()
    # idm_policy imports ManualControlPolicy (keyboard/wheel controllers,
    # never touched by the decision math) — stub its controller module
    import types
    from unittest import mock
    mc = types.ModuleType("metadrive.engine.core.manual_controller")
    mc.KeyboardController = mock.MagicMock()
    mc.SteeringWheelController = mock.MagicMock()
    mc.XboxController = mock.MagicMock()
    sys.modules.setdefault("metadrive.engine.core.manual_controller", mc)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from metadrive.component.lane.straight_lane import StraightLane
    from metadrive.policy.idm_policy import FrontBackObjects, IDMPolicy
    from metadrive.component.vehicle.PID_controller import PIDController
    return IDMPolicy, FrontBackObjects, StraightLane, PIDController


class FakeVehicle:
    """The slice of BaseVehicle state the IDM math reads."""

    def __init__(self, position, speed_kmh, heading_theta=0.0, lane=None):
        self.position = np.asarray(position, dtype=float)
        self.speed_km_h = float(speed_kmh)
        self.heading_theta = float(heading_theta)
        self.heading = np.array(
            [math.cos(heading_theta), math.sin(heading_theta)]
        )
        self.velocity_km_h = self.heading * self.speed_km_h
        self.lane = lane
        self.navigation = None


class FakeNavigation:
    def __init__(self, current_ref_lanes, next_ref_lanes):
        self.current_ref_lanes = current_ref_lanes
        self.next_ref_lanes = next_ref_lanes


def make_policy(IDMPolicy, PIDController, ego, routing_lane,
                overtake_timer=0):
    p = IDMPolicy.__new__(IDMPolicy)
    p.control_object = ego
    p.target_speed = IDMPolicy.NORMAL_SPEED
    p.routing_target_lane = routing_lane
    p.available_routing_index_range = None
    p.overtake_timer = overtake_timer
    p.enable_lane_change = True
    p.disable_idm_deceleration = False
    p.heading_pid = PIDController(1.7, 0.01, 3.5)
    p.lateral_pid = PIDController(0.3, 0.002, 0.05)
    return p


def make_lanes(StraightLane, n, x0=0.0, x1=LANE_LEN, road=("a", "b")):
    """n parallel lanes, index i at y = i*LANE_W (ref_lanes[0] is 'left':
    FrontBackObjects takes left_lane = ref_lanes[idx-1])."""
    lanes = []
    for i in range(n):
        lane = StraightLane([x0, i * LANE_W], [x1, i * LANE_W], LANE_W)
        lane.index = (road[0], road[1], i)
        lanes.append(lane)
    return lanes


def acceleration_grid(IDMPolicy, PIDController, StraightLane):
    """acceleration + desired_gap over a co-linear grid (heading-aligned
    front vehicles, so the reference's projected dv equals the scalar
    speed difference)."""
    lane = make_lanes(StraightLane, 1)[0]
    cases = []
    for v in [0.0, 4.0, 15.0, 28.0, 30.0, 33.0, 45.0, 60.0]:
        for target in ["normal", "creep"]:
            ego = FakeVehicle([EGO_X, 0.0], v, lane=lane)
            p = make_policy(IDMPolicy, PIDController, ego, lane)
            if target == "creep":
                p.target_speed = IDMPolicy.CREEP_SPEED
            cases.append(dict(v=v, target=target, d=None, fv=None,
                              acc=float(p.acceleration(None, 5.0))))
            for d in [0.5, 2.0, 5.2, 10.0, 14.8, 20.0, 29.5]:
                for fv in [0.0, 10.0, 28.0, 40.0]:
                    front = FakeVehicle([EGO_X + d, 0.0], fv, lane=lane)
                    cases.append(dict(
                        v=v, target=target, d=d, fv=fv,
                        acc=float(p.acceleration(front, d)),
                    ))
    return cases


def steering_sequence(IDMPolicy, PIDController, StraightLane):
    """steering_control over a 12-step trajectory beside a straight lane
    (stateful PID: integrator + derivative must match step-for-step)."""
    lane = make_lanes(StraightLane, 1)[0]
    rng = np.random.RandomState(0)
    ego = FakeVehicle([EGO_X, 0.0], 20.0, lane=lane)
    p = make_policy(IDMPolicy, PIDController, ego, lane)
    steps = []
    for _ in range(12):
        lat = float(rng.uniform(-1.5, 1.5))
        hdg = float(rng.uniform(-0.4, 0.4))
        ego.position = np.array([EGO_X, -lat])  # lateral = -y on a +x lane
        ego.heading_theta = hdg
        steps.append(dict(lat=lat, heading=hdg,
                          steering=float(p.steering_control(lane))))
    return steps


def lane_change_grid(IDMPolicy, FrontBackObjects, PIDController,
                     StraightLane):
    """lane_change_policy decisions over constructed neighbor grids.

    Each case: ego on ``ego_lane`` of ``n_lanes`` current lanes; ``objs``
    is a list of (lane_idx, dx, speed_kmh) center-offset neighbors;
    ``drop`` builds next_ref_lanes with one lane fewer, continuing either
    the left or the right subset (the reference detects the drop via
    current_lanes[0].is_previous_lane_of(next_lanes[0]))."""
    S, F = IDMPolicy.SAFE_LANE_CHANGE_DISTANCE, IDMPolicy.LANE_CHANGE_FREQ
    cases_spec = []

    # ---- forced change on lane drop (idm_policy.py:339-374) -------------
    for drop, ego_lane in [("right", 2), ("left", 0)]:
        side = "left" if drop == "right" else "right"
        for objs, label in [
            ([], "clear"),
            ([(1, -S + 1.0, 20.0)], "back_too_close"),
            ([(1, -S - 2.0, 20.0)], "back_far_enough"),
            ([(1, 4.0, 20.0)], "front_too_close"),
            ([(1, 6.0, 20.0), (1, -S - 2.0, 10.0)], "both_clear"),
            ([(ego_lane, 8.0, 5.0)], "own_front_only"),
        ]:
            cases_spec.append(dict(
                kind=f"forced_{drop}_{side}_{label}", n_lanes=3,
                ego_lane=ego_lane, v=20.0, timer=0, drop=drop, objs=objs,
            ))

    # ---- overtake (idm_policy.py:377-397) -------------------------------
    # ego 45 km/h behind a slow front car; left/right neighbors vary
    base_front = (1, 12.0, 10.0)
    for timer in [F - 10, F + 1]:
        for objs, label in [
            ([base_front], "both_sides_open"),
            ([base_front, (0, 20.0, 35.0)], "left_front_faster"),
            ([base_front, (0, 20.0, 12.0)], "left_front_slow"),
            ([base_front, (0, 20.0, 35.0), (0, -5.0, 20.0)],
             "left_front_faster_back_close_quirk"),
            ([base_front, (0, -5.0, 20.0)], "left_back_close_blocks_max"),
            ([base_front, (2, 20.0, 35.0)], "right_front_faster"),
            ([base_front, (0, 20.0, 35.0), (2, 20.0, 60.0)],
             "left_priority_over_faster_right"),
            ([base_front, (0, 5.0, 35.0)], "left_front_close_but_faster"),
        ]:
            cases_spec.append(dict(
                kind=f"overtake_{label}_t{timer}", n_lanes=3, ego_lane=1,
                v=45.0, timer=timer, drop=None, objs=objs,
            ))
    # near-NORMAL speed never overtakes; slow front near NORMAL either
    cases_spec.append(dict(kind="no_overtake_speed_near_normal", n_lanes=3,
                           ego_lane=1, v=31.0, timer=F + 1, drop=None,
                           objs=[base_front, (0, 20.0, 35.0)]))
    cases_spec.append(dict(kind="no_overtake_front_near_normal", n_lanes=3,
                           ego_lane=1, v=45.0, timer=F + 1, drop=None,
                           objs=[(1, 12.0, 29.0), (0, 20.0, 45.0)]))
    # edge lanes: no left neighbor / no right neighbor
    cases_spec.append(dict(kind="overtake_no_left_lane", n_lanes=3,
                           ego_lane=0, v=45.0, timer=F + 1, drop=None,
                           objs=[(0, 12.0, 10.0), (1, 20.0, 35.0)]))
    cases_spec.append(dict(kind="overtake_no_right_lane", n_lanes=3,
                           ego_lane=2, v=45.0, timer=F + 1, drop=None,
                           objs=[(2, 12.0, 10.0)]))
    # follow: fast ego, front present, timer below threshold handled above;
    # plain follow with no front at all -> fall-through branch
    cases_spec.append(dict(kind="follow_no_front", n_lanes=3, ego_lane=1,
                           v=45.0, timer=F + 1, drop=None, objs=[]))
    # 2-lane road: only one neighbor side ever exists
    for ego_lane, label in [(0, "right_only"), (1, "left_only")]:
        cases_spec.append(dict(
            kind=f"overtake_2lane_{label}", n_lanes=2, ego_lane=ego_lane,
            v=45.0, timer=F + 1, drop=None,
            objs=[(ego_lane, 12.0, 10.0), (1 - ego_lane, 20.0, 35.0)],
        ))
    # 2-lane forced drop (the whole neighbor axis is the target)
    cases_spec.append(dict(kind="forced_2lane_right_drop", n_lanes=2,
                           ego_lane=1, v=20.0, timer=0, drop="right",
                           objs=[]))
    # speed-increase threshold boundary: diff exactly 10 km/h must NOT
    # trigger (strict >), 10.5 must
    cases_spec.append(dict(kind="overtake_threshold_exact", n_lanes=3,
                           ego_lane=1, v=45.0, timer=F + 1, drop=None,
                           objs=[(1, 12.0, 10.0), (0, 20.0, 20.0)]))
    cases_spec.append(dict(kind="overtake_threshold_over", n_lanes=3,
                           ego_lane=1, v=45.0, timer=F + 1, drop=None,
                           objs=[(1, 12.0, 10.0), (0, 20.0, 20.5)]))
    # slow ego crawling behind a slow front (both far from NORMAL_SPEED)
    cases_spec.append(dict(kind="overtake_slow_ego", n_lanes=3, ego_lane=1,
                           v=8.0, timer=F + 1, drop=None,
                           objs=[(1, 6.0, 5.0)]))

    out = []
    for spec in cases_spec:
        lanes = make_lanes(StraightLane, spec["n_lanes"])
        if spec["drop"] is None:
            next_lanes = make_lanes(StraightLane, spec["n_lanes"],
                                    x0=LANE_LEN, x1=2 * LANE_LEN,
                                    road=("b", "c"))
        elif spec["drop"] == "right":
            # next road continues lanes [0..n-2]: current[0] connects
            next_lanes = make_lanes(StraightLane, spec["n_lanes"] - 1,
                                    x0=LANE_LEN, x1=2 * LANE_LEN,
                                    road=("b", "c"))
        else:
            # drop on the left: next road continues lanes [1..n-1]
            next_lanes = []
            for i in range(1, spec["n_lanes"]):
                lane = StraightLane([LANE_LEN, i * LANE_W],
                                    [2 * LANE_LEN, i * LANE_W], LANE_W)
                lane.index = ("b", "c", i - 1)
                next_lanes.append(lane)
        ego_lane = lanes[spec["ego_lane"]]
        ego = FakeVehicle([EGO_X, spec["ego_lane"] * LANE_W], spec["v"],
                          lane=ego_lane)
        ego.navigation = FakeNavigation(lanes, next_lanes)
        p = make_policy(IDMPolicy, PIDController, ego, ego_lane,
                        overtake_timer=spec["timer"])
        objs = [
            FakeVehicle([EGO_X + dx, li * LANE_W], fv, lane=lanes[li])
            for li, dx, fv in spec["objs"]
        ]
        front_obj, front_dist, target_lane = p.lane_change_policy(objs)
        out.append(dict(
            kind=spec["kind"], n_lanes=spec["n_lanes"],
            ego_lane=spec["ego_lane"], v=spec["v"], timer=spec["timer"],
            drop=spec["drop"], objs=spec["objs"],
            target=lanes.index(target_lane),
            creep=bool(p.target_speed == IDMPolicy.CREEP_SPEED),
            front_dist=(None if front_obj is None else float(front_dist)),
            front_speed=(None if front_obj is None
                         else float(front_obj.speed_km_h)),
        ))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "goldens", "ref_idm.json"))
    args = ap.parse_args()

    IDMPolicy, FrontBackObjects, StraightLane, PIDController = \
        load_reference_idm()
    golden = dict(
        constants=dict(
            NORMAL_SPEED=IDMPolicy.NORMAL_SPEED,
            CREEP_SPEED=IDMPolicy.CREEP_SPEED,
            MAX_SPEED=IDMPolicy.MAX_SPEED,
            LANE_CHANGE_FREQ=IDMPolicy.LANE_CHANGE_FREQ,
            LANE_CHANGE_SPEED_INCREASE=IDMPolicy.LANE_CHANGE_SPEED_INCREASE,
            SAFE_LANE_CHANGE_DISTANCE=IDMPolicy.SAFE_LANE_CHANGE_DISTANCE,
            MAX_LONG_DIST=IDMPolicy.MAX_LONG_DIST,
            DISTANCE_WANTED=IDMPolicy.DISTANCE_WANTED,
            TIME_WANTED=IDMPolicy.TIME_WANTED,
            DELTA=IDMPolicy.DELTA,
            ACC_FACTOR=IDMPolicy.ACC_FACTOR,
            DEACC_FACTOR=IDMPolicy.DEACC_FACTOR,
        ),
        acceleration=acceleration_grid(IDMPolicy, PIDController,
                                       StraightLane),
        steering=steering_sequence(IDMPolicy, PIDController, StraightLane),
        lane_change=lane_change_grid(IDMPolicy, FrontBackObjects,
                                     PIDController, StraightLane),
        trajectory_idm_constants=load_reference_trajectory_idm_constants(),
    )
    with open(args.out, "w") as f:
        json.dump(golden, f, indent=1)
    print(f"wrote {args.out}: {len(golden['acceleration'])} acceleration, "
          f"{len(golden['steering'])} steering, "
          f"{len(golden['lane_change'])} lane-change cases")


if __name__ == "__main__":
    main()
