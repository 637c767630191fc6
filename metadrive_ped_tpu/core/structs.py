"""Pytree state structures.

The reference scatters per-object state across Python objects
(BaseVehicle fields, manager dicts). Here everything is a struct-of-arrays
pytree batched over the env axis ``[E, ...]`` (NPCs add a slot axis
``[E, N, ...]``), so one jit'd step advances all envs in lockstep.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Scene:
    """Stacked per-scenario arrays ``[S, ...]`` (see mapgen/scene.py)."""

    lane_kind: jnp.ndarray
    lane_p0: jnp.ndarray
    lane_dir: jnp.ndarray
    lane_radius: jnp.ndarray
    lane_start_phase: jnp.ndarray
    lane_arc_dir: jnp.ndarray
    lane_width: jnp.ndarray
    lane_length: jnp.ndarray
    lane_angle: jnp.ndarray
    lane_road: jnp.ndarray
    lane_idx_in_road: jnp.ndarray
    lane_succ: jnp.ndarray
    lane_left: jnp.ndarray
    lane_right: jnp.ndarray
    lane_valid: jnp.ndarray
    lane_speed_limit: jnp.ndarray  # [S, L] m/s (tollgate lanes = 3)
    lane_block: jnp.ndarray        # [S, L] ord() of the owning block ID char
    road_lane0: jnp.ndarray
    road_nlanes: jnp.ndarray
    road_negative: jnp.ndarray
    road_succ: jnp.ndarray
    road_valid: jnp.ndarray
    route_roads: jnp.ndarray   # [S, SLOT, K] per-spawn-slot checkpoint roads
    route_len: jnp.ndarray     # [S, SLOT]
    # PG traffic lights (opt-in; see mapgen/scene.py)
    light_lane: jnp.ndarray    # [S, LT]
    light_long: jnp.ndarray    # [S, LT]
    light_pos: jnp.ndarray     # [S, LT, 2]
    light_heading: jnp.ndarray  # [S, LT] lane heading at the stop line
    light_width: jnp.ndarray    # [S, LT] lane width = air-wall span
    light_offset: jnp.ndarray  # [S, LT] phase offset in steps
    light_valid: jnp.ndarray   # [S, LT]
    slot_lane: jnp.ndarray     # [S, SLOT] spawn lane id
    slot_long: jnp.ndarray     # [S, SLOT] spawn longitude
    slot_valid: jnp.ndarray    # [S, SLOT]
    seg_p0: jnp.ndarray
    seg_p1: jnp.ndarray
    seg_type: jnp.ndarray
    seg_halfwidth: jnp.ndarray
    seg_valid: jnp.ndarray
    npc_lane: jnp.ndarray
    npc_long: jnp.ndarray
    npc_class: jnp.ndarray
    npc_trigger_road: jnp.ndarray
    npc_valid: jnp.ndarray
    npc_expert: jnp.ndarray    # [S, N] expert-driven NPCs (MixedPGTraffic)
    # static traffic objects (accident scenes: cones/warnings/barriers)
    obj_pos: jnp.ndarray
    obj_heading: jnp.ndarray
    obj_len: jnp.ndarray
    obj_wid: jnp.ndarray
    obj_kind: jnp.ndarray
    obj_valid: jnp.ndarray
    # pedestrians / cyclists (spawn slots; runtime state in PedState)
    ped_lane: jnp.ndarray
    ped_lat: jnp.ndarray
    ped_long: jnp.ndarray
    ped_speed: jnp.ndarray
    ped_kind: jnp.ndarray
    ped_len: jnp.ndarray
    ped_wid: jnp.ndarray
    ped_valid: jnp.ndarray
    # packed float32 lookup tables for one-hot gathers (ops/gather.py)
    lane_table: jnp.ndarray   # [S, L, LANE_F] — see LANE_* indices below
    road_table: jnp.ndarray   # [S, R, ROAD_F]
    # lane_table prejoined with each lane's LEFT and RIGHT neighbor geometry
    # (+ the neighbor's successor id): the IDM step needs self+left+right
    # rows every step for 6 NPC slots — prejoining turns 5 one-hot
    # contractions (each generating a [E,N,S*L] compare mask, the profiled
    # top cost of the PG step at 8192 envs) into ONE wider lookup
    lane_nbr_table: jnp.ndarray  # [S, L, LANE_F + 2*NBR_F]
    # flattened route views for fast (scenario, slot) row gathers
    route_flat: jnp.ndarray      # [S*SLOT, K]
    route_len_flat: jnp.ndarray  # [S*SLOT]
    # int16-quantized boundary-segment endpoints (offsets from seg_origin at
    # seg_scale m/unit): the per-env row gathers [E,B,2] of seg_p0/seg_p1
    # move half the HBM bytes; the dequant affine fuses into the consumers
    # (same move as the scenario route tables, commit c49d886)
    seg_p0_q: jnp.ndarray     # [S, B, 2] int16
    seg_p1_q: jnp.ndarray     # [S, B, 2] int16
    seg_origin: jnp.ndarray   # [S, 2] float32
    seg_scale: jnp.ndarray    # [S] float32 (>= 0.025 m; grows for huge maps)
    # spawn poses precomputed host-side (spawn lane ids + longitudes are
    # static per scenario, so the pose is too): the auto-reset merge runs
    # every step, and computing these poses in-kernel cost two one-hot
    # lane-table contractions per step (profiled ~95 us/step at 8192 envs)
    npc_spawn_pos: jnp.ndarray      # [S, N, 2]
    npc_spawn_heading: jnp.ndarray  # [S, N]
    slot_pos: jnp.ndarray           # [S, SLOT, 2]
    slot_heading: jnp.ndarray       # [S, SLOT]

    @classmethod
    def from_pack(cls, pack: dict) -> "Scene":
        arrays = {k: jnp.asarray(np.asarray(v)) for k, v in pack.items()}
        lane_cols = [
            pack["lane_kind"], pack["lane_p0"][..., 0], pack["lane_p0"][..., 1],
            pack["lane_dir"][..., 0], pack["lane_dir"][..., 1], pack["lane_radius"],
            pack["lane_start_phase"], pack["lane_arc_dir"], pack["lane_width"],
            pack["lane_length"], pack["lane_angle"], pack["lane_road"],
            pack["lane_idx_in_road"], pack["lane_succ"], pack["lane_left"],
            pack["lane_right"], pack["lane_valid"],
            pack["lane_speed_limit"], pack["lane_block"],
        ]
        arrays["lane_table"] = jnp.asarray(
            np.stack([np.asarray(c, np.float32) for c in lane_cols], axis=-1)
        )
        road_cols = [
            pack["road_lane0"], pack["road_nlanes"], pack["road_negative"], pack["road_succ"],
        ]
        arrays["road_table"] = jnp.asarray(
            np.stack([np.asarray(c, np.float32) for c in road_cols], axis=-1)
        )
        rr = np.asarray(pack["route_roads"])
        S, SLOT, K = rr.shape
        arrays["route_flat"] = jnp.asarray(rr.reshape(S * SLOT, K))
        arrays["route_len_flat"] = jnp.asarray(
            np.asarray(pack["route_len"]).reshape(S * SLOT)
        )

        # prejoined neighbor geometry (see field comment above)
        lt = np.asarray(arrays["lane_table"])            # [S, L, LANE_F]
        L = lt.shape[1]
        s_col = np.arange(S)[:, None]

        def nbr_block(ids):
            ids = np.asarray(ids, np.int64)
            rows = lt[s_col, np.clip(ids, 0, L - 1)][..., NBR_GEOM_COLS]
            rows[ids < 0] = 0.0
            rows[..., NBR_F - 1] = np.where(ids < 0, -1.0, rows[..., NBR_F - 1])
            return rows

        arrays["lane_nbr_table"] = jnp.asarray(np.concatenate(
            [lt, nbr_block(pack["lane_left"]), nbr_block(pack["lane_right"])],
            axis=-1,
        ).astype(np.float32))

        # int16 segment quantization (per-scene origin + adaptive scale)
        p0 = np.asarray(pack["seg_p0"], np.float32)      # [S, B, 2]
        p1 = np.asarray(pack["seg_p1"], np.float32)
        both = np.concatenate([p0, p1], axis=1) if p0.shape[1] else p0
        if both.shape[1]:
            # padding rows (seg_valid False) must not widen the span: clamp
            # them to the valid extent before computing origin/scale
            valid2 = np.concatenate(
                [np.asarray(pack["seg_valid"], bool)] * 2, axis=1
            )[..., None]                                 # [S, 2B, 1]
            any_valid = valid2.any(axis=(1, 2), keepdims=True)
            big = np.float32(np.inf)
            lo = np.where(any_valid[:, 0],
                          np.where(valid2, both, big).min(axis=1), 0.0)
            hi = np.where(any_valid[:, 0],
                          np.where(valid2, both, -big).max(axis=1), 0.0)
            origin = (lo + hi) / 2
            span = np.abs(hi - origin).max(axis=1)       # [S]
        else:
            origin = np.zeros((p0.shape[0], 2), np.float32)
            span = np.zeros(p0.shape[0], np.float32)
        scale = np.maximum(0.025, span / 32000.0).astype(np.float32)
        # clip (don't wrap) so out-of-extent padding rows can't alias onto
        # real coordinates; consumers also mask with seg_valid
        quant = lambda p: np.clip(np.round(
            (p - origin[:, None, :]) / scale[:, None, None]
        ), -32767, 32767).astype(np.int16)
        arrays["seg_p0_q"] = jnp.asarray(quant(p0))
        arrays["seg_p1_q"] = jnp.asarray(quant(p1))
        arrays["seg_origin"] = jnp.asarray(origin.astype(np.float32))
        arrays["seg_scale"] = jnp.asarray(scale)

        # host-side spawn poses (numpy twin of lane_geom.position /
        # heading_theta_at at lateral 0)
        def lane_pose(ids, longs):
            ids = np.asarray(ids, np.int64)
            longs = np.asarray(longs, np.float32)
            rows = lt[s_col, np.clip(ids, 0, L - 1)]
            kind = rows[..., LANE_KIND]
            p0xy = rows[..., LANE_P0X:LANE_P0Y + 1]
            dirv = rows[..., LANE_DIRX:LANE_DIRY + 1]
            radius = np.maximum(rows[..., LANE_RADIUS], 1e-6)
            phase0 = rows[..., LANE_START_PHASE]
            arc = rows[..., LANE_ARC_DIR]
            pos_s = p0xy + longs[..., None] * dirv
            head_s = np.arctan2(dirv[..., 1], dirv[..., 0])
            phi = arc * longs / radius + phase0
            pos_c = p0xy + radius[..., None] * np.stack(
                [np.cos(phi), np.sin(phi)], axis=-1
            )
            head_c = phi + 0.5 * np.pi * arc
            from metadrive_ped_tpu.constants import LANE_CIRCULAR
            circ = kind == float(LANE_CIRCULAR)
            pos = np.where(circ[..., None], pos_c, pos_s).astype(np.float32)
            head = np.where(circ, head_c, head_s).astype(np.float32)
            return pos, head

        npos, nhead = lane_pose(pack["npc_lane"], pack["npc_long"])
        arrays["npc_spawn_pos"] = jnp.asarray(npos)
        arrays["npc_spawn_heading"] = jnp.asarray(nhead)
        spos, shead = lane_pose(pack["slot_lane"], pack["slot_long"])
        arrays["slot_pos"] = jnp.asarray(spos)
        arrays["slot_heading"] = jnp.asarray(shead)
        return cls(**arrays)

    def seg_points(self, sidx):
        """Dequantized per-env segment endpoints (p0 [E,B,2], p1 [E,B,2]).

        The row gathers read int16; the affine dequant fuses into consumers."""
        origin = self.seg_origin[sidx][:, None, :]
        scale = self.seg_scale[sidx][:, None, None]
        p0 = origin + self.seg_p0_q[sidx].astype(jnp.float32) * scale
        p1 = origin + self.seg_p1_q[sidx].astype(jnp.float32) * scale
        return p0, p1

    @property
    def num_scenarios(self):
        return self.lane_kind.shape[0]

    @property
    def max_lanes(self):
        return self.lane_kind.shape[1]

    @property
    def max_npcs(self):
        return self.npc_lane.shape[1]


# lane_table column indices
LANE_KIND, LANE_P0X, LANE_P0Y, LANE_DIRX, LANE_DIRY, LANE_RADIUS, \
    LANE_START_PHASE, LANE_ARC_DIR, LANE_WIDTH, LANE_LENGTH, LANE_ANGLE, \
    LANE_ROAD, LANE_IDX_IN_ROAD, LANE_SUCC, LANE_LEFT, LANE_RIGHT, LANE_VALID, \
    LANE_SPEED_LIMIT, LANE_BLOCK = range(19)
LANE_F = 19

# columns of one neighbor block in lane_nbr_table (geometry the IDM gap
# search needs of a left/right lane, + its successor id — SUCC must stay
# last, from_pack writes the missing-neighbor sentinel there)
NBR_GEOM_COLS = [
    LANE_KIND, LANE_P0X, LANE_P0Y, LANE_DIRX, LANE_DIRY, LANE_RADIUS,
    LANE_START_PHASE, LANE_ARC_DIR, LANE_WIDTH, LANE_LENGTH, LANE_ANGLE,
    LANE_SUCC,
]
NBR_F = len(NBR_GEOM_COLS)

# road_table column indices
ROAD_LANE0, ROAD_NLANES, ROAD_NEGATIVE, ROAD_SUCC = range(4)


@struct.dataclass
class VehicleParams:
    """Per-vehicle-class dynamics parameters, batched alongside the vehicle."""

    length: jnp.ndarray
    width: jnp.ndarray
    accel_gain: jnp.ndarray      # full-throttle acceleration [m/s^2]
    brake_gain: jnp.ndarray      # full-brake deceleration [m/s^2]
    max_steer_rad: jnp.ndarray   # max road-wheel angle [rad]
    max_speed_kmh: jnp.ndarray
    wheelbase_eff: jnp.ndarray   # effective wheelbase of the validated
                                 # bicycle fit (reference: bicycle_model.py:46)


@struct.dataclass
class EgoState:
    pos: jnp.ndarray            # [E,2]
    heading: jnp.ndarray        # [E]
    speed: jnp.ndarray          # [E] signed m/s (negative = reversing)
    vel_dir: jnp.ndarray        # [E] slip angle beta (bicycle_model.py:32)
    steering: jnp.ndarray       # [E] normalized applied steering
    throttle: jnp.ndarray       # [E] normalized throttle/brake
    last_action: jnp.ndarray    # [E,2] action at t-1 (deque slot 0)
    current_action: jnp.ndarray  # [E,2] action at t (deque slot 1)
    last_pos: jnp.ndarray       # [E,2]
    last_heading: jnp.ndarray   # [E]
    lane: jnp.ndarray           # [E] current lane id
    route_idx: jnp.ndarray      # [E] checkpoint index into route_roads
    slot: jnp.ndarray           # [E] spawn-slot index (selects the route)
    on_lane: jnp.ndarray        # [E] bool
    crash_vehicle: jnp.ndarray  # [E] bool
    crash_object: jnp.ndarray   # [E] bool
    crash_human: jnp.ndarray    # [E] bool
    crash_building: jnp.ndarray  # [E] bool (toll booths etc.)
    crash_sidewalk: jnp.ndarray  # [E] bool
    on_yellow_line: jnp.ndarray  # [E] bool
    on_white_line: jnp.ndarray   # [E] bool
    out_of_route: jnp.ndarray    # [E] bool
    past_pos: jnp.ndarray        # [E, PAST_POS_STEPS, 2] ego position history
    break_down: jnp.ndarray      # [E] fault injection: broken-down vehicles
                                 # ignore their actions (set_break_down,
                                 # base_vehicle.py:939-941)
    params: VehicleParams        # [E] fields


PAST_POS_STEPS = 10


@struct.dataclass
class NpcState:
    pos: jnp.ndarray            # [E,N,2]
    heading: jnp.ndarray        # [E,N]
    speed: jnp.ndarray          # [E,N]
    vel_dir: jnp.ndarray        # [E,N]
    lane: jnp.ndarray           # [E,N] routing target lane
    active: jnp.ndarray        # [E,N] bool — spawned and alive
    released: jnp.ndarray      # [E,N] bool — trigger fired (Trigger mode)
    heading_pid_i: jnp.ndarray  # [E,N] PID integrator
    heading_pid_e: jnp.ndarray  # [E,N] PID previous error
    lateral_pid_i: jnp.ndarray  # [E,N]
    lateral_pid_e: jnp.ndarray  # [E,N]
    overtake_timer: jnp.ndarray  # [E,N] steps since last lane change
    params: VehicleParams       # [E,N] fields


@struct.dataclass
class PedState:
    """Pedestrians/cyclists walk in lane-arc coordinates along their
    sidewalk/edge line; world pose is derived per step."""

    long: jnp.ndarray           # [E,P] arc-length position
    direction: jnp.ndarray      # [E,P] +1 along lane, -1 against
    active: jnp.ndarray         # [E,P]


@struct.dataclass
class SimState:
    rng: jnp.ndarray            # [E,2] per-env PRNG key data
    sidx: jnp.ndarray           # [E] scenario index into Scene arrays
    step_count: jnp.ndarray     # [E] episode length so far
    episode_reward: jnp.ndarray  # [E]
    episode_cost: jnp.ndarray    # [E]
    episode_energy: jnp.ndarray  # [E] fuel use in mL (base_vehicle.py:259-271)
    dead_timer: jnp.ndarray      # [E] MARL delay-done countdown (0 = alive)
    scenario_cap: jnp.ndarray    # [E] auto-reset samples sidx in [0, cap) —
                                 # a TRACED value so curriculum level-ups
                                 # never trigger a recompile (the reference
                                 # narrows the band via engine re-seed,
                                 # scenario_curriculum_manager.py:38-84)
    aux: jnp.ndarray             # [E, 4] env-family-specific counters
                                 # (e.g. tollgate stay time); zeroed on spawn
    policy_state: jnp.ndarray    # [E, 4] agent-policy PID/latch state
                                 # (lane-change PIDs, AI-protector takeover)
    ego: EgoState
    npc: NpcState
    ped: PedState

    @property
    def num_envs(self):
        return self.sidx.shape[0]
