"""Pytree structures for the scenario (log-replay) path."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from metadrive_ped_tpu.core.structs import EgoState

TRK_VEHICLE = 0
TRK_PEDESTRIAN = 1
TRK_CYCLIST = 2


@struct.dataclass
class ScenarioScene:
    """Stacked per-scenario replay arrays [S, ...] (mapgen/scenario_scene.py).

    Mirrors what the reference reconstructs per episode from a
    ScenarioDescription (manager/scenario_map_manager.py +
    scenario_traffic_manager.py), flattened for lockstep replay.
    """

    sdc_pts: jnp.ndarray       # [S, PT, 2] ego reference trajectory
    sdc_npts: jnp.ndarray      # [S]
    sdc_track_pos: jnp.ndarray      # [S, T, 2] recorded ego time series
    sdc_track_heading: jnp.ndarray  # [S, T]
    sdc_track_valid: jnp.ndarray    # [S, T]
    trk_pos: jnp.ndarray       # [S, TRK, T, 2]
    trk_heading: jnp.ndarray   # [S, TRK, T]
    trk_valid: jnp.ndarray     # [S, TRK, T]
    trk_npts: jnp.ndarray      # [S, TRK] valid point count per track
    trk_arclen: jnp.ndarray    # [S, TRK, T] static cumulative arc length
    sdc_arclen: jnp.ndarray    # [S, PT] static cumulative arc length
    trk_len: jnp.ndarray       # [S, TRK]
    trk_wid: jnp.ndarray       # [S, TRK]
    trk_kind: jnp.ndarray      # [S, TRK] TRK_* codes
    trk_first_t: jnp.ndarray   # [S, KR] first recorded-valid timestep
    # TrajectoryIDM eligibility, precomputed against the recorded sdc pose at
    # the track's first valid step (scenario_traffic_manager.py:217-235:
    # route > 5 m, spawns behind the ego within 15 m laterally, heading
    # within pi/2). Eligible tracks sort FIRST on the track axis and the
    # reactive tables cover only the leading KR slots (KR = max eligible
    # count, rounded up to the act-batch size) — the reference instantiates
    # IDM policies per eligible vehicle only
    trk_reactive_ok: jnp.ndarray  # [S, KR] bool
    scenario_len: jnp.ndarray  # [S] valid timesteps
    # map-feature lane network (ScenarioMap builds ScenarioLane PointLanes
    # from map_features, component/map/scenario_map.py:9 +
    # scenario_block.py:25-31); resampled centerlines for ego on-lane
    # localization (need_lane_localization)
    lane_pts: jnp.ndarray      # [S, LN, LP, 2]
    lane_npts: jnp.ndarray     # [S, LN]
    lane_width: jnp.ndarray    # [S, LN]
    lane_valid: jnp.ndarray    # [S, LN]
    lane_arclen: jnp.ndarray   # [S, LN, LP]
    seg_p0: jnp.ndarray        # [S, B, 2] map boundary segments
    seg_p1: jnp.ndarray
    seg_type: jnp.ndarray
    seg_halfwidth: jnp.ndarray
    seg_valid: jnp.ndarray
    light_pos: jnp.ndarray      # [S, LG, 2] stop points
    light_status: jnp.ndarray   # [S, LG, T] 0 unknown / 1 green / 2 yellow / 3 red
    light_valid: jnp.ndarray    # [S, LG]
    sdc_start_pos: jnp.ndarray     # [S,2]
    sdc_start_heading: jnp.ndarray  # [S]
    # time-major flattened copies: per-step pose lookups become pure row
    # gathers a[sidx * T + t] (the TPU fast path) instead of one-hot
    # contractions over the T axis (profiled as multiply_reduce hotspots)
    # fixed-spacing resampled routes (TRK_SPACING_M chords) — reactive
    # traffic pose/probe lookups are one one-hot each (polyline.uniform_*).
    # Stored as int16 offsets from trk_uorigin at UPATH_QUANT resolution so
    # the per-env gather + contractions move half the bytes (TPU HBM is the
    # bottleneck); dequantization fuses into the one-hot reduce
    trk_upath_q: jnp.ndarray      # [S, KR, P5, 2] int16
    trk_uorigin: jnp.ndarray      # [S, KR, 2] float32
    trk_unpts: jnp.ndarray        # [S, KR]
    trk_utotal: jnp.ndarray       # [S, KR]
    trk_pos_t: jnp.ndarray        # [S*T, TRK, 2]
    trk_heading_t: jnp.ndarray    # [S*T, TRK]
    trk_valid_t: jnp.ndarray      # [S*T, TRK]
    trk_speed_t: jnp.ndarray      # [S*T, TRK] recorded body speed (IDM front
                                  # candidates expose their true speed)
    trk_spawn_speed: jnp.ndarray  # [S, KR] recorded speed at first_t —
                                  # reactive cars start at their recorded
                                  # velocity like log-spawned IDM vehicles
    light_status_t: jnp.ndarray   # [S*T, LG]
    sdc_pos_t: jnp.ndarray        # [S*T, 2]
    sdc_heading_t: jnp.ndarray    # [S*T]
    # int16-quantized boundary segments (offsets from seg_origin at
    # seg_scale m/unit): the per-env [E,B,2] row gathers in the line-flag
    # and detector paths move half the HBM bytes (same move as the PG
    # Scene, core/structs.py)
    seg_p0_q: jnp.ndarray      # [S, B, 2] int16
    seg_p1_q: jnp.ndarray      # [S, B, 2] int16
    seg_origin: jnp.ndarray    # [S, 2] float32
    seg_scale: jnp.ndarray     # [S] float32

    @classmethod
    def from_pack(cls, pack):
        arrays = {k: jnp.asarray(np.asarray(v)) for k, v in pack.items()}
        p0 = np.asarray(pack["seg_p0"], np.float32)
        p1 = np.asarray(pack["seg_p1"], np.float32)
        both = np.concatenate([p0, p1], axis=1) if p0.shape[1] else p0
        if both.shape[1]:
            origin = (both.min(axis=1) + both.max(axis=1)) / 2
            span = np.abs(both - origin[:, None, :]).max(axis=(1, 2))
        else:
            origin = np.zeros((p0.shape[0], 2), np.float32)
            span = np.zeros(p0.shape[0], np.float32)
        scale = np.maximum(0.025, span / 32000.0).astype(np.float32)
        quant = lambda p: np.round(
            (p - origin[:, None, :]) / scale[:, None, None]
        ).astype(np.int16)
        arrays["seg_p0_q"] = jnp.asarray(quant(p0))
        arrays["seg_p1_q"] = jnp.asarray(quant(p1))
        arrays["seg_origin"] = jnp.asarray(origin.astype(np.float32))
        arrays["seg_scale"] = jnp.asarray(scale)
        return cls(**arrays)

    def seg_points(self, sidx):
        """Dequantized per-env segment endpoints (p0, p1), each [E, B, 2]."""
        origin = self.seg_origin[sidx][:, None, :]
        scale = self.seg_scale[sidx][:, None, None]
        p0 = origin + self.seg_p0_q[sidx].astype(jnp.float32) * scale
        p1 = origin + self.seg_p1_q[sidx].astype(jnp.float32) * scale
        return p0, p1

    @property
    def num_scenarios(self):
        return self.sdc_npts.shape[0]

    @property
    def max_tracks(self):
        return self.trk_pos.shape[1]


@struct.dataclass
class ScenarioSimState:
    rng: jnp.ndarray
    sidx: jnp.ndarray
    step_count: jnp.ndarray
    episode_reward: jnp.ndarray
    episode_cost: jnp.ndarray
    scenario_cap: jnp.ndarray  # [E] auto-reset sidx bound (traced; see
                               # core/structs.py SimState.scenario_cap)
    ego: EgoState              # route_idx/slot/lane unused on this path
    last_long: jnp.ndarray     # [E] trajectory longitude at t-1
    cur_long: jnp.ndarray      # [E]
    cur_lat: jnp.ndarray       # [E]
    # reactive-traffic state (TrajectoryIDMPolicy): arc position + speed on
    # each track's own recorded path; npc_acc carries the last committed IDM
    # acceleration between act batches (staggered speed control,
    # scenario_traffic_manager.py:75 episode_step % IDM_ACT_BATCH_SIZE);
    # npc_dead marks vehicles cleaned at arrive_destination
    # (idm_policy.py:449-455 DEST_REGION_RADIUS)
    npc_long: jnp.ndarray      # [E, TRK]
    npc_speed: jnp.ndarray     # [E, TRK]
    npc_acc: jnp.ndarray       # [E, TRK]
    npc_dead: jnp.ndarray      # [E, TRK] bool
    # carried uniform-path pose — invariant: the pose at arc npc_long on the
    # track's fixed-spacing route. npc_long only advances inside the reactive
    # traffic step, so the pose is computed ONCE there (after the advance)
    # and reused everywhere else (candidate set, contacts, lidar, obs):
    # halves the full-width one-hot route contractions per step
    npc_upos: jnp.ndarray      # [E, TRK, 2]
    npc_uheading: jnp.ndarray  # [E, TRK]
    # global act-batch phase (scalar): on each step only tracks with
    # k % IDM_ACT_BATCH_SIZE == phase recompute their IDM acceleration —
    # the batched twin of the reference's round-robin policy_index
    # (scenario_traffic_manager.py:75); a global counter rather than
    # per-env episode_step so the fresh batch is ONE dynamic slice instead
    # of a per-env mask over all tracks (5x less front-gap work)
    phase: jnp.ndarray         # [] int32
