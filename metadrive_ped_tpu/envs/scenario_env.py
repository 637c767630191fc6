"""ScenarioEnv — log replay of ScenarioDescription datasets (vectorized).

Reference: metadrive/envs/scenario_env.py:21-357 + the scenario managers
(manager/scenario_*.py). Every env replays one scenario: traffic follows its
recorded tracks frame by frame (ReplayTrafficParticipantPolicy,
policy/replay_policy.py:10-68) or, with reactive_traffic, IDM speed control
along the recorded path (TrajectoryIDMPolicy, idm_policy.py:426-493); the
ego is RL-controlled and navigated along the recorded sdc trajectory
(TrajectoryNavigation, navigation_module/trajectory_navigation.py).

Observation layout (reference formula, 161 dims with the default config):
  12 side-detector rays + 6 ego core + 1 lane-lateral = 19
  trajectory navi 10 waypoints x 2 + (lateral, heading-diff) = 22
  lidar 120
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from metadrive_ped_tpu.config import Config
from metadrive_ped_tpu.constants import (
    OBS_MAX_STEERING, SEG_SIDEWALK, SEG_WHITE_LINE, SEG_YELLOW_LINE, TerminationState
)
from metadrive_ped_tpu.core.scenario_structs import (
    ScenarioScene, ScenarioSimState, TRK_PEDESTRIAN
)
from metadrive_ped_tpu.core.structs import PAST_POS_STEPS, EgoState
from metadrive_ped_tpu.envs.base import DEFAULT_CLASS_IDX, make_vehicle_params
from metadrive_ped_tpu.mapgen.scenario_scene import build_scenario_pack
from metadrive_ped_tpu.ops import collision, dynamics, polyline, raycast
from metadrive_ped_tpu.ops.math_ops import clip01, heading_vec, rhs_vec, wrap_to_pi

NUM_WAY_POINT = 10      # trajectory_navigation.py:21
CKPT_DIM = 2
DISCRETE_LEN = 2.0      # trajectory_navigation.py:19
TRAJ_NAVI_POINT_DIST = 30.0

NAVI_DIM = NUM_WAY_POINT * CKPT_DIM + 2  # = 22

# TrajectoryIDMPolicy (idm_policy.py:426-430) + staggered act batches
# (scenario_traffic_manager.py:27)
TRAJ_NORMAL_SPEED = 40.0   # km/h
IDM_MAX_DIST = 20.0        # m
DEST_REGION_RADIUS = 2.0   # m
IDM_ACT_BATCH_SIZE = 5


class ScenarioEnv:
    @classmethod
    def default_config(cls):
        # reference: scenario_env.py:21-94 SCENARIO_ENV_CONFIG
        return Config(
            dict(
                num_envs=16,
                data_directory=None,
                scenario_data=None,  # in-memory list of SD dicts (tests/pipelines)
                start_scenario_index=0,
                num_scenarios=None,
                sequential_seed=False,
                worker_index=0,
                num_workers=1,
                no_traffic=False,
                reactive_traffic=False,
                # curriculum config keys (scenario_env.py:31-33): with
                # curriculum_level > 1 the scenario set splits into that
                # many contiguous difficulty bands and the env levels up
                # when the recent success rate clears target_success_rate
                # (ScenarioCurriculumManager semantics; same machinery as
                # envs/curriculum.py CurriculumWrapper, driven by config)
                curriculum_level=1,
                episodes_to_evaluate_curriculum=None,
                target_success_rate=0.8,
                # localize the ego against the compiled map-feature lane
                # network (ScenarioMap/ScenarioLane, scenario_env.py:38
                # need_lane_localization); strict out-of-road then requires
                # lane membership
                need_lane_localization=True,
                replay_ego=False,  # ReplayEgoCarPolicy (policy/replay_policy.py:70)
                even_sample_vehicle_class=True,
                horizon=None,
                truncate_as_terminate=False,
                auto_reset=True,
                decision_repeat=5,
                physics_world_step_size=0.02,
                # ego <-> replayed-track rigid contact resolution (see
                # BaseVectorEnv.default_config docline)
                contact_response=True,
                vehicle_config=dict(
                    enable_reverse=False,
                    lidar=dict(num_lasers=120, distance=50.0),
                    side_detector=dict(num_lasers=12, distance=50.0),
                    lane_line_detector=dict(num_lasers=0, distance=50.0),
                ),
                # reward scheme (scenario_env.py:64-80)
                success_reward=5.0,
                out_of_road_penalty=5.0,
                on_lane_line_penalty=1.0,
                crash_vehicle_penalty=1.0,
                crash_object_penalty=1.0,
                crash_human_penalty=1.0,
                driving_reward=1.0,
                steering_range_penalty=0.5,
                heading_penalty=1.0,
                lateral_penalty=0.5,
                max_lateral_dist=4.0,
                no_negative_reward=True,
                crash_vehicle_cost=1.0,
                crash_object_cost=1.0,
                out_of_road_cost=1.0,
                crash_human_cost=1.0,
                out_of_route_done=False,
                crash_vehicle_done=False,
                crash_object_done=False,
                crash_human_done=False,
                relax_out_of_road_done=True,
            )
        )

    def __init__(self, config=None):
        self.config = self.default_config()
        if config:
            self.config.update(config)
        cfg = self.config
        if cfg["scenario_data"] is not None:
            sds = list(cfg["scenario_data"])
        else:
            from metadrive_ped_tpu.scenario.utils import load_scenarios
            assert cfg["data_directory"], "need data_directory or scenario_data"
            sds = load_scenarios(
                cfg["data_directory"], cfg["start_scenario_index"], cfg["num_scenarios"],
                cfg["worker_index"], cfg["num_workers"],
            )
        if cfg["num_scenarios"]:
            sds = sds[: cfg["num_scenarios"]]
        self.num_scenarios = len(sds)
        pack = build_scenario_pack(sds)
        from metadrive_ped_tpu.core.logger import get_logger
        get_logger().info(
            "compiled %d scenario(s): %d track slots, %d map lanes, T=%d",
            self.num_scenarios, pack["trk_pos"].shape[1],
            pack["lane_pts"].shape[1], pack["trk_pos"].shape[2],
        )
        self._has_lanes = bool(np.any(pack["lane_valid"]))
        self._sds = sds  # raw SDs for host-side map introspection
        self.scene = ScenarioScene.from_pack(pack)
        self.num_envs = cfg["num_envs"]
        self._state = None
        # ---- curriculum (scenario_env.py:31-33 config keys; manager/
        # scenario_curriculum_manager.py:38-84 semantics) ------------------
        self._cur_levels = int(cfg["curriculum_level"])
        if self._cur_levels > 1:
            assert self.num_scenarios % self._cur_levels == 0, (
                "Each level should have the same number of scenarios"
            )
            from collections import deque
            self._cur_total = self.num_scenarios
            self._cur_band = self.num_scenarios // self._cur_levels
            self._cur_level = 0
            self._cur_eval = (cfg["episodes_to_evaluate_curriculum"]
                              or self._cur_band)
            self._cur_recent = deque(maxlen=self._cur_eval)
            # episodes sample only the current band (state.scenario_cap
            # carries it through the jitted step; level-up is a host swap)
            self.num_scenarios = self._cur_band
        # data_coverage (scenario_data_manager.py:185-190): fraction of this
        # worker's dataset that has entered an episode, times num_workers
        self._seen_scenarios = set()
        # per-scenario difficulty (data_manager.current_scenario_difficulty
        # reads SD metadata; 0 when absent)
        self._difficulty = np.asarray([
            float((sd.get("metadata") or {}).get("difficulty", 0) or 0)
            for sd in sds
        ], np.float32)
        self._recent_route_completion = None
        self._step_jit = jax.jit(self._step_impl, donate_argnums=0)
        self._reset_jit = jax.jit(self._reset_impl)
        self._reset_jit_cap = self.num_scenarios

    # ------------------------------------------------------------------ API
    @property
    def observation_dim(self):
        vc = self.config["vehicle_config"]
        side = max(vc["side_detector"]["num_lasers"], 2)
        return side + 6 + 1 + NAVI_DIM + vc["lidar"]["num_lasers"]

    def reset(self, seed=0):
        rng = jax.random.PRNGKey(0 if seed is None else seed)
        self._state, obs, info = self._reset_jit(rng)
        self._last_obs = obs
        if "env_seed" in info:
            self._track_coverage(info)
        info["curriculum_level"] = self.current_level
        info["data_coverage"] = self.data_coverage
        return obs, info

    def step(self, actions):
        actions = jnp.asarray(actions, jnp.float32).reshape(self.num_envs, 2)
        self._state, obs, reward, term, trunc, info = self._step_jit(self._state, actions)
        self._last_obs = obs
        self._track_coverage(info)
        if self._cur_levels > 1:
            self._curriculum_update(term, trunc, info)
        # host-side scalars like the reference's step_info keys
        # (scenario_env.py:280-283); per-env device arrays stay device-side
        info["curriculum_level"] = self.current_level
        info["data_coverage"] = self.data_coverage
        info["num_stored_maps"] = self.num_scenarios
        info["scenario_difficulty"] = self._difficulty[
            np.asarray(info["env_seed"]) - self.config["start_scenario_index"]
        ]
        if self._cur_levels > 1:
            info["curriculum_success"] = self.current_success_rate
            info["curriculum_route_completion"] = \
                self.current_route_completion
        return obs, reward, term, trunc, info

    # ---- curriculum / coverage stats (reference step_info surface) -------
    @property
    def current_level(self):
        """0-based current curriculum level (engine.current_level,
        scenario_env.py:280)."""
        return self._cur_level if self._cur_levels > 1 else 0

    @property
    def current_success_rate(self):
        if self._cur_levels <= 1 or not self._cur_recent:
            return 0.0
        return float(sum(self._cur_recent)) / self._cur_eval

    @property
    def data_coverage(self):
        """Fraction of this worker's dataset that has entered an episode,
        times num_workers (scenario_data_manager.py:185-190). Updated on
        .step()/.reset() calls (rollout() scans device-side and does not
        touch the host counter)."""
        total = getattr(self, "_cur_total", self.num_scenarios)
        return (len(self._seen_scenarios) / max(total, 1)
                * self.config["num_workers"])

    def _track_coverage(self, info):
        start = self.config["start_scenario_index"]
        seeds = np.unique(np.asarray(info["env_seed"]))
        self._seen_scenarios.update(int(s) - start for s in seeds)

    @property
    def current_route_completion(self):
        """Mean route completion over the curriculum evaluation window
        (curriculum_manager.current_route_completion analog)."""
        if not self._recent_route_completion:
            return 0.0
        return float(np.mean(self._recent_route_completion))

    def _curriculum_update(self, term, trunc, info):
        done = np.asarray(term) | np.asarray(trunc)
        if not done.any():
            return
        success = np.asarray(info["arrive_dest"])[done]
        if self._recent_route_completion is None:
            from collections import deque
            self._recent_route_completion = deque(maxlen=self._cur_eval)
        if "route_completion" in info:
            self._recent_route_completion.extend(
                float(r) for r in np.asarray(info["route_completion"])[done]
            )
        self._cur_recent.extend(bool(s) for s in success)
        if (
            self.current_success_rate
            >= self.config["target_success_rate"] - 1e-3
            and self._cur_level < self._cur_levels - 1
        ):
            from collections import deque

            from metadrive_ped_tpu.core.logger import get_logger
            self._cur_level += 1
            self.num_scenarios = self._cur_band * (self._cur_level + 1)
            get_logger().info(
                "curriculum level %d/%d: scenario band -> %d",
                self._cur_level, self._cur_levels, self.num_scenarios,
            )
            self._cur_recent = deque(maxlen=self._cur_eval)
            if self._state is not None:
                cap = jnp.full_like(self._state.scenario_cap, self.num_scenarios)
                self._state = self._state.replace(scenario_cap=cap)

    def close(self):
        self._state = None

    def get_map_features(self, scenario_index=0):
        """The scenario's raw SD map_features (ScenarioMap.get_map_features
        passthrough, component/map/scenario_map.py; pairs with
        scenario.utils.draw_map like test_export_map.py's workflow)."""
        return dict(self._sds[scenario_index].get("map_features") or {})

    def edge_network(self, scenario_index=0):
        """EdgeRoadNetwork of one loaded scenario's raw map — lane-indexed
        graph with entry/exit/neighbor adjacency and BFS routing (the
        reference ScenarioMap's road_network, scenario_map.py +
        edge_road_network.py). Host-side introspection; the jit'd step uses
        the compiled lane arrays."""
        from metadrive_ped_tpu.mapgen.edge_network import build_edge_network
        return build_edge_network(self._sds[scenario_index])

    def rollout(self, n_steps, policy_fn=None, actions=None, collect=("reward",)):
        """Run n_steps on-device via lax.scan — no per-step host dispatch
        (mirrors BaseVectorEnv.rollout; the ScenarioEnv fast path for
        throughput measurement and on-device RL collection)."""
        if actions is None and policy_fn is None:
            actions = jnp.zeros((self.num_envs, 2), jnp.float32)

        key = (id(policy_fn), tuple(collect), n_steps, self.num_scenarios)
        if getattr(self, "_rollout_cache_key", None) != key:
            def run(state, obs0, fixed_actions):
                def body(carry, _):
                    state, obs = carry
                    act = policy_fn(obs, state) if policy_fn is not None else fixed_actions
                    state, obs, reward, term, trunc, info = self._step_impl(state, act)
                    special = dict(
                        reward=reward, obs=obs, terminated=term, truncated=trunc,
                        ego_pos=state.ego.pos, ego_heading=state.ego.heading,
                        ego_speed=state.ego.speed,
                    )
                    out = {k: special[k] if k in special else info[k] for k in collect}
                    return (state, obs), out
                (state, obs), outs = jax.lax.scan(body, (state, obs0), None, length=n_steps)
                return state, obs, outs
            self._rollout_jit = jax.jit(run)
            self._rollout_cache_key = key

        obs0 = getattr(self, "_last_obs", None)
        if obs0 is None:
            obs0 = self._observe(self._state)
        fixed = actions if actions is not None else jnp.zeros((self.num_envs, 2), jnp.float32)
        self._state, obs, outs = self._rollout_jit(
            self._state, obs0, jnp.asarray(fixed, jnp.float32)
        )
        self._last_obs = obs
        mean_reward = float(jnp.mean(outs["reward"])) if "reward" in outs else 0.0
        return outs, mean_reward

    # ------------------------------------------------------------- internals
    def _spawn(self, rng, sidx):
        scene = self.scene
        E = sidx.shape[0]
        pos = scene.sdc_start_pos[sidx]
        heading = scene.sdc_start_heading[sidx]
        zeros = jnp.zeros(E)
        zi = jnp.zeros(E, jnp.int32)
        ego = EgoState(
            pos=pos, heading=heading, speed=zeros, vel_dir=zeros,
            steering=zeros, throttle=zeros,
            last_action=jnp.zeros((E, 2)), current_action=jnp.zeros((E, 2)),
            last_pos=pos, last_heading=heading,
            lane=zi, route_idx=zi, slot=zi,
            on_lane=jnp.ones(E, bool),
            crash_vehicle=jnp.zeros(E, bool), crash_object=jnp.zeros(E, bool),
            crash_human=jnp.zeros(E, bool), crash_building=jnp.zeros(E, bool),
            crash_sidewalk=jnp.zeros(E, bool),
            on_yellow_line=jnp.zeros(E, bool), on_white_line=jnp.zeros(E, bool),
            out_of_route=jnp.zeros(E, bool),
            past_pos=jnp.tile(pos[:, None, :], (1, PAST_POS_STEPS, 1)),
            break_down=jnp.zeros(E, bool),
            params=make_vehicle_params(jnp.full((E,), DEFAULT_CLASS_IDX, jnp.int32)),
        )
        KR = scene.trk_unpts.shape[1]  # compact reactive axis (eligible slots)
        # pose at arc 0 of each reactive route: the origin (chord 0 == the
        # quantization origin) and the dequantized chord 1 — small row
        # gathers, NOT a full [E,KR,P,2] gather; _spawn is traced inside
        # the step for auto-reset rows
        from metadrive_ped_tpu.mapgen.scenario_scene import UPATH_QUANT
        p0 = scene.trk_uorigin[sidx]
        p1 = p0 + scene.trk_upath_q[:, :, 1, :][sidx].astype(jnp.float32) * UPATH_QUANT
        uheading = jnp.arctan2(p1[..., 1] - p0[..., 1], p1[..., 0] - p0[..., 0])
        return ScenarioSimState(
            rng=rng, sidx=sidx, step_count=jnp.zeros(E, jnp.int32),
            episode_reward=zeros, episode_cost=zeros,
            scenario_cap=jnp.full((E,), self.num_scenarios, jnp.int32), ego=ego,
            last_long=zeros, cur_long=zeros, cur_lat=zeros,
            npc_long=jnp.zeros((E, KR)), npc_speed=scene.trk_spawn_speed[sidx],
            npc_acc=jnp.zeros((E, KR)), npc_dead=jnp.zeros((E, KR), bool),
            npc_upos=p0, npc_uheading=uheading,
            phase=jnp.int32(0),
        )

    def _reset_impl(self, rng):
        E = self.num_envs
        keys = jax.random.split(rng, E + 1)
        if self.config["sequential_seed"]:
            sidx = (jnp.arange(E) + self.config["worker_index"]) % self.num_scenarios
        else:
            sidx = jax.random.randint(keys[0], (E,), 0, self.num_scenarios)
        state = self._spawn(keys[1:], sidx)
        obs = self._observe(state)
        return state, obs, dict(env_seed=sidx + self.config["start_scenario_index"])

    def _npc_pose(self, state):
        """Replayed (or reactive) traffic pose at the current timestep."""
        scene, sidx = self.scene, state.sidx
        T = scene.trk_pos.shape[2]
        t = jnp.clip(state.step_count, 0, T - 1)
        # pose-at-t as a flat ROW gather over the time-major copy (fast
        # path); a one-hot contraction over T was the profiled hotspot
        flat = sidx * T + t
        pos = scene.trk_pos_t[flat]          # [E,TRK,2]
        heading = scene.trk_heading_t[flat]
        active = scene.trk_valid_t[flat]

        if self.config["reactive_traffic"]:
            # TrajectoryIDM vehicles follow their recorded route with IDM
            # speed control (idm_policy.py:426-493). Eligibility was
            # precomputed per track (route > 5 m, spawned behind the ego —
            # scenario_traffic_manager.py:217-235) and eligible tracks sort
            # FIRST on the track axis, so the reactive overlay only touches
            # the leading KR slots; everything else replays. The route pose
            # is CARRIED in the state (npc_upos invariant) — no one-hot
            # contraction here.
            K = pos.shape[1]
            KR = scene.trk_unpts.shape[1]
            KRT = min(KR, K)
            unpts = scene.trk_unpts[sidx]
            reactive = scene.trk_reactive_ok[sidx]              # [E,KR]
            # reactive cars spawn at their recorded first-valid step and
            # despawn at arrive_destination (npc_dead)
            spawned = state.step_count[:, None] >= scene.trk_first_t[sidx]
            r_active = reactive & spawned & ~state.npc_dead & (unpts > 1)
            ov = reactive[:, :KRT]
            pos = jnp.concatenate([
                jnp.where(ov[..., None], state.npc_upos[:, :KRT], pos[:, :KRT]),
                pos[:, KRT:],
            ], axis=1)
            heading = jnp.concatenate([
                jnp.where(ov, state.npc_uheading[:, :KRT], heading[:, :KRT]),
                heading[:, KRT:],
            ], axis=1)
            active = jnp.concatenate([
                jnp.where(ov, r_active[:, :KRT], active[:, :KRT]),
                active[:, KRT:],
            ], axis=1)
        if self.config["no_traffic"]:
            # nothing spawns at all (scenario_env.py:44 + manager gate :122)
            active = jnp.zeros_like(active)
        return pos, heading, active

    def _step_npc_reactive(self, state, ego):
        """TrajectoryIDMPolicy speed control along each track's recorded
        PointLane (idm_policy.py:426-493 + scenario_traffic_manager.py:67-76):

        - front-gap search measured along the route's ARC LENGTH over a 20 m
          probe chain (get_find_front_back_objs_single_lane restricted to
          IDM_MAX_DIST — bodies near the lane, smallest positive relative
          longitude), not a heading cone;
        - staggered act batches: track k refreshes its IDM acceleration only
          on steps where the global act phase equals k % IDM_ACT_BATCH_SIZE
          and replays the committed value otherwise (the batched twin of
          before_step's round-robin policy_index gate,
          scenario_traffic_manager.py:75 — each IDM car does speed control
          exactly once every IDM_ACT_BATCH_SIZE steps);
        - arrive_destination: a car within DEST_REGION_RADIUS of its route
          end is cleaned (idm_policy.py:449-455 + manager before_step).

        The IDM state lives on the compact KR axis (eligible tracks sort
        first; the reference instantiates IDM policies per eligible vehicle
        only), and the probe chain + front-gap search run ONLY for the
        fresh act batch — one dynamic slice [E, KR/5, ...].
        """
        from metadrive_ped_tpu.constants import BICYCLE_REF_ACCEL, BICYCLE_REF_BRAKE
        from metadrive_ped_tpu.mapgen.scenario_scene import TRK_SPACING_M, UPATH_QUANT
        from metadrive_ped_tpu.ops.idm import idm_acceleration
        scene, sidx = self.scene, state.sidx
        E, KR = state.npc_long.shape
        upath_q = scene.trk_upath_q[sidx]        # [E,KR,P,2] int16 (half the bytes)
        uorigin = scene.trk_uorigin[sidx]        # [E,KR,2]
        unpts = scene.trk_unpts[sidx]
        total = scene.trk_utotal[sidx]

        # candidates at their ACTUAL current pose (replay or reactive); the
        # reactive route pose comes from the carried state invariant
        cand_pos, _, cand_active = self._npc_pose(state)
        K = cand_pos.shape[1]
        KRT = min(KR, K)
        cand = jnp.concatenate([cand_pos, ego.pos[:, None]], axis=1)      # [E,C,2]
        cand_active = jnp.concatenate(
            [cand_active, jnp.ones((E, 1), bool)], axis=1
        )
        # candidate speeds: live IDM speed for reactive slots, RECORDED body
        # speed for replayed tracks (the reference's front object is a
        # kinematic body whose velocity is force-set from the log each frame)
        T = scene.trk_pos.shape[2]
        flat = sidx * T + jnp.clip(state.step_count, 0, T - 1)
        rec_speed = scene.trk_speed_t[flat]                               # [E,K]
        reactive = scene.trk_reactive_ok[sidx]                            # [E,KR]
        spd = jnp.concatenate([
            jnp.where(reactive[:, :KRT], state.npc_speed[:, :KRT], rec_speed[:, :KRT]),
            rec_speed[:, KRT:],
        ], axis=1)
        cand_speed = jnp.concatenate([spd, ego.speed[:, None]], axis=1)
        cand_wid = jnp.concatenate(
            [scene.trk_wid[sidx], ego.params.width[:, None]], axis=1
        )

        # ---- fresh act batch: tracks k == phase (mod ACT) as ONE slice ----
        ACT = IDM_ACT_BATCH_SIZE
        G = KR // ACT
        phase = state.phase

        def sub(x):
            r = x.reshape((E, G, ACT) + x.shape[2:])
            return jax.lax.dynamic_slice_in_dim(r, phase, 1, axis=2).squeeze(2)

        long_sub = sub(state.npc_long)                                     # [E,G]
        unpts_sub = sub(unpts)
        total_sub = sub(total)
        upath_q_sub = sub(upath_q)                                         # [E,G,P,2]
        base_sub = jnp.floor(long_sub / TRK_SPACING_M).astype(jnp.int32)

        # 20 m probe chain along my own arc (5 points / 4 chords) off the
        # fixed-spacing path, one shared one-hot pass
        step_chords = int(round((IDM_MAX_DIST / 4.0) / TRK_SPACING_M))
        my_pos_sub, _, aheads = polyline.uniform_pose_and_ahead(
            upath_q_sub, unpts_sub, TRK_SPACING_M, long_sub, total_sub,
            deltas=tuple(k * step_chords for k in range(1, 5)),
            scale=UPATH_QUANT, origin=sub(uorigin),
        )
        probe = jnp.stack([my_pos_sub] + aheads, axis=-2)                  # [E,G,5,2]
        probe_long = jnp.minimum(
            jnp.minimum(base_sub[..., None] + jnp.arange(5) * step_chords,
                        unpts_sub[..., None] - 1).astype(jnp.float32) * TRK_SPACING_M,
            total_sub[..., None],
        )
        probe_long = probe_long.at[..., 0].set(long_sub)
        a = probe[..., :-1, :]
        seg = probe[..., 1:, :] - a
        seg_len = jnp.sqrt(jnp.maximum((seg ** 2).sum(-1), 1e-12))        # [E,G,4]
        arc0 = (probe_long - long_sub[..., None])[..., :-1]               # [E,G,4]

        rel = cand[:, None, :, None, :] - a[:, :, None, :, :]             # [E,G,C,4,2]
        t = jnp.clip(
            (rel * seg[:, :, None]).sum(-1)
            / jnp.maximum((seg_len ** 2)[:, :, None], 1e-9), 0.0, 1.0,
        )
        proj = a[:, :, None] + t[..., None] * seg[:, :, None]
        dist_lat = jnp.sqrt(((cand[:, None, :, None, :] - proj) ** 2).sum(-1))
        long_c = arc0[:, :, None, :] + t * seg_len[:, :, None, :]         # [E,G,C,4]
        # on-route test ~ PointLane(width=2).point_on_lane of the candidate
        # bounding box (idm_policy.py:160-167): centre within half the lane
        # width plus the body's half width
        on_route = dist_lat < (1.0 + cand_wid[:, None, :, None] / 2)
        # candidate c is the probing track itself when c == g*ACT + phase
        # (reactive slots are the PREFIX of the full track axis)
        ks = jnp.arange(G) * ACT + phase                                   # [G]
        not_self = jnp.arange(K + 1)[None, :] != ks[:, None]               # [G,C]
        valid = (
            on_route & cand_active[:, None, :, None]
            & not_self[None, :, :, None] & (long_c > 0.1)
        )
        fgap = jnp.where(valid, long_c, jnp.inf)                           # [E,G,C,4]
        front_dist = fgap.min(axis=(2, 3))                                 # [E,G]
        has_front = jnp.isfinite(front_dist)
        # speed of the nearest candidate: a tie-broken min-reduce instead of
        # first-match one-hot — the cumsum of the one-hot lowered to a
        # depthwise convolution (reduce_window) that alone cost ~1 ms/step
        # at Waymo scale; exact-distance ties between distinct bodies are
        # measure-zero on real data, and ties resolve to the slowest (most
        # conservative). Synthetic scenes with duplicated/stacked tracks CAN
        # tie deterministically and then brake harder than a first-match
        # pick would; if replay determinism against pre-change traces ever
        # matters, add a tiny index-based epsilon to fgap instead.
        front_speed = jnp.where(
            fgap <= front_dist[..., None, None], cand_speed[:, None, :, None], jnp.inf
        ).min(axis=(2, 3))
        front_speed = jnp.where(has_front, front_speed, 0.0)

        acc_sub = idm_acceleration(
            sub(state.npc_speed) * 3.6, front_speed * 3.6,
            jnp.where(has_front, front_dist, 1e6), has_front,
            target_speed_kmh=TRAJ_NORMAL_SPEED,
        )
        # commit the fresh batch; other tracks replay their committed value
        acc = jax.lax.dynamic_update_slice_in_dim(
            state.npc_acc.reshape(E, G, ACT), acc_sub[..., None], phase, axis=2
        ).reshape(E, KR)

        # acceleration -> speed exactly like a throttle on the bicycle model
        # (before_step clips the action; full throttle = BICYCLE_REF_ACCEL).
        # Integration is gated on the SPAWN step: a late-spawning IDM car
        # holds its recorded spawn speed at arc 0 until step >= first_t —
        # the reference creates the vehicle at its recorded state then
        # (scenario_traffic_manager.py spawn path), it does not pre-roll
        spawned = state.step_count[:, None] >= scene.trk_first_t[sidx]
        dt = self.config["physics_world_step_size"] * self.config["decision_repeat"]
        # throttle semantics of the bicycle model: positive scales to the
        # 3 m/s^2 engine gain, negative to the 9 m/s^2 brake gain
        # (bicycle_model.py:29-36) — braking at the engine gain made IDM
        # cars spawned at recorded speed unable to stop for a parked body
        thr = jnp.clip(acc, -1.0, 1.0)
        accel_ms2 = jnp.where(
            thr >= 0, thr * BICYCLE_REF_ACCEL, thr * BICYCLE_REF_BRAKE
        )
        speed = jnp.where(
            spawned,
            jnp.clip(state.npc_speed + accel_ms2 * dt, 0.0, 80.0 / 3.6),
            state.npc_speed,
        )
        long = jnp.where(
            spawned, jnp.minimum(state.npc_long + speed * dt, total), state.npc_long
        )
        # arrive_destination within 2 m of the route end, measured along the
        # arc (== the reference's euclidean end-region radius at route ends)
        dead = state.npc_dead | (total - long < DEST_REGION_RADIUS)
        # re-establish the carried-pose invariant at the advanced arc — the
        # ONE full-width route contraction per step
        upos, uheading = polyline.uniform_pose(
            upath_q, unpts, TRK_SPACING_M, long, total=total,
            scale=UPATH_QUANT, origin=uorigin,
        )
        return state.replace(npc_long=long, npc_speed=speed, npc_acc=acc,
                             npc_dead=dead, npc_upos=upos, npc_uheading=uheading)

    def _observe(self, state, cached=None):
        """cached = (long, lat, traj_heading, npc_pose) computed by
        _step_impl this step — avoids re-running the polyline localization
        and the one-hot track-pose contraction twice per step."""
        cfg = self.config
        scene, sidx, ego = self.scene, state.sidx, state.ego
        vc = cfg["vehicle_config"]
        E = self.num_envs

        pts = scene.sdc_pts[sidx]
        npts = scene.sdc_npts[sidx]
        arcl = scene.sdc_arclen[sidx]
        if cached is not None:
            long, lat, traj_heading, npc_pose = cached
        else:
            long, lat = polyline.local_coordinates(pts, npts, ego.pos, s=arcl)
            traj_heading = polyline.heading_at(pts, npts, long, s=arcl)
            npc_pose = None

        # --- side detector rays vs continuous lines (state_obs.py:77-86) ---
        n_side = vc["side_detector"]["num_lasers"]
        seg_line = (scene.seg_type[sidx] == SEG_YELLOW_LINE) | (scene.seg_type[sidx] == SEG_WHITE_LINE)
        if n_side > 0:
            side = raycast.side_detector_cloud(
                ego.pos, ego.heading, n_side, vc["side_detector"]["distance"],
                *scene.seg_points(sidx),
                seg_line & scene.seg_valid[sidx],
            )
        else:
            # side detector off -> normalized lateral distances to the SDC
            # route's left/right borders (state_obs.py:90-98 fallback with
            # TrajectoryNavigation: lane = the width-2 idm route,
            # parse_object_state.py:19; lateral range = 2*width,
            # trajectory_navigation.py:148-152; normalized by
            # (MAX_LANE_NUM+1)*MAX_LANE_WIDTH = 18, base_map.py:38-40)
            route_w = 2.0
            lat_to_left = lat + route_w / 2.0
            lat_to_right = 2.0 * route_w - lat_to_left
            side = jnp.stack(
                [clip01(lat_to_left / 18.0), clip01(lat_to_right / 18.0)], axis=-1
            )

        # --- ego core (state_obs.py:100-151) -------------------------------
        hv = heading_vec(ego.heading)
        traj_rhs = rhs_vec(traj_heading)
        hdiff = jnp.clip((hv * traj_rhs).sum(-1), -1.0, 1.0) / 2 + 0.5
        speed_kmh = ego.speed * 3.6
        f_speed = clip01((speed_kmh + 1) / (ego.params.max_speed_kmh + 1))
        f_steer = clip01((ego.steering / OBS_MAX_STEERING + 1) / 2)
        f_a0 = clip01((ego.current_action[:, 0] + 1) / 2)
        f_a1 = clip01((ego.current_action[:, 1] + 1) / 2)
        cosb = (heading_vec(ego.heading) * heading_vec(ego.last_heading)).sum(-1)
        f_yaw = clip01(jnp.arccos(jnp.clip(cosb, 0.0, 1.0)) / 0.1)
        f_lat = clip01((lat * 2 / 4.5 + 1) / 2)
        core = jnp.stack([hdiff, f_speed, f_steer, f_a0, f_a1, f_yaw, f_lat], axis=-1)

        # --- trajectory navi (trajectory_navigation.py:106-146) ------------
        next_idx = jnp.maximum((long / DISCRETE_LEN).astype(jnp.int32) + 1, 0)
        ks = jnp.arange(1, NUM_WAY_POINT)  # ckpts[1:]
        total = polyline.total_length(pts, npts, s=arcl)
        ck_long = jnp.minimum(
            (next_idx[:, None] + ks[None, :]).astype(jnp.float32) * DISCRETE_LEN,
            total[:, None],
        )
        ck_pos = polyline.position(
            pts[:, None], npts[:, None], ck_long, s=arcl[:, None],
        )
        dirv = ck_pos - ego.pos[:, None, :]
        dn = jnp.sqrt((dirv ** 2).sum(-1))
        scale = jnp.where(dn > TRAJ_NAVI_POINT_DIST, TRAJ_NAVI_POINT_DIST / jnp.maximum(dn, 1e-6), 1.0)
        dirv = dirv * scale[..., None]
        # LEFT-positive lateral (TrajectoryNavigation._get_info_for_checkpoint
        # -> convert_to_local_coordinates, base_vehicle.py:986-988; see
        # localization._checkpoint_info for the convention note)
        rv = -rhs_vec(ego.heading)
        in_h = (dirv * hv[:, None, :]).sum(-1)
        in_r = (dirv * rv[:, None, :]).sum(-1)
        wp = jnp.stack(
            [clip01((in_h / TRAJ_NAVI_POINT_DIST + 1) / 2),
             clip01((in_r / TRAJ_NAVI_POINT_DIST + 1) / 2)], axis=-1
        ).reshape(E, (NUM_WAY_POINT - 1) * 2)
        tail = jnp.stack(
            [
                clip01((lat / cfg["max_lateral_dist"] + 1) / 2),
                clip01((wrap_to_pi(traj_heading - ego.heading) / jnp.pi + 1) / 2),
            ],
            axis=-1,
        )
        navi = jnp.concatenate([wp, tail, jnp.zeros((E, 2))], axis=-1)  # 22 dims

        # --- lidar vs replayed bodies --------------------------------------
        parts = [side, core, navi]
        if vc["lidar"]["num_lasers"] > 0:
            npc_pos, npc_heading, npc_active = (
                npc_pose if npc_pose is not None else self._npc_pose(state)
            )
            parts.append(raycast.lidar_cloud(
                ego.pos, ego.heading, vc["lidar"]["num_lasers"], vc["lidar"]["distance"],
                npc_pos, npc_heading, scene.trk_len[sidx], scene.trk_wid[sidx], npc_active,
            ))
        return jnp.concatenate(parts, axis=-1)

    def _step_impl(self, state, actions):
        cfg = self.config
        scene = self.scene
        E = self.num_envs
        actions = jnp.clip(jnp.nan_to_num(actions, nan=0.0, posinf=1.0, neginf=-1.0), -1, 1)
        # fault injection (set_break_down, base_vehicle.py:939-941)
        actions = jnp.where(state.ego.break_down[:, None], 0.0, actions)

        ego = state.ego
        ego = ego.replace(
            last_pos=ego.pos, last_heading=ego.heading,
            last_action=ego.current_action, current_action=actions,
            steering=actions[:, 0], throttle=actions[:, 1],
            past_pos=jnp.concatenate([ego.past_pos[:, 1:], ego.pos[:, None]], axis=1),
        )
        if cfg["replay_ego"]:
            # force-set the recorded sdc state (ReplayEgoCarPolicy semantics);
            # flat row gather, not pointwise [sidx, t] fancy indexing
            T = scene.sdc_track_pos.shape[1]
            flat = state.sidx * T + jnp.clip(state.step_count + 1, 0, T - 1)
            pos = scene.sdc_pos_t[flat]
            heading = scene.sdc_heading_t[flat]
            speed = jnp.sqrt(((pos - ego.pos) ** 2).sum(-1)) / 0.1
            vel_dir = jnp.zeros_like(speed)
        else:
            pos, heading, speed, vel_dir = dynamics.step_vehicle(
                ego.pos, ego.heading, ego.speed, ego.vel_dir, ego.steering, ego.throttle,
                ego.params, dt=cfg["physics_world_step_size"], substeps=cfg["decision_repeat"],
                enable_reverse=cfg["vehicle_config"]["enable_reverse"],
            )
        ego = ego.replace(pos=pos, heading=heading, speed=speed, vel_dir=vel_dir)

        if cfg["reactive_traffic"]:
            state = self._step_npc_reactive(state, ego)
        state = state.replace(step_count=state.step_count + 1, ego=ego)

        # contacts
        npc_pos, npc_heading, npc_active = self._npc_pose(state)
        hits = collision.obb_obb_overlap(
            ego.pos[:, None, :], ego.heading[:, None],
            ego.params.length[:, None], ego.params.width[:, None],
            npc_pos, npc_heading, scene.trk_len[state.sidx], scene.trk_wid[state.sidx],
        ) & npc_active
        is_ped = scene.trk_kind[state.sidx] != 0
        crash_v = (hits & ~is_ped).any(axis=1)
        crash_h = (hits & is_ped).any(axis=1)

        # rigid contact response, ego side only: replayed/reactive tracks are
        # kinematic bodies (ReplayTrafficParticipantPolicy force-sets their
        # pose, replay_policy.py:10-68), so the ego takes the full
        # minimum-translation push and loses its closing velocity — the
        # Bullet behavior when a dynamic chassis meets a kinematic body
        # (engine_core.py:350-352). replay_ego force-sets the ego too.
        if cfg["contact_response"] and not cfg["replay_ego"]:
            depth, normal = collision.obb_obb_mtv(
                ego.pos[:, None, :], ego.heading[:, None],
                ego.params.length[:, None], ego.params.width[:, None],
                npc_pos, npc_heading, scene.trk_len[state.sidx], scene.trk_wid[state.sidx],
            )
            contact = hits & ~is_ped
            push = (jnp.where(contact, jnp.maximum(depth, 0.0), 0.0)[..., None]
                    * normal).sum(axis=1)
            mag = jnp.sqrt((push ** 2).sum(-1, keepdims=True))
            push = push * jnp.minimum(1.0, 1.0 / jnp.maximum(mag, 1.0))
            scale = collision.contact_speed_scale(
                ego.speed, ego.heading + ego.vel_dir, normal, contact
            )
            ego = ego.replace(pos=ego.pos + push, speed=ego.speed * scale)
            state = state.replace(ego=ego)

        # trajectory localization
        pts = scene.sdc_pts[state.sidx]
        npts = scene.sdc_npts[state.sidx]
        arcl = scene.sdc_arclen[state.sidx]
        long, lat = polyline.local_coordinates(pts, npts, ego.pos, s=arcl)
        traj_heading = polyline.heading_at(pts, npts, long, s=arcl)
        total = polyline.total_length(pts, npts, s=arcl)
        route_completion = long / jnp.maximum(total, 1e-3)
        state = state.replace(last_long=state.cur_long, cur_long=long, cur_lat=lat)
        seg_flags = collision.vehicle_segment_flags(
            ego.pos, ego.heading, ego.params.length, ego.params.width,
            *scene.seg_points(state.sidx),
            scene.seg_type[state.sidx], scene.seg_halfwidth[state.sidx],
            scene.seg_valid[state.sidx],
            (SEG_YELLOW_LINE, SEG_WHITE_LINE, SEG_SIDEWALK),
        )
        # traffic light ahead (BaseTrafficLight contact,
        # base_vehicle.py:720-733): red/yellow within the stop region
        lp = scene.light_pos[state.sidx]                    # [E,LG,2]
        LT = scene.light_status.shape[2]
        lflat = state.sidx * LT + jnp.clip(state.step_count, 0, LT - 1)
        lstat = scene.light_status_t[lflat]                  # [E,LG] row gather
        ldist = jnp.sqrt(((lp - ego.pos[:, None, :]) ** 2).sum(-1))
        near = (ldist < 4.0) & scene.light_valid[state.sidx]
        on_red = (near & (lstat == 3)).any(axis=1)
        on_yellow_light = (near & (lstat == 2)).any(axis=1)

        # lane-network localization (need_lane_localization; the reference
        # builds ScenarioLanes from map_features and ray-localizes the ego
        # against them — scenario_map.py:9, edge_network_navigation.py:159):
        # on_lane = the ego centre sits inside some map lane's band.
        # Computed only when something consumes it: with
        # relax_out_of_road_done (the default) out-of-road is the lateral
        # band test and on_lane would be a dead flag — the [E,LN,LP] band
        # distance pass + per-env lane gather cost ~0.25 ms/step at Waymo
        # scale for nothing
        on_lane = jnp.ones(E, bool)
        use_lanes = (self._has_lanes and cfg["need_lane_localization"]
                     and not cfg["relax_out_of_road_done"])
        if use_lanes:
            inside = polyline.in_band(
                scene.lane_pts[state.sidx], scene.lane_npts[state.sidx],
                ego.pos[:, None, :], scene.lane_width[state.sidx] / 2,
            ) & scene.lane_valid[state.sidx]                      # [E,LN]
            on_lane = inside.any(axis=1)

        ego = ego.replace(
            crash_vehicle=crash_v, crash_human=crash_h,
            on_yellow_line=seg_flags[SEG_YELLOW_LINE],
            on_white_line=seg_flags[SEG_WHITE_LINE],
            crash_sidewalk=seg_flags[SEG_SIDEWALK],
            on_lane=on_lane,
        )
        state = state.replace(ego=ego)

        # done (scenario_env.py:128-196)
        arrive = (route_completion > 0.95) | (total < 2.0)
        if cfg["relax_out_of_road_done"]:
            out_of_road = jnp.abs(lat) > cfg["max_lateral_dist"]
        else:
            out_of_road = ego.crash_sidewalk | ego.on_yellow_line | ego.on_white_line
            if use_lanes:
                # leaving every map lane is out-of-road (lane membership,
                # VERDICT r1 item 4; supersedes the lateral-band proxy)
                out_of_road = out_of_road | ~on_lane
        out_of_road = out_of_road | (route_completion < -0.1)
        terminated = arrive | out_of_road
        if cfg["crash_vehicle_done"]:
            terminated = terminated | crash_v
        if cfg["crash_human_done"]:
            terminated = terminated | crash_h
        horizon = cfg["horizon"]
        scenario_over = state.step_count >= scene.scenario_len[state.sidx]
        truncated = scenario_over
        if horizon is not None:
            truncated = truncated | (state.step_count >= horizon)
        if cfg["truncate_as_terminate"]:
            terminated = terminated | truncated

        # reward (scenario_env.py:216-292)
        reward = cfg["driving_reward"] * (long - state.last_long)
        lateral_penalty = -jnp.abs(lat) / cfg["max_lateral_dist"] * cfg["lateral_penalty"]
        heading_diff = jnp.abs(wrap_to_pi(ego.heading - traj_heading)) / jnp.pi
        heading_penalty = -heading_diff * cfg["heading_penalty"]
        allowed_steering = 1.0 / jnp.maximum(ego.speed, 1e-2)
        overflow = jnp.minimum(allowed_steering - jnp.abs(actions[:, 0]), 0.0)
        steering_penalty = overflow * cfg["steering_range_penalty"]
        reward = reward + lateral_penalty + heading_penalty + steering_penalty
        if cfg["no_negative_reward"]:
            reward = jnp.maximum(reward, 0.0)
        on_line = ego.on_yellow_line | ego.on_white_line | ego.crash_sidewalk
        reward = jnp.where(crash_v, -cfg["crash_vehicle_penalty"], reward)
        reward = jnp.where(crash_h, -cfg["crash_human_penalty"], reward)
        reward = jnp.where(on_line, -cfg["on_lane_line_penalty"], reward)
        step_reward = reward
        reward = jnp.where(arrive, cfg["success_reward"], reward)
        reward = jnp.where(~arrive & out_of_road, -cfg["out_of_road_penalty"], reward)

        # cost (scenario_env.py:198-214; additive)
        cost = (
            jnp.where(out_of_road, cfg["out_of_road_cost"], 0.0)
            + jnp.where(crash_v, cfg["crash_vehicle_cost"], 0.0)
            + jnp.where(crash_h, cfg["crash_human_cost"], 0.0)
        )

        episode_reward = state.episode_reward + reward
        episode_cost = state.episode_cost + cost
        state = state.replace(episode_reward=episode_reward, episode_cost=episode_cost)

        done = terminated | truncated
        info = {
            "arrive_dest": arrive, "out_of_road": out_of_road,
            "crash_vehicle": crash_v, "crash_human": crash_h,
            "crash": crash_v | crash_h | ego.crash_sidewalk,
            "cost": cost, "total_cost": episode_cost, "step_reward": step_reward,
            "route_completion": route_completion,
            "velocity": ego.speed, "max_step": truncated,
            "on_red_light": on_red, "on_yellow_light": on_yellow_light,
            "episode_reward": episode_reward, "episode_length": state.step_count,
            "env_seed": state.sidx + cfg["start_scenario_index"],
            # reference step_info extras (scenario_env.py:276-283):
            # navigation.reference_trajectory.length, lateral_now, seed
            "track_length": total,
            "lateral_dist": lat,
            "scenario_index": state.sidx + cfg["start_scenario_index"],
            "carsize": jnp.stack(
                [ego.params.width, ego.params.length], axis=-1
            ),
            TerminationState.SUCCESS: arrive,
            TerminationState.OUT_OF_ROAD: out_of_road,
            TerminationState.CRASH_VEHICLE: crash_v,
            TerminationState.CRASH_HUMAN: crash_h,
        }

        npc_pose = (npc_pos, npc_heading, npc_active)
        if cfg["auto_reset"]:
            new_keys = jax.vmap(jax.random.split)(state.rng)
            step_rng, reset_rng = new_keys[:, 0], new_keys[:, 1]
            cap = state.scenario_cap  # traced: level-up = host-side swap
            if cfg["sequential_seed"]:
                new_sidx = (state.sidx + 1) % cap
            else:
                new_sidx = jax.vmap(
                    lambda k, c: jax.random.randint(k, (), 0, c)
                )(step_rng, cap)
            fresh = self._spawn(reset_rng, new_sidx)
            state = jax.tree_util.tree_map(
                lambda new, old: old if old.ndim == 0 else jnp.where(
                    done.reshape(done.shape + (1,) * (old.ndim - 1)), new, old
                ),
                fresh, state.replace(rng=step_rng),
            )
            state = state.replace(scenario_cap=cap)
            # refresh the cached obs inputs for re-spawned rows: spawn sits at
            # arc length 0 of the new sdc trajectory; tracks are at t=0 (a
            # flat row gather at the scenario's first frame)
            T0 = scene.trk_pos.shape[2]
            d1 = done[:, None]
            long = jnp.where(done, 0.0, long)
            lat = jnp.where(done, 0.0, lat)
            traj_heading = jnp.where(
                done, scene.sdc_start_heading[state.sidx], traj_heading
            )
            npc_pose = (
                jnp.where(d1[..., None], scene.trk_pos_t[state.sidx * T0], npc_pos),
                jnp.where(d1, scene.trk_heading_t[state.sidx * T0], npc_heading),
                jnp.where(d1, scene.trk_valid_t[state.sidx * T0], npc_active),
            )

        # advance the global act-batch phase (scalar — untouched by the
        # per-env auto-reset merge above). Divergence: because the phase is
        # global, a freshly auto-reset env's IDM cars refresh at a different
        # offset relative to its episode_step than the reference's per-car
        # round-robin; every car still refreshes exactly once per
        # IDM_ACT_BATCH_SIZE steps, so the policy frequency matches. If
        # per-episode determinism is ever needed, derive the phase from a
        # designated env's step_count (or pay for per-env phase masks).
        state = state.replace(phase=(state.phase + 1) % IDM_ACT_BATCH_SIZE)

        obs = self._observe(state, cached=(long, lat, traj_heading, npc_pose))
        return state, obs, reward, terminated, truncated, info
