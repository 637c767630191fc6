"""Vectorized env core: one jit'd step advances all envs in lockstep.

This is the TPU-native replacement for the reference's engine step protocol
(BaseEnv.step -> engine.before_step/step/after_step,
envs/base_env.py:426-463 + engine/base_engine.py:402-478): the manager loop
becomes a fixed pipeline of batched kernels —

    actions -> dynamics (x5 substeps) -> traffic release -> localization
            -> collision flags -> reward/done/cost -> obs -> auto-reset

All state is a SimState pytree [E, ...]; maps are Scene arrays [S, ...]
compiled host-side once (mapgen/). Auto-reset re-spawns done envs in-place,
sampling a fresh scenario per the reference's seed cycling
(base_env.py:886-891).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from metadrive_ped_tpu.config import Config
from metadrive_ped_tpu.constants import (
    BICYCLE_REF_ACCEL, BICYCLE_REF_BRAKE, BICYCLE_REF_WHEELBASE_EFF,
    SEG_BROKEN_LINE, SEG_SIDEWALK, SEG_WHITE_LINE, SEG_YELLOW_LINE,
    VEHICLE_CLASS_ORDER, VEHICLE_CLASSES,
)
from metadrive_ped_tpu.core.structs import (
    PAST_POS_STEPS, EgoState, NpcState, PedState, Scene, SimState, VehicleParams
)
from metadrive_ped_tpu.mapgen.scene import OBJ_BUILDING, build_scene_pack
from metadrive_ped_tpu.obs import state_obs
from metadrive_ped_tpu.ops import collision, dynamics, idm, localization, participants
from metadrive_ped_tpu.ops import lane_geom

# ---- per-class parameter tables (constants.py VEHICLE_CLASSES) ------------
_CLS = [VEHICLE_CLASSES[k] for k in VEHICLE_CLASS_ORDER]
_TBL = {
    "length": np.array([c["length"] for c in _CLS], np.float32),
    "width": np.array([c["width"] for c in _CLS], np.float32),
    "accel": np.array(
        [BICYCLE_REF_ACCEL * (c["engine"] / c["mass"]) / (800.0 / 1100.0) for c in _CLS], np.float32
    ),
    "brake": np.array([BICYCLE_REF_BRAKE * (c["brake"] / 130.0) for c in _CLS], np.float32),
    "steer": np.array([np.radians(c["steer"]) for c in _CLS], np.float32),
    "vmax": np.array([c["vmax"] for c in _CLS], np.float32),
    "wheelbase": np.array(
        [BICYCLE_REF_WHEELBASE_EFF * c["wheelbase"] / VEHICLE_CLASSES["default"]["wheelbase"] for c in _CLS],
        np.float32,
    ),
}
DEFAULT_CLASS_IDX = VEHICLE_CLASS_ORDER.index("default")


_TBL_MAT = np.stack(
    [_TBL[k] for k in ("length", "width", "accel", "brake", "steer", "vmax", "wheelbase")], axis=-1
)  # [5, 7]


def make_vehicle_params(class_idx):
    from metadrive_ped_tpu.ops.gather import vector_lookup
    v = vector_lookup(jnp.asarray(_TBL_MAT), jnp.asarray(class_idx))
    return VehicleParams(
        length=v[..., 0], width=v[..., 1], accel_gain=v[..., 2], brake_gain=v[..., 3],
        max_steer_rad=v[..., 4], max_speed_kmh=v[..., 5], wheelbase_eff=v[..., 6],
    )


class BaseVectorEnv:
    """Shared machinery; reward/done/cost live in subclasses
    (mirrors BaseEnv -> MetaDriveEnv in the reference)."""

    @classmethod
    def default_config(cls) -> Config:
        return Config(
            dict(
                num_envs=16,
                start_seed=0,
                num_scenarios=1,
                # per-process scenario striding for multi-host data parallel
                # (ScenarioDataManager worker split, scenario_data_manager
                # .py:26-32, applied to PG seeds): host w of W compiles and
                # samples seeds start_seed+w, start_seed+w+W, ...
                worker_index=0,
                num_workers=1,
                map=3,  # int block count or block-ID string (pg_map.py:17-36)
                map_config=dict(lane_width=3.5, lane_num=3, exit_length=50.0,
                                # the reference's BaseMap.GENERATE_TYPE/
                                # GENERATE_CONFIG keys (base_map.py:30-41):
                                # config overrides the top-level `map`;
                                # type is implied by the value (int =
                                # block count, str = block sequence)
                                type=None, config=None,
                                xodr_file=None,  # OpenDrive ingest (mapgen/opendrive.py)
                                # CityBIG growth instead of linear BIG
                                # (component/map/city_map.py:97-113)
                                city_map=False),
                # pre-compiled scene pack (PGMapManager.dump_all_maps/
                # load_all_maps parity, pg_map_manager.py:92-133): skip map
                # generation and load the pkl written by env.dump_all_maps
                map_pack_file=None,
                # per-seed lane width/count variation
                # (PGMapManager.add_random_to_map, pg_map_manager.py:66-74)
                random_lane_width=False,
                random_lane_num=False,
                traffic_density=0.1,
                # ego spawns on a random entrance lane per episode
                # (metadrive_env.py:59 random_spawn_lane_index=True;
                # agent_manager.py:107-112)
                random_spawn_lane_index=True,
                traffic_mode="trigger",  # "trigger" | "respawn" | "hybrid" (traffic_manager.py:20-29)
                # MixedPGTrafficManager: fraction of NPCs driven by the PPO
                # expert instead of IDM (traffic_manager.py:367-418)
                rl_agent_ratio=0.0,
                accident_prob=0.0,       # metadrive_env.py:51
                static_traffic_object=True,
                # opt-in traffic lights at PG intersection approaches
                # (BaseTrafficLight components; cycle green/yellow durations
                # in env steps, opposite arms alternating)
                pg_traffic_lights=False,
                pedestrian_density=0.0,  # TPU-build extension (the _ped fork's
                                         # participants on PG maps)
                horizon=None,
                truncate_as_terminate=False,
                auto_reset=True,
                # discrete action interface (env_input_policy.py:9-69)
                discrete_action=False,
                use_multi_discrete=False,
                discrete_steering_dim=5,
                discrete_throttle_dim=5,
                # agent policy family (reference: policy/lange_change_policy.py,
                # AI_protect_policy.py, manual_control_policy.py)
                agent_policy=None,        # None | "lane_change"
                use_AI_protector=False,   # expert veto of dangerous actions
                save_level=0.5,
                manual_control=False,     # host-side controller overrides row 0
                controller="keyboard",
                # per-episode randomized dynamics (varying_dynamics_env.py);
                # dict of param -> (min, max) or None
                random_dynamics=None,
                # sample the agent's vehicle class uniformly per episode and
                # prepend length/width obs features (base_env.py config key;
                # agent_manager.py:41 random_vehicle_type, state_obs.py:69-75)
                random_agent_model=False,
                decision_repeat=5,
                physics_world_step_size=0.02,
                # rigid contact resolution between ego and NPC/object/
                # building bodies (Bullet resolves contacts every doPhysics,
                # engine_core.py:350-352). Off = flags only, bodies overlap.
                contact_response=True,
                # ---- terrain (base_env.py:219-223, engine/core/terrain.py) —
                # the TPU build simulates on an implicit flat plane (z = 0);
                # the mesh-heightfield terrain is a render/physics feature of
                # the Panda3D+Bullet stack with no batched-XLA analog yet.
                # use_mesh_terrain=True raises loudly instead of silently
                # simulating different physics than requested (docs/
                # divergences.md "Terrain").
                use_mesh_terrain=False,
                height_scale=50,        # accepted for config parity; only the
                                        # flat-plane value (terrain stays flat)
                show_terrain=True,      # render-only in the reference; ignored
                # ---- realtime window (base_env.py use_render): this build
                # is always headless — False (every reference tutorial's
                # setting) is accepted as the no-op it is; True raises in
                # __init__ (no Panda3D window exists; use env.render()).
                # window_size sizes that window — accepted and ignored.
                use_render=False,
                window_size=(1200, 900),
                # logger level (base_env.py log_level; engine sets it on
                # reset) — applied to core.logger at construction
                log_level=None,
                # ---- HUD / realtime interface (engine/interface.py:19,
                # engine/core/force_fps.py) — accepted-and-ignored: there is
                # no realtime Panda3D window to decorate or throttle; the
                # visual surface is env.render()'s top-down/camera frames
                # (docs/divergences.md "HUD / ForceFPS").
                show_interface=True,
                show_fps=True,
                show_logo=True,
                show_coordinates=False,
                # camera observation family (reference: obs/image_obs.py +
                # component/sensors/*_camera.py; rendered here by the
                # TPU raycast renderer, ops/camera.py)
                image_observation=False,
                norm_pixel=True,
                stack_size=3,
                image_source="main_camera",
                sensors=dict(main_camera=("rgb", 84, 84)),
                camera=dict(fov=66.0, pitch=0.0, height=1.4, max_dist=50.0),
                vehicle_config=dict(
                    enable_reverse=False,
                    max_engine_force=800.0,
                    max_brake_force=130.0,
                    max_steering=40.0,
                    max_speed_km_h=80.0,
                    lidar=dict(num_lasers=240, distance=50.0, num_others=0,
                               gaussian_noise=0.0, dropout_prob=0.0,
                               # CommunicationObservation extension: append
                               # each agent's two navi checkpoints to its
                               # comm slot (tinyinter.py:142-186)
                               add_others_navi=False),
                    side_detector=dict(num_lasers=0, distance=50.0),
                    lane_line_detector=dict(num_lasers=0, distance=20.0),
                ),
                # reward/cost/termination scheme (metadrive_env.py:68-89)
                success_reward=10.0,
                out_of_road_penalty=5.0,
                crash_vehicle_penalty=5.0,
                crash_object_penalty=5.0,
                driving_reward=1.0,
                speed_reward=0.1,
                use_lateral_reward=False,
                crash_vehicle_cost=1.0,
                crash_object_cost=1.0,
                out_of_road_cost=1.0,
                out_of_route_done=False,
                on_continuous_line_done=True,
                crash_vehicle_done=True,
                crash_object_done=True,
                crash_human_done=True,
            )
        )

    def __init__(self, config=None):
        self.config = self.default_config()
        if config:
            # `sensors` replaces wholesale (users name their own sensors, e.g.
            # mini_map) — the reference likewise rebuilds the sensor dict
            # instead of key-merging it (base_env.py sensor registration)
            self.config.update(config, stop_recursive_update=("sensors",))
        cfg = self.config
        if cfg["use_render"]:
            raise NotImplementedError(
                "use_render=True: there is no realtime Panda3D window in "
                "the TPU build — every env is headless. Use env.render() "
                "('topdown' / 'rgb_array' / 'dashboard') for frames, or "
                "examples/generate_video_for_bev_and_interface.py for "
                "videos. See docs/divergences.md."
            )
        if cfg["log_level"] is not None:
            from metadrive_ped_tpu.core.logger import get_logger
            get_logger().setLevel(cfg["log_level"])
        if cfg["use_mesh_terrain"]:
            raise NotImplementedError(
                "use_mesh_terrain=True: the TPU build simulates on an "
                "implicit flat plane; mesh-heightfield terrain "
                "(reference engine/core/terrain.py:30,157,295) has no "
                "batched-XLA analog. Use the default flat terrain "
                "(use_mesh_terrain=False) — the reference's physics also "
                "defaults to the flat collision plane. See "
                "docs/divergences.md."
            )
        if cfg["agent_policy"] == "lane_change":
            # LaneChangePolicy forces discrete 3-way steering [left, keep,
            # right] (lange_change_policy.py:17-24)
            assert cfg["discrete_action"], \
                "Must set discrete_action=True for using LaneChangePolicy"
            cfg.force_set("discrete_steering_dim", 3)
        if cfg["use_AI_protector"]:
            lidar = cfg["vehicle_config"]["lidar"]
            assert lidar["num_lasers"] == 240 and lidar["num_others"] == 4, (
                "AI protector needs the expert observation layout "
                "(lidar num_lasers=240, num_others=4), like the reference's "
                "expert obs-mismatch guard (AI_protect_policy.py:16-21)"
            )
            from metadrive_ped_tpu.policies.expert import load_expert_params
            self._expert_params = load_expert_params()
        self._manual_controller = None
        if cfg["manual_control"]:
            from metadrive_ped_tpu.policies.manual import make_controller
            self._manual_controller = make_controller(cfg["controller"])
        seeds = list(range(cfg["start_seed"], cfg["start_seed"] + cfg["num_scenarios"]))
        if cfg["num_workers"] > 1:
            seeds = seeds[cfg["worker_index"]::cfg["num_workers"]]
            assert seeds, "num_scenarios leaves this worker without seeds"
        self._seeds = np.asarray(seeds, np.int32)
        map_cfg = dict(cfg["map_config"])
        if map_cfg.get("config") is None:
            map_cfg["config"] = cfg["map"]
        if cfg["map_pack_file"]:
            # load a pre-compiled scene pack (PGMapManager.load_all_maps
            # parity, pg_map_manager.py:112-133)
            import pickle
            with open(cfg["map_pack_file"], "rb") as f:
                pack = pickle.load(f)["pack"]
        else:
            pack = build_scene_pack(
                seeds,
                dict(
                    include_broken_line_segs=(
                        cfg["vehicle_config"]["lane_line_detector"]["num_lasers"] > 0
                    ),
                    random_lane_width=cfg["random_lane_width"],
                    random_lane_num=cfg["random_lane_num"],
                    map_config=map_cfg,
                    traffic_density=cfg["traffic_density"],
                    accident_prob=cfg["accident_prob"],
                    pedestrian_density=cfg["pedestrian_density"],
                    spawn_roads=cfg.get("spawn_roads"),
                    spawn_dest_nodes=cfg.get("spawn_dest_nodes"),
                    pg_traffic_lights=cfg["pg_traffic_lights"],
                    rl_agent_ratio=cfg["rl_agent_ratio"],
                ),
            )
        if cfg["rl_agent_ratio"] > 0:
            from metadrive_ped_tpu.policies.expert import load_expert_params
            self._npc_expert_params = load_expert_params()
        self.scene = Scene.from_pack(pack)
        self._pack = pack  # host-side arrays (texture baking, debugging)
        from metadrive_ped_tpu.core.logger import get_logger
        get_logger().info(
            "compiled %d PG scene(s): %d lane slots, %d NPC slots, %d boundary segs",
            pack["lane_kind"].shape[0], pack["lane_kind"].shape[1],
            pack["npc_lane"].shape[1], pack["seg_p0"].shape[1],
        )
        # live scenario band: episode sampling draws from
        # [0, num_scenarios); CurriculumWrapper narrows it then re-jits
        # (ScenarioCurriculumManager semantics for PG seeds)
        self.num_scenarios = int(self.scene.num_scenarios)
        self.num_envs = cfg["num_envs"]
        self._state = None
        self._step_jit = jax.jit(functools.partial(self._step_impl), donate_argnums=0)
        self._reset_jit = jax.jit(functools.partial(self._reset_impl))
        self._reset_jit_cap = self.num_scenarios
        self._img_stack = None
        if cfg["image_observation"]:
            self._render_jit = jax.jit(self._render_frame)

    # ------------------------------------------------------------------ API
    @property
    def observation_dim(self):
        vc = self.config["vehicle_config"]
        return state_obs.obs_dim(
            vc["lidar"]["num_lasers"], vc["lidar"]["num_others"],
            side_lasers=vc["side_detector"]["num_lasers"],
            lane_line_lasers=vc["lane_line_detector"]["num_lasers"],
            random_agent_model=self.config["random_agent_model"],
        )

    @property
    def observation_space(self):
        import gymnasium as gym
        state_space = gym.spaces.Box(-0.0, 1.0, shape=(self.observation_dim,), dtype=np.float32)
        if not self.config["image_observation"]:
            return state_space
        modality, w, h = self._sensor_spec()
        channels = 1 if modality == "depth" else 3
        shape = (h, w, channels, self.config["stack_size"])
        img_space = (
            gym.spaces.Box(-0.0, 1.0, shape=shape, dtype=np.float32)
            if self.config["norm_pixel"]
            else gym.spaces.Box(0, 255, shape=shape, dtype=np.uint8)
        )
        return gym.spaces.Dict({"image": img_space, "state": state_space})

    @property
    def action_space(self):
        import gymnasium as gym
        cfg = self.config
        if cfg["discrete_action"]:
            if cfg["use_multi_discrete"]:
                return gym.spaces.MultiDiscrete(
                    [cfg["discrete_steering_dim"], cfg["discrete_throttle_dim"]]
                )
            return gym.spaces.Discrete(
                cfg["discrete_steering_dim"] * cfg["discrete_throttle_dim"]
            )
        return gym.spaces.Box(-1.0, 1.0, shape=(2,), dtype=np.float32)

    def _convert_actions(self, actions):
        """Discrete / MultiDiscrete -> continuous
        (env_input_policy.py:40-48 convert_to_continuous_action)."""
        cfg = self.config
        if not cfg["discrete_action"]:
            return jnp.asarray(actions, jnp.float32).reshape(self.num_envs, 2)
        s_dim, t_dim = cfg["discrete_steering_dim"], cfg["discrete_throttle_dim"]
        s_unit, t_unit = 2.0 / (s_dim - 1), 2.0 / (t_dim - 1)
        a = jnp.asarray(actions)
        if cfg["use_multi_discrete"]:
            a = a.reshape(self.num_envs, 2)
            steering = a[:, 0].astype(jnp.float32) * s_unit - 1.0
            throttle = a[:, 1].astype(jnp.float32) * t_unit - 1.0
        else:
            a = a.reshape(self.num_envs)
            steering = (a % s_dim).astype(jnp.float32) * s_unit - 1.0
            throttle = (a // s_dim).astype(jnp.float32) * t_unit - 1.0
        return jnp.stack([steering, throttle], axis=-1)

    def reset(self, seed=0):
        rng = jax.random.PRNGKey(0 if seed is None else seed)
        self._state, obs, info = self._reset_jit(rng)
        self._last_obs = obs
        if self.config["image_observation"]:
            self._img_stack = None
            obs = self._image_obs(obs)
        return obs, info

    def step(self, actions):
        actions = self._convert_actions(actions)
        if self._manual_controller is not None:
            # host-side human input drives env row 0 (ManualControlPolicy;
            # the tracked agent in the reference)
            actions = jnp.asarray(actions)
            manual = self._manual_controller.process_input()
            if manual is not None:
                actions = actions.at[0].set(jnp.asarray(manual, jnp.float32))
        if self.config["use_AI_protector"]:
            self._state, obs, reward, terminated, truncated, info = self._step_jit(
                self._state, actions, self._last_obs
            )
        else:
            self._state, obs, reward, terminated, truncated, info = self._step_jit(self._state, actions)
        self._last_obs = obs
        if self.config["image_observation"]:
            obs = self._image_obs(obs)
        return obs, reward, terminated, truncated, info

    # ---- camera observation assembly (ImageStateObservation,
    #      obs/image_obs.py:16-44; frame stack semantics of ImageObservation
    #      .observe — roll the stack, newest frame last) -------------------
    def _sensor_spec(self):
        cfg = self.config
        modality, w, h = cfg["sensors"][cfg["image_source"]]
        return str(modality), int(w), int(h)

    def _render_frame(self, state):
        from metadrive_ped_tpu.ops import camera as cam_ops
        modality, w, h = self._sensor_spec()
        if modality == "mini_map":
            # MiniMap panel sensor (component/sensors/mini_map.py): a BEV
            # camera hovering above the vehicle aimed 20 m ahead, rendered
            # from the baked map textures (physics-mode analog)
            from metadrive_ped_tpu.obs import top_down
            if getattr(self, "_minimap_tex", None) is None:
                self._minimap_tex = top_down.bake_map_textures(
                    self._pack, self.scene.num_scenarios
                )
            tex, origins = self._minimap_tex
            return top_down.observe_mini_map(
                tex, origins, state.sidx, state.ego, state.npc,
                width=w, height=h,
            )
        targets, kinds = self._lidar_targets(state)
        cam = self.config["camera"]
        out = cam_ops.render(
            self.scene, state.sidx, state.ego, targets, kinds,
            self.scene.obj_kind[state.sidx],
            width=w, height=h, fov_deg=cam["fov"], pitch_deg=cam["pitch"],
            cam_height=cam["height"], max_dist=cam["max_dist"],
        )
        return out[modality]

    def _image_obs(self, state_obs_vec):
        frame = np.asarray(self._render_jit(self._state))  # [E, H, W, C]
        if not self.config["norm_pixel"]:
            frame = (frame * 255).astype(np.uint8)
        if self._img_stack is None:
            self._img_stack = np.zeros(
                frame.shape + (self.config["stack_size"],), frame.dtype
            )
        self._img_stack = np.roll(self._img_stack, -1, axis=-1)
        self._img_stack[..., -1] = frame
        return {"image": self._img_stack.copy(), "state": state_obs_vec}

    # -- state snapshots (the reference's record/replay substrate:
    #    engine.dump_episode / ReplayManager force-set,
    #    base_engine.py:480-487; here the entire [E,...] pytree IS the
    #    episode state, so checkpoint/resume is a tree copy) ----------------
    def set_break_down(self, rows=None, break_down=True):
        """In-sim fault injection (vehicle.set_break_down,
        base_vehicle.py:939-941): the selected env rows' vehicles stop
        responding to actions until un-set or respawned. ``rows`` = bool
        mask [E], index list, or None for all rows."""
        st = self._state
        assert st is not None, "reset() the env before injecting faults"
        flags = np.asarray(st.ego.break_down).copy()
        if rows is None:
            flags[:] = break_down
        else:
            flags[np.asarray(rows)] = break_down
        self._state = st.replace(
            ego=st.ego.replace(break_down=jnp.asarray(flags))
        )

    def snapshot(self):
        """Full simulation state as a host-side pytree of numpy arrays."""
        return jax.tree_util.tree_map(np.asarray, self._state)

    def restore(self, snap):
        """Restore a snapshot taken from an env with identical config."""
        self._state = jax.tree_util.tree_map(jnp.asarray, snap)
        self._last_obs = self._observe(
            self._state, jnp.zeros(self.num_envs), jnp.zeros(self.num_envs)
        )

    def rollout(self, n_steps, policy_fn=None, actions=None, collect=("reward",)):
        """Run n_steps entirely on-device via lax.scan (no per-step host
        dispatch — the TPU analog of collecting a rollout inside the
        training loop). policy_fn(obs, state) -> [E,2] actions; or fixed
        ``actions``. Returns (stacked collected arrays dict, mean_reward).
        """
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
                        ego_speed=state.ego.speed, ego_action=state.ego.current_action,
                        npc_pos=state.npc.pos, npc_heading=state.npc.heading,
                        npc_speed=state.npc.speed, npc_active=state.npc.active,
                        state=state,
                    )
                    out = {k: special[k] if k in special else info[k] for k in collect}
                    return (state, obs), out
                (state, obs), outs = jax.lax.scan(body, (state, obs0), None, length=n_steps)
                return state, obs, outs
            self._rollout_jit = jax.jit(run)
            self._rollout_cache_key = key

        obs0 = self._last_obs
        fixed = actions if actions is not None else jnp.zeros((self.num_envs, 2), jnp.float32)
        self._state, obs, outs = self._rollout_jit(self._state, obs0, jnp.asarray(fixed, jnp.float32))
        mean_reward = float(jnp.mean(outs["reward"])) if "reward" in outs else 0.0
        return outs, mean_reward

    def record_episode(self, n_steps, policy_fn=None, actions=None):
        """Per-frame FrameInfo recording (RecordManager,
        manager/record_manager.py: every frame's complete object states +
        policy outputs). Here a frame IS the full SimState pytree, so the
        recording is the stacked pytree [T, E, ...] plus obs/reward/done —
        pickleable, and any frame restores exactly (replay_frame).
        Debugging-scale: memory = T x the live state."""
        outs, _ = self.rollout(
            n_steps, policy_fn=policy_fn, actions=actions,
            collect=("state", "obs", "reward", "terminated", "truncated",
                     "ego_action"),
        )
        return jax.tree_util.tree_map(np.asarray, outs)

    def replay_frame(self, recording, t):
        """ReplayManager force-set (manager/replay_manager.py): restore the
        world exactly as it was after recorded step t and return the obs.
        Deterministic stepping from here reproduces the recorded future."""
        frame = jax.tree_util.tree_map(lambda x: x[t], recording["state"])
        self.restore(frame)
        return self._last_obs

    def dump_all_maps(self, path):
        """Write the compiled scene pack to pkl
        (PGMapManager.dump_all_maps, pg_map_manager.py:92-110). A later env
        with map_pack_file=path skips map generation entirely."""
        import pickle
        with open(path, "wb") as f:
            pickle.dump(
                dict(pack=self._pack,
                     num_scenarios=self.config["num_scenarios"],
                     start_seed=self.config["start_seed"]),
                f,
            )
        return path

    def get_map_features(self, scenario_index=0):
        """Lane centerlines + boundary lines of one compiled scenario as an
        SD map_features dict (BaseMap.get_map_features parity,
        base_map.py:163-172; consumed by scenario.utils.draw_map — the
        export-map workflow of tests/test_functionality/test_export_map.py)."""
        from metadrive_ped_tpu.scenario.recorder import _map_features
        return _map_features(self._pack, int(scenario_index))

    def render(self, mode="topdown", **kwargs):
        """RGB frame of one env (reference: BaseEnv.render + the pygame
        TopDownRenderer, obs/top_down_renderer.py). Modes: "topdown" /
        "top_down_plt" (BEV map + object stamps) or "rgb_array" (TPU raycast
        camera)."""
        from metadrive_ped_tpu.obs.render import (
            render_dashboard, render_rgb_array, render_topdown,
        )
        if self._state is None:
            raise RuntimeError("call reset() before render()")
        if mode in ("topdown", "top_down", "bev", "top_down_plt"):
            return render_topdown(self, **kwargs)
        if mode in ("rgb_array", "camera"):
            return render_rgb_array(self, **kwargs)
        if mode == "dashboard":
            return render_dashboard(self, **kwargs)
        raise ValueError(f"unknown render mode {mode!r}")

    def close(self):
        self._state = None

    # -------------------------------------------------------------- spawning
    def _spawn(self, rng, sidx, slot=None):
        """Fresh per-env episode state for scenario indices sidx [E],
        spawning at slot (default 0 = the single-agent entrance slot)."""
        scene = self.scene
        E = sidx.shape[0]
        if slot is None:
            if self.config["random_spawn_lane_index"]:
                # uniform over the scenario's valid spawn slots (= entrance
                # lanes for single-agent scenes)
                SLOT = scene.slot_valid.shape[1]
                keys = jax.vmap(lambda k: jax.random.fold_in(k, 79))(rng)
                noise = jax.vmap(lambda k: jax.random.uniform(k, (SLOT,)))(keys)
                score = jnp.where(scene.slot_valid[sidx], noise, -1.0)
                best = score.max(axis=1)
                oh = (score == best[:, None]) & (jnp.cumsum(score == best[:, None], axis=1) == 1)
                slot = (oh * jnp.arange(SLOT)).sum(axis=1).astype(jnp.int32)
            else:
                slot = jnp.zeros(E, jnp.int32)
        # row-gather + one-hot pick over the tiny SLOT axis; poses come from
        # the host-precomputed spawn tables (core/structs.py) — this path
        # runs in the auto-reset merge EVERY step, and the in-kernel
        # gather_lane + position it replaces was a profiled one-hot
        # contraction per step (as was the pointwise [sidx, slot] 2D gather
        # before that)
        from metadrive_ped_tpu.ops.gather import onehot_of, onehot_pick
        spawn_lane = onehot_pick(scene.slot_lane[sidx], slot)
        oh = onehot_of(slot, scene.slot_lane.shape[1])          # [E, SLOT]
        pos = jnp.einsum("es,esd->ed", oh, scene.slot_pos[sidx])
        heading = onehot_pick(scene.slot_heading[sidx], slot)
        zeros = jnp.zeros(E)
        ego = EgoState(
            pos=pos, heading=heading, speed=zeros, vel_dir=zeros,
            steering=zeros, throttle=zeros,
            last_action=jnp.zeros((E, 2)), current_action=jnp.zeros((E, 2)),
            last_pos=pos, last_heading=heading,
            lane=spawn_lane, route_idx=jnp.zeros(E, jnp.int32), slot=slot,
            on_lane=jnp.ones(E, bool),
            crash_vehicle=jnp.zeros(E, bool), crash_object=jnp.zeros(E, bool),
            crash_human=jnp.zeros(E, bool), crash_building=jnp.zeros(E, bool),
            crash_sidewalk=jnp.zeros(E, bool),
            on_yellow_line=jnp.zeros(E, bool), on_white_line=jnp.zeros(E, bool),
            out_of_route=jnp.zeros(E, bool),
            past_pos=jnp.tile(pos[:, None, :], (1, PAST_POS_STEPS, 1)),
            break_down=jnp.zeros(E, bool),
            params=self._ego_params(rng, E),
        )
        npc_lane = scene.npc_lane[sidx]              # [E,N]
        npc_long = scene.npc_long[sidx]
        # spawn poses are static per scenario — plain row gathers of the
        # host-precomputed tables instead of an [E,N] one-hot lane lookup
        npc_pos = scene.npc_spawn_pos[sidx]
        npc_heading = scene.npc_spawn_heading[sidx]
        nz = jnp.zeros_like(npc_long)
        # Respawn: all NPCs live immediately. Trigger/Hybrid: released when
        # the ego enters the trigger road (traffic_manager.py:20-29, 69).
        respawn_mode = self.config["traffic_mode"] == "respawn"
        active = scene.npc_valid[sidx]
        npc = NpcState(
            pos=npc_pos, heading=npc_heading, speed=nz, vel_dir=nz,
            lane=npc_lane, active=active,
            released=active if respawn_mode else jnp.zeros_like(active),
            heading_pid_i=nz, heading_pid_e=nz, lateral_pid_i=nz, lateral_pid_e=nz,
            # staggered overtake timers (reference seeds them randomly,
            # idm_policy.py:231)
            overtake_timer=jnp.tile((jnp.arange(npc_lane.shape[1]) * 17) % 50, (E, 1)),
            params=make_vehicle_params(scene.npc_class[sidx]),
        )
        ped = PedState(
            long=scene.ped_long[sidx],
            direction=jnp.ones_like(scene.ped_long[sidx]),
            active=scene.ped_valid[sidx],
        )
        return SimState(
            rng=rng, sidx=sidx, step_count=jnp.zeros(E, jnp.int32),
            episode_reward=zeros, episode_cost=zeros, episode_energy=zeros,
            dead_timer=jnp.zeros(E, jnp.int32), aux=jnp.zeros((E, 4)),
            policy_state=jnp.zeros((E, 4)),
            scenario_cap=jnp.full((E,), self.num_scenarios, jnp.int32),
            ego=ego, npc=npc, ped=ped,
        )

    def _ego_params(self, rng, E):
        """Default-class params, optionally re-sampled per episode from the
        random_dynamics ranges (VaryingDynamicsAgentManager,
        varying_dynamics_env.py:28-49)."""
        if self.config["random_agent_model"]:
            # uniform class draw per episode (vehicle_type.py:269-282
            # random_vehicle_type with default p, via agent_manager.py:41)
            ckeys = jax.vmap(lambda k: jax.random.fold_in(k, 78))(rng)
            cls = jax.vmap(
                lambda k: jax.random.randint(k, (), 0, len(VEHICLE_CLASS_ORDER))
            )(ckeys)
            base = make_vehicle_params(cls.astype(jnp.int32))
        else:
            base = make_vehicle_params(jnp.full((E,), DEFAULT_CLASS_IDX, jnp.int32))
        # user vehicle_config overrides (BaseVehicle reads these per vehicle,
        # base_vehicle.py:447-484 _apply_throttle_brake + max_speed_km_h
        # governor) — applied when set away from the defaults so explicit
        # config keys are never silently ignored
        vc = self.config["vehicle_config"]
        if vc["max_engine_force"] != 800.0:
            base = base.replace(
                accel_gain=jnp.full((E,), BICYCLE_REF_ACCEL
                                    * (vc["max_engine_force"] / 1100.0) / (800.0 / 1100.0))
            )
        if vc["max_brake_force"] != 130.0:
            base = base.replace(
                brake_gain=jnp.full((E,), BICYCLE_REF_BRAKE * (vc["max_brake_force"] / 130.0))
            )
        if vc["max_steering"] != 40.0:
            base = base.replace(max_steer_rad=jnp.full((E,), float(np.radians(vc["max_steering"]))))
        if vc["max_speed_km_h"] != 80.0:
            base = base.replace(max_speed_kmh=jnp.full((E,), float(vc["max_speed_km_h"])))
        rd = self.config["random_dynamics"]
        if not rd:
            return base
        keys = jax.vmap(lambda k: jax.random.fold_in(k, 77))(rng)
        draws = jax.vmap(lambda k: jax.random.uniform(k, (5,)))(keys)  # [E,5]

        def rng_range(i, lo_hi, default):
            if lo_hi is None:
                return jnp.full((E,), default)
            lo, hi = lo_hi
            return lo + draws[:, i] * (hi - lo)

        engine = rng_range(0, rd.get("max_engine_force"), 800.0)
        brake = rng_range(1, rd.get("max_brake_force"), 130.0)
        steer = rng_range(2, rd.get("max_steering"), 40.0)
        mass = rng_range(3, rd.get("mass"), 1100.0)
        # wheel_friction scales how sharply the car can actually turn
        fric = rng_range(4, rd.get("wheel_friction"), 0.9)
        return base.replace(
            accel_gain=BICYCLE_REF_ACCEL * (engine / mass) / (800.0 / 1100.0),
            brake_gain=BICYCLE_REF_BRAKE * (brake / 130.0),
            max_steer_rad=jnp.radians(steer),
            wheelbase_eff=base.wheelbase_eff * jnp.clip(0.9 / fric, 0.5, 2.0),
        )

    def _seed_of(self, sidx):
        """Local scenario index -> global seed (identity + offset without
        striding; one-hot table lookup when this worker holds a stride)."""
        if self.config["num_workers"] <= 1:
            return sidx + self.config["start_seed"]
        from metadrive_ped_tpu.ops.gather import vector_lookup
        return vector_lookup(jnp.asarray(self._seeds), sidx)

    def _reset_impl(self, rng):
        E = self.num_envs
        keys = jax.random.split(rng, E + 1)
        env_rng = keys[1:]
        # scenario assignment: uniform over [0, num_scenarios)
        # (reference _reset_global_seed, base_env.py:886-891)
        sidx = jax.random.randint(keys[0], (E,), 0, self.num_scenarios)
        state = self._spawn(env_rng, sidx)
        obs = self._observe(state, self.scene.slot_long[sidx, state.ego.slot], jnp.zeros(E))
        info = dict(env_seed=self._seed_of(sidx))
        return state, obs, info

    def _extra_vehicle_targets(self, state):
        """Hook: additional vehicle-like bodies (MARL: the other agents of
        the same env). Returns (pos,heading,len,wid,active) [E,X,...] or
        None."""
        return None

    def _override_kinematics(self, state, ego, dt, rep):
        """Hook: replace the bicycle-model pose for selected rows (rule-based
        TinyInter agents advance kinematically along their lane)."""
        return ego

    def _freeze_mask(self, state):
        """Hook: [E] bool — rows whose ego must stay frozen this step
        (MARL delay-done corpses). None = nothing frozen."""
        return None

    def _lidar_targets(self, state):
        """Combined (pos, heading, len, wid, active) arrays of every
        lidar-visible / collidable body: NPC vehicles + static traffic
        objects + pedestrians/cyclists (reference lidar mask, lidar.py:28)
        + any extra vehicle targets (other MARL agents).

        kinds["radius"] marks the reference's cylinder bodies (pedestrian
        r=0.35, cone r=0.2, warning r=0.5 — pedestrian.py:12-118,
        traffic_object.py:43-160): radius > 0 rows ray-cast and collide as
        circles. It is None when the compiled scenes contain no cylinder
        bodies at all, so the plain-vehicle hot path pays nothing."""
        scene, sidx, npc = self.scene, state.sidx, state.npc
        ped_pos, ped_heading = participants.ped_world_pose(scene, sidx, state.ped)
        pos = [npc.pos, scene.obj_pos[sidx], ped_pos]
        heading = [npc.heading, scene.obj_heading[sidx], ped_heading]
        length = [npc.params.length, scene.obj_len[sidx], scene.ped_len[sidx]]
        width = [npc.params.width, scene.obj_wid[sidx], scene.ped_wid[sidx]]
        active = [npc.active, scene.obj_valid[sidx], state.ped.active]
        N, O, P = npc.pos.shape[1], scene.obj_pos.shape[1], ped_pos.shape[1]
        extra = self._extra_vehicle_targets(state)
        X = 0
        if extra is not None:
            for lst, arr in zip((pos, heading, length, width, active), extra):
                lst.append(arr)
            X = extra[0].shape[1]
        pos = jnp.concatenate(pos, axis=1)
        radius = None
        if self._scene_has_cylinders():
            from metadrive_ped_tpu.mapgen.scene import (
                OBJ_CONE, OBJ_WARNING, PED_WALKER
            )
            okind = scene.obj_kind[sidx]
            obj_r = jnp.where(okind == OBJ_CONE, 0.2,
                              jnp.where(okind == OBJ_WARNING, 0.5, 0.0))
            ped_r = jnp.where(scene.ped_kind[sidx] == PED_WALKER, 0.35, 0.0)
            radius = jnp.concatenate([
                jnp.zeros((pos.shape[0], N)), obj_r, ped_r,
                jnp.zeros((pos.shape[0], X)),
            ], axis=1)
        kinds = dict(
            npc=slice(0, N), obj=slice(N, N + O), ped=slice(N + O, N + O + P),
            agents=slice(N + O + P, N + O + P + X), radius=radius,
            circle_slice=slice(N, N + O + P),
        )
        return (
            pos,
            jnp.concatenate(heading, axis=1),
            jnp.concatenate(length, axis=1),
            jnp.concatenate(width, axis=1),
            jnp.concatenate(active, axis=1),
        ), kinds

    def _scene_has_cylinders(self):
        """Static (host-side) check: does ANY compiled scene carry a
        cone/warning object or a pedestrian walker?"""
        cached = getattr(self, "_has_cylinders", None)
        if cached is None:
            from metadrive_ped_tpu.mapgen.scene import (
                OBJ_CONE, OBJ_WARNING, PED_WALKER
            )
            ok = np.asarray(self.scene.obj_kind)
            ov = np.asarray(self.scene.obj_valid)
            pk = np.asarray(self.scene.ped_kind)
            pv = np.asarray(self.scene.ped_valid)
            cached = bool(
                (ov & ((ok == OBJ_CONE) | (ok == OBJ_WARNING))).any()
                or (pv & (pk == PED_WALKER)).any()
            )
            self._has_cylinders = cached
        return cached

    def _step_traffic(self, state, npc, ego, dt, rep, light_block):
        """Advance NPC traffic one decision step (IDM + optional expert
        slots). MARL envs override this to step traffic once per ENV against
        all agent rows instead of once per agent."""
        cfg = self.config
        scene = self.scene
        expert_actions = expert_mask = None
        if cfg["rl_agent_ratio"] > 0:
            from metadrive_ped_tpu.ops import mixed_traffic
            expert_actions = mixed_traffic.expert_npc_actions(
                scene, state.sidx, npc, ego, self._npc_expert_params,
                num_lasers=cfg["vehicle_config"]["lidar"]["num_lasers"],
                distance=cfg["vehicle_config"]["lidar"]["distance"],
            )
            expert_mask = scene.npc_expert[state.sidx]
        return idm.step_npcs(
            scene, state.sidx, npc, ego, dt=dt, substeps=rep,
            respawn_mode=cfg["traffic_mode"] in ("respawn", "hybrid"),
            expert_actions=expert_actions, expert_mask=expert_mask,
            light_block=light_block,
        )

    def _resolve_contacts(self, state, ego, npc, hits, kinds, t_pos, t_heading,
                          t_len, t_wid, frozen):
        """Batched rigid contact response (replaces Bullet's solver,
        engine_core.py:350-352): for every ego<->body overlap compute the SAT
        minimum-translation vector, split it between the two dynamic bodies
        (equal mass; objects/buildings are static -> ego takes the full
        push), and remove each body's closing velocity component. Pedestrians
        don't block the chassis (character bodies in the reference fork);
        crash_human stays a flag."""
        C = t_pos.shape[1]
        depth, normal = collision.obb_obb_mtv(
            ego.pos[:, None, :], ego.heading[:, None],
            ego.params.length[:, None], ego.params.width[:, None],
            t_pos, t_heading, t_len, t_wid,
        )
        depth = jnp.maximum(depth, 0.0)
        # per-kind ego push fraction over the concatenated target axis
        frac = np.zeros(C, np.float32)
        frac[kinds["npc"]] = 0.5
        frac[kinds["obj"]] = 1.0
        frac[kinds["agents"]] = 0.5   # the other agent resolves its own half
        frac = jnp.asarray(frac)
        contact = hits & (frac > 0)

        push = jnp.where(contact, depth * frac, 0.0)[..., None] * normal
        push = push.sum(axis=1)
        # cap a single-step correction (deep spawn overlaps shouldn't teleport)
        mag = jnp.sqrt((push ** 2).sum(-1, keepdims=True))
        push = push * jnp.minimum(1.0, 1.0 / jnp.maximum(mag, 1.0))
        scale = collision.contact_speed_scale(
            ego.speed, ego.heading + ego.vel_dir, normal, contact
        )
        if frozen is not None:
            push = jnp.where(frozen[:, None], 0.0, push)
            scale = jnp.where(frozen, 1.0, scale)
        ego = ego.replace(pos=ego.pos + push, speed=ego.speed * scale)

        # NPCs take the opposite half of their contact with the ego
        sl = kinds["npc"]
        n_hit, n_depth, n_normal = hits[:, sl], depth[:, sl], normal[:, sl]
        n_push = jnp.where(n_hit, -0.5 * n_depth, 0.0)[..., None] * n_normal
        n_scale = collision.contact_speed_scale(
            npc.speed, npc.heading + npc.vel_dir,
            -n_normal[:, :, None, :], n_hit[:, :, None],
        )
        npc = npc.replace(pos=npc.pos + n_push, speed=npc.speed * n_scale)
        return ego, npc

    def _observe(self, state, ego_long, ego_lat):
        vc = self.config["vehicle_config"]
        lidar_cfg = vc["lidar"]
        targets, t_kinds = self._lidar_targets(state)
        noisy = lidar_cfg["gaussian_noise"] > 0 or lidar_cfg["dropout_prob"] > 0
        rng = None
        if noisy:
            rng = jax.random.fold_in(
                jax.random.PRNGKey(0), jnp.sum(state.step_count)
            )
        side_lasers = vc["side_detector"]["num_lasers"]
        ll_lasers = vc["lane_line_detector"]["num_lasers"]
        line_segs = None
        if side_lasers > 0 or ll_lasers > 0:
            scene, sidx = self.scene, state.sidx
            styp = scene.seg_type[sidx]
            valid = scene.seg_valid[sidx]
            cont = ((styp == SEG_YELLOW_LINE) | (styp == SEG_WHITE_LINE)) & valid
            anyline = cont | ((styp == SEG_BROKEN_LINE) & valid)
            line_segs = (*scene.seg_points(sidx), cont, anyline)
        return state_obs.observe(
            self.scene, state.sidx, state.ego, targets, ego_long, ego_lat,
            num_lasers=lidar_cfg["num_lasers"], lidar_distance=lidar_cfg["distance"],
            num_others=lidar_cfg["num_others"], npc=state.npc,
            gaussian_noise=lidar_cfg["gaussian_noise"],
            dropout_prob=lidar_cfg["dropout_prob"], rng=rng,
            side_lasers=side_lasers, side_distance=vc["side_detector"]["distance"],
            lane_line_lasers=ll_lasers,
            lane_line_distance=vc["lane_line_detector"]["distance"],
            line_segs=line_segs,
            random_agent_model=self.config["random_agent_model"],
            t_radius=t_kinds["radius"], circle_slice=t_kinds["circle_slice"],
        )

    # ------------------------------------------------------------------ step
    def _step_impl(self, state, actions, prev_obs=None):
        cfg = self.config
        scene = self.scene
        E = self.num_envs
        # NaN -> 0, +/-inf -> +/-1, clip to [-1, 1]
        # (reference _preprocess_action -> safe_clip_for_small_array,
        # base_vehicle.py:204-209 + utils/math.py:16-26)
        actions = jnp.clip(jnp.nan_to_num(actions, nan=0.0, posinf=1.0, neginf=-1.0), -1.0, 1.0)
        # fault injection: broken-down vehicles ignore their actions and
        # coast to a stop (set_break_down, base_vehicle.py:939-941 — the
        # reference's breakdown car simply has no policy actuating it)
        actions = jnp.where(state.ego.break_down[:, None], 0.0, actions)

        takeover_info = None
        if cfg["agent_policy"] == "lane_change":
            state, actions = self._lane_change_actions(state, actions)
        if cfg["use_AI_protector"] and prev_obs is not None:
            state, actions, takeover_info = self._ai_protect(state, actions, prev_obs)

        ego = state.ego
        # before_step (base_vehicle.py:211-232): save last kinematics, apply action
        ego = ego.replace(
            last_pos=ego.pos, last_heading=ego.heading,
            last_action=ego.current_action, current_action=actions,
            steering=actions[:, 0], throttle=actions[:, 1],
            past_pos=jnp.concatenate([ego.past_pos[:, 1:], ego.pos[:, None]], axis=1),
        )

        # ego dynamics (decision_repeat substeps)
        dt = cfg["physics_world_step_size"]
        rep = cfg["decision_repeat"]
        pos, heading, speed, vel_dir = dynamics.step_vehicle(
            ego.pos, ego.heading, ego.speed, ego.vel_dir,
            ego.steering, ego.throttle, ego.params, dt=dt, substeps=rep,
            enable_reverse=cfg["vehicle_config"]["enable_reverse"],
        )
        frozen = self._freeze_mask(state)
        if frozen is not None:
            keep2 = lambda new, old: jnp.where(
                frozen.reshape(frozen.shape + (1,) * (old.ndim - 1)), old, new
            )
            pos = keep2(pos, ego.pos)
            heading = keep2(heading, ego.heading)
            speed = keep2(speed, ego.speed)
            vel_dir = keep2(vel_dir, ego.vel_dir)
        ego = ego.replace(pos=pos, heading=heading, speed=speed, vel_dir=vel_dir)
        # hook: rows driven kinematically instead of by the bicycle model
        # (TinyInterRuleBasedPolicy teleports along the routing lane,
        # tinyinter.py:193-221); default no-op
        ego = self._override_kinematics(state, ego, dt, rep)

        # PG traffic-light phases (opt-in): green -> yellow -> red per arm,
        # opposite arms antiphased (mapgen/scene.py light_offset). Computed
        # before the NPC step so red lights gate IDM traffic too.
        light_ctx = None
        if scene.light_lane.shape[1] > 0 and cfg["pg_traffic_lights"]:
            lcfg = cfg["pg_traffic_lights"]
            g_dur = int(lcfg.get("green", 30)) if isinstance(lcfg, dict) else 30
            y_dur = int(lcfg.get("yellow", 4)) if isinstance(lcfg, dict) else 4
            half = g_dur + y_dur
            phase = (state.step_count[:, None] + scene.light_offset[state.sidx]) % (2 * half)
            status = jnp.where(phase < g_dur, 0, jnp.where(phase < half, 1, 2))  # g/y/r
            light_ctx = dict(
                status=status, valid=scene.light_valid[state.sidx],
                lane=scene.light_lane[state.sidx], long=scene.light_long[state.sidx],
                pos=scene.light_pos[state.sidx],
                heading=scene.light_heading[state.sidx],
                width=scene.light_width[state.sidx],
            )

        # NPC traffic: release by trigger road, IDM actuation, dynamics
        npc = state.npc
        cur_road = localization.route_road_at(scene, state.sidx, ego.slot, ego.route_idx)
        trig = scene.npc_trigger_road[state.sidx]  # [E,N]
        released = npc.released | (trig == cur_road[:, None])
        npc = npc.replace(released=released)
        light_block = None
        if light_ctx is not None:
            # red lights hold IDM NPCs at the stop line (the air wall is a
            # physical body in the reference, base_traffic_light.py:45-51)
            light_block = (
                light_ctx["lane"], light_ctx["long"],
                light_ctx["valid"] & (light_ctx["status"] == 2),
            )
        npc = self._step_traffic(state, npc, ego, dt, rep, light_block)

        # pedestrians / cyclists advance kinematically
        ped = participants.step_peds(scene, state.sidx, state.ped, dt * rep)
        state = state.replace(ego=ego, npc=npc, ped=ped)

        # contact flags (_state_check, base_vehicle.py:700-792)
        targets, kinds = self._lidar_targets(state)
        t_pos, t_heading, t_len, t_wid, t_active = targets
        t_radius = kinds["radius"]
        hits = collision.obb_obb_overlap(
            ego.pos[:, None, :], ego.heading[:, None],
            ego.params.length[:, None], ego.params.width[:, None],
            t_pos, t_heading, t_len, t_wid,
        ) & t_active
        if t_radius is not None:
            # cylinder bodies (pedestrians/cones/warnings) use the exact
            # OBB-vs-circle test for crash onset instead of their bounding
            # box (reference shapes: pedestrian.py:12-118, traffic_object.py)
            sl = kinds["circle_slice"]
            circ = t_radius[:, sl] > 0
            circ_hits = collision.obb_circle_overlap(
                ego.pos[:, None, :], ego.heading[:, None],
                ego.params.length[:, None], ego.params.width[:, None],
                t_pos[:, sl], t_radius[:, sl],
            ) & t_active[:, sl] & circ
            hits = hits.at[:, sl].set(jnp.where(circ, circ_hits, hits[:, sl]))
        crash_v = hits[:, kinds["npc"]].any(axis=1) | hits[:, kinds["agents"]].any(axis=1)
        obj_hits = hits[:, kinds["obj"]]
        # toll booths are buildings, not traffic objects (crash_building vs
        # crash_object, base_vehicle.py _state_check classification)
        is_building = scene.obj_kind[state.sidx] == OBJ_BUILDING
        crash_o = (obj_hits & ~is_building).any(axis=1)
        crash_b = (obj_hits & is_building).any(axis=1)
        crash_h = hits[:, kinds["ped"]].any(axis=1)

        # rigid contact response: project the bodies apart and kill the
        # closing velocity, the batched analog of Bullet's per-substep
        # contact resolution (engine_core.py:350-352; base_vehicle.py's
        # chassis collides with every other body). Without this the ego
        # drives THROUGH vehicles wherever a crash is non-terminal
        # (SafeMetaDriveEnv, MARL respawn).
        if cfg["contact_response"]:
            ego, npc = self._resolve_contacts(
                state, ego, npc, hits, kinds, t_pos, t_heading, t_len, t_wid,
                frozen,
            )
            state = state.replace(ego=ego, npc=npc)

        # localization + navigation update (after_step,
        # base_vehicle.py:234-253)
        loc = localization.localize(scene, state.sidx, ego.slot, ego.pos, ego.lane, ego.route_idx)
        ego = ego.replace(lane=loc["lane"], route_idx=loc["route_idx"], on_lane=loc["on_lane"])
        seg_pts = scene.seg_points(state.sidx)  # int16 gathers, fused dequant
        seg_flags = collision.vehicle_segment_flags(
            ego.pos, ego.heading, ego.params.length, ego.params.width,
            *seg_pts,
            scene.seg_type[state.sidx], scene.seg_halfwidth[state.sidx],
            scene.seg_valid[state.sidx],
            (SEG_YELLOW_LINE, SEG_WHITE_LINE, SEG_SIDEWALK),
        )
        left, right = localization.boundary_distances(scene, state.sidx, ego.slot, ego.route_idx, ego.pos)
        ego = ego.replace(
            on_yellow_line=seg_flags[SEG_YELLOW_LINE],
            on_white_line=seg_flags[SEG_WHITE_LINE],
            crash_sidewalk=seg_flags[SEG_SIDEWALK],
            crash_vehicle=crash_v,
            crash_object=crash_o,
            crash_building=crash_b,
            crash_human=crash_h,
            out_of_route=(left < 0) | (right < 0),
        )

        step_count = state.step_count + 1
        state = state.replace(ego=ego, npc=npc, step_count=step_count)
        state = self._pre_reward_update(state, loc)

        # reward / done / cost (subclass formulas)
        arrive = localization.arrive_destination(scene, state.sidx, ego.slot, ego.pos)
        out_of_road = self._is_out_of_road(ego, state)
        reward, step_info = self.reward_function(state, loc, arrive, out_of_road)
        cost, cost_info = self.cost_function(state, out_of_road)
        terminated, truncated, done_info = self.done_function(state, arrive, out_of_road)

        episode_reward = state.episode_reward + reward
        episode_cost = state.episode_cost + cost
        # fuel model 3.25*e^(0.01 v_kmh) L/100km (base_vehicle.py:259-271)
        dist_km = jnp.sqrt(((ego.pos - ego.last_pos) ** 2).sum(-1)) / 1000.0
        step_energy = 3.25 * jnp.exp(0.01 * ego.speed * 3.6) * dist_km / 100.0 * 1000.0
        episode_energy = state.episode_energy + step_energy
        state = state.replace(
            episode_reward=episode_reward, episode_cost=episode_cost,
            episode_energy=episode_energy,
        )

        state, terminated, truncated = self._post_done(state, terminated, truncated)
        done = terminated | truncated
        # crash aggregates vehicle/object/building/sidewalk/human
        # (metadrive_env.py:148-152)
        crash_any = (
            ego.crash_vehicle | ego.crash_object | ego.crash_sidewalk
            | ego.crash_human | ego.crash_building
        )
        info = dict(
            arrive_dest=arrive, out_of_road=out_of_road,
            crash_vehicle=ego.crash_vehicle, crash_object=ego.crash_object,
            crash_human=ego.crash_human, crash_sidewalk=ego.crash_sidewalk,
            crash_building=ego.crash_building,
            crash=crash_any,
            max_step=truncated, cost=cost, total_cost=episode_cost,
            step_reward=step_info["step_reward"],
            velocity=ego.speed, steering=ego.steering, acceleration=ego.throttle,
            step_energy=step_energy, episode_energy=episode_energy,
            episode_reward=episode_reward, episode_length=step_count,
            env_seed=self._seed_of(state.sidx),
        )
        info.update({k: v for k, v in step_info.items() if k != "step_reward"})
        info.update(done_info)
        info.update(cost_info)
        if takeover_info is not None:
            info.update(takeover_info)

        # traffic-light contact flags: the ego OBB against each light's
        # air-wall stop region — a 0.25 m x lane-width box across the lane
        # end (BaseTrafficLight AIR_WALL_LENGTH, base_traffic_light.py:17,
        # 44-51; contact classified in base_vehicle.py:720-733)
        if light_ctx is not None:
            wall = collision.obb_obb_overlap(
                ego.pos[:, None, :], ego.heading[:, None],
                ego.params.length[:, None], ego.params.width[:, None],
                light_ctx["pos"], light_ctx["heading"],
                jnp.full_like(light_ctx["width"], 0.25), light_ctx["width"],
            ) & light_ctx["valid"]
            status = light_ctx["status"]
            info["on_green_light"] = (wall & (status == 0)).any(axis=1)
            info["on_yellow_light"] = (wall & (status == 1)).any(axis=1)
            info["on_red_light"] = (wall & (status == 2)).any(axis=1)

        # auto-reset done envs in place (vectorized-RL semantics replacing
        # the reference's explicit env.reset())
        done = self._reset_mask(state, done)
        if cfg["auto_reset"]:
            new_keys = jax.vmap(jax.random.split)(state.rng)      # [E,2,2]
            step_rng, reset_rng = new_keys[:, 0], new_keys[:, 1]
            cap = state.scenario_cap  # traced: level-up = host-side swap
            new_sidx = jax.vmap(
                lambda k, c: jax.random.randint(k, (), 0, c)
            )(step_rng, cap)
            fresh = self._spawn(reset_rng, new_sidx)
            state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    done.reshape(done.shape + (1,) * (old.ndim - 1)), new, old
                ),
                fresh, state.replace(rng=step_rng),
            )
            # _spawn bakes the compile-time cap; keep the live (possibly
            # curriculum-narrowed) one
            state = state.replace(scenario_cap=cap)
            ego_long = jnp.where(done, 5.0, loc["long"])
            ego_lat = jnp.where(done, 0.0, loc["lat"])
        else:
            ego_long, ego_lat = loc["long"], loc["lat"]

        obs = self._observe(state, ego_long, ego_lat)
        return state, obs, reward, terminated, truncated, info

    # ---- agent policies -----------------------------------------------------
    def _lane_change_actions(self, state, actions):
        """LaneChangePolicy (policy/lange_change_policy.py:11-72): discrete
        steering {-1: right, 0: keep, +1: left} selects a target lane; the
        applied steering is a heading PID + lateral PID toward it.
        policy_state = (heading_i, heading_prev_e, lateral_i, lateral_prev_e).
        """
        from metadrive_ped_tpu.ops.idm import _pid
        from metadrive_ped_tpu.ops.math_ops import wrap_to_pi

        scene, ego = self.scene, state.ego
        cmd = actions[:, 0]
        g = lane_geom.gather_lane(scene, state.sidx, ego.lane)
        target = jnp.where(
            cmd > 0.5, jnp.where(g["left"] >= 0, g["left"], ego.lane),
            jnp.where(cmd < -0.5, jnp.where(g["right"] >= 0, g["right"], ego.lane), ego.lane),
        )
        gt = lane_geom.gather_lane(scene, state.sidx, target)
        long, lat = lane_geom.local_coordinates(gt, ego.pos)
        lane_heading = lane_geom.heading_theta_at(gt, long + 1.0)
        herr = -wrap_to_pi(lane_heading - ego.heading)
        ps = state.policy_state
        # gains from the reference (lange_change_policy.py:26-27); the error
        # signs match the IDM steering kernel's convention (ops/idm.py:148-150)
        s_h, h_i, h_e = _pid((1.7, 0.01, 3.5), herr, ps[:, 0], ps[:, 1])
        s_l, l_i, l_e = _pid((0.3, 0.002, 0.05), -lat, ps[:, 2], ps[:, 3])
        steering = jnp.clip(s_h + s_l, -1.0, 1.0)
        new_ps = jnp.stack([h_i, h_e, l_i, l_e], axis=-1)
        return (
            state.replace(policy_state=new_ps),
            jnp.stack([steering, actions[:, 1]], axis=-1),
        )

    def _ai_protect(self, state, actions, prev_obs):
        """AIProtectPolicy / TakeoverPolicy (policy/AI_protect_policy.py):
        the PPO expert vetoes dangerous user actions. save_level > 0.9 means
        full takeover; otherwise the expert intervenes near road boundaries
        (obs dims 0/1) and when lidar shows imminent side/front collisions.
        policy_state[:, 3] latches last step's takeover flag (for
        takeover_start/takeover_end info keys)."""
        from metadrive_ped_tpu.ops import localization
        from metadrive_ped_tpu.policies.expert import expert_action

        cfg = self.config
        ego = state.ego
        save_level = cfg["save_level"]
        saver = expert_action(self._expert_params, prev_obs)
        steering, throttle = actions[:, 0], actions[:, 1]

        if save_level > 0.9:
            new_s, new_t = saver[:, 0], saver[:, 1]
        elif save_level > 1e-3:
            hd = localization.heading_diff_ref(
                self.scene, state.sidx, ego.slot, ego.route_idx, ego.pos, ego.heading
            ) - 0.5
            speed_kmh = ego.speed * 3.6
            f = jnp.minimum(
                1 + jnp.abs(hd) * speed_kmh * ego.params.max_speed_kmh, save_level * 10
            )
            o0, o1 = prev_obs[:, 0], prev_obs[:, 1]
            out_of_road = (
                ((o0 < 0.04 * f) & (hd < 0)) | ((o1 < 0.04 * f) & (hd > 0))
                | (o0 <= 1e-3) | (o1 <= 1e-3)
            )
            new_s = jnp.where(out_of_road, saver[:, 0], steering)
            new_t = jnp.where(out_of_road, saver[:, 1], throttle)
            new_t = jnp.where(out_of_road & (speed_kmh < 5), 0.5, new_t)
            # collision guards on the lidar tail of the expert obs
            n = cfg["vehicle_config"]["lidar"]["num_lasers"]
            cloud = prev_obs[:, -n:]
            left, right = n // 4, n // 4 * 3
            side_close = (
                cloud[:, left - 4:left + 6].min(axis=1) < (save_level + 0.1) / 10
            ) | (
                cloud[:, right - 4:right + 6].min(axis=1) < (save_level + 0.1) / 10
            )
            new_s = jnp.where(side_close, saver[:, 0], new_s)
            front_close = jnp.minimum(
                cloud[:, :10].min(axis=1), cloud[:, -10:].min(axis=1)
            ) < save_level
            brake = (throttle >= 0) & (saver[:, 1] <= 0) & front_close
            new_t = jnp.where(brake, saver[:, 1], new_t)
        else:
            new_s, new_t = steering, throttle

        takeover = (new_s != steering) | (new_t != throttle)
        pre = state.policy_state[:, 3] > 0.5
        # the saver action is applied only from the SECOND consecutive
        # takeover step, exactly like the reference
        # (AI_protect_policy.py:49-57: action replaced iff takeover and
        # pre_save)
        apply = takeover & pre
        info = dict(
            takeover=apply,
            takeover_start=takeover & ~pre,
            takeover_end=~takeover & pre,
        )
        ps = state.policy_state.at[:, 3].set(takeover.astype(jnp.float32))
        out_actions = jnp.stack(
            [jnp.where(apply, new_s, steering), jnp.where(apply, new_t, throttle)],
            axis=-1,
        )
        return state.replace(policy_state=ps), out_actions, info

    # ---- overridable scheme ------------------------------------------------
    def _pre_reward_update(self, state, loc):
        """Hook after localization/contacts, before reward/done — env families
        update their aux counters here (e.g. tollgate stay time)."""
        return state

    def _post_done(self, state, terminated, truncated):
        """Hook after done computation (MARL delay-done/respawn)."""
        return state, terminated, truncated

    def _reset_mask(self, state, done):
        """Hook mapping per-row done -> rows to auto-reset (MARL resets an
        env only when ALL its agents are finished)."""
        return done

    def _is_out_of_road(self, ego, state=None):
        raise NotImplementedError

    def reward_function(self, state, loc, arrive, out_of_road):
        raise NotImplementedError

    def cost_function(self, state, out_of_road):
        raise NotImplementedError

    def done_function(self, state, arrive, out_of_road):
        raise NotImplementedError
