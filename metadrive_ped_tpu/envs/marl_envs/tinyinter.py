"""MultiAgentTinyInter: mixed rule-based/RL agents on a tiny intersection.

Reference: metadrive/envs/marl_envs/tinyinter.py —
- ``MultiAgentTinyInter`` (:328-415): a MultiAgentIntersectionEnv with a
  1-lane, 4 m-wide, 30 m-exit intersection where only ``num_RL_agents`` of
  the ``num_agents`` slots are externally controlled; the env surface
  (obs/reward/done arrays) exposes ONLY the RL agents.
- ``TinyInterRuleBasedPolicy`` (:193-221): the remaining agents are NOT
  IDM — they advance kinematically along their routing lane at a constant
  target speed (default 10 km/h), teleporting to
  lane.position(long + v*dt*decision_repeat, lat) with the lane's heading.
- ``MixedIDMAgentManager`` (:223-326): per-slot RL-vs-rule assignment; here
  the assignment is static by agent column (a respawned agent keeps its
  column's role — the vectorized analog of the reference's slot
  inheritance in refresh_agent_name_index_mapping).
- ``CommunicationObservation`` (:14-190): LidarStateObservation with
  ``num_others=0`` plus a global per-slot block spliced between the state
  vector and the lidar cloud: for every agent slot j,
  [slot_id=(j+1)/A, rel_pos_x, rel_pos_y, rel_vel_x, rel_vel_y], positions
  clipped to lidar distance, velocities (m/s) to speed_scale=20, each
  mapped through (v/scale+1)/2; inactive slots stay 0.
"""
import jax
import jax.numpy as jnp
import numpy as np

from metadrive_ped_tpu.envs.marl_envs.marl_env import MultiAgentIntersectionEnv
from metadrive_ped_tpu.ops import lane_geom
from metadrive_ped_tpu.ops.math_ops import clip01, heading_vec, rhs_vec

COMM_SPEED_SCALE = 20.0  # tinyinter.py:134 speed_scale


class MultiAgentTinyInter(MultiAgentIntersectionEnv):
    @classmethod
    def default_config(cls):
        config = super().default_config()
        config.update(
            dict(
                num_agents=8,
                num_RL_agents=8,
                success_reward=10.0,
                out_of_road_penalty=10.0,
                crash_vehicle_penalty=10.0,
                crash_object_penalty=10.0,
                # remove dead vehicles immediately (ignore_delay_done=True)
                delay_done=0,
                target_speed=10.0,   # km/h, rule-based agents
                use_communication_obs=False,
                map_config=dict(exit_length=30.0, lane_num=1, lane_width=4.0),
            ),
            allow_add_new_key=True,
        )
        return config

    def __init__(self, config=None):
        super().__init__(config)
        self.num_RL_agents = int(self.config["num_RL_agents"])
        assert 1 <= self.num_RL_agents <= self.agents_per_env
        if self.config["use_communication_obs"]:
            assert self.config["vehicle_config"]["lidar"]["num_others"] == 0, (
                "CommunicationObservation carries all agents; num_others must be 0"
            )

    # rule/RL assignment is static per agent column
    def _rl_row_mask(self):
        A = self.agents_per_env
        col = jnp.arange(self.num_envs) % A
        return col < self.num_RL_agents

    # ---- rule-based rows: kinematic lane following ------------------------
    def _override_kinematics(self, state, ego, dt, rep):
        """TinyInterRuleBasedPolicy.act (tinyinter.py:199-221): advance the
        longitude by target_speed * dt * decision_repeat on the current
        routing lane, keep the lateral, snap heading to the lane heading at
        long+1."""
        if self.num_RL_agents >= self.agents_per_env:
            return ego
        scene = self.scene
        g = lane_geom.gather_lane(scene, state.sidx, ego.lane)
        long, lat = lane_geom.local_coordinates(g, ego.pos)
        inc = self.config["target_speed"] / 3.6 * dt * rep
        new_long = long + inc
        new_pos = lane_geom.position(g, new_long, lat)
        new_heading = lane_geom.heading_theta_at(g, new_long + 1.0)
        rule = ~self._rl_row_mask()
        frozen = self._freeze_mask(state)
        if frozen is not None:
            rule = rule & ~frozen
        return ego.replace(
            pos=jnp.where(rule[:, None], new_pos, ego.pos),
            heading=jnp.where(rule, new_heading, ego.heading),
            # the reference rule policy issues [0,0] actions, so its Bullet
            # speed decays to ~0; the effective speed is carried for the
            # rel-velocity comm features instead
            speed=jnp.where(rule, inc / (dt * rep), ego.speed),
            vel_dir=jnp.where(rule, 0.0, ego.vel_dir),
        )

    # ---- communication observation ---------------------------------------
    def _observe(self, state, ego_long, ego_lat):
        obs = super()._observe(state, ego_long, ego_lat)
        if not self.config["use_communication_obs"]:
            return obs
        E, A = self.num_marl_envs, self.agents_per_env
        rows = E * A
        lidar_cfg = self.config["vehicle_config"]["lidar"]
        dist = lidar_cfg["distance"]

        pos = self._rows_to_EA(state.ego.pos)            # [E,A,2]
        heading = self._rows_to_EA(state.ego.heading)
        speed = self._rows_to_EA(state.ego.speed)
        move = self._rows_to_EA(state.ego.heading + state.ego.vel_dir)
        active = self._rows_to_EA(state.dead_timer == 0)
        vel = speed[..., None] * jnp.stack(
            [jnp.cos(move), jnp.sin(move)], axis=-1
        )                                                # [E,A,2] m/s

        # every row vs every slot of its env
        rel = pos[:, None, :, :] - pos[:, :, None, :]    # [E,Aego,Aother,2]
        hv = heading_vec(heading)
        # LEFT-positive lateral (the comm slots mirror lidar.py's
        # get_surrounding_vehicles_info projections -> base_vehicle.py:
        # 986-988; see localization._checkpoint_info)
        rv = -rhs_vec(heading)
        rx = (rel * hv[:, :, None, :]).sum(-1)
        ry = (rel * rv[:, :, None, :]).sum(-1)
        rp = jnp.stack([rx, ry], axis=-1)
        rp = _clip_norm(rp, dist)
        relv = vel[:, None, :, :] - vel[:, :, None, :]
        vx = (relv * hv[:, :, None, :]).sum(-1)
        vy = (relv * rv[:, :, None, :]).sum(-1)
        rva = _clip_norm(jnp.stack([vx, vy], axis=-1), COMM_SPEED_SCALE)

        slot_id = (jnp.arange(A) + 1.0) / A              # [A]
        parts = [
            jnp.broadcast_to(slot_id[None, None, :, None], (E, A, A, 1)),
            clip01((rp / dist + 1) / 2),
            clip01((rva / COMM_SPEED_SCALE + 1) / 2),
        ]
        res_size = 5
        if lidar_cfg.get("add_others_navi"):
            # each slot also broadcasts its two navigation checkpoints,
            # projected into the observer's frame (tinyinter.py:174-186)
            from metadrive_ped_tpu.ops import localization
            ck1, ck2 = localization.checkpoint_positions(
                self.scene, state.sidx, state.ego.slot, state.ego.route_idx
            )
            for ck in (ck1, ck2):
                ck_ea = self._rows_to_EA(ck)                       # [E,A,2]
                rel_ck = ck_ea[:, None, :, :] - pos[:, :, None, :]  # [E,Aego,Ao,2]
                cx = (rel_ck * hv[:, :, None, :]).sum(-1)
                cy = (rel_ck * rv[:, :, None, :]).sum(-1)
                rc = _clip_norm(jnp.stack([cx, cy], axis=-1), dist)
                parts.append(clip01((rc / dist + 1) / 2))
            res_size = 9
        feats = jnp.concatenate(parts, axis=-1)          # [E,Aego,Aother,res]
        feats = jnp.where(active[:, None, :, None], feats, 0.0)
        comm = feats.reshape(rows, A * res_size)

        # splice between the state vector and the lidar cloud
        # (lidar_observe: other_v_info = global_info + cloud_points)
        n_lasers = lidar_cfg["num_lasers"]
        state_part, cloud = obs[:, : obs.shape[1] - n_lasers], obs[:, obs.shape[1] - n_lasers:]
        return jnp.concatenate([state_part, comm, cloud], axis=-1)

    @property
    def observation_dim(self):
        d = super().observation_dim
        if self.config["use_communication_obs"]:
            res = 9 if self.config["vehicle_config"]["lidar"].get("add_others_navi") else 5
            d += self.agents_per_env * res
        return d

    # ---- RL-only env surface (filter_RL_agents, tinyinter.py:374-395) -----
    def reset(self, seed=0):
        obs, info = super().reset(seed)
        return obs[:, : self.num_RL_agents], info

    def step(self, actions):
        E, K, A = self.num_marl_envs, self.num_RL_agents, self.agents_per_env
        actions = jnp.asarray(actions, jnp.float32).reshape(E, K, 2)
        full = jnp.zeros((E, A, 2), jnp.float32)
        full = full.at[:, :K].set(actions)
        obs, reward, terminated, truncated, info = super().step(full)
        sl = lambda x: x[:, :K] if hasattr(x, "shape") and x.ndim >= 2 and x.shape[:2] == (E, A) else x
        info = {k: sl(v) for k, v in info.items()}
        info["__all__"] = (terminated[:, :K] | truncated[:, :K]).all(axis=1)
        return (obs[:, :K], reward[:, :K], terminated[:, :K], truncated[:, :K], info)


def _clip_norm(vec, max_norm):
    """Scale a vector down to max_norm when it is longer
    (_process_norm, tinyinter.py:124-129)."""
    n = jnp.sqrt((vec ** 2).sum(-1, keepdims=True))
    return jnp.where(n > max_norm, vec / jnp.maximum(n, 1e-9) * max_norm, vec)
