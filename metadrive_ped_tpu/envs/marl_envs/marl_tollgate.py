"""Multi-agent tollgate scene (TPU-native).

Reference: metadrive/envs/marl_envs/marl_tollgate.py — a fixed map
FirstPGBlock(3 lanes) -> Split(to 8 lanes) -> TollGate -> Merge(back to 3),
40 agents spawning at both ends. Agents must pass the toll plaza slower than
the 3 m/s limit and stay inside it for at least ``min_pass_steps`` steps;
speeding in the plaza is penalized, rushing through ends the episode as
out_of_road (StayTimeManager semantics, marl_tollgate.py:38-63, 262-268).

Observation (TollGateObservation, marl_tollgate.py:65-110): side-detector
cloud (72) + 6 core ego dims + lane-line cloud (4) + lidar (72) + 2 toll
flags = 156 dims; no navigation block.

Documented divergence: the stay-time accounting uses a per-agent step
counter inside the toll block rather than entry/exit timestamps (equivalent
observable behavior).
"""
import jax.numpy as jnp

from metadrive_ped_tpu.constants import (
    OBS_MAX_STEERING, SEG_BROKEN_LINE, SEG_WHITE_LINE, SEG_YELLOW_LINE
)
from metadrive_ped_tpu.envs.marl_envs.marl_env import MultiAgentMetaDrive
from metadrive_ped_tpu.ops import lane_geom, raycast
from metadrive_ped_tpu.ops.math_ops import clip01, heading_vec

TOLL_BLOCK_CODE = ord("$")
BOTTLE_LENGTH = 35.0  # MATollGateMap.BOTTLE_LENGTH


class MultiAgentTollgateEnv(MultiAgentMetaDrive):
    @classmethod
    def default_config(cls):
        config = super().default_config()
        toll_lane_num, lane_num = 8, 3
        config.update(
            dict(
                num_agents=40,
                map="$",  # informational; the real map is custom_blocks below
                map_config=dict(
                    lane_width=3.5,
                    lane_num=lane_num,
                    exit_length=70.0,
                    toll_lane_num=toll_lane_num,
                    toll_length=10.0,
                    custom_blocks=None,  # filled from the keys above in __init__
                ),
                # reference MATollConfig spawn roads: first block + the
                # negative side of the Merge block's socket road
                spawn_roads=[(">>", ">>>"), ("-3y0_1_", "-3y0_0_")],
                cross_yellow_line_done=True,
                speed_reward=0.0,
                overspeed_penalty=0.5,
                vehicle_config=dict(
                    min_pass_steps=30,  # >= 6 s inside the plaza
                    side_detector=dict(num_lasers=72, distance=20.0),
                    lane_line_detector=dict(num_lasers=4, distance=20.0),
                    lidar=dict(num_lasers=72, distance=20.0, num_others=0,
                               gaussian_noise=0.0, dropout_prob=0.0),
                ),
            ),
            allow_add_new_key=True,
        )
        return config

    def __init__(self, config=None):
        cfg = self.default_config()
        if config:
            cfg.update(config, allow_add_new_key=True)
        mc = cfg["map_config"]
        mc["custom_blocks"] = [
            dict(id="Y", config=dict(
                length=2.0,
                lane_num=mc["toll_lane_num"] - mc["lane_num"],
                bottle_len=BOTTLE_LENGTH,
            )),
            dict(id="$", config=dict(length=mc["toll_length"])),
            dict(id="y", config=dict(
                lane_num=mc["toll_lane_num"] - mc["lane_num"],
                length=mc["exit_length"],
                bottle_len=BOTTLE_LENGTH,
            )),
        ]
        super().__init__(cfg)

    # ---- observation (TollGateObservation) --------------------------------
    @property
    def observation_dim(self):
        vc = self.config["vehicle_config"]
        return (
            vc["side_detector"]["num_lasers"] + 6
            + vc["lane_line_detector"]["num_lasers"]
            + vc["lidar"]["num_lasers"] + vc["lidar"]["num_others"] * 4 + 2
        )

    def _observe(self, state, ego_long, ego_lat):
        vc = self.config["vehicle_config"]
        scene, sidx, ego = self.scene, state.sidx, state.ego

        seg_line = (
            (scene.seg_type[sidx] == SEG_YELLOW_LINE)
            | (scene.seg_type[sidx] == SEG_WHITE_LINE)
        ) & scene.seg_valid[sidx]
        side = raycast.side_detector_cloud(
            ego.pos, ego.heading, vc["side_detector"]["num_lasers"],
            vc["side_detector"]["distance"],
            scene.seg_p0[sidx], scene.seg_p1[sidx], seg_line,
        )
        # LaneLineDetector sees BOTH line types (BrokenLaneLine |
        # ContinuousLaneLine mask, distance_detector.py:202); broken-line
        # segments are compiled because lane_line_detector.num_lasers>0
        # turns on include_broken_line_segs (envs/base.py scene build)
        any_line = seg_line | (
            (scene.seg_type[sidx] == SEG_BROKEN_LINE) & scene.seg_valid[sidx]
        )
        lane_line = raycast.side_detector_cloud(
            ego.pos, ego.heading, vc["lane_line_detector"]["num_lasers"],
            vc["lane_line_detector"]["distance"],
            scene.seg_p0[sidx], scene.seg_p1[sidx], any_line,
        )

        # core ego dims (state_obs.py vehicle_state middle block)
        from metadrive_ped_tpu.ops import localization
        hdiff = localization.heading_diff_ref(
            scene, sidx, ego.slot, ego.route_idx, ego.pos, ego.heading
        )
        f_speed = clip01((ego.speed * 3.6 + 1) / (ego.params.max_speed_kmh + 1))
        f_steer = clip01((ego.steering / OBS_MAX_STEERING + 1) / 2)
        f_a0 = clip01((ego.current_action[:, 0] + 1) / 2)
        f_a1 = clip01((ego.current_action[:, 1] + 1) / 2)
        cosb = (heading_vec(ego.heading) * heading_vec(ego.last_heading)).sum(-1)
        f_yaw = clip01(jnp.arccos(jnp.clip(cosb, 0.0, 1.0)) / 0.1)
        core = jnp.stack([hdiff, f_speed, f_steer, f_a0, f_a1, f_yaw], axis=-1)

        targets, _ = self._lidar_targets(state)
        t_pos, t_heading, t_len, t_wid, t_active = targets
        cloud = raycast.lidar_cloud(
            ego.pos, ego.heading, vc["lidar"]["num_lasers"], vc["lidar"]["distance"],
            t_pos, t_heading, t_len, t_wid, t_active,
        )

        # toll flags (marl_tollgate.py:96-110): in-toll indicator and
        # stayed-long-enough indicator
        in_toll = self._in_toll_block(state)
        stayed = state.aux[:, 0] > self.config["vehicle_config"]["min_pass_steps"]
        toll = jnp.stack(
            [in_toll.astype(jnp.float32), (in_toll & stayed).astype(jnp.float32)],
            axis=-1,
        )
        return jnp.concatenate([side, core, lane_line, cloud, toll], axis=-1)

    # ---- toll bookkeeping ---------------------------------------------------
    def _in_toll_block(self, state):
        g = lane_geom.gather_lane(self.scene, state.sidx, state.ego.lane)
        return g["block"] == TOLL_BLOCK_CODE

    def _pre_reward_update(self, state, loc):
        # aux0: steps spent inside the toll block this visit
        # aux1: was inside the toll block last step
        # aux2: latched "rushed through the toll too fast" flag
        in_toll = self._in_toll_block(state)
        was_in = state.aux[:, 1] > 0.5
        stay = jnp.where(in_toll, state.aux[:, 0] + 1.0, state.aux[:, 0])
        exited = was_in & ~in_toll
        too_fast = exited & (stay < self.config["vehicle_config"]["min_pass_steps"])
        aux = state.aux.at[:, 0].set(jnp.where(exited, 0.0, stay))
        aux = aux.at[:, 1].set(in_toll.astype(jnp.float32))
        aux = aux.at[:, 2].set(jnp.maximum(state.aux[:, 2], too_fast.astype(jnp.float32)))
        return state.replace(aux=aux)

    # ---- reward / done ------------------------------------------------------
    def _is_out_of_road(self, ego, state=None):
        # marl_tollgate.py:240-246
        ret = ego.crash_sidewalk
        if self.config["cross_yellow_line_done"]:
            ret = ret | ego.on_yellow_line
        return ret

    def reward_function(self, state, loc, arrive, out_of_road):
        # marl_tollgate.py:193-238
        cfg = self.config
        scene, sidx, ego = self.scene, state.sidx, state.ego
        cur_road = loc["cur_road"]
        road_info = lane_geom.gather_road(scene, sidx, cur_road)
        on_ref = loc["road"] == cur_road
        lane_for_reward = jnp.where(on_ref, ego.lane, road_info["lane0"])
        g = lane_geom.gather_lane(scene, sidx, lane_for_reward)
        long_now, lateral_now = lane_geom.local_coordinates(g, ego.pos)
        long_last, _ = lane_geom.local_coordinates(g, ego.last_pos)

        if cfg["use_lateral_reward"]:
            lateral_factor = clip01(1 - 2 * jnp.abs(lateral_now) / g["width"])
        else:
            lateral_factor = 1.0
        reward = cfg["driving_reward"] * (long_now - long_last) * lateral_factor

        speed_kmh = ego.speed * 3.6
        in_toll = self._in_toll_block(state)
        overspeed = speed_kmh > g["speed_limit"] * 3.6
        toll_reward = jnp.where(
            overspeed, -cfg["overspeed_penalty"] * speed_kmh / ego.params.max_speed_kmh,
            reward,
        )
        cruise_reward = reward + cfg["speed_reward"] * (speed_kmh / ego.params.max_speed_kmh)
        reward = jnp.where(in_toll, toll_reward, cruise_reward)
        step_reward = reward

        reward = jnp.where(
            arrive, cfg["success_reward"],
            jnp.where(
                out_of_road, -cfg["out_of_road_penalty"],
                jnp.where(
                    state.ego.crash_vehicle, -cfg["crash_vehicle_penalty"],
                    jnp.where(state.ego.crash_object, -cfg["crash_object_penalty"], reward),
                ),
            ),
        )
        return reward, dict(step_reward=step_reward)

    def done_function(self, state, arrive, out_of_road):
        terminated, truncated, done_info = super().done_function(state, arrive, out_of_road)
        # rushing through the plaza terminates as out_of_road
        # (marl_tollgate.py:262-268)
        too_fast = state.aux[:, 2] > 0.5
        terminated = terminated | too_fast
        done_info = dict(done_info)
        done_info["out_of_road"] = done_info["out_of_road"] | too_fast
        return terminated, truncated, done_info
