"""Multi-agent parking lot scene (TPU-native).

Reference: metadrive/envs/marl_envs/marl_parking_lot.py — a fixed map
FirstPGBlock(1 lane) -> ParkingLot(2N spaces) -> TInterSection, where agents
either drive IN from one of three entrances toward a parking space, or
drive OUT of a parking space toward an exit. Episodes end on yellow-line /
off-lane / sidewalk (white continuous lines are allowed — vehicles cross
them while maneuvering into spaces).

Documented divergence: the reference's ParkingLotSpawnManager dynamically
reserves parking spaces (a space being targeted by one agent is removed from
the respawn/destination pool, marl_parking_lot.py:47-95). Routes here are
compiled per spawn slot at scene build time, so two agents can be assigned
the same space within an episode; slot occupancy is still checked radially
on respawn.
"""
from metadrive_ped_tpu.envs.marl_envs.marl_env import MultiAgentMetaDrive

PARKING_SPACE_NUM = 8  # MAParkingLotConfig parking_space_num


class MultiAgentParkingLotEnv(MultiAgentMetaDrive):
    @classmethod
    def default_config(cls):
        config = super().default_config()
        n = PARKING_SPACE_NUM
        in_spawn_roads = [
            (">>", ">>>"),
            ("-2T0_1_", "-2T0_0_"),
            ("-2T2_1_", "-2T2_0_"),
        ]
        out_spawn_roads = [(f"1P{k}_5_", f"1P{k}_6_") for k in range(1, n + 1)]
        # in-arms park into a space; spaces drive out to an entrance's
        # reverse side (update_destination_for, marl_parking_lot.py:82-90)
        space_dests = [f"1P{k}_2_" for k in range(1, n + 1)]
        exit_dests = ["->>", "2T0_1_", "2T2_1_"]
        config.update(
            dict(
                num_agents=10,
                parking_space_num=n,
                map="P",  # informational; custom_blocks below is the map
                map_config=dict(
                    lane_width=3.5,
                    lane_num=1,
                    exit_length=20.0,
                    custom_blocks=None,  # filled in __init__
                ),
                spawn_roads=in_spawn_roads + out_spawn_roads,
                spawn_dest_nodes=(
                    [space_dests] * len(in_spawn_roads)
                    + [exit_dests] * len(out_spawn_roads)
                ),
                vehicle_config=dict(
                    enable_reverse=True,
                    lidar=dict(num_lasers=72, distance=40.0, num_others=0,
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
        n = cfg["parking_space_num"]
        assert n % 2 == 0, "number of parking spaces must be multiples of 2"
        assert n >= 4, "minimal number of parking space is 4"
        cfg["map_config"]["custom_blocks"] = [
            dict(id="P", config=dict(one_side_vehicle_number=n // 2)),
            dict(id="T", config=dict(t_type=1, change_lane_num=0, exit_part_length=10.0)),
        ]
        if n != PARKING_SPACE_NUM:
            out_spawn_roads = [(f"1P{k}_5_", f"1P{k}_6_") for k in range(1, n + 1)]
            space_dests = [f"1P{k}_2_" for k in range(1, n + 1)]
            exit_dests = ["->>", "2T0_1_", "2T2_1_"]
            in_roads = [tuple(r) for r in cfg["spawn_roads"][:3]]
            cfg["spawn_roads"] = in_roads + out_spawn_roads
            cfg.force_set(
                "spawn_dest_nodes",
                [space_dests] * len(in_roads) + [exit_dests] * len(out_spawn_roads),
            )
        super().__init__(cfg)

    def _is_out_of_road(self, ego, state=None):
        # marl_parking_lot.py:274-277: white continuous lines are crossable
        return ego.on_yellow_line | ~ego.on_lane | ego.crash_sidewalk
