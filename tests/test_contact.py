"""Rigid contact response.

The reference resolves every ego<->body contact through Bullet each physics
substep (metadrive/engine/core/engine_core.py:350-352); in envs where a
crash is NOT terminal (SafeMetaDriveEnv: crash_vehicle_done=False,
safe_metadrive_env.py:7-35) the ego visibly collides-and-stops instead of
driving through other vehicles. These tests pin that behavior for the
batched SAT/MTV solver (ops/collision.py obb_obb_mtv + the envs'
contact-response stage).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from metadrive_ped_tpu import SafeMetaDriveEnv
from metadrive_ped_tpu.ops import collision


def test_mtv_consistent_with_sat_overlap():
    rng = np.random.RandomState(0)
    c1 = rng.uniform(-5, 5, (64, 2)).astype(np.float32)
    c2 = rng.uniform(-5, 5, (64, 2)).astype(np.float32)
    h1 = rng.uniform(-np.pi, np.pi, 64).astype(np.float32)
    h2 = rng.uniform(-np.pi, np.pi, 64).astype(np.float32)
    l1, w1 = np.full(64, 4.5, np.float32), np.full(64, 1.8, np.float32)
    l2, w2 = np.full(64, 4.0, np.float32), np.full(64, 2.0, np.float32)
    hit = np.asarray(collision.obb_obb_overlap(c1, h1, l1, w1, c2, h2, l2, w2))
    depth, normal = collision.obb_obb_mtv(c1, h1, l1, w1, c2, h2, l2, w2)
    depth, normal = np.asarray(depth), np.asarray(normal)
    # depth sign agrees with the SAT overlap test
    np.testing.assert_array_equal(depth > 0, hit)
    # normals are unit vectors
    np.testing.assert_allclose(
        np.linalg.norm(normal, axis=-1), 1.0, atol=1e-5
    )
    # translating OBB1 out along the MTV separates the pair
    c1_out = c1 + (np.maximum(depth, 0.0) * 1.001)[:, None] * normal
    hit_after = np.asarray(
        collision.obb_obb_overlap(c1_out, h1, l1, w1, c2, h2, l2, w2)
    )
    assert not hit_after[hit].any()


def test_contact_speed_scale_kills_closing_velocity():
    # driving straight into a wall whose outward normal is -x
    normal = jnp.array([[[-1.0, 0.0]]])          # [1,1,2]
    contact = jnp.array([[True]])
    scale = collision.contact_speed_scale(
        jnp.array([5.0]), jnp.array([0.0]), normal, contact
    )
    np.testing.assert_allclose(np.asarray(scale), 0.0, atol=1e-6)
    # grazing contact (normal perpendicular to motion) keeps the speed
    normal_t = jnp.array([[[0.0, 1.0]]])
    scale_t = collision.contact_speed_scale(
        jnp.array([5.0]), jnp.array([0.0]), normal_t, contact
    )
    np.testing.assert_allclose(np.asarray(scale_t), 1.0, atol=1e-6)
    # separating (moving away) contact is untouched
    scale_away = collision.contact_speed_scale(
        jnp.array([-5.0]), jnp.array([0.0]), normal, contact
    )
    np.testing.assert_allclose(np.asarray(scale_away), 1.0, atol=1e-6)


def _plant_parked_npc(env, gap):
    """Park NPC slot 0 `gap` meters dead ahead of the ego; freeze the rest."""
    snap = env.snapshot()
    ego_pos = np.asarray(snap.ego.pos)
    ego_heading = np.asarray(snap.ego.heading)
    hv = np.stack([np.cos(ego_heading), np.sin(ego_heading)], axis=-1)
    npc_pos = np.array(snap.npc.pos)
    npc_pos[:, 0] = ego_pos + gap * hv
    npc_heading = np.array(snap.npc.heading)
    npc_heading[:, 0] = ego_heading
    active = np.zeros_like(np.asarray(snap.npc.active))
    active[:, 0] = True
    # released=False keeps the IDM frozen: a parked car
    snap = snap.replace(npc=snap.npc.replace(
        pos=npc_pos, heading=npc_heading, active=active,
        released=np.zeros_like(active), speed=np.zeros_like(npc_heading),
    ))
    env.restore(snap)
    return npc_pos[:, 0].copy()


def _run_into_parked(contact_response, steps=120):
    env = SafeMetaDriveEnv(dict(
        num_envs=1, map="SSS", num_scenarios=1, traffic_density=0.2,
        horizon=1000, contact_response=contact_response, auto_reset=False,
    ))
    env.reset(seed=3)
    assert env.scene.npc_lane.shape[1] >= 1, "need at least one NPC slot"
    # NPCs stay parked: triggers never fire
    env.scene = env.scene.replace(
        npc_trigger_road=jnp.full_like(env.scene.npc_trigger_road, -999)
    )
    planted = _plant_parked_npc(env, gap=14.0)
    acts = np.tile([0.0, 1.0], (1, 1)).astype(np.float32)
    crashed = False
    for _ in range(steps):
        _, _, _, _, info = env.step(acts)
        crashed = crashed or bool(np.asarray(info["crash_vehicle"])[0])
    st = env.snapshot()
    return env, st, planted, crashed


def test_safe_env_contact_blocks_ego():
    """Two vehicles on a collision course end up touching, not overlapping,
    and the parked one is pushed forward (VERDICT round-1 item 3)."""
    env, st, planted, crashed = _run_into_parked(contact_response=True)
    assert crashed, "ego never reached the parked NPC"
    ego_pos = np.asarray(st.ego.pos)[0]
    npc_pos = np.asarray(st.npc.pos)[0, 0]
    # penetration at rest is at most a whisker (quasi-static pushing can
    # leave the pair in light persistent contact)
    depth, _ = collision.obb_obb_mtv(
        st.ego.pos, st.ego.heading, st.ego.params.length, st.ego.params.width,
        st.npc.pos[:, 0], st.npc.heading[:, 0],
        st.npc.params.length[:, 0], st.npc.params.width[:, 0],
    )
    assert float(depth[0]) < 0.35, f"bodies still interpenetrate: {float(depth[0]):.3f} m"
    # ego is stopped (blocked), not cruising through
    assert float(np.asarray(st.ego.speed)[0]) < 1.5
    # ego center stays behind the NPC center along the travel direction
    hv = np.array([np.cos(np.asarray(st.ego.heading)[0]),
                   np.sin(np.asarray(st.ego.heading)[0])])
    assert float((npc_pos - ego_pos) @ hv) > 3.0
    # the parked vehicle was shoved forward by the contact train
    assert float(np.linalg.norm(npc_pos - planted[0])) > 0.05


def test_contact_response_off_restores_tunneling():
    """With contact_response=False the ego drives straight through — the
    round-1 behavior, kept reachable for ablation."""
    env, st, planted, crashed = _run_into_parked(contact_response=False)
    assert crashed
    ego_pos = np.asarray(st.ego.pos)[0]
    npc_pos = np.asarray(st.npc.pos)[0, 0]
    hv = np.array([np.cos(np.asarray(st.ego.heading)[0]),
                   np.sin(np.asarray(st.ego.heading)[0])])
    # ego ended up well past the parked car, which never moved
    assert float((ego_pos - npc_pos) @ hv) > 5.0
    np.testing.assert_allclose(npc_pos, planted[0], atol=1e-5)
