"""Expert policy + rollout API (reference: examples/ppo_expert/numpy_expert.py,
tests/test_policy/test_expert_performance.py)."""
import numpy as np
import pytest

from metadrive_ped_tpu import MetaDriveEnv
from metadrive_ped_tpu.policies.expert import (
    expert_action, load_expert_params, make_expert_policy, obs_correction
)


def test_obs_correction_flips_dims():
    import jax.numpy as jnp
    obs = jnp.arange(275, dtype=jnp.float32) / 275.0
    fixed = obs_correction(obs)
    assert float(fixed[10]) == pytest.approx(1.0 - 10 / 275.0)
    assert float(fixed[15]) == pytest.approx(1.0 - 15 / 275.0)
    assert float(fixed[11]) == pytest.approx(11 / 275.0)


def test_expert_weights_load_shapes():
    p = load_expert_params()
    assert p["w1"].shape == (275, 256)
    assert p["w3"].shape == (256, 4)


def test_expert_forward_batched():
    import jax.numpy as jnp
    p = load_expert_params()
    obs = jnp.zeros((7, 275))
    act = expert_action(p, obs)
    assert act.shape == (7, 2)
    assert np.isfinite(np.asarray(act)).all()


def test_expert_obs_dim_275():
    env = MetaDriveEnv(
        dict(num_envs=2, map="S", num_scenarios=1, traffic_density=0.0,
             vehicle_config=dict(lidar=dict(num_others=4)))
    )
    obs, _ = env.reset(seed=0)
    assert obs.shape == (2, 275)


def test_expert_drives_straight_map_without_leaving_road():
    env = MetaDriveEnv(
        dict(num_envs=8, map="SS", num_scenarios=1, traffic_density=0.0,
             vehicle_config=dict(lidar=dict(num_others=4)))
    )
    env.reset(seed=0)
    policy = make_expert_policy()
    outs, mean_r = env.rollout(60, policy_fn=policy, collect=("reward", "out_of_road"))
    assert mean_r > 0.0, "expert should make forward progress"
    assert int(np.asarray(outs["out_of_road"]).sum()) == 0


def test_rollout_constant_actions_matches_step_loop():
    cfg = dict(num_envs=4, map="S", num_scenarios=1, traffic_density=0.0)
    env1 = MetaDriveEnv(cfg)
    env2 = MetaDriveEnv(cfg)
    env1.reset(seed=9)
    env2.reset(seed=9)
    acts = np.tile([0.1, 0.7], (4, 1)).astype(np.float32)
    for _ in range(20):
        obs_loop, r_loop, *_ = env1.step(acts)
    outs, _ = env2.rollout(20, actions=acts, collect=("reward", "obs"))
    np.testing.assert_allclose(
        np.asarray(outs["reward"][-1]), np.asarray(r_loop), rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(outs["obs"][-1]), np.asarray(obs_loop), rtol=0, atol=1e-6
    )


def test_idm_forced_lane_change_on_merge():
    """NPCs on a disappearing lane (Merge block) change onto the continuing
    lane instead of despawning at the lane end, creeping while the target
    side is unsafe (idm_policy.py:339-374 lane_change_policy)."""
    import numpy as np
    from metadrive_ped_tpu import MetaDriveEnv

    env = MetaDriveEnv(dict(num_envs=2, map="SyS", num_scenarios=1,
                            traffic_density=0.25, traffic_mode="respawn"))
    env.reset(seed=0)
    lanes0 = np.asarray(env._state.npc.lane).copy()
    for _ in range(150):
        env.step(np.zeros((2, 2)))
    st = env._state
    # lane changes happened (not just successor hops: respawn mode resets to
    # the spawn lane, so a persistent diff means a sideways move)
    assert (np.asarray(st.npc.lane) != lanes0).any()
    # traffic survives the merge
    assert np.asarray(st.npc.active).sum() > 0


def test_random_spawn_lane_index():
    """metadrive_env.py:59 random_spawn_lane_index=True: the ego spawns on a
    random entrance lane per episode (agent_manager.py:107-112)."""
    import numpy as np
    from metadrive_ped_tpu import MetaDriveEnv
    env = MetaDriveEnv(dict(num_envs=32, map="S", num_scenarios=1,
                            traffic_density=0.0))
    env.reset(seed=0)
    slots = np.asarray(env._state.ego.slot)
    assert len(np.unique(slots)) > 1, "spawn lanes should vary across envs"
    env2 = MetaDriveEnv(dict(num_envs=32, map="S", num_scenarios=1,
                             traffic_density=0.0, random_spawn_lane_index=False))
    env2.reset(seed=0)
    np.testing.assert_array_equal(np.asarray(env2._state.ego.slot), 0)


def test_expert_closes_episodes_end_to_end():
    """Behavioral parity: the reference's released PPO expert checkpoint
    drives THIS simulator to the destination on most episodes (random PG
    maps + traffic). Round-4 attribution (tools/expert_attribution.py)
    traced the old ~0.42 rate to a mirrored navi/neighbor lateral sign
    (convert_to_local_coordinates is LEFT-positive in the reference;
    localization._checkpoint_info). Round-5 attribution of the remaining
    traffic residual (~0.15 at density 0.1): pre-crash geometry shows
    crossing NPCs inside intersections (heading diff 100-135 deg) — a
    blindness the reference's IDMPolicy shares structurally (its
    ``obj.lane is lane`` front filter cannot see crossing traffic and it
    has no yield logic), so the residual is reference-faithful, not a
    decision divergence (decisions are oracle-pinned in
    test_parity_reference.py). Measured 0.88 on this protocol; floor 0.75
    absorbs platform numerics."""
    import numpy as np
    import jax.numpy as jnp
    from metadrive_ped_tpu import MetaDriveEnv
    from metadrive_ped_tpu.policies.expert import expert_action, load_expert_params
    params = load_expert_params()
    env = MetaDriveEnv(dict(
        num_envs=32, map=3, num_scenarios=8, traffic_density=0.05,
        vehicle_config=dict(lidar=dict(num_lasers=240, num_others=4)),
        horizon=1000,
    ))
    env.reset(seed=0)
    pol = lambda obs, state: jnp.clip(expert_action(params, obs), -1, 1)
    outs, _ = env.rollout(600, policy_fn=pol, collect=("terminated", "arrive_dest"))
    term = np.asarray(outs["terminated"])
    suc = (term & np.asarray(outs["arrive_dest"])).sum()
    fin = term.sum()
    assert fin >= 20, f"expert should finish episodes, finished {fin}"
    rate = suc / fin
    assert rate >= 0.75, f"expert success rate collapsed: {rate:.2f} ({suc}/{fin})"


def test_expert_reference_protocol_ccc():
    """The reference's own expert benchmark, with the reference's own
    assertions (tests/test_policy/test_expert_performance.py:60-100):
    map "CCC", start_seed=2, fixed spawn lane — without traffic the expert
    must succeed on EVERY episode and score an episode reward in
    [300, 350]; with traffic the reward band still holds. Measured here:
    success 1.0, mean reward ~327 both ways — reference-level parity."""
    import numpy as np
    import jax.numpy as jnp
    from metadrive_ped_tpu import MetaDriveEnv
    from metadrive_ped_tpu.policies.expert import expert_action, load_expert_params
    params = load_expert_params()
    for density, need_all_success in ((0.0, True), (0.1, False)):
        env = MetaDriveEnv(dict(
            num_envs=16, map="CCC", num_scenarios=1, start_seed=2,
            traffic_density=density, random_spawn_lane_index=False,
            vehicle_config=dict(lidar=dict(num_lasers=240, num_others=4)),
            horizon=1000,
        ))
        env.reset(seed=0)
        pol = lambda obs, state: jnp.clip(expert_action(params, obs), -1, 1)
        outs, _ = env.rollout(
            700, policy_fn=pol, collect=("terminated", "arrive_dest", "reward")
        )
        term = np.asarray(outs["terminated"])
        suc = (term & np.asarray(outs["arrive_dest"])).sum()
        fin = term.sum()
        assert fin >= 16
        if need_all_success:
            assert suc == fin, f"expert must succeed every CCC episode ({suc}/{fin})"
        r = np.asarray(outs["reward"])
        ep_rewards, acc = [], np.zeros(r.shape[1])
        for t in range(r.shape[0]):
            acc += r[t]
            for e in np.where(term[t])[0]:
                ep_rewards.append(acc[e])
                acc[e] = 0.0
        mean_r = float(np.mean(ep_rewards))
        assert 300.0 <= mean_r <= 350.0, f"density {density}: reward {mean_r:.1f}"
        env.close()


def test_torch_expert_twin_matches_jax():
    """The torch expert twin (policies/expert_torch.py; reference
    examples/ppo_expert/torch_expert.py) produces the same actions as the
    JAX expert on the same observations."""
    import numpy as np
    from metadrive_ped_tpu.policies.expert import expert_action, load_expert_params
    from metadrive_ped_tpu.policies.expert_torch import torch_expert_action
    rng = np.random.RandomState(0)
    obs = rng.uniform(0, 1, (8, 275)).astype(np.float32)
    import jax.numpy as jnp
    a_jax = np.asarray(expert_action(load_expert_params(), jnp.asarray(obs)))
    a_torch = torch_expert_action(obs)
    np.testing.assert_allclose(a_jax, a_torch, atol=2e-5)


def test_train_ppo_smoke():
    """The on-device PPO training example (examples/train_ppo.py — TPU twin
    of the reference's rllib training entry) runs end to end at smoke scale
    and exports a policy in the expert .npz format."""
    import subprocess, sys, os, tempfile
    out = os.path.join(tempfile.mkdtemp(), "policy.npz")
    r = subprocess.run(
        [sys.executable, "-m", "metadrive_ped_tpu.examples.train_ppo",
         "--cpu", "--quick", "--save", out],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "iter   1" in r.stdout
    import numpy as np
    w = np.load(out)
    assert w["default_policy/fc_1/kernel"].shape == (275, 256)
