"""On-device PPO training on the vectorized MetaDriveEnv.

The TPU-native twin of the reference's training entry
(metadrive/examples/train_generalization_experiment.py, which drives
rllib PPO over subprocess env workers): here the *simulator is the
vectorized batch*, so rollout collection, GAE, and the clipped-PPO update
all run on one chip with zero environment workers. The policy is the same
256x256 tanh MLP the shipped expert checkpoint uses
(examples/ppo_expert/numpy_expert.py architecture), so a trained policy
can be exported into the expert's .npz format.

    python -m metadrive_ped_tpu.examples.train_ppo --num-envs 512 --iters 20
    python -m metadrive_ped_tpu.examples.train_ppo --cpu --quick  # smoke

This is an example, not a tuned baseline: generalization protocol
(train/test scenario split via start_seed/num_scenarios) mirrors the
reference experiment; reward curves depend on scale and iterations.
"""
import argparse
import functools
import time

import numpy as np

from metadrive_ped_tpu.examples import force_cpu_flag, maybe_force_cpu


def make_train_state(rng, obs_dim, lr):
    import jax
    import jax.numpy as jnp
    import optax

    k1, k2, k3 = jax.random.split(rng, 3)
    scale = lambda k, shape: jax.random.normal(k, shape) * (1.0 / np.sqrt(shape[0]))
    params = dict(
        w1=scale(k1, (obs_dim, 256)), b1=jnp.zeros(256),
        w2=scale(k2, (256, 256)), b2=jnp.zeros(256),
        w3=scale(k3, (256, 4)) * 0.01, b3=jnp.zeros(4),
        vw1=scale(k1, (obs_dim, 256)), vb1=jnp.zeros(256),
        vw2=scale(k2, (256, 256)), vb2=jnp.zeros(256),
        vw3=scale(k3, (256, 1)) * 0.01, vb3=jnp.zeros(1),
    )
    tx = optax.adam(lr)
    return params, tx, tx.init(params)


def policy_forward(params, obs):
    import jax.numpy as jnp

    x = jnp.tanh(obs @ params["w1"] + params["b1"])
    x = jnp.tanh(x @ params["w2"] + params["b2"])
    out = x @ params["w3"] + params["b3"]
    mean, log_std = out[..., :2], jnp.clip(out[..., 2:], -5.0, 2.0)
    v = jnp.tanh(obs @ params["vw1"] + params["vb1"])
    v = jnp.tanh(v @ params["vw2"] + params["vb2"])
    value = (v @ params["vw3"] + params["vb3"])[..., 0]
    return mean, log_std, value


def main():
    import jax
    import jax.numpy as jnp
    import optax

    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=512)
    p.add_argument("--rollout", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--minibatches", type=int, default=8)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument("--lam", type=float, default=0.95)
    p.add_argument("--clip", type=float, default=0.2)
    p.add_argument("--num-scenarios", type=int, default=64,
                   help="training scenario count (generalization axis of the "
                        "reference experiment)")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--save", default=None, help="export .npz in the expert format")
    force_cpu_flag(p)
    args = p.parse_args()
    maybe_force_cpu(args)
    if args.quick:
        args.num_envs, args.rollout, args.iters, args.num_scenarios = 16, 16, 2, 2

    from metadrive_ped_tpu import MetaDriveEnv

    env = MetaDriveEnv(dict(
        num_envs=args.num_envs, map=3, num_scenarios=args.num_scenarios,
        traffic_density=0.05, horizon=1000,
        vehicle_config=dict(lidar=dict(num_lasers=240, num_others=4)),
    ))
    obs, _ = env.reset(seed=0)
    obs_dim = env.observation_dim
    rng = jax.random.PRNGKey(0)
    params, tx, opt_state = make_train_state(rng, obs_dim, args.lr)

    def sample_policy(params, rng):
        def policy_fn(obs, state):
            mean, log_std, _ = policy_forward(params, obs)
            key = jax.random.fold_in(rng, jnp.sum(state.step_count))
            return jnp.clip(
                mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape),
                -1.0, 1.0,
            )
        return policy_fn

    @jax.jit
    def ppo_update(params, opt_state, batch, rng):
        obs_b, act_b, adv_b, ret_b, logp_old = batch
        B = obs_b.shape[0]
        idx = jax.random.permutation(rng, B)
        mb = B // args.minibatches

        def loss_fn(params, o, a, adv, ret, lp_old):
            mean, log_std, value = policy_forward(params, o)
            std = jnp.exp(log_std)
            logp = (-0.5 * ((a - mean) / std) ** 2 - log_std
                    - 0.5 * np.log(2 * np.pi)).sum(-1)
            ratio = jnp.exp(logp - lp_old)
            adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
            pg = -jnp.minimum(
                ratio * adv_n,
                jnp.clip(ratio, 1 - args.clip, 1 + args.clip) * adv_n,
            ).mean()
            vf = 0.5 * ((value - ret) ** 2).mean()
            ent = (log_std + 0.5 * np.log(2 * np.pi * np.e)).sum(-1).mean()
            return pg + 0.5 * vf - 1e-3 * ent

        def epoch(carry, _):
            params, opt_state = carry

            def minibatch(carry, i):
                params, opt_state = carry
                sl = jax.lax.dynamic_slice_in_dim(idx, i * mb, mb)
                g = jax.grad(loss_fn)(
                    params, obs_b[sl], act_b[sl], adv_b[sl], ret_b[sl],
                    logp_old[sl],
                )
                updates, opt_state = tx.update(g, opt_state)
                return (optax.apply_updates(params, updates), opt_state), 0.0

            (params, opt_state), _ = jax.lax.scan(
                minibatch, (params, opt_state), jnp.arange(args.minibatches)
            )
            return (params, opt_state), 0.0

        (params, opt_state), _ = jax.lax.scan(
            epoch, (params, opt_state), None, length=args.epochs
        )
        return params, opt_state

    @jax.jit
    def compute_gae(values, rewards, dones, last_value):
        # reverse scan, carried advantage
        def rev_body(gae, xs):
            r, v, nv, d = xs
            delta = r + args.gamma * nv * (1.0 - d) - v
            gae = delta + args.gamma * args.lam * (1.0 - d) * gae
            return gae, gae

        next_values = jnp.concatenate([values[1:], last_value[None]], axis=0)
        _, adv = jax.lax.scan(
            rev_body, jnp.zeros_like(last_value),
            (rewards, values, next_values, dones), reverse=True,
        )
        return adv, adv + values

    for it in range(args.iters):
        t0 = time.perf_counter()
        rng, k_roll, k_upd = jax.random.split(rng, 3)
        obs0 = env._last_obs  # obs the FIRST action of this rollout sees
        outs, mean_r = env.rollout(
            args.rollout, policy_fn=sample_policy(params, k_roll),
            collect=("obs", "reward", "terminated", "truncated", "ego_action"),
        )
        # rollout collects the POST-step obs; a_t was sampled from the obs
        # BEFORE step t, so shift by one (at done steps outs["obs"][t] is
        # already the auto-reset obs of the next episode)
        obs_t = jnp.concatenate([obs0[None], outs["obs"][:-1]], axis=0)
        act_t = outs["ego_action"]
        rew_t = outs["reward"]
        done_t = (outs["terminated"] | outs["truncated"]).astype(jnp.float32)
        mean_a, log_std_a, val_t = jax.jit(policy_forward)(params, obs_t)
        std = jnp.exp(log_std_a)
        logp_t = (-0.5 * ((act_t - mean_a) / std) ** 2 - log_std_a
                  - 0.5 * np.log(2 * np.pi)).sum(-1)
        _, _, last_v = jax.jit(policy_forward)(params, env._last_obs)
        adv, ret = compute_gae(val_t, rew_t, done_t, last_v)
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        batch = tuple(map(flat, (obs_t, act_t, adv, ret, logp_t)))
        params, opt_state = ppo_update(params, opt_state, batch, k_upd)
        steps = args.rollout * args.num_envs
        dt = time.perf_counter() - t0
        print(f"iter {it:3d}  mean_step_reward {float(mean_r):+.4f}  "
              f"{steps / dt:,.0f} env-steps/s (collect+update)")

    if args.save:
        np.savez(
            args.save,
            **{
                "default_policy/fc_1/kernel": np.asarray(params["w1"]),
                "default_policy/fc_1/bias": np.asarray(params["b1"]),
                "default_policy/fc_2/kernel": np.asarray(params["w2"]),
                "default_policy/fc_2/bias": np.asarray(params["b2"]),
                "default_policy/fc_out/kernel": np.asarray(params["w3"]),
                "default_policy/fc_out/bias": np.asarray(params["b3"]),
            },
        )
        print(f"saved policy (expert .npz format) -> {args.save}")


if __name__ == "__main__":
    main()
