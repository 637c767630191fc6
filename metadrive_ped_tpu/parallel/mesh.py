"""Multi-chip / multi-host scaling.

The reference has no in-process parallelism — users shard scenario indices
across ray workers (SURVEY.md §2.11; manager/scenario_data_manager.py:26-32).
The TPU-native equivalent is pure data parallelism over the env axis: envs
are independent during stepping, so the [E, ...] state shards over a device
mesh with ZERO collective traffic in the hot loop; XLA inserts psum/all-
gather only where cross-env reductions appear (metrics, learner updates).

Across hosts: call init_distributed() on every host (jax.distributed), build
the global mesh, and give every host its own env batch; scenario assignment
folds in the process index, replicating the reference's worker striding.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize the JAX distributed runtime (multi-host pods).

    No-op on single-host. On TPU pods the arguments auto-detect.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    return jax.process_index(), jax.process_count()


def make_mesh(devices=None, axis_name="envs"):
    """1-D mesh over the given (default: all) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


class ShardedEnv:
    """Wraps a vectorized env so its state/step shard over a mesh.

    num_envs must divide by the mesh size. Step outputs keep the env-axis
    sharding; scalar summaries (mean reward etc.) become the only cross-chip
    collectives.

        env = MetaDriveEnv(dict(num_envs=4096, ...))
        senv = ShardedEnv(env)        # shards over all local devices
        obs, info = senv.reset(seed=0)
        obs, r, term, trunc, info = senv.step(actions)
    """

    def __init__(self, env, mesh=None, axis_name="envs"):
        self.env = env
        self.mesh = mesh or make_mesh(axis_name=axis_name)
        self.axis_name = axis_name
        n = self.mesh.devices.size
        assert env.num_envs % n == 0, (
            f"num_envs={env.num_envs} must divide over {n} devices"
        )
        self._shard = NamedSharding(self.mesh, P(axis_name))
        self._shard2 = NamedSharding(self.mesh, P(axis_name, None))

    def _put_state(self):
        self.env._state = jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, self._shard if x.ndim >= 1 else NamedSharding(self.mesh, P())
            ),
            self.env._state,
        )

    def reset(self, seed=0):
        obs, info = self.env.reset(seed)
        self._put_state()
        # shard the cached obs IN PLACE, not just the returned copy: the
        # rollout jit takes env._last_obs as an input, and an unsharded
        # first-call obs vs the sharded obs every later call produces
        # different input shardings — a pjit cache miss that recompiled the
        # whole rollout on the second (timed) call (found by the scenario
        # sharding-overhead study: the "sharded" column was compile time)
        obs = jax.device_put(obs, self._shard2)
        self.env._last_obs = obs
        return obs, info

    def step(self, actions):
        actions = jax.device_put(
            jnp.asarray(actions, jnp.float32).reshape(self.env.num_envs, -1), self._shard2
        )
        return self.env.step(actions)

    def rollout(self, *args, **kwargs):
        return self.env.rollout(*args, **kwargs)

    def mean_metrics(self, info, keys=("step_reward", "cost")):
        """Cross-shard scalar reductions — the only collective traffic."""
        return {k: jnp.mean(info[k]) for k in keys if k in info}

    def __getattr__(self, name):
        return getattr(self.env, name)
