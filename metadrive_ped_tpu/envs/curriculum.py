"""Curriculum over scenario difficulty levels.

Port of ScenarioCurriculumManager (manager/scenario_curriculum_manager.py:
38-84): the scenario set splits into `curriculum_level` contiguous bands;
episodes sample only from bands up to the current level; when the recent
success rate over an evaluation window reaches target_success_rate, the
level increases.

Vectorized twist: episode outcomes stream in batches from the env's info
dicts, so the wrapper consumes terminated/arrive masks host-side and
restricts the scenario band by re-seeding the env's scenario sampler.
"""
from collections import deque

import numpy as np


class CurriculumWrapper:
    """Wraps a vectorized env (ScenarioEnv or MetaDriveEnv).

        env = CurriculumWrapper(ScenarioEnv(...), curriculum_level=5)
        obs, info = env.reset(seed=0)
        obs, r, term, trunc, info = env.step(actions)   # handles leveling
    """

    def __init__(self, env, curriculum_level=2, target_success_rate=0.8,
                 episodes_to_evaluate=None):
        assert curriculum_level >= 1
        self.env = env
        self.num_levels = curriculum_level
        self.target_success_rate = target_success_rate
        total = env.num_scenarios
        assert total % curriculum_level == 0, (
            "Each level should have the same number of scenarios"
        )
        self.band = total // curriculum_level
        self._episodes_to_eval = episodes_to_evaluate or self.band
        self.level = 0
        self._recent = deque(maxlen=self._episodes_to_eval)

    # restrict scenario sampling to [0, (level+1)*band)
    def _apply_level(self):
        self.env.num_scenarios = self.band * (self.level + 1)

    @property
    def current_success_rate(self):
        if not self._recent:
            return 0.0
        return float(sum(self._recent)) / self._episodes_to_eval

    def reset(self, seed=0):
        self._apply_level()
        # only the full-reset closure bakes num_scenarios as a constant;
        # rebuild it iff the band changed since it was traced. The step
        # closure reads the band from state.scenario_cap (traced) and never
        # needs a rebuild.
        if getattr(self.env, "_reset_jit_cap", None) != self.env.num_scenarios:
            import jax
            self.env._reset_jit = jax.jit(self.env._reset_impl)
            self.env._reset_jit_cap = self.env.num_scenarios
        return self.env.reset(seed)

    def step(self, actions):
        obs, r, term, trunc, info = self.env.step(actions)
        done = np.asarray(term) | np.asarray(trunc)
        if done.any():
            success = np.asarray(info["arrive_dest"])[done]
            self._recent.extend(bool(s) for s in success)
            if (
                self.current_success_rate >= self.target_success_rate - 1e-3
                and self.level < self.num_levels - 1
            ):
                self.level_up()
        return obs, r, term, trunc, info

    def level_up(self):
        """Widen the sampling band WITHOUT recompiling: the auto-reset
        inside the jitted step samples sidx in [0, state.scenario_cap), so
        leveling up is a host-side integer swap on the live state."""
        from metadrive_ped_tpu.core.logger import get_logger
        self.level += 1
        get_logger().info(
            "curriculum level %d/%d: scenario band -> %d",
            self.level, self.num_levels, self.band * (self.level + 1),
        )
        self._recent = deque(maxlen=self._episodes_to_eval)
        self._apply_level()
        state = getattr(self.env, "_state", None)
        if state is not None:
            import jax.numpy as jnp
            cap = jnp.full_like(state.scenario_cap, self.band * (self.level + 1))
            self.env._state = state.replace(scenario_cap=cap)

    def __getattr__(self, name):
        return getattr(self.env, name)
