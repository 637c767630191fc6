"""Framework logger (engine/logger.py analog): log-once dedup + levels."""
import logging
from contextlib import contextmanager

from metadrive_ped_tpu.core.logger import get_logger, reset_log_once, set_log_level


@contextmanager
def capture(level=logging.INFO):
    """The framework logger doesn't propagate to root (so pytest output
    stays clean) — capture with an explicit handler."""
    logger = get_logger()
    records = []

    class _H(logging.Handler):
        def emit(self, record):
            records.append(record)

    h = _H(level)
    old_level = logger.level
    logger.addHandler(h)
    logger.setLevel(level)
    try:
        yield records
    finally:
        logger.removeHandler(h)
        logger.setLevel(old_level)


def test_log_once_deduplicates():
    logger = get_logger()
    reset_log_once()
    with capture(logging.WARNING) as records:
        for _ in range(5):
            logger.warning("only once please", extra={"log_once": True})
        logger.warning("every time")
        logger.warning("every time")
    assert len([r for r in records if r.msg == "only once please"]) == 1
    assert len([r for r in records if r.msg == "every time"]) == 2


def test_reset_log_once_allows_reemit():
    logger = get_logger()
    reset_log_once()
    with capture(logging.WARNING) as records:
        logger.warning("banner", extra={"log_once": True})
        reset_log_once()
        logger.warning("banner", extra={"log_once": True})
    assert len([r for r in records if r.msg == "banner"]) == 2


def test_env_construction_logs_scene_summary():
    from metadrive_ped_tpu import MetaDriveEnv
    with capture(logging.INFO) as records:
        MetaDriveEnv(dict(num_envs=1, map="S", num_scenarios=1,
                          traffic_density=0.0))
    assert any("compiled" in r.getMessage() for r in records)


def test_zero_init_expert_warns_once():
    from metadrive_ped_tpu.policies.expert import load_expert_params
    reset_log_once()
    with capture(logging.WARNING) as records:
        load_expert_params(path="/nonexistent.npz", allow_zero_init=True)
        load_expert_params(path="/nonexistent.npz", allow_zero_init=True)
    warns = [r for r in records if "zero-initialized" in r.getMessage()]
    assert len(warns) == 1
    set_log_level(logging.INFO)
