"""Dynamics kernel vs a scalar oracle of the reference bicycle model
(component/vehicle_model/bicycle_model.py:17-51 — the model validated
against Bullet in the reference's tests/test_component/test_bicycle_model.py)."""
import math

import numpy as np

from metadrive_ped_tpu.envs.base import make_vehicle_params
from metadrive_ped_tpu.ops import dynamics


def oracle_substep(state, pedal, steering_norm, dt):
    """Scalar reference model: accel 3 m/s^2 (x3 when braking), friction
    0.5, beta = atan(0.5 tan d), heading rate v/4*tan(d)."""
    x, y, v, phi, beta = state
    steering_deg = steering_norm * 40.0
    delta = math.radians(steering_deg)
    new_beta = math.atan(0.5 * math.tan(delta))
    a = pedal * 3.0 if pedal >= 0 else pedal * 9.0
    af = 0.5
    new_v = 0.0
    if v > 1e-5 or a > af:
        new_v = v + (a - af) * dt
        if v * new_v < 0:
            new_v = 0.0
    new_phi = phi + v / 4.0 * math.tan(delta) * dt
    new_x = x + v * math.cos(phi + beta) * dt
    new_y = y + v * math.sin(phi + beta) * dt
    return (new_x, new_y, new_v, new_phi, new_beta)


def run_kernel(throttle, steering, steps):
    E = 3
    params = make_vehicle_params(np.full(E, 4, np.int32))  # "default" class
    pos = np.zeros((E, 2), np.float32)
    heading = np.zeros(E, np.float32)
    speed = np.zeros(E, np.float32)
    beta = np.zeros(E, np.float32)
    for _ in range(steps):
        pos, heading, speed, beta = dynamics.step_vehicle(
            pos, heading, speed, beta,
            np.full(E, steering, np.float32), np.full(E, throttle, np.float32),
            params, dt=0.02, substeps=1,
        )
    return np.asarray(pos[0]), float(heading[0]), float(speed[0]), float(beta[0])


def run_oracle(throttle, steering, steps):
    s = (0.0, 0.0, 0.0, 0.0, 0.0)
    for _ in range(steps):
        s = oracle_substep(s, throttle, steering, 0.02)
    return np.array([s[0], s[1]]), s[3], s[2], s[4]


def test_straight_throttle_matches_oracle():
    for throttle in (1.0, 0.5, 0.2):
        pos, heading, speed, _ = run_kernel(throttle, 0.0, 100)
        opos, oheading, ospeed, _ = run_oracle(throttle, 0.0, 100)
        np.testing.assert_allclose(pos, opos, atol=1e-2)
        assert abs(speed - ospeed) < 1e-3


def test_curved_trajectory_matches_oracle():
    pos, heading, speed, beta = run_kernel(0.8, 0.3, 200)
    opos, oheading, ospeed, obeta = run_oracle(0.8, 0.3, 200)
    np.testing.assert_allclose(pos, opos, atol=5e-2)
    assert abs(heading - oheading) < 1e-3
    assert abs(beta - obeta) < 1e-5


def test_brake_stops_without_reverse():
    E = 1
    params = make_vehicle_params(np.full(E, 4, np.int32))
    pos = np.zeros((E, 2), np.float32)
    heading = np.zeros(E, np.float32)
    speed = np.full(E, 10.0, np.float32)
    beta = np.zeros(E, np.float32)
    for _ in range(200):
        pos, heading, speed, beta = dynamics.step_vehicle(
            pos, heading, speed, beta, np.zeros(E, np.float32), np.full(E, -1.0, np.float32),
            params, dt=0.02, substeps=5,
        )
    assert float(speed[0]) == 0.0


def test_speed_governor_caps_at_80kmh():
    pos, heading, speed, _ = run_kernel(1.0, 0.0, 3000)
    assert speed * 3.6 <= 80.0 + 1.0


def test_reverse_enabled_goes_backward():
    E = 1
    params = make_vehicle_params(np.full(E, 4, np.int32))
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
