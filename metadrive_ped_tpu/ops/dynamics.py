"""Batched vehicle dynamics (kinematic bicycle with slip).

Replaces the reference's Bullet raycast-vehicle integration
(base_vehicle.py:595-671 chassis/wheels; engine_core.py:350-352 doPhysics).
The model is the reference's own offline bicycle approximation — validated
against Bullet in tests/test_component/test_bicycle_model.py — i.e.
component/vehicle_model/bicycle_model.py:17-51:

    beta  = atan(0.5 * tan(delta))           (slip angle)
    phi  += v / L_eff * tan(delta) * dt      (L_eff = 4 for DefaultVehicle)
    x    += v * cos(phi + beta_prev) * dt
    v    += (a - a_friction) * dt,  a_friction = 0.5 m/s^2, v floored at 0

augmented with the Bullet actuation semantics of _apply_throttle_brake
(base_vehicle.py:468-484): engine force zeroed above max_speed_km_h,
braking (not reverse) for negative throttle unless enable_reverse.

Full-throttle acceleration calibration: 4 wheels x 800 N / 1100 kg
= 2.9 m/s^2 ~ the reference model's 3.0; accel_gain/brake_gain in
VehicleParams carry the per-class scaling.

All ops are elementwise over any batch shape -> VPU-bound, fuses with the
rest of the step.
"""
import jax.numpy as jnp

FRICTION_DECEL = 0.5  # m/s^2 (bicycle_model.py:38 `af`)


def substep(pos, heading, speed, vel_dir, steering_norm, throttle, params, dt, enable_reverse):
    """One physics substep (dt=0.02). Shapes broadcast over batch axes."""
    delta = steering_norm * params.max_steer_rad
    tan_delta = jnp.tan(delta)
    new_beta = jnp.arctan(0.5 * tan_delta)

    speed_kmh = speed * 3.6
    over_governor = speed_kmh > params.max_speed_kmh
    accel_engine = jnp.where(over_governor, 0.0, throttle * params.accel_gain)
    accel_reverse = throttle * params.accel_gain
    decel_brake = -params.brake_gain * jnp.abs(throttle) * jnp.sign(speed)
    a = jnp.where(
        throttle >= 0,
        accel_engine,
        jnp.where(enable_reverse, accel_reverse, decel_brake),
    )
    # rolling friction opposes motion (or the accel direction at rest) and is
    # applied inside the velocity update even from standstill; the car only
    # starts moving once engine torque exceeds it (bicycle_model.py:40-44)
    moving = jnp.abs(speed) > 1e-5
    oppose = jnp.where(moving, jnp.sign(speed), jnp.sign(a))
    net = a - FRICTION_DECEL * oppose
    can_start = jnp.abs(a) > FRICTION_DECEL
    new_speed = jnp.where(moving | can_start, speed + net * dt, 0.0)
    # friction/brake cannot reverse the motion direction by itself; only an
    # actively reversing vehicle may cross through zero
    crossed = speed * new_speed < 0
    actively_reversing = (throttle < 0) & jnp.asarray(enable_reverse)
    new_speed = jnp.where(crossed & ~actively_reversing, 0.0, new_speed)

    new_heading = heading + speed / params.wheelbase_eff * tan_delta * dt
    # NOTE: position integrates with the *previous* slip angle, matching the
    # reference's update order (bicycle_model.py:46-49).
    move_dir = heading + vel_dir
    new_pos = pos + (speed * dt)[..., None] * jnp.stack(
        [jnp.cos(move_dir), jnp.sin(move_dir)], axis=-1
    )
    return new_pos, new_heading, new_speed, new_beta


def step_vehicle(pos, heading, speed, vel_dir, steering_norm, throttle, params,
                 dt=0.02, substeps=5, enable_reverse=False):
    """decision_repeat substeps (base_env.py:184-186). Unrolled: `substeps`
    is static and tiny, XLA fuses the chain into one elementwise kernel."""
    for _ in range(substeps):
        pos, heading, speed, vel_dir = substep(
            pos, heading, speed, vel_dir, steering_norm, throttle, params, dt, enable_reverse
        )
    return pos, heading, speed, vel_dir
