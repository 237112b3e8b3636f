"""Kinematic bicycle model — the single physics primitive of the simulator
(reference common/kinematics.py:22-36), as a jittable JAX function plus a
numpy twin for host-side golden tests.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp


@dataclass
class VehicleParam:
    wb: float = 3.0
    max_spd: float = 15.0
    max_acc: float = 6.0
    max_str: float = float(np.deg2rad(45.0))
    max_dstr: float = float(np.deg2rad(30.0))

    @property
    def max_dec(self) -> float:
        return -self.max_acc


def kine_propagate(state, ctrl, dt, wb=2.5, max_spd=20.0,
                   max_steer=float(np.deg2rad(45.0)), max_acc=6.0, max_dec=-6.0):
    """One Euler step of the kinematic bicycle on state [x, y, v, yaw].

    Clips accel/steer inputs, integrates, clips speed — exactly the update
    the reference applies at 50 Hz (common/kinematics.py:22-36). Shapes
    broadcast, so this vmaps over agent batches unchanged.
    """
    x, y, v, yaw = state[..., 0], state[..., 1], state[..., 2], state[..., 3]
    a = jnp.clip(ctrl[..., 0], max_dec, max_acc)
    delta = jnp.clip(ctrl[..., 1], -max_steer, max_steer)
    new_v = jnp.clip(v + a * dt, -max_spd, max_spd)
    return jnp.stack([
        x + v * jnp.cos(yaw) * dt,
        y + v * jnp.sin(yaw) * dt,
        new_v,
        yaw + v / wb * jnp.tan(delta) * dt,
    ], axis=-1)


def kine_propagate_np(state, ctrl, dt, wb=2.5, max_spd=20.0,
                      max_steer=float(np.deg2rad(45.0)), max_acc=6.0, max_dec=-6.0):
    """Numpy twin of `kine_propagate` for host-side checks."""
    x, y, v, yaw = state
    a = np.clip(ctrl[0], max_dec, max_acc)
    delta = np.clip(ctrl[1], -max_steer, max_steer)
    out = np.array([
        x + v * np.cos(yaw) * dt,
        y + v * np.sin(yaw) * dt,
        v + a * dt,
        yaw + v / wb * np.tan(delta) * dt,
    ])
    out[2] = np.clip(out[2], -max_spd, max_spd)
    return out


def ext_bicycle_step(x, u, dt: float, wb: float = 2.5):
    """Extended-state bicycle used by the trajectory optimizer.

    State [x, y, v, yaw, a, steer], control [jerk, steer-rate] — the same
    dynamics the reference compiles through Theano
    (planners/mind/trajectory_tree.py:153-177), here as a plain jnp function
    whose jacobians come from jax.jacfwd.
    """
    px, py, v, q, a, s = x[..., 0], x[..., 1], x[..., 2], x[..., 3], x[..., 4], x[..., 5]
    da, ds = u[..., 0], u[..., 1]
    return jnp.stack([
        px + v * jnp.cos(q) * dt,
        py + v * jnp.sin(q) * dt,
        v + a * dt,
        q + v / wb * jnp.tan(s) * dt,
        a + da * dt,
        s + ds * dt,
    ], axis=-1)
