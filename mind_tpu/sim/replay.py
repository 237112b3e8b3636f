"""Device-resident replay simulation: the 50 Hz loop as a jitted lax.scan.

The reference steps Python agent objects per tick (simulator.py:51-107); for
replay (non-reactive) agents that loop is a pure gather over resampled logs,
so the whole rollout becomes one `lax.scan` over device-resident scene state
— the M1 slice of SURVEY.md §7 and the substrate for the vmapped multi-
scenario and Monte-Carlo configs in BASELINE.json.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mind_tpu.data.loader import TrajBundle


class ReplayScene(NamedTuple):
    """Padded device arrays for one scenario's replay logs."""

    pos: jnp.ndarray    # [N, T, 2]
    ang: jnp.ndarray    # [N, T]
    vel: jnp.ndarray    # [N, T]
    valid: jnp.ndarray  # [N, T] bool
    mask: jnp.ndarray   # [N] real agents


def scene_from_bundle(bundle: TrajBundle, max_agents: Optional[int] = None,
                      max_steps: Optional[int] = None) -> ReplayScene:
    n, t = bundle.pos.shape[:2]
    N = max_agents or n
    T = max_steps or t
    pos = np.zeros((N, T, 2), np.float32)
    ang = np.zeros((N, T), np.float32)
    vel = np.zeros((N, T), np.float32)
    valid = np.zeros((N, T), bool)
    mask = np.zeros(N, bool)
    pos[:n, :t] = bundle.pos[:, :T]
    ang[:n, :t] = bundle.ang[:, :T]
    vel[:n, :t] = bundle.vel[:, :T]
    valid[:n, :t] = bundle.has_flag[:, :T]
    mask[:n] = True
    return ReplayScene(jnp.asarray(pos), jnp.asarray(ang), jnp.asarray(vel),
                       jnp.asarray(valid), jnp.asarray(mask))


def replay_rollout(scene: ReplayScene, horizon: int):
    """Full replay rollout: states[t] = log state at step t+1 (the reference
    advances rec_step before update_state). Returns ([H, N, 4] states,
    [H, N] valid)."""
    T = scene.pos.shape[1]

    def step(carry, t):
        rec = jnp.minimum(t + 1, T - 1)
        state = jnp.stack([
            scene.pos[:, rec, 0], scene.pos[:, rec, 1],
            scene.vel[:, rec], scene.ang[:, rec],
        ], axis=-1)
        return carry, (state, scene.valid[:, rec])

    _, (states, valid) = jax.lax.scan(step, None, jnp.arange(horizon))
    return states, valid


def perturbed_rollout(scene: ReplayScene, horizon: int, offsets: jnp.ndarray,
                      dt: float = 0.02):
    """Monte-Carlo rollout: every agent replays its log velocity/heading
    profile but integrates position from a perturbed initial state via the
    kinematic bicycle's position update. offsets: [N, 2] initial position
    perturbation. Vmap over a batch of offsets for the 64-way config."""
    T = scene.pos.shape[1]
    x0 = jnp.concatenate([scene.pos[:, 0] + offsets,
                          scene.vel[:, 0:1], scene.ang[:, 0:1]], axis=-1)

    def step(state, t):
        rec = jnp.minimum(t + 1, T - 1)
        v = scene.vel[:, rec]
        yaw = scene.ang[:, rec]
        new = jnp.stack([
            state[:, 0] + v * jnp.cos(yaw) * dt,
            state[:, 1] + v * jnp.sin(yaw) * dt,
            v, yaw,
        ], axis=-1)
        return new, new

    _, states = jax.lax.scan(step, x0, jnp.arange(horizon))
    return states  # [H, N, 4]


def batched_replay(scenes: ReplayScene, horizon: int):
    """Vmapped rollout across stacked scenes ([S, ...] leading axis) — the
    'all four demos as one batched rollout' config."""
    return jax.vmap(lambda s: replay_rollout(s, horizon))(scenes)
