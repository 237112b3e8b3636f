"""Device-resident closed-loop episode: the ENTIRE 500-step rollout as one
jitted `lax.scan` over plan cycles — obs-window update, fused AIME + tree-iLQR
plan, and 50 Hz bicycle propagation all on device, with a single host sync at
the end of the episode.

This is the TPU-native endgame of the reference's host loop
(reference simulator.py:51-107 + agent.py:277-300): where `Simulator.run_sim`
dispatches one fused plan program per 10 Hz trigger (~40 ms tunnel latency
each), this runner uploads the precomputed replay/presence schedule once and
scans C = horizon/5 cycles in one program. Exo agents are non-reactive, so
their slot states, presence masks, and the obs-buffer slot assignment are all
known ahead of time (reference agent.py:119-149 replay semantics); only the
ego state, control, and observation window are carried through the scan.

Semantics-matching notes (all verified against the host loop by
tests/test_episode.py):
- observations recorded at loop start of each tick (pre-update), ego slot 0;
- obs window updates at every 10 Hz trigger from tick 0, plans only once
  `sim_time >= enable_timestep` (reference agent.py:261-286);
- at the enable tick the ego state re-loads from the replay log and the
  control resets to zero (reference agent.py:208-214 init_state_ctrl);
- between plans the ego integrates the clipped kinematic bicycle at 50 Hz
  with the held control (reference agent.py:297-300, kinematics.py:22-36);
- a plan failure latches: later cycles skip planning and the episode
  reports the failing cycle (reference simulator.py:85-89 termination).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mind_tpu.common.kinematics import kine_propagate
from mind_tpu.planner.aime_device import DeviceObsBuffer, obs_buffer_update
from mind_tpu.planner.planner import fused_plan_core, type_onehot


TICKS_PER_PLAN = 5  # 50 Hz sim / 10 Hz planner (reference agent.py:156-157)


class EpisodeInputs(NamedTuple):
    """Per-cycle schedule, precomputed on host (all replay-derived)."""

    slot_states: jnp.ndarray  # [C, A, 4] local-frame obs at each trigger tick
    present: jnp.ndarray      # [C, A] slot observed at this trigger
    active: jnp.ndarray       # [C, A] slot assigned by this trigger
    ego_replay: jnp.ndarray   # [C, 5, 4] ego log at ticks t0..t0+4 (local)
    types: jnp.ndarray        # [A, 7] one-hot per slot
    enable_tick: jnp.ndarray  # [] int32
    target_vel: jnp.ndarray   # [] f32


class EpisodeResult(NamedTuple):
    ego_states: np.ndarray   # [T, 4] loop-start ego states, GLOBAL frame f64
    plan_ok: np.ndarray      # [C] bool (True where a plan ran and succeeded)
    planned: np.ndarray      # [C] bool (a plan ran this cycle)
    iterations: np.ndarray   # [C] iLQR iteration counts
    controls: np.ndarray     # [C, 2] applied [accel, steer] per cycle
    fail_cycle: int          # first failed cycle, or -1
    plan_calls: int


def build_episode_inputs(sim, horizon: Optional[int] = None) -> EpisodeInputs:
    """Precompute the replay/presence schedule from an initialized Simulator
    (exactly the observation stream the host loop would feed the planner)."""
    from mind_tpu.sim.agents import CustomizedAgent, MINDAgent

    egos = [a for a in sim.agents if isinstance(a, MINDAgent)]
    assert len(egos) == 1, "episode runner supports exactly one MIND ego"
    ego = egos[0]
    pl = ego.planner
    A = pl.cfg.max_actors
    origin = pl.origin
    dt = sim.sim_step
    T = horizon or sim.sim_horizon
    C = T // TICKS_PER_PLAN
    assert C * TICKS_PER_PLAN == T, "horizon must be a multiple of 5"
    enable_tick = int(np.ceil(ego.enable_timestep / dt - 1e-9))

    def log_state(agent, t):
        r = min(t, agent.max_step)
        return np.array([agent.traj_pos[r][0], agent.traj_pos[r][1],
                         agent.traj_vel[r], agent.traj_ang[r]], np.float64)

    exo = [a for a in sim.agents if not isinstance(a, CustomizedAgent)]

    # replicate ObsBuffer slot assignment: first-seen order over trigger
    # ticks, ego always slot 0, new tracks dropped when the buffer is full
    slots: dict = {}
    types = np.zeros((A, 7), np.float32)

    def assign(track_id, obj_type):
        if track_id in slots:
            return slots[track_id]
        if len(slots) >= A:
            return None
        s = len(slots)
        slots[track_id] = s
        types[s] = type_onehot(obj_type)
        return s

    slot_states = np.zeros((C, A, 4), np.float64)
    present = np.zeros((C, A), bool)
    active = np.zeros((C, A), bool)
    ego_replay = np.zeros((C, TICKS_PER_PLAN, 4), np.float64)

    for c in range(C):
        t0 = c * TICKS_PER_PLAN
        s0 = assign("AV", ego.type)
        slot_states[c, s0] = log_state(ego, t0)
        present[c, s0] = True
        for a in exo:
            r = min(t0, a.max_step)
            if not a.has_flag[r]:
                continue
            s = assign(a.id, a.traj_type[r])
            if s is None:
                continue
            slot_states[c, s] = log_state(a, t0)
            present[c, s] = True
        active[c, : len(slots)] = True
        for i in range(TICKS_PER_PLAN):
            ego_replay[c, i] = log_state(ego, t0 + i)

    slot_states[:, :, :2] -= origin
    ego_replay[:, :, :2] -= origin
    return EpisodeInputs(
        slot_states=jnp.asarray(slot_states, jnp.float32),
        present=jnp.asarray(present),
        active=jnp.asarray(active),
        ego_replay=jnp.asarray(ego_replay, jnp.float32),
        types=jnp.asarray(types),
        enable_tick=jnp.int32(enable_tick),
        target_vel=jnp.float32(float(ego.lcl_smp.target_velocity)),
    )


def make_episode_fn(planner, veh_param, dt: float):
    """Build the jitted episode program around one planner's statics.

    Returns fn(params, inputs) -> (rec [C,5,4], ok [C], planned [C],
    iters [C]) — a single device program for the whole episode."""
    cfg = planner.cfg
    warm_p, full_p = planner._cost_params()
    ph = cfg.traj_tree.full
    half = 0.5 * (ph.smooth_grid_size[0] - 1) * ph.smooth_grid_res
    weights = (cfg.comfort_acc_weight, cfg.comfort_str_weight,
               cfg.efficiency_weight, cfg.target_weight)
    core = functools.partial(
        fused_plan_core, batched_apply=planner.batched_apply, cfg=cfg,
        ilqr_cfg=planner.ilqr_cfg, warm_ilqr_cfg=planner.warm_ilqr_cfg,
        weights=weights)
    lane_static, tgt_static = planner.lane_static, planner.tgt_static
    eval_segs = planner._eval_segs
    wb, max_spd, max_str = veh_param.wb, veh_param.max_spd, veh_param.max_str

    def episode(params, inp: EpisodeInputs):
        A = inp.types.shape[0]
        C = inp.slot_states.shape[0]

        def cycle(carry, xs):
            buf, ego, ctrl, failed = carry
            states, present, act, ego_rep, c = xs
            t0 = c * TICKS_PER_PLAN
            enabled = t0 >= inp.enable_tick
            # pre-update ego obs: replay until (and including) the enable
            # tick, carried state after
            ego_obs = jnp.where(t0 <= inp.enable_tick, states[0], ego)
            states = states.at[0].set(ego_obs)
            buf = obs_buffer_update(buf, states, present)
            amask = act & present

            ctrl_in = jnp.where(t0 <= inp.enable_tick,
                                jnp.zeros_like(ctrl), ctrl)
            x0 = jnp.concatenate([ego_obs, ctrl_in]).astype(jnp.float32)
            offset = jnp.asarray([x0[0] - half, x0[1] - half], jnp.float32)
            wp = warm_p._replace(field_offset=offset)
            fp = full_p._replace(field_offset=offset)

            do_plan = enabled & ~failed

            def plan_branch(_):
                return core(params, buf, inp.types, amask, x0, wp, fp,
                            inp.target_vel, lane_static, tgt_static,
                            eval_segs)

            out = jax.lax.cond(do_plan, plan_branch,
                               lambda _: jnp.zeros(4, jnp.float32),
                               operand=None)
            ok = out[2] > 0.5
            new_ctrl = jnp.where(do_plan & ok, out[:2], ctrl_in)
            failed = failed | (do_plan & ~ok)

            # 5 ticks of 50 Hz propagation, recording loop-start states.
            # After a plan failure the reference terminates the episode
            # (simulator.py:85-89); here the ego freezes so post-failure
            # frames stay bounded (the host wrapper truncates at fail_cycle)
            def tick(s, i):
                t = t0 + i
                s = jnp.where(t <= inp.enable_tick, ego_rep[i], s)
                rec = s
                s_next = kine_propagate(s, new_ctrl, dt, wb, max_spd, max_str)
                s = jnp.where((t >= inp.enable_tick) & ~failed, s_next, s)
                return s, rec

            ego, rec = jax.lax.scan(tick, ego, jnp.arange(TICKS_PER_PLAN))
            return (buf, ego, new_ctrl, failed), (rec, ok, do_plan, out[3],
                                                  new_ctrl)

        buf0 = DeviceObsBuffer.create(A)
        carry0 = (buf0, jnp.zeros(4, jnp.float32), jnp.zeros(2, jnp.float32),
                  jnp.array(False))
        xs = (inp.slot_states, inp.present, inp.active, inp.ego_replay,
              jnp.arange(C, dtype=jnp.int32))
        _, (rec, ok, planned, iters, ctrls) = jax.lax.scan(cycle, carry0, xs)
        return rec, ok, planned, iters, ctrls

    return jax.jit(episode)


def run_episode(sim, horizon: Optional[int] = None) -> EpisodeResult:
    """Run one scenario's closed loop as a single device program.

    `sim` must be an initialized Simulator with one MINDAgent ego. The
    returned ego trajectory matches `Simulator.run_sim()` +
    `sim.ego_trajectory()` (tests/test_episode.py asserts <= 1e-3)."""
    from mind_tpu.sim.agents import MINDAgent

    ego = next(a for a in sim.agents if isinstance(a, MINDAgent))
    pl = ego.planner
    inp = build_episode_inputs(sim, horizon)
    fn = getattr(pl, "_episode_fn", None)
    if fn is None:
        fn = make_episode_fn(pl, ego.veh_param, sim.sim_step)
        pl._episode_fn = fn
    rec, ok, planned, iters, ctrls = fn(pl.params, inp)
    rec = np.asarray(rec, np.float64).reshape(-1, 4)
    rec[:, :2] += pl.origin
    ok = np.asarray(ok)
    planned = np.asarray(planned)
    failed = planned & ~ok
    fail_cycle = int(np.argmax(failed)) if failed.any() else -1
    return EpisodeResult(
        ego_states=rec,
        plan_ok=ok,
        planned=planned,
        iterations=np.asarray(iters),
        controls=np.asarray(ctrls),
        fail_cycle=fail_cycle,
        plan_calls=int(planned.sum()) if fail_cycle < 0
        else int(planned[: fail_cycle + 1].sum()),
    )
