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

Everything per-scenario — the replay schedule, lane graph, target lane, cost
parameters — is a runtime ARGUMENT of the program, not a trace-time constant,
so ONE compiled executable serves all four demos, `jax.vmap` batches S
scenarios into one program (`run_episodes_batched`), and K Monte-Carlo
perturbed egos of one scenario share the statics (`run_episode_monte_carlo`).

Semantics-matching notes (all verified against the host loop by
tests/test_episode.py):
- observations recorded at loop start of each tick (pre-update), ego slot 0;
- obs window updates at every 10 Hz trigger from tick 0, plans only once
  `sim_time >= enable_timestep` (reference agent.py:261-286);
- at the enable tick the ego state re-loads from the replay log and the
  control resets to zero (reference agent.py:208-214 init_state_ctrl);
- between plans the ego integrates the clipped kinematic bicycle at 50 Hz
  with the held control (reference agent.py:297-300, kinematics.py:22-36);
- a plan failure (no surviving scenario tree, or a non-finite control)
  latches: later cycles skip planning and the episode reports the failing
  cycle (reference simulator.py:85-89 termination).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import time
from typing import List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mind_tpu.common.kinematics import kine_propagate
from mind_tpu.ops.potential import CostParams
from mind_tpu.planner.aime_device import DeviceObsBuffer, obs_buffer_update
from mind_tpu.planner.planner import fused_plan_core, type_onehot
from mind_tpu.planner.scene_prep import LaneGraphStatic, TargetLaneStatic


TICKS_PER_PLAN = 5  # 50 Hz sim / 10 Hz planner (reference agent.py:156-157)


class EpisodeStatics(NamedTuple):
    """Per-scenario device data that is constant over the episode. Passed as
    runtime arguments (NOT baked into the compilation) so one executable
    serves every scenario and the whole pytree vmaps across scenarios."""

    lane_static: LaneGraphStatic
    tgt_static: TargetLaneStatic
    eval_seg_start: jnp.ndarray   # [P-1, 2] selection-lane segments
    eval_seg_end: jnp.ndarray     # [P-1, 2]
    eval_seg_mask: jnp.ndarray    # [P-1]
    warm_params: CostParams       # field_offset re-centered per cycle
    full_params: CostParams


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
    # float64 schedule: the episode's obs/replay stream feeds the decision
    # pipeline at mirror precision (see DeviceObsBuffer docstring)
    return EpisodeInputs(
        slot_states=jnp.asarray(slot_states, jnp.float64),
        present=jnp.asarray(present),
        active=jnp.asarray(active),
        ego_replay=jnp.asarray(ego_replay, jnp.float64),
        types=jnp.asarray(types),
        enable_tick=jnp.int32(enable_tick),
        target_vel=jnp.float32(float(ego.lcl_smp.target_velocity)),
    )


def build_episode_statics(planner) -> EpisodeStatics:
    """Collect one planner's per-scenario device statics as episode data."""
    warm_p, full_p = planner._cost_params()
    ev_s, ev_e, ev_m = planner._eval_segs
    return EpisodeStatics(
        lane_static=planner.lane_static,
        tgt_static=planner.tgt_static,
        eval_seg_start=ev_s,
        eval_seg_end=ev_e,
        eval_seg_mask=ev_m,
        warm_params=warm_p,
        full_params=full_p,
    )


def _build_cycle(params, inp: EpisodeInputs, st: EpisodeStatics,
                 enable_tick, *, core, half, wb, max_spd, max_str, dt):
    """One plan cycle of the device episode as a `lax.scan` step function.

    `enable_tick` is a SEPARATE (never-batched) scalar: it is the only input
    feeding the plan `lax.cond` predicate, so under `jax.vmap` the cond stays
    a cond (uniform across lanes) instead of degrading to a select that runs
    the full AIME+iLQR plan on every pre-enable cycle of every lane — the
    difference between the batched 4-demo program costing ~1× and ~2.5× the
    planned-cycle work. The per-lane failure latch is applied to the OUTPUTS
    (a failed lane keeps planning in lock-step but discards the results),
    matching the host loop's observable behavior. The unbatched mode shares
    this cycle body, so a failed single-scenario episode also keeps
    executing (discarded) plan cycles — accepted: failure ends the
    episode's useful region anyway, and one cycle implementation keeps the
    single/batched programs semantically identical by construction."""
    eval_segs = (st.eval_seg_start, st.eval_seg_end, st.eval_seg_mask)

    def cycle(carry, xs):
        buf, ego, ctrl, failed = carry
        states, present, act, ego_rep, c = xs
        t0 = c * TICKS_PER_PLAN
        enabled = t0 >= enable_tick
        # pre-update ego obs: replay until (and including) the enable
        # tick, carried state after
        ego_obs = jnp.where(t0 <= enable_tick, states[0], ego)
        states = states.at[0].set(ego_obs)
        buf = obs_buffer_update(buf, states, present)
        amask = act & present

        ctrl_in = jnp.where(t0 <= enable_tick,
                            jnp.zeros_like(ctrl), ctrl)
        # x0 and the grid origin stay f64 (the mirror's precision; a
        # 6-vector, nil cost) — two_phase_solve casts them to the solve
        # dtype internally, and the exec re-solve sees the unrounded state
        x0 = jnp.concatenate([ego_obs, ctrl_in.astype(jnp.float64)])
        offset = jnp.asarray([x0[0] - half, x0[1] - half], jnp.float64)
        wp = st.warm_params._replace(field_offset=offset)
        fp = st.full_params._replace(field_offset=offset)

        def plan_branch(_):
            return core(params, buf, inp.types, amask, x0, wp, fp,
                        inp.target_vel, st.lane_static, st.tgt_static,
                        eval_segs)

        out = jax.lax.cond(enabled, plan_branch,
                           lambda _: jnp.zeros(4, jnp.float32),
                           operand=None)
        do_plan = enabled & ~failed
        # non-finite controls fail the plan exactly like the host loop
        # (planner.py _plan_fused); otherwise a NaN ctrl would be applied
        # with plan_ok still True — a silent semantic divergence
        ok = (out[2] > 0.5) & jnp.all(jnp.isfinite(out[:2]))
        new_ctrl = jnp.where(do_plan & ok, out[:2], ctrl_in)
        failed = failed | (do_plan & ~ok)

        # 5 ticks of 50 Hz propagation in float64 (the host loop integrates
        # the ego in host f64 — reference agent.py:297-300), recording
        # loop-start states. After a plan failure the reference terminates
        # the episode (simulator.py:85-89); here the ego freezes so
        # post-failure frames stay bounded (the host wrapper truncates at
        # fail_cycle)
        def tick(s, i):
            t = t0 + i
            s = jnp.where(t <= inp.enable_tick, ego_rep[i], s)
            rec = s
            # widen the f32 control to f64 BEFORE a*dt etc. — the host loop
            # holds the same f32-valued control in f64 (agents.py plan())
            s_next = kine_propagate(s, new_ctrl.astype(s.dtype), dt, wb,
                                    max_spd, max_str)
            s = jnp.where((t >= inp.enable_tick) & ~failed, s_next, s)
            return s, rec

        ego, rec = jax.lax.scan(tick, ego, jnp.arange(TICKS_PER_PLAN))
        return (buf, ego, new_ctrl, failed), (rec, ok, do_plan, out[3],
                                              new_ctrl)

    return cycle


def _init_episode_carry(A: int, pipeline_dtype=jnp.float64):
    # the ego state carry is ALWAYS f64 (the host loop integrates the ego in
    # host f64 — reference agent.py:297-300); only the obs window follows
    # the pipeline dtype
    return (DeviceObsBuffer.create(A, jnp.dtype(pipeline_dtype)),
            jnp.zeros(4, jnp.float64),
            jnp.zeros(2, jnp.float32), jnp.array(False))


def _episode_core(params, inp: EpisodeInputs, st: EpisodeStatics,
                  enable_tick, *, pipeline_dtype=jnp.float64, **kw):
    """The whole closed loop as ONE pure scan over all plan cycles."""
    C = inp.slot_states.shape[0]
    cycle = _build_cycle(params, inp, st, enable_tick, **kw)
    carry0 = _init_episode_carry(inp.types.shape[0], pipeline_dtype)
    xs = (inp.slot_states, inp.present, inp.active, inp.ego_replay,
          jnp.arange(C, dtype=jnp.int32))
    _, (rec, ok, planned, iters, ctrls) = jax.lax.scan(cycle, carry0, xs)
    return rec, ok, planned, iters, ctrls


def _episode_core_seg(params, inp: EpisodeInputs, st: EpisodeStatics,
                      enable_tick, c0, carry, *,
                      pipeline_dtype=jnp.float64, **kw):
    """A SEGMENT of the closed loop: plan cycles [c0, c0+Cseg) with an
    explicit carry. Splitting the episode into a few device programs bounds
    per-program execution time (a single 100-cycle Monte-Carlo chunk program
    can run minutes when perturbed starts drive the iLQR to max iterations —
    long enough to trip the TPU runtime's execution watchdog) at the price
    of one ~µs host sync per segment instead of one per episode."""
    Cseg = inp.slot_states.shape[0]
    cycle = _build_cycle(params, inp, st, enable_tick, **kw)
    xs = (inp.slot_states, inp.present, inp.active, inp.ego_replay,
          c0 + jnp.arange(Cseg, dtype=jnp.int32))
    carry, (rec, ok, planned, iters, ctrls) = jax.lax.scan(cycle, carry, xs)
    return carry, (rec, ok, planned, iters, ctrls)


# One jitted episode program per (planner configuration, batch mode): the
# compiled executable is shared by every scenario with the same paddings —
# all four demos hit ONE compilation (and its persistent-cache entry).
_EPISODE_FN_CACHE: dict = {}


def _cfg_signature(planner, veh_param, dt: float) -> str:
    cfg = dataclasses.asdict(planner.cfg)
    cfg.pop("ckpt_path", None)  # weights are data, not program structure
    cfg.pop("seed", None)
    # every OptPhaseConfig field except the grid geometry becomes a runtime
    # CostParams array (trajectory_tree.make_cost_params) — cost weights and
    # bounds are episode-statics DATA, not program structure. Keeping them
    # in the key would give demo_3 (w_des_velocity override) a needless
    # second executable, breaking the one-compilation-serves-all-demos
    # property this cache exists for.
    for ph in ("warm", "full"):
        phase = cfg["traj_tree"][ph]
        cfg["traj_tree"][ph] = {
            k: phase[k] for k in ("smooth_grid_res", "smooth_grid_size")}
    return json.dumps({
        "cfg": cfg,
        "veh": (veh_param.wb, veh_param.max_spd, veh_param.max_str),
        "dt": dt,
    }, sort_keys=True, default=str)


def _make_core(planner, veh_param, dt: float, batched_apply=None,
               seg: bool = False):
    cfg = planner.cfg
    ph = cfg.traj_tree.full
    half = 0.5 * (ph.smooth_grid_size[0] - 1) * ph.smooth_grid_res
    weights = (cfg.comfort_acc_weight, cfg.comfort_str_weight,
               cfg.efficiency_weight, cfg.target_weight)
    core = functools.partial(
        fused_plan_core,
        batched_apply=batched_apply or planner.batched_apply, cfg=cfg,
        ilqr_cfg=planner.ilqr_cfg, warm_ilqr_cfg=planner.warm_ilqr_cfg,
        weights=weights)
    return functools.partial(
        _episode_core_seg if seg else _episode_core, core=core, half=half,
        wb=veh_param.wb, max_spd=veh_param.max_spd, max_str=veh_param.max_str,
        dt=dt, pipeline_dtype=jnp.dtype(cfg.pipeline_dtype))


def episode_fn_for(planner, veh_param, dt: float, batch: str = "single"):
    """The jitted episode program for one planner configuration.

    batch='single': fn(params, inputs, statics);
    batch='single_seg': unbatched, one SEGMENT of cycles with an explicit
        carry — fn(params, inputs, statics, enable_tick, c0, carry). For
        configurations whose per-cycle cost makes a whole-episode program
        outlive the TPU execution watchdog (e.g. the strict
        solve_dtype='float64' mode, whose emulated-f64 iLQR is ~an order
        of magnitude slower per cycle);
    batch='scenarios': vmapped over leading axes of BOTH inputs and statics;
    batch='copies_seg': vmapped over inputs only (shared statics —
        Monte-Carlo), one SEGMENT of cycles with an explicit carry —
        fn(params, inputs, statics, enable_tick, c0, carry). There is
        deliberately NO unsegmented copies mode: a whole-episode
        Monte-Carlo program is exactly the configuration that trips the
        TPU execution watchdog on hard perturbed cycles.
    """
    key = (_cfg_signature(planner, veh_param, dt), batch)
    fn = _EPISODE_FN_CACHE.get(key)
    if fn is not None:
        return fn
    batched_apply = None
    if batch == "copies_seg":
        # the pallas fusion kernel does not survive the extra vmap level
        # (Mosaic fails to legalize the doubly-batched grid), and at
        # copies*branch batch sizes the plain-XLA path batches just as well
        from mind_tpu.models.scene_pred import (
            ScenePredNet, make_batched_apply, resolve_pallas_fusion)

        if resolve_pallas_fusion(planner.cfg.net):
            net_cfg = dataclasses.replace(planner.cfg.net,
                                          use_pallas_fusion=False)
            batched_apply = make_batched_apply(ScenePredNet(net_cfg), net_cfg)
    body = _make_core(planner, veh_param, dt, batched_apply,
                      seg=batch in ("copies_seg", "single_seg"))
    # enable_tick (and the segment's c0) are NEVER batched: enable_tick
    # drives the plan cond, which must stay uniform across vmap lanes (see
    # _build_cycle)
    if batch in ("single", "single_seg"):
        fn = jax.jit(body)
    elif batch == "scenarios":
        fn = jax.jit(jax.vmap(body, in_axes=(None, 0, 0, None)))
    elif batch == "copies_seg":
        fn = jax.jit(jax.vmap(body, in_axes=(None, 0, None, None, None, 0)))
    else:
        raise ValueError(batch)
    _EPISODE_FN_CACHE[key] = fn
    return fn


def _to_result(pl, rec, ok, planned, iters, ctrls) -> EpisodeResult:
    # np.array (copy) not np.asarray: a CPU-backend jax array converts to a
    # READ-ONLY zero-copy view, and the origin shift below writes in place
    rec = np.array(rec, np.float64).reshape(-1, 4)
    rec[:, :2] += pl.origin
    ok = np.asarray(ok)
    planned = np.asarray(planned)
    failed = planned & ~ok
    fail_cycle = int(np.argmax(failed)) if failed.any() else -1
    if fail_cycle >= 0:
        # truncate at the failing cycle like the reference's terminate-on-
        # plan-failure loop (simulator.py:85-89): the device program keeps
        # the ego frozen past this point, and those frozen frames are
        # neither trajectory data nor simulated throughput steps
        rec = rec[: (fail_cycle + 1) * TICKS_PER_PLAN]
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


def _episode_setup(sim, horizon, inputs):
    """Shared run_episode/run_episode_segmented setup: locate the MIND ego,
    build (or reuse) the schedule, and collect the per-scenario statics."""
    from mind_tpu.sim.agents import MINDAgent

    ego = next(a for a in sim.agents if isinstance(a, MINDAgent))
    pl = ego.planner
    inp = inputs if inputs is not None else build_episode_inputs(sim, horizon)
    return ego, pl, inp, build_episode_statics(pl)


def run_episode(sim, horizon: Optional[int] = None,
                inputs: Optional[EpisodeInputs] = None) -> EpisodeResult:
    """Run one scenario's closed loop as a single device program.

    `sim` must be an initialized Simulator with one MINDAgent ego. The
    returned ego trajectory matches `Simulator.run_sim()` +
    `sim.ego_trajectory()` (tests/test_episode.py asserts <= 1e-3).
    `inputs` optionally reuses a schedule from `build_episode_inputs(sim,
    horizon)` (callers that need the schedule themselves — e.g. the parity
    playback harness — avoid building and uploading it twice)."""
    ego, pl, inp, statics = _episode_setup(sim, horizon, inputs)
    fn = episode_fn_for(pl, ego.veh_param, sim.sim_step)
    out = fn(pl.params, inp, statics, inp.enable_tick)
    return _to_result(pl, *out)


def run_episode_timed(sim, horizon: Optional[int] = None):
    """(result, wall_s) with the warm-measurement discipline every episode
    benchmark uses: the first call absorbs compile/cache-load/warm-up, the
    second is timed. Shared by bench.py, scripts/bench_strict.py, and
    scripts/run_all_demos.py so the timing definition cannot drift."""
    import time

    inp = build_episode_inputs(sim, horizon)
    run_episode(sim, horizon, inputs=inp)
    t0 = time.perf_counter()
    res = run_episode(sim, horizon, inputs=inp)
    return res, time.perf_counter() - t0


def run_episode_segmented(sim, horizon: Optional[int] = None,
                          seg_cycles: int = 10,
                          inputs: Optional[EpisodeInputs] = None
                          ) -> EpisodeResult:
    """`run_episode` in `seg_cycles`-cycle device programs.

    Identical cycle program and result; the scan is cut into segments with
    an explicit carry crossing the host boundary (one ~µs sync per segment
    instead of one per episode). Use this when a single whole-episode
    program could outlive the TPU runtime's execution watchdog (~8 min,
    see `run_episode_monte_carlo`): measured in round 3, the strict
    `solve_dtype='float64'` configuration — whose emulated-f64 iLQR is far
    slower per cycle than the production f32 solve — faults the worker as
    one 100-cycle program but completes segmented."""
    assert seg_cycles >= 1, f"seg_cycles must be >= 1, got {seg_cycles}"
    ego, pl, inp, statics = _episode_setup(sim, horizon, inputs)
    fn = episode_fn_for(pl, ego.veh_param, sim.sim_step, batch="single_seg")
    C = int(inp.slot_states.shape[0])
    carry = _init_episode_carry(int(inp.types.shape[0]),
                                jnp.dtype(pl.cfg.pipeline_dtype))
    segs = []
    for s0 in range(0, C, seg_cycles):
        s1 = min(s0 + seg_cycles, C)
        carry, out = fn(pl.params, _slice_cycles(inp, s0, s1), statics,
                        inp.enable_tick, jnp.int32(s0), carry)
        segs.append([np.asarray(o) for o in out])
    outs = [np.concatenate([s[j] for s in segs], axis=0)
            for j in range(len(segs[0]))]
    return _to_result(pl, *outs)


def _stack(items):
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                        *items)


def run_episodes_batched(sims, horizon: Optional[int] = None
                         ) -> List[EpisodeResult]:
    """All S scenarios as ONE vmapped device program (one sync total).

    Every sim must be initialized with the same paddings/plan cadence; the
    planners should share network weights (see MultiScenario bench). This is
    the BASELINE.json "4 demos as one batched rollout" config executed in
    episode mode: S × 500 steps, one device program, one host sync."""
    from mind_tpu.sim.agents import MINDAgent

    egos = [next(a for a in s.agents if isinstance(a, MINDAgent))
            for s in sims]
    pls = [e.planner for e in egos]
    inps = [build_episode_inputs(s, horizon) for s in sims]
    ticks = {int(i.enable_tick) for i in inps}
    assert len(ticks) == 1, f"egos must share the enable tick, got {ticks}"
    # the compiled core bakes pls[0]'s NON-static values (selection
    # weights, iLQR budgets/solve dtype, grid half-size, vehicle, net
    # architecture) — per-scenario cost weights ride in the runtime statics
    # (demo_3's w_des override), but a planner differing in a BAKED field
    # would silently run with scenario 0's constants, so assert equality
    def baked_sig(p, e, s):
        ph = p.cfg.traj_tree.full
        return json.dumps({
            "weights": [p.cfg.comfort_acc_weight, p.cfg.comfort_str_weight,
                        p.cfg.efficiency_weight, p.cfg.target_weight],
            "half": 0.5 * (ph.smooth_grid_size[0] - 1) * ph.smooth_grid_res,
            "ilqr": list(p.ilqr_cfg), "warm": list(p.warm_ilqr_cfg),
            "net": dataclasses.asdict(p.cfg.net),
            "shapes": [p.cfg.max_actors, p.cfg.max_lanes],
            "veh": [e.veh_param.wb, e.veh_param.max_spd, e.veh_param.max_str],
            "dt": s.sim_step,
        }, sort_keys=True, default=str)

    sigs = {baked_sig(p, e, s) for p, e, s in zip(pls, egos, sims)}
    assert len(sigs) == 1, "scenario planners differ in core-baked config"
    # the batched program runs EVERY scenario with pls[0]'s weights — equal
    # configs do not imply equal checkpoints, and silently planning
    # scenarios 1..S-1 with scenario 0's network would be plausible-but-
    # wrong output, so require identical (or same-object) params
    for i, p in enumerate(pls[1:], 1):
        if p.params is pls[0].params:
            continue
        same = jax.tree.all(jax.tree.map(
            lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()),
            p.params, pls[0].params))
        assert same, (
            f"scenario {i}'s planner holds different network weights than "
            f"scenario 0; run_episodes_batched shares scenario 0's params "
            f"— run differing-weight scenarios via run_episode instead")
    inp_b = _stack(inps)
    st_b = _stack([build_episode_statics(p) for p in pls])
    fn = episode_fn_for(pls[0], egos[0].veh_param, sims[0].sim_step,
                        batch="scenarios")
    out = fn(pls[0].params, inp_b, st_b, jnp.int32(ticks.pop()))
    outs_np = [np.asarray(o) for o in out]
    return [
        _to_result(pls[i], *(o[i] for o in outs_np))
        for i in range(len(sims))
    ]


def perturb_ego_starts(base, k: int, pos_sigma: float, vel_sigma: float,
                       tar_dist_thres: float, seed: int,
                       corridor_frac: float = 0.1) -> np.ndarray:
    """Corridor-respecting perturbed ego start states [K, 4] (x, y, v, yaw).

    Position noise is split into lane-frame components: sigma_long along the
    heading, and a lateral sigma capped at `corridor_frac * tar_dist_thres`
    so the perturbation respects the corridor the reference's target-lane
    prune enforces (reference scenario_tree.py:373-379) — wide isotropic
    noise parks most copies outside the corridor where every plan
    legitimately fails, which makes a poor scale workload (round-2
    finding)."""
    rng = np.random.default_rng(seed)
    base = np.asarray(base, np.float64)
    yaw = base[3]
    lat_sigma = min(pos_sigma, corridor_frac * tar_dist_thres)
    d_long = rng.normal(0.0, pos_sigma, k)
    d_lat = rng.normal(0.0, lat_sigma, k)
    dx = d_long * np.cos(yaw) - d_lat * np.sin(yaw)
    dy = d_long * np.sin(yaw) + d_lat * np.cos(yaw)
    dv = rng.normal(0.0, vel_sigma, k)

    starts = np.tile(base, (k, 1))
    starts[:, 0] += dx
    starts[:, 1] += dy
    starts[:, 2] = np.maximum(starts[:, 2] + dv, 0.0)
    return starts


def build_mc_inputs(sim, k: int, pos_sigma: float = 0.5,
                    vel_sigma: float = 0.25, seed: int = 0,
                    horizon: Optional[int] = None,
                    corridor_frac: float = 0.1) -> EpisodeInputs:
    """K perturbed-ego copies of one scenario's episode schedule.

    The ego enables immediately (cycle 0) from a perturbed start state; see
    `perturb_ego_starts` for the corridor-respecting noise model."""
    from mind_tpu.sim.agents import MINDAgent

    ego = next(a for a in sim.agents if isinstance(a, MINDAgent))
    pl = ego.planner
    inp = build_episode_inputs(sim, horizon)

    base = np.asarray(inp.ego_replay[0, 0], np.float64)  # local frame
    starts = perturb_ego_starts(base, k, pos_sigma, vel_sigma,
                                pl.cfg.scen_tree.tar_dist_thres, seed,
                                corridor_frac)

    def one(start):
        s = jnp.asarray(start, jnp.float64)
        return inp._replace(
            slot_states=inp.slot_states.at[0, 0].set(s),
            ego_replay=inp.ego_replay.at[0, 0].set(s),
            enable_tick=jnp.int32(0),
        )

    return _stack([one(starts[i]) for i in range(k)])


def _slice_cycles(inp: EpisodeInputs, s0: int, s1: int) -> EpisodeInputs:
    """Slice the per-cycle fields [.., C, ..] to cycles [s0, s1)."""
    ax = inp.slot_states.ndim - 3  # 0 unbatched, 1 with a leading copy axis
    def cut(x):
        return jax.lax.slice_in_dim(x, s0, s1, axis=ax)
    return inp._replace(slot_states=cut(inp.slot_states),
                        present=cut(inp.present), active=cut(inp.active),
                        ego_replay=cut(inp.ego_replay))


def run_episode_monte_carlo(sim, k: int = 64, pos_sigma: float = 0.5,
                            vel_sigma: float = 0.25, seed: int = 0,
                            horizon: Optional[int] = None,
                            chunk: int = 4,
                            seg_cycles: int = 10,
                            deadline: Optional[float] = None,
                            mesh=None,
                            chunk_walls: Optional[list] = None
                            ) -> List[EpisodeResult]:
    """K Monte-Carlo perturbed closed-loop episodes, vmapped on device.

    `deadline` (epoch seconds) optionally bounds the sweep: no new chunk is
    dispatched past it, and the completed copies are returned (callers
    report len(results) as the copies actually run). Chunks that already
    started still finish — the bound is best-effort, not preemptive.
    `chunk_walls`, if given, receives one (lo, hi, wall_s) tuple per
    dispatched chunk — the cold (first-chunk executable load / hard-cycle)
    vs warm steady-state split the MC benchmarks report.

    Lanes run in chunks of `chunk` copies per device program: each plan
    cycle's batched network forward materializes a [lanes*B, N, N, D] fusion
    edge memory (N = actors+lanes+1 = 129..144 tokens), so 64 concurrent
    lanes would need ~2x5 GB of HBM scratch just for one layer. Measured on
    the real v5e chip, chunk=8 reproducibly faults the TPU worker (HBM
    exhaustion inside the fused episode program) while chunk=4 runs the
    whole 64-copy sweep reliably, so 4 is the default.

    Each chunk additionally runs as `seg_cycles`-cycle SEGMENTS (an explicit
    scan carry crosses the host boundary): perturbed starts can drive the
    iLQR toward max iterations on many cycles at once (measured ~17 s/cycle
    vs ~1 s nominal on the k=64 stream's first chunk), and a single
    100-cycle chunk program then runs long enough to trip the TPU runtime's
    execution watchdog (observed as a worker 'kernel fault' on the k=64
    stream while short probes passed; a measured 466 s segment survived, a
    ~900 s program did not). Bounding each program to 10 cycles keeps even
    an all-hard-cycle dispatch near ~190 s, at the cost of nine extra ~µs
    syncs per chunk.

    `mesh` optionally shards the copy axis over a `jax.sharding.Mesh` (first
    mesh axis): each device plans/integrates its shard of the perturbed egos
    in SPMD, the cross-copy batch dimension riding ICI-free (no collectives —
    copies are independent), so a v5e-8 slice runs 8x the lanes per program.
    The per-chunk HBM budget is per DEVICE, so the default chunk scales by
    the device count; the chunk size must divide evenly across devices."""
    from mind_tpu.sim.agents import MINDAgent

    assert seg_cycles >= 1, f"seg_cycles must be >= 1, got {seg_cycles}"
    ego = next(a for a in sim.agents if isinstance(a, MINDAgent))
    pl = ego.planner
    inp_b = build_mc_inputs(sim, k, pos_sigma, vel_sigma, seed, horizon)
    statics = build_episode_statics(pl)
    fn = episode_fn_for(pl, ego.veh_param, sim.sim_step, batch="copies_seg")
    params = pl.params
    C = int(inp_b.slot_states.shape[1])
    A = int(inp_b.types.shape[-2])  # types is [K, A, 7] after _stack
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_dev = int(np.prod(mesh.devices.shape))
        axis = mesh.axis_names[0]
        chunk = chunk * n_dev
        copies_sh = NamedSharding(mesh, PartitionSpec(axis))
        replicated = NamedSharding(mesh, PartitionSpec())
        statics = jax.device_put(statics, replicated)
        # checkpoint-loaded params arrive committed to one device; they
        # must be replicated over the mesh like the statics
        params = jax.device_put(params, replicated)

        def place_copies(tree):
            return jax.device_put(tree, copies_sh)
    results: List[EpisodeResult] = []
    for lo in range(0, k, chunk):
        if deadline is not None and results and time.time() > deadline:
            break
        t_chunk = time.perf_counter()
        hi = min(lo + chunk, k)
        inp_c = jax.tree.map(lambda x: x[lo:hi], inp_b)
        carry = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (hi - lo,) + x.shape),
            _init_episode_carry(A, jnp.dtype(pl.cfg.pipeline_dtype)))
        if mesh is not None:
            assert (hi - lo) % n_dev == 0, (
                f"chunk of {hi - lo} copies does not divide over {n_dev} "
                f"devices; pick k/chunk multiples of the mesh size")
            inp_c = place_copies(inp_c)
            carry = place_copies(carry)
        segs = []
        for s0 in range(0, C, seg_cycles):
            s1 = min(s0 + seg_cycles, C)
            carry, out = fn(params, _slice_cycles(inp_c, s0, s1),
                            statics, jnp.int32(0), jnp.int32(s0), carry)
            if mesh is not None and lo == 0 and s0 == 0:
                got = len(out[0].sharding.device_set)
                assert got == n_dev, (
                    f"episode outputs sharded over {got} devices, "
                    f"expected {n_dev} (sharding {out[0].sharding})")
            segs.append([np.asarray(o) for o in out])
        outs_np = [np.concatenate([s[j] for s in segs], axis=1)
                   for j in range(len(segs[0]))]
        results.extend(
            _to_result(pl, *(o[i] for o in outs_np))
            for i in range(hi - lo))
        if chunk_walls is not None:
            chunk_walls.append((lo, hi,
                                round(time.perf_counter() - t_chunk, 2)))
    return results
