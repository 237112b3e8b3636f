"""Batched closed-loop simulation: several scenarios as one vmapped rollout.

BASELINE.json config: "All four demo scenarios as one batched vmapped rollout
on a single chip". Every scenario is padded to the same shapes, so one
vmapped `fused_plan_core` plans for all egos simultaneously — a plan cycle
for S scenarios costs roughly the same wall-clock as for one. Host-side
replay bookkeeping stays per-scenario (cheap numpy); plan cadence is shared
(identical plan_rate/enable_timestep across demos), which the runner asserts.
"""

from __future__ import annotations

import time
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mind_tpu.config import SimConfig, PlannerConfig, planner_config_for_demo
from mind_tpu.models import init_scene_pred
from mind_tpu.ops.potential import CostParams
from mind_tpu.planner.aime_device import obs_buffer_update
from mind_tpu.sim.simulator import Simulator
from mind_tpu.sim.agents import MINDAgent, CustomizedAgent
from mind_tpu.planner.planner import MINDPlanner


def _stack(items):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *items)


class MultiScenarioSim:
    """Drives S simulators in lockstep with one vmapped plan program."""

    def __init__(self, sim_cfgs: List[SimConfig],
                 planner_cfg: Optional[PlannerConfig] = None,
                 max_steps: Optional[int] = None):
        self.planner_cfg = planner_cfg or planner_config_for_demo("demo_1")
        cfg = self.planner_cfg
        shared_net = init_scene_pred(cfg.net, cfg.max_actors, cfg.max_lanes,
                                     seed=cfg.seed)
        if cfg.ckpt_path:
            import os
            if os.path.isdir(cfg.ckpt_path):
                from mind_tpu.models.checkpoint import load_params
                shared_net = (shared_net[0],
                              load_params(cfg.ckpt_path, shared_net[1]),
                              shared_net[2])

        self.sims: List[Simulator] = []
        self.avs: List[MINDAgent] = []
        for sc in sim_cfgs:
            sc.render = False
            sim = Simulator(sc, max_steps=max_steps)
            # build agents with a planner that shares the network
            import mind_tpu.sim.agents as agents_mod

            orig_init_planner = MINDAgent.init_planner

            def init_planner(agent_self, pc, _net=shared_net):
                agent_self.planner = MINDPlanner(
                    pc, agent_self._smp, agent_self.lcl_smp,
                    export_trees=False, shared_net=_net)

            MINDAgent.init_planner = init_planner
            try:
                sim.init_sim()
            finally:
                MINDAgent.init_planner = orig_init_planner
            av = next(a for a in sim.agents if a.id == "AV")
            self.sims.append(sim)
            self.avs.append(av)

        # all egos must share cadence for lockstep batching
        assert len({a.plan_rate for a in self.avs}) == 1
        assert len({a.enable_timestep for a in self.avs}) == 1

        p0 = self.avs[0].planner
        core = p0._fused_core

        # batch every CostParams leaf except the static grid size
        cp_axes = CostParams(
            **{f: (None if f == "grid_n" else 0) for f in CostParams._fields})

        def batched(params, bufs, types, amasks, x0s, warm_ps, full_ps, tvs,
                    lanes, tgts, evals):
            return jax.vmap(
                core, in_axes=(None, 0, 0, 0, 0, cp_axes, cp_axes, 0, 0, 0, 0)
            )(params, bufs, types, amasks, x0s, warm_ps, full_ps, tvs,
              lanes, tgts, evals)

        self._batched_fn = jax.jit(batched)
        self.params = p0.params
        self.plan_calls = 0
        self.plan_time_s = 0.0

        # statics never change: stack them once (each eager device op costs
        # ~20 ms over the tunnel)
        planners = [av.planner for av in self.avs]
        self._lanes_b = _stack([p.lane_static for p in planners])
        self._tgts_b = _stack([p.tgt_static for p in planners])
        self._evals_b = _stack([p._eval_segs for p in planners])
        self._tvs_b = jnp.asarray(
            [float(p.lcl_smp.target_velocity) for p in planners], jnp.float32)

        def stack_cp_base(phase):
            items = [p._cost_params()[phase] for p in planners]
            return CostParams(**{
                f: (getattr(items[0], f) if f == "grid_n"
                    else jnp.stack([getattr(i, f) for i in items]))
                for f in CostParams._fields})

        self._warm_b = stack_cp_base(0)
        self._full_b = stack_cp_base(1)

        # ONE batched device obs window [S, A, 50, ...]: per-planner updates
        # are deferred (ObsBuffer.pending) and applied here with a single
        # vmapped dispatch per trigger instead of S eager dispatches
        for p in planners:
            p.obs_buffer.device_updates = False
        self._bufs = _stack([p.obs_buffer.buf for p in planners])
        self._obs_update = jax.jit(jax.vmap(obs_buffer_update))
        # caches for rarely-changing stacked masks/types
        self._types_b = None
        self._types_ver = None
        self._amasks_b = None
        self._amasks_key = None

    # ------------------------------------------------------------------
    def _flush_obs(self):
        """Apply all deferred per-scenario obs updates as ONE vmapped
        dispatch. Scenarios without a pending update (terminated) roll their
        window forward unobserved."""
        planners = [av.planner for av in self.avs]
        if not any(p.obs_buffer.pending is not None for p in planners):
            return
        A = planners[0].obs_buffer.A
        # float64: the observation pipeline feeds the f64 decision path
        # (prune/branch/selection parity with the mirror); an f32 staging
        # buffer here would silently re-round every batched observation
        states = np.zeros((len(planners), A, 4), np.float64)
        present = np.zeros((len(planners), A), bool)
        for i, p in enumerate(planners):
            if p.obs_buffer.pending is not None:
                states[i], present[i] = p.obs_buffer.pending
                p.obs_buffer.pending = None
        self._bufs = self._obs_update(self._bufs, jnp.asarray(states),
                                      jnp.asarray(present))

    def _stacked_types(self, planners):
        ver = tuple(p.obs_buffer._ver for p in planners)
        if self._types_ver != ver:
            self._types_b = jnp.asarray(
                np.stack([p.obs_buffer.types for p in planners]))
            self._types_ver = ver
        return self._types_b

    def _stacked_amasks(self, planners):
        masks = np.stack([p.obs_buffer.actor_mask() for p in planners])
        key = masks.tobytes()
        if self._amasks_key != key:
            self._amasks_b = jnp.asarray(masks)
            self._amasks_key = key
        return self._amasks_b

    def _batched_plan(self, ready: List[int]):
        """One vmapped plan each trigger. The dispatch always covers ALL
        scenarios (fixed batch size -> one compilation even when some
        scenarios terminate); only `ready` egos consume their results."""
        t0 = time.perf_counter()
        for i in ready:  # state/ctrl hand-off (MINDAgent.plan semantics)
            av = self.avs[i]
            av.planner.update_state_ctrl(av.lcl_smp.ego_agent.state, av.ctrl)
        for av in self.avs:  # placeholders for non-ready scenarios
            if av.planner.state is None:
                av.planner.update_state_ctrl(av.state, av.ctrl)
        planners = [av.planner for av in self.avs]
        bufs = self._bufs
        types = self._stacked_types(planners)
        amasks = self._stacked_amasks(planners)
        # host-assembled small arrays: one upload each (local planning frame)
        x0s = jnp.asarray(np.stack(
            [np.concatenate([p.local_state(), p.ctrl]) for p in planners]
        ).astype(np.float32))
        ph = planners[0].cfg.traj_tree.full
        half = 0.5 * (ph.smooth_grid_size[0] - 1) * ph.smooth_grid_res
        offsets = jnp.asarray(np.stack(
            [p.local_state()[:2] - half for p in planners]).astype(np.float32))
        warm_ps = self._warm_b._replace(field_offset=offsets)
        full_ps = self._full_b._replace(field_offset=offsets)

        packed = np.asarray(self._batched_fn(
            self.params, bufs, types, amasks, x0s, warm_ps, full_ps,
            self._tvs_b, self._lanes_b, self._tgts_b, self._evals_b))
        self.plan_calls += 1
        self.plan_time_s += time.perf_counter() - t0

        ok = []
        for i in ready:
            ctrl = packed[i, :2].astype(np.float64)
            good = packed[i, 2] > 0.5 and np.isfinite(ctrl).all()
            if good:
                self.avs[i].ctrl = ctrl
            ok.append(good)
        return ok

    def run(self, horizon: Optional[int] = None):
        horizon = horizon or min(s.sim_horizon for s in self.sims)
        terminated = [False] * len(self.sims)
        t_start = time.perf_counter()

        for tick in range(horizon):
            ready = []
            for si, sim in enumerate(self.sims):
                if terminated[si]:
                    continue
                agent_obs = [
                    a.observe() for a in sim.agents
                    if (isinstance(a, CustomizedAgent)
                        or a.is_valid())
                ]
                for agent in sim.agents:
                    if isinstance(agent, CustomizedAgent):
                        agent.check_enable(sim.sim_time)
                        rec_tri, pl_tri = agent.check_trigger(sim.sim_time)
                        if rec_tri:
                            agent.step()
                        if pl_tri:
                            agent.update_observation(agent_obs)
                            if agent.is_enable and agent.id == "AV":
                                ready.append(si)
                    else:
                        agent.step()

            self._flush_obs()
            if ready:
                # batch only when every live scenario triggered together
                oks = self._batched_plan(ready)
                for ok, si in zip(oks, ready):
                    if not ok:
                        terminated[si] = True

            for si, sim in enumerate(self.sims):
                if terminated[si]:
                    continue
                for agent in sim.agents:
                    agent.update_state(sim.sim_step)
                sim.sim_time += sim.sim_step

        wall = time.perf_counter() - t_start
        return {
            "ticks": horizon,
            "scenarios": len(self.sims),
            "wall_time_s": wall,
            "plan_calls": self.plan_calls,
            "plan_time_s": self.plan_time_s,
            "terminated": terminated,
        }

    def ego_states(self) -> np.ndarray:
        return np.stack([a.state for a in self.avs])
