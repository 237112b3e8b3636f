"""Monte-Carlo closed-loop rollouts: K perturbed egos in one scenario,
planned by ONE vmapped fused program per cycle (BASELINE.json config:
"64-way Monte-Carlo rollout of one scenario with perturbed agent initial
states").

All K copies share the scenario's replay agents, map statics and network
parameters (broadcast into the vmap); only the ego state, the rolling
observation window and the cost-field origin are per-copy. The K observation
windows live in ONE batched DeviceObsBuffer updated by a single vmapped
dispatch per plan trigger, and the K egos integrate the kinematic bicycle in
vectorized host numpy between plans.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from mind_tpu.config import SimConfig, PlannerConfig, planner_config_for_demo
from mind_tpu.common.kinematics import VehicleParam
from mind_tpu.data.loader import ArgoAgentLoader
from mind_tpu.data.semantic_map import SemanticMap
from mind_tpu.ops.potential import CostParams
from mind_tpu.planner.aime_device import DeviceObsBuffer, obs_buffer_update
from mind_tpu.planner.planner import MINDPlanner, type_onehot
from mind_tpu.sim.agents import MINDAgent


class MonteCarloSim:
    """K perturbed ego copies of one scenario, closed loop."""

    def __init__(self, sim_cfg: SimConfig, k: int = 64,
                 pos_sigma: float = 0.5, vel_sigma: float = 0.25,
                 planner_cfg: Optional[PlannerConfig] = None, seed: int = 0,
                 max_steps: Optional[int] = None):
        self.k = k
        self.sim_cfg = sim_cfg
        self.horizon = max_steps or sim_cfg.sim_horizon
        self.sim_step = sim_cfg.sim_step
        pc = planner_cfg or planner_config_for_demo(sim_cfg.sim_name)
        self.pc = pc

        smp = SemanticMap().load_from_argo2(sim_cfg.map_path)
        self.bundle = ArgoAgentLoader(sim_cfg.scenario_path).get_trajs_info(smp)
        self.av_row = self.bundle.track_ids.index("AV")

        # one template agent/planner provides statics + cost params
        av = MINDAgent()
        c = sim_cfg.cl_agents[0]
        av.init("AV", self.bundle, self.av_row, smp,
                semantic_lane_id=None if c.semantic_lane == -1 else c.semantic_lane,
                target_velocity=None if c.target_velocity == -1 else c.target_velocity)
        av.init_planner(pc)
        av.update_target_lane(smp, None if c.semantic_lane == -1 else c.semantic_lane)
        self.planner: MINDPlanner = av.planner
        self.veh = VehicleParam()

        # perturbed ego initial states [K, 4]: corridor-respecting noise so
        # copies start inside the target-lane corridor (see
        # sim.episode.perturb_ego_starts; reference scenario_tree.py:373-379)
        from mind_tpu.sim.episode import perturb_ego_starts

        base = np.array([
            self.bundle.pos[self.av_row, 0, 0], self.bundle.pos[self.av_row, 0, 1],
            self.bundle.vel[self.av_row, 0], self.bundle.ang[self.av_row, 0]])
        self.egos = perturb_ego_starts(
            base, k, pos_sigma, vel_sigma,
            pc.scen_tree.tar_dist_thres, seed)
        self.ctrls = np.zeros((k, 2))

        # slot layout: 0 = ego, then every other track in bundle order
        A = pc.max_actors
        self.exo_rows = [i for i in range(len(self.bundle))
                         if i != self.av_row][:A - 1]
        types = np.zeros((A, 7), np.float32)
        types[0] = type_onehot(self.bundle.types[self.av_row][0])
        for s, r in enumerate(self.exo_rows, start=1):
            types[s] = type_onehot(self.bundle.types[r][0])
        self._types_d = jnp.asarray(types)
        amask = np.zeros(A, bool)
        amask[0] = True
        amask[1:1 + len(self.exo_rows)] = True  # refined per trigger below
        self.A = A

        # batched obs buffer [K, A, ...]
        self.buf = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (k,) + x.shape).copy(),
            DeviceObsBuffer.create(A, jnp.dtype(pc.pipeline_dtype)))
        self._update_fn = jax.jit(
            jax.vmap(obs_buffer_update, in_axes=(0, 0, None)))

        # batched plan: statics broadcast, per-copy buf/x0/field offset
        core = self.planner._fused_core
        cp_axes = CostParams(**{
            f: (0 if f == "field_offset" else None)
            for f in CostParams._fields})

        def batched(params, bufs, types_d, amask_d, x0s, warm_p, full_p, tv,
                    lane, tgt, evals):
            return jax.vmap(
                core,
                in_axes=(None, 0, None, None, 0, cp_axes, cp_axes, None,
                         None, None, None)
            )(params, bufs, types_d, amask_d, x0s, warm_p, full_p, tv,
              lane, tgt, evals)

        self._batched_fn = jax.jit(batched)
        self.plan_calls = 0
        self.failed = np.zeros(k, bool)
        self.trajectory = []

    # ------------------------------------------------------------------
    def _exo_state(self, rec: int):
        """Replay states/validity for the exo slots at a 50 Hz step, in the
        planner's local frame."""
        states = np.zeros((self.A, 4), np.float64)
        present = np.zeros(self.A, bool)
        present[0] = True
        for s, r in enumerate(self.exo_rows, start=1):
            states[s] = (self.bundle.pos[r, rec, 0], self.bundle.pos[r, rec, 1],
                         self.bundle.vel[r, rec], self.bundle.ang[r, rec])
            present[s] = self.bundle.has_flag[r, rec]
        states[:, :2] -= self.planner.origin
        return states.astype(np.float32), present

    def run(self):
        pc = self.pc
        plan_every = 5  # 10 Hz at dt=0.02
        amask_holder = {}
        t0 = time.perf_counter()

        for tick in range(self.horizon):
            rec = min(tick, self.bundle.pos.shape[1] - 1)
            if tick % plan_every == 0:
                states, present = self._exo_state(rec)
                egos_loc = self.egos.copy()
                egos_loc[:, :2] -= self.planner.origin
                egos_d = jnp.asarray(egos_loc.astype(np.float32))
                states_d = jnp.asarray(states)

                def with_ego(e, s=states_d):
                    return s.at[0].set(e)

                batched_states = jax.vmap(with_ego)(egos_d)
                self.buf = self._update_fn(self.buf, batched_states,
                                           jnp.asarray(present))
                amask_holder["mask"] = jnp.asarray(present)

                # plan
                x0s = jnp.asarray(np.concatenate(
                    [egos_loc, self.ctrls], axis=1).astype(np.float32))
                warm_p, full_p = self.planner._cost_params()
                ph = pc.traj_tree.full
                half = 0.5 * (ph.smooth_grid_size[0] - 1) * ph.smooth_grid_res
                offs = jnp.asarray(
                    (egos_loc[:, :2] - half).astype(np.float32))
                warm_p = warm_p._replace(field_offset=offs)
                full_p = full_p._replace(field_offset=offs)
                tv = jnp.float32(float(self.planner.lcl_smp.target_velocity))

                packed = np.asarray(self._batched_fn(
                    self.planner.params, self.buf, self._types_d,
                    amask_holder["mask"], x0s, warm_p, full_p, tv,
                    self.planner.lane_static, self.planner.tgt_static,
                    self.planner._eval_segs))
                self.plan_calls += 1
                good = (packed[:, 2] > 0.5) & np.isfinite(packed[:, :2]).all(1)
                self.ctrls[good & ~self.failed] = packed[good & ~self.failed, :2]
                self.failed |= ~good

            # vectorized bicycle step for all K egos
            x, y, v, yaw = (self.egos[:, 0], self.egos[:, 1],
                            self.egos[:, 2], self.egos[:, 3])
            a = np.clip(self.ctrls[:, 0], -self.veh.max_acc, self.veh.max_acc)
            d = np.clip(self.ctrls[:, 1], -self.veh.max_str, self.veh.max_str)
            self.egos = np.stack([
                x + v * np.cos(yaw) * self.sim_step,
                y + v * np.sin(yaw) * self.sim_step,
                np.clip(v + a * self.sim_step, -self.veh.max_spd,
                        self.veh.max_spd),
                yaw + v / self.veh.wb * np.tan(d) * self.sim_step,
            ], axis=1)
            self.trajectory.append(self.egos.copy())

        wall = time.perf_counter() - t0
        return {
            "ticks": self.horizon,
            "copies": self.k,
            "wall_time_s": wall,
            "plan_calls": self.plan_calls,
            "failed": int(self.failed.sum()),
            "effective_steps_per_s": self.k * self.horizon / wall,
        }
