"""Typed configuration tree.

One dataclass hierarchy replaces the reference's three config tiers (sim JSON,
planner JSON, importable Python classes — SURVEY.md §5). The reference's JSON
files load unchanged via `SimConfig.from_json`, preserving every knob 1:1.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, asdict
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class NetConfig:
    """Scene-prediction network (reference net_cfg.py)."""

    num_modes: int = 6
    obs_len: int = 50
    pred_len: int = 60
    in_actor: int = 14
    d_actor: int = 128
    n_fpn_scale: int = 4
    in_lane: int = 16
    d_lane: int = 128
    d_rpe_in: int = 5
    d_rpe: int = 128
    d_embed: int = 128
    n_scene_layer: int = 6
    n_scene_head: int = 8
    dropout: float = 0.1
    update_edge: bool = True
    param_out: str = "bezier"
    bezier_order: int = 7
    # run the fusion-layer core through the Pallas VMEM-resident kernel
    # (ops/fusion_attention.py) instead of plain XLA. None = auto: enabled
    # on TPU (measured 1.3x on the network forward, ~7% end-to-end on the
    # fused episode), disabled on CPU where pallas only interprets
    use_pallas_fusion: bool | None = None
    # inference compute dtype ('float32' | 'bfloat16'); bfloat16 runs the
    # network on the MXU's native precision (params stay float32)
    compute_dtype: str = "float32"


@dataclass
class ScenTreeConfig:
    """AIME scenario-tree generation (reference planning/demo_*.py ScenTreeCfg)."""

    max_depth: int = 5
    tar_dist_thres: float = 10.0
    tar_time_ahead: float = 5.0
    seg_length: float = 15.0
    seg_n_node: int = 10
    far_dist_thres: float = 10.0
    # fixed-width limits for the TPU-side batched tree (new; sized to cover
    # every configuration the reference can reach: ≤6 modes per expansion)
    max_branch_nodes: int = 8      # simultaneously expanded nodes per round
    max_tree_nodes: int = 64       # total scenario-tree node slots
    prune_prob: float = 0.001
    merge_thres: float = float(np.pi / 6)
    cov_change_rate: float = 9.0


@dataclass
class OptPhaseConfig:
    """One optimization phase (warm start or full) of the trajectory tree."""

    w_des_velocity: float = 0.1
    w_des_accel: float = 1.0
    w_des_steer: float = 10.0
    w_con_velocity: float = 50.0
    w_con_accel: float = 50.0
    w_con_steer: float = 500.0
    state_upper_bound: Tuple[float, ...] = (1e5, 1e5, 8.0, 10.0, 4.0, 0.2)
    state_lower_bound: Tuple[float, ...] = (-1e5, -1e5, 0.0, -10.0, -6.0, -0.2)
    w_ctrl: float = 5.0
    w_tgt: float = 1.0
    smooth_grid_res: float = 0.4
    smooth_grid_size: Tuple[int, int] = (256, 256)
    # full-phase only (ignored in warm start)
    w_ego: float = 1.0
    w_ego_cov_offset: float = 1.0
    w_exo: float = 10.0
    w_exo_cov_offset: float = 2.5
    w_exo_cost_offset: float = 10.0

    def w_des_state(self) -> np.ndarray:
        w = np.zeros((6, 6))
        w[2, 2] = self.w_des_velocity
        w[4, 4] = self.w_des_accel
        w[5, 5] = self.w_des_steer
        return w

    def w_state_con(self) -> np.ndarray:
        w = np.zeros((6, 6))
        w[2, 2] = self.w_con_velocity
        w[4, 4] = self.w_con_accel
        w[5, 5] = self.w_con_steer
        return w


@dataclass
class TrajTreeConfig:
    """Trajectory-tree optimizer (reference planning/demo_*.py TrajTreeCfg)."""

    dt: float = 0.2
    state_size: int = 6
    action_size: int = 2
    wheelbase: float = 2.5
    warm: OptPhaseConfig = field(default_factory=OptPhaseConfig)
    full: OptPhaseConfig = field(default_factory=OptPhaseConfig)
    # iLQR solver budget (reference solver.py uses rel_tol 1e-6 in float64;
    # in on-chip float32 that threshold is below cost-sum resolution and the
    # solver would always burn max_iterations, so the default is 1e-5 —
    # controls agree to ~1e-4)
    max_iterations: int = 100
    # warm-start phase budget: the warm solve only initializes the full solve
    # (reference planner.py:174-178 gives both the full 100; 40 reaches the
    # same warm trajectory to ~1e-3 at a fraction of the cost)
    warm_max_iterations: int = 40
    rel_tol: float = 1e-5
    # iLQR solve precision: "float32" (fast path) or "float64" (strict
    # parity — matches the f64 reference mirror's solver, removing
    # tree-selection flips at near-tied candidate trees)
    solve_dtype: str = "float32"
    # execution precision: after the best tree is selected from the
    # `solve_dtype` solves, the WINNER is re-solved at this dtype and its
    # first control is what the vehicle executes. None (default) follows
    # `solve_dtype`, which disables the re-solve — so strict mode
    # (solve_dtype='float64' alone) stays pure f64 end to end.
    exec_solve_dtype: Optional[str] = None
    # exec re-solve strategy:
    # - "polish": ONE full-phase solve at exec_solve_dtype warm-started from
    #   the winner's converged `solve_dtype` controls — converges to the
    #   full-cost optimum (the point the mirror's two-phase f64 solve also
    #   approaches) in a handful of f64 iterations instead of the ~140
    #   two-phase iterations from scratch;
    # - "scratch": re-run the full two-phase solve at exec_solve_dtype,
    #   reproducing the f64 mirror's iteration path exactly (executed
    #   control mirror-exact whenever the selection agrees) — the
    #   certification option, priced at ~5.6x the plan cycle
    #   (outputs/exec_ab.json: 623 ms vs 111 ms on demo_1);
    # - "native": the 'scratch' two-phase f64 re-solve computed as native
    #   C++ on the HOST CPU (mind_tpu/native) instead of TPU f64 emulation
    #   — same mirror-exact semantics at ~5 ms/plan instead of ~450 ms.
    #   Host-loop path only (the fused single-program episode cannot call
    #   out mid-scan); exec_solve_dtype is ignored (the C++ is f64).
    exec_resolve_mode: str = "polish"
    # iteration cap for the polish re-solve (a budget, not a trip count —
    # the lax.while_loop exits on the production rel_tol, measured ~5-15
    # iterations from a converged f32 warm start)
    exec_polish_iterations: int = 100
    n_line_search: int = 10
    max_reg: float = 1e10
    # fixed-width limits for the batched tree solve (new)
    max_cost_nodes: int = 192
    max_depth_levels: int = 32
    max_width_hint: int = 16   # max cost nodes per depth level (= max leaves)


@dataclass
class PlannerConfig:
    """One MIND planner instance (reference planners/mind/configs/demo_*.json)."""

    net: NetConfig = field(default_factory=NetConfig)
    scen_tree: ScenTreeConfig = field(default_factory=ScenTreeConfig)
    traj_tree: TrajTreeConfig = field(default_factory=TrajTreeConfig)
    ckpt_path: Optional[str] = None
    seed: int = 20240121  # weight init seed when no checkpoint is available
    obs_len: int = 50
    plan_len: int = 50
    # best-tree selection weights (reference planner.py:180-198)
    comfort_acc_weight: float = 0.1
    comfort_str_weight: float = 5.0
    efficiency_weight: float = 0.01
    target_weight: float = 0.01
    # fixed paddings for jit-stable shapes (new); defaults cover all four
    # bundled demos (<=45 tracks, <=71 lane-graph segments)
    max_actors: int = 48
    max_lanes: int = 80
    # AIME pipeline precision: dtype of the observation window, scene prep,
    # and decoded trajectory slots. "float64" runs the whole decision
    # pipeline at the f64 reference mirror's precision (bit-equal network
    # inputs -> bit-equal prune/merge/branch quantities given equal network
    # outputs); "float32" keeps the bulk tensors in the chip-native dtype —
    # probabilities, covariance accumulation, renormalization and the
    # tree-selection cost stay f64 either way (they are cheap scalars/small
    # tensors and carry the discrete decisions; see PARITY.md). Production
    # defaults to float32: the f64 bulk pipeline costs ~22% throughput
    # (outputs/exec_ab.json: 75.1 -> 58.8 steps/s on demo_1) and the
    # decision scalars above are what the flip-free property rests on.
    pipeline_dtype: str = "float32"


@dataclass
class ClAgentConfig:
    """One closed-loop agent binding (sim JSON `cl_agents` entry)."""

    id: str = "AV"
    enable_timestep: float = 4.0
    semantic_lane: int = -1       # -1 => auto-select closest
    target_velocity: float = -1.0  # -1 => mean log speed
    agent: str = "MINDAgent"
    planner_config: Optional[str] = None


@dataclass
class RenderConfig:
    mode: str = "fixed"
    camera_x: float = 0.0
    camera_y: float = 0.0
    camera_yaw: float = 0.0
    camera_elev: float = 90.0


@dataclass
class SimConfig:
    """Top-level simulation config (reference configs/demo_*.json)."""

    sim_name: str = "demo"
    seq_id: str = ""
    data_root: str = "data"
    output_dir: str = "outputs"
    num_threads: int = 8
    render: bool = False
    render_config: RenderConfig = field(default_factory=RenderConfig)
    cl_agents: List[ClAgentConfig] = field(default_factory=list)
    sim_step: float = 0.02
    sim_horizon: int = 500

    @classmethod
    def from_json(cls, path: Path | str, data_root: Optional[str] = None) -> "SimConfig":
        """Load a reference-format sim JSON (configs/demo_*.json)."""
        with open(path, "r") as f:
            raw = json.load(f)
        rc = raw.get("render_config", {}).get("camera_position", {})
        cfg = cls(
            sim_name=raw["sim_name"],
            seq_id=raw["seq_id"],
            output_dir=raw.get("output_dir", "outputs"),
            num_threads=raw.get("num_threads", 8),
            render=raw.get("render", False),
            render_config=RenderConfig(
                mode=raw.get("render_config", {}).get("mode", "fixed"),
                camera_x=rc.get("x", 0.0),
                camera_y=rc.get("y", 0.0),
                camera_yaw=rc.get("yaw", 0.0),
                camera_elev=rc.get("elev", 90.0),
            ),
            cl_agents=[
                ClAgentConfig(
                    id=c["id"],
                    enable_timestep=c["enable_timestep"],
                    semantic_lane=c.get("semantic_lane", -1),
                    target_velocity=c.get("target_velocity", -1),
                    agent=c.get("agent", "MINDAgent").split(":")[-1],
                    planner_config=c.get("planner_config"),
                )
                for c in raw.get("cl_agents", [])
            ],
        )
        if data_root is not None:
            cfg.data_root = data_root
        return cfg

    @property
    def seq_path(self) -> Path:
        return Path(self.data_root) / self.seq_id

    @property
    def map_path(self) -> Path:
        return self.seq_path / f"log_map_archive_{self.seq_id}.json"

    @property
    def scenario_path(self) -> Path:
        return self.seq_path / f"scenario_{self.seq_id}.parquet"


def planner_config_for_demo(demo: str) -> PlannerConfig:
    """PlannerConfig equivalent to the reference's planning/demo_*.py modules.

    demo_3 raises the desired-velocity weight to .5 in both phases
    (planning/demo_3.py:23,51); all other demos share demo_1's values.
    Picks up the repo-trained demo weights when present (the reference's
    checkpoints are stripped from its snapshot).
    """
    cfg = PlannerConfig()
    # inference runs the fusion net in MXU-native bfloat16 (decoder stays
    # f32); cls err ~2e-3, position err ~2 cm vs f32
    cfg.net.compute_dtype = "bfloat16"
    if demo.endswith("3"):
        cfg.traj_tree.warm.w_des_velocity = 0.5
        cfg.traj_tree.full.w_des_velocity = 0.5
    default_w = Path(__file__).resolve().parent.parent / "weights/scene_pred_demo"
    if default_w.is_dir():
        cfg.ckpt_path = str(default_w)
    return cfg


def load_planner_config(path: Path | str) -> PlannerConfig:
    """Load a reference-format planner JSON (planners/mind/configs/demo_*.json),
    mapping its `planning_config` module name onto our typed tree."""
    with open(path, "r") as f:
        raw = json.load(f)
    demo = raw.get("planning_config", "demo_1").rsplit(".", 1)[-1]
    cfg = planner_config_for_demo(demo)
    if raw.get("ckpt_path"):  # otherwise keep the repo-trained default
        cfg.ckpt_path = raw["ckpt_path"]
    return cfg
