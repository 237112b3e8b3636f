"""mind_tpu — a TPU-native (JAX/XLA/Pallas) closed-loop driving simulator + planner.

A ground-up re-design of the capabilities of HKUST-Aerial-Robotics/MIND
(arXiv 2408.13742): a 50 Hz replay simulator over Argoverse 2 scenarios, a
SIMPL-style joint scene-prediction transformer, AIME scenario-tree branching,
and a tree-structured iLQR contingency planner — all expressed as fixed-shape,
device-resident JAX programs (lax.scan rollouts, vmapped tree expansion,
batched Riccati sweeps) instead of the reference's Python-object loop,
PyTorch inference and Theano/numpy iLQR.

Layer map (mirrors SURVEY.md §1):
  data/      — AV2 parquet/map ingestion, semantic map, agent loading (host, numpy)
  common/    — geometry, kinematics, bboxes, generic tree (host + jittable)
  models/    — flax scene-prediction network (ScenePredNet equivalent)
  ops/       — jittable potential fields, rpe, attention kernels
  planner/   — batched tree-iLQR, scenario tree (AIME), MIND planner facade
  sim/       — closed-loop simulator + agents
  parallel/  — meshes, sharding, multi-chip scale-out
  viz/       — matplotlib rendering fed from host-transferred buffers
"""

__version__ = "0.1.0"

# Enable 64-bit mode package-wide: decision-critical scalars (AIME
# branch/prune/merge thresholds, probability renormalization, tree-selection
# costs) evaluate in float64 on device so the production f32 pipeline takes
# the same discrete decisions as the float64 reference mirror (PARITY.md).
# Every hot-path array pins an explicit float32/bfloat16 dtype — x64 only
# changes the DEFAULT dtype of un-annotated literals, and the test suite
# guards the hot programs against accidental f64 promotion.
import os as _os

if _os.environ.get("MIND_TPU_DISABLE_X64", "0") != "1":
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)
