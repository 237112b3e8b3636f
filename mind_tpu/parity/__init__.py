"""End-to-end parity harness: a host-numpy, float64, reference-control-flow
re-implementation of the full MIND plan cycle (process_data -> branch_aime ->
warm+full tree-iLQR -> selection), run closed-loop against the TPU path to
certify the 1e-3 trajectory-parity north star (BASELINE.json).

The reference itself (torch+theano+av2) cannot run in this environment and
its checkpoints are stripped, so parity is established the way the survey
prescribes (SURVEY.md §7 hard parts): shared weights, shared scenario data,
and an independent host mirror that follows the reference's control flow
(reference planner.py:104-145, scenario_tree.py:38-108, solver.py:80-240)
while both sides run the same prediction network function.
"""

from mind_tpu.parity.host_planner import HostRefPlanner
