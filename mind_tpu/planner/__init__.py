from mind_tpu.planner.ilqr import TreeTopology, ILQRConfig, ilqr_solve
