from mind_tpu.utils.metrics import PhaseTimer, Metrics, profile_trace
