import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
print('devices:', jax.devices(), flush=True)
from mind_tpu.config import SimConfig, planner_config_for_demo
from mind_tpu.sim.simulator import Simulator
import mind_tpu.planner.planner as P

cfg = SimConfig.from_json('configs/demo_1.json', data_root='/root/reference/data')
cfg.render = False
cfg.cl_agents[0].enable_timestep = 0.0
pc = planner_config_for_demo('demo_1')
sim = Simulator(cfg, planner_cfg=pc, max_steps=52)
sim.init_sim()
agent = [a for a in sim.agents if a.id=='AV'][0]
pl = agent.planner
pl.export_trees = False

# instrument dispatch vs sync inside plan by monkeypatching np.asarray? simpler:
# wrap _aime_fn and _solve_fn with timing of dispatch only
orig_aime = pl._aime_fn
def timed_aime(*a, **k):
    t0=time.perf_counter(); r = orig_aime(*a, **k); d=time.perf_counter()-t0
    t1=time.perf_counter(); _ = np.asarray(r[2]); s=time.perf_counter()-t1
    print(f"aime dispatch {d*1e3:.0f}ms sync {s*1e3:.0f}ms", flush=True)
    return r
pl._aime_fn = timed_aime
m = sim.run_sim()
print(m, flush=True)
try:
    print('aime cache size', orig_aime._cache_size(), flush=True)
    print('solve cache size', pl._solve_fn._cache_size(), flush=True)
except Exception as e:
    print('cache size err', e, flush=True)
print(pl.metrics.dump(), flush=True)
