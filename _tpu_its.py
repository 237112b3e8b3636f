import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from mind_tpu.config import SimConfig, planner_config_for_demo
from mind_tpu.sim.simulator import Simulator
cfg = SimConfig.from_json('configs/demo_1.json', data_root='/root/reference/data')
cfg.render = False; cfg.cl_agents[0].enable_timestep = 0.0
pc = planner_config_for_demo('demo_1')
sim = Simulator(cfg, planner_cfg=pc, max_steps=32)
sim.init_sim()
agent = [a for a in sim.agents if a.id=='AV'][0]
pl = agent.planner; pl.export_trees = False
its = []
orig = pl._solve_fn
def wrapped(*a):
    xs,us,packed = orig(*a); its.append(float(np.asarray(packed)[3])); return xs,us,packed
pl._solve_fn = wrapped
sim.run_sim()
print('total its (warm+full) per plan:', its, flush=True)
