import time, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from mind_tpu.config import SimConfig
from mind_tpu.sim.simulator import Simulator
cfg = SimConfig.from_json('configs/demo_1.json', data_root='/root/reference/data')
cfg.render = True
cfg.output_dir = 'outputs/demo_1_trained/'
sim = Simulator(cfg, max_steps=350)
sim.init_sim()
av = [a for a in sim.agents if a.id=='AV'][0]
print('ckpt:', av.planner.cfg.ckpt_path, flush=True)
t0=time.time()
m = sim.run_sim()
print('sim done', time.time()-t0, m, flush=True)
import numpy as np
ego = sim.ego_trajectory()
print('ego v over time:', np.round(ego[::50, 2], 2), flush=True)
t0=time.time()
sim.render_video()
print('render done', time.time()-t0, flush=True)
