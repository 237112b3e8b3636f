import time, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from mind_tpu.config import SimConfig
from mind_tpu.sim.simulator import Simulator
cfg = SimConfig.from_json('configs/demo_1.json', data_root='/root/reference/data')
cfg.render = True
cfg.output_dir = 'outputs/demo_1/'
sim = Simulator(cfg, max_steps=300)
sim.init_sim()
t0=time.time()
m = sim.run_sim()
print('sim done', time.time()-t0, m, flush=True)
t0=time.time()
out = sim.render_video()
print('render done', time.time()-t0, flush=True)
import os
print('outputs:', os.listdir(cfg.output_dir), flush=True)
