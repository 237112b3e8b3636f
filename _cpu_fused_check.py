import os
os.environ['JAX_PLATFORMS']='cpu'
import jax; jax.config.update('jax_platforms','cpu')
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from mind_tpu.config import SimConfig, planner_config_for_demo
from mind_tpu.sim.simulator import Simulator

def run(export):
    cfg = SimConfig.from_json('configs/demo_1.json', data_root='/root/reference/data')
    cfg.render = False; cfg.cl_agents[0].enable_timestep = 0.0
    pc = planner_config_for_demo('demo_1')
    pc.net.n_scene_layer = 2
    sim = Simulator(cfg, planner_cfg=pc, max_steps=17)
    sim.init_sim()
    a = [x for x in sim.agents if x.id=='AV'][0]
    a.planner.export_trees = export
    sim.run_sim()
    return sim.ego_trajectory()

t_exp = run(True)
t_fused = run(False)
print('match:', np.allclose(t_exp, t_fused, atol=1e-5), flush=True)
print(t_exp[-1], t_fused[-1], flush=True)
