import jax, os, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from mind_tpu.config import SimConfig
from mind_tpu.sim.simulator import Simulator
from mind_tpu.sim.state_io import save_sim_state, load_sim_state

cfg = SimConfig.from_json('configs/demo_1.json', data_root='/root/reference/data')
cfg.render = True
cfg.output_dir = '/tmp/verify_out/'
cfg.cl_agents[0].enable_timestep = 0.0
sim = Simulator(cfg, max_steps=12)
sim.init_sim()
m = sim.run_sim()
print('SIM:', m, flush=True)
# checkpoint/resume round trip through the public API
p = save_sim_state(sim, '/tmp/verify_state.npz')
print('SAVED:', p, os.path.getsize(p), 'bytes', flush=True)
sim2 = Simulator(cfg, max_steps=5)
sim2.init_sim()
load_sim_state(sim2, p)
av = [a for a in sim2.agents if a.id == 'AV'][0]
av0 = [a for a in sim.agents if a.id == 'AV'][0]
print('RESUME state match:', np.allclose(av.state, av0.state), av.state, flush=True)
# render path (the cleaned module)
out = sim.render_video()
print('RENDER ->', out, sorted(os.listdir(out))[:3], '...', len(os.listdir(out)), 'frames', flush=True)
