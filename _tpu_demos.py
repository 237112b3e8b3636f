import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from mind_tpu.config import SimConfig, planner_config_for_demo
from mind_tpu.sim.simulator import Simulator
for d in [2, 3, 4]:
    cfg = SimConfig.from_json(f'configs/demo_{d}.json', data_root='/root/reference/data')
    cfg.render = False; cfg.cl_agents[0].enable_timestep = 0.0
    pc = planner_config_for_demo(f'demo_{d}')
    sim = Simulator(cfg, planner_cfg=pc, max_steps=52)
    t0=time.time(); sim.init_sim()
    agent = [a for a in sim.agents if a.id=='AV'][0]
    agent.planner.export_trees = False
    init_t = time.time()-t0
    m = sim.run_sim()
    ego = sim.ego_trajectory()
    ok = np.isfinite(ego).all()
    print(f"demo_{d}: init {init_t:.0f}s plans {m['plan_calls']} "
          f"plan_time {m['plan_time_s']:.1f}s finite={ok} "
          f"v_final={ego[-1,2]:.2f}", flush=True)
