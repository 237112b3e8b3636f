import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
print('devices:', jax.devices(), flush=True)
from mind_tpu.config import SimConfig, planner_config_for_demo
from mind_tpu.sim.simulator import Simulator

cfg = SimConfig.from_json('configs/demo_1.json', data_root='/root/reference/data')
cfg.render = False
cfg.cl_agents[0].enable_timestep = 0.0
pc = planner_config_for_demo('demo_1')
sim = Simulator(cfg, planner_cfg=pc, max_steps=7)
t0=time.time(); sim.init_sim(); print('init_sim', time.time()-t0, flush=True)
m = sim.run_sim()  # 2 plans to warm everything
agent = [a for a in sim.agents if a.id=='AV'][0]
pl = agent.planner

amask = pl.obs_buffer.actor_mask()
amask_d = pl.obs_buffer.mask_device(amask)
types_d = pl.obs_buffer.types_device()
buf = pl.obs_buffer.buf

def timeit(name, f, n_it=5):
    out = f(); jax.block_until_ready(out); t0=time.perf_counter()
    for _ in range(n_it):
        out = f(); jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n_it*1e3:.1f} ms", flush=True)
    return out

state, meta, packed = timeit('aime_fn full', lambda: pl._aime_fn(pl.params, buf, types_d, amask_d))
packed_np = np.asarray(packed)
MN = pc.scen_tree.max_tree_nodes
parent = packed_np[0:MN].astype(np.int32); duration = packed_np[MN:2*MN].astype(np.int32)
end_flag = packed_np[2*MN:3*MN] > .5; tree_id = packed_np[3*MN:4*MN].astype(np.int32)
from mind_tpu.planner.trajectory_tree import build_cost_indices
from mind_tpu.planner.planner import MAX_TREES
trees = build_cost_indices(parent, duration, end_flag, tree_id, pc.traj_tree)[:MAX_TREES]
while len(trees) < MAX_TREES: trees.append(trees[0])
topo_b = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *[t[0] for t in trees])
cs_b = jnp.asarray(np.stack([t[1] for t in trees])); st_b = jnp.asarray(np.stack([t[2] for t in trees]))
tm = jnp.asarray(np.arange(MAX_TREES) < 2)
x0 = jnp.asarray([*pl.state, *pl.ctrl], jnp.float32)
tv = float(pl.lcl_smp.target_velocity)
warm_p, full_p = pl._cost_params()
off = pl._field_offset(np.asarray(pl.state))
warm_p = warm_p._replace(field_offset=off); full_p = full_p._replace(field_offset=off)
timeit('solve_fn full', lambda: pl._solve_fn(state.slots, meta.norm_prob, amask_d, topo_b, cs_b, st_b, tm, x0, warm_p, full_p, jnp.float32(tv)))
