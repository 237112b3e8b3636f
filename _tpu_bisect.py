import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
print('devices:', jax.devices(), flush=True)
from mind_tpu.config import PlannerConfig, planner_config_for_demo
from mind_tpu.models import init_scene_pred
from mind_tpu.planner.scene_prep import OBS_LEN, LaneGraphStatic, TargetLaneStatic, prepare_node_inputs
from mind_tpu.planner.scenario_tree import _decode_node

cfg = planner_config_for_demo('demo_1')
A, L, B, M = cfg.max_actors, cfg.max_lanes, cfg.scen_tree.max_branch_nodes, 6
_, params, batched_apply = init_scene_pred(cfg.net, A, L, seed=0)
rng = np.random.default_rng(0)
lane = LaneGraphStatic(jnp.zeros((L,10,16)), jnp.asarray(rng.normal(0,30,(L,2)).astype(np.float32)),
                       jnp.tile(jnp.asarray([[1.,0.]]),(L,1)), jnp.ones(L,bool))
P=512; n=300
pts=np.full((P,2),1e6,np.float32); pts[:n,0]=np.arange(n)-50.
tgt = TargetLaneStatic(jnp.asarray(pts), jnp.zeros((P,12)), jnp.asarray(np.arange(P)<n), jnp.int32(n))
wp = jnp.asarray(rng.normal(0,5,(B,A,OBS_LEN,2)).astype(np.float32))
wa = jnp.asarray(rng.normal(0,.1,(B,A,OBS_LEN)).astype(np.float32))
wv = jnp.asarray(rng.normal(0,1,(B,A,OBS_LEN,2)).astype(np.float32))
wc = jnp.full((B,A,OBS_LEN), 1e-5, jnp.float32)
wo = jnp.ones((B,A,OBS_LEN))
types = jnp.zeros((A,7)).at[:,0].set(1); amask = jnp.ones(A,bool)
probs = jnp.ones(B); cur_ts = jnp.zeros(B, jnp.int32)

prep_fn = jax.jit(lambda wp,wa,wv,wo: jax.vmap(lambda p,a,v,o: prepare_node_inputs(p,a,v,o,types,amask,lane,tgt,5.0))(wp,wa,wv,wo))
def timeit(name, f, *args, n_it=5):
    out = jax.block_until_ready(f(*args)); t0=time.perf_counter()
    for _ in range(n_it): out = jax.block_until_ready(f(*args))
    print(f"{name}: {(time.perf_counter()-t0)/n_it*1e3:.1f} ms", flush=True)
    return out
prep = timeit('prep(B=8)', prep_fn, wp,wa,wv,wo)
fwd = jax.jit(lambda params, prep: batched_apply(params, prep.actors, prep.actor_mask, prep.lanes, prep.lane_mask, prep.rpe, prep.tgt_nodes, prep.tgt_rpe))
out = timeit('network(B=8)', fwd, params, prep)
cls, reg, vel = out
dec = jax.jit(lambda cls,reg,vel,prep,wp,wa,wv,wc,probs,cur_ts: jax.vmap(
    lambda c,r,v,inp,p1,a1,v1,c1,pb,ct: _decode_node(c,r,v,inp,p1,a1,v1,c1,pb,ct,amask,tgt,cfg.scen_tree)
)(cls,reg,vel,prep,wp,wa,wv,wc,probs,cur_ts))
timeit('decode(B=8)', dec, cls,reg,vel,prep,wp,wa,wv,wc,probs,cur_ts)
