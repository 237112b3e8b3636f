import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
print('devices:', jax.devices(), flush=True)

# 1. basic masked any with where=
f = jax.jit(lambda x, m: jnp.any(x > 0.5, axis=0, where=m))
r = f(jnp.ones((4, 8)), jnp.ones((4, 1), bool))
print('any-where ok', np.asarray(r)[:2], flush=True)

# 2. prepare_node_inputs on TPU
from mind_tpu.planner.scene_prep import prepare_node_inputs, LaneGraphStatic, TargetLaneStatic, OBS_LEN
A, L = 8, 16
lane = LaneGraphStatic(jnp.zeros((L,10,16)), jnp.zeros((L,2)), jnp.tile(jnp.asarray([[1.,0.]]),(L,1)), jnp.ones(L,bool))
n=64
pts=np.full((128,2),1e6,np.float32); pts[:n,0]=np.arange(n); 
tgt = TargetLaneStatic(jnp.asarray(pts), jnp.zeros((128,12)), jnp.asarray(np.arange(128)<n), jnp.int32(n))
rng=np.random.default_rng(0)
pos=jnp.asarray(rng.normal(0,5,(A,OBS_LEN,2)).astype(np.float32))
ang=jnp.asarray(rng.normal(0,.1,(A,OBS_LEN)).astype(np.float32))
vel=jnp.asarray(rng.normal(0,1,(A,OBS_LEN,2)).astype(np.float32))
obs=jnp.ones((A,OBS_LEN)); types=jnp.zeros((A,7)).at[:,0].set(1); mask=jnp.ones(A,bool)
g = jax.jit(lambda *xs: prepare_node_inputs(*xs, lane, tgt, 5.0))
t0=time.time()
out = g(pos,ang,vel,obs,types,mask)
jax.block_until_ready(out)
print('prep ok', time.time()-t0, out.actors.shape, flush=True)
t0=time.time()
out = jax.block_until_ready(g(pos,ang,vel,obs,types,mask))
print('prep warm', time.time()-t0, flush=True)

# 3. small network forward on TPU
from mind_tpu.config import NetConfig
from mind_tpu.models import init_scene_pred
cfg = NetConfig(n_scene_layer=2)
t0=time.time()
model, params, batched_apply = init_scene_pred(cfg, A, L, seed=0)
print('init', time.time()-t0, flush=True)
N=A+L; To=48
inp=(jnp.zeros((2,A,To,14)), jnp.ones((2,A),bool), jnp.zeros((2,L,10,16)), jnp.ones((2,L),bool),
     jnp.zeros((2,N,N,5)), jnp.zeros((2,10,16)), jnp.zeros((2,20)))
fwd = jax.jit(batched_apply)
t0=time.time(); o=jax.block_until_ready(fwd(params,*inp)); print('fwd compile+run', time.time()-t0, flush=True)
t0=time.time(); o=jax.block_until_ready(fwd(params,*inp)); print('fwd warm', time.time()-t0, flush=True)
