import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
x = jnp.ones((1024, 1024))
jax.block_until_ready(x @ x)
for size, shape in [("4KB",(32,32)), ("400KB",(320,320)), ("4MB",(1024,1024))]:
    a = jnp.ones(shape); jax.block_until_ready(a)
    t0=time.perf_counter(); b = np.asarray(a); dt=time.perf_counter()-t0
    print(f"D2H {size}: {dt*1e3:.1f}ms ({a.size*4/dt/1e6:.1f} MB/s)", flush=True)
    h = np.ones(shape, np.float32)
    t0=time.perf_counter(); d = jax.block_until_ready(jnp.asarray(h)); dt=time.perf_counter()-t0
    print(f"H2D {size}: {dt*1e3:.1f}ms", flush=True)
f = jax.jit(lambda x: x + 1)
a = jnp.ones((8,128)); jax.block_until_ready(f(a))
t0=time.perf_counter()
for _ in range(50): jax.block_until_ready(f(a))
print(f"sync roundtrip: {(time.perf_counter()-t0)/50*1e3:.2f}ms", flush=True)
big = jnp.zeros((64, 48, 110, 2)); src = jnp.ones((3, 48, 110, 2)); idx = jnp.asarray([1,5,7])
jax.block_until_ready(big.at[idx].set(src))
t0=time.perf_counter()
for _ in range(20): big = big.at[idx].set(src)
jax.block_until_ready(big)
print(f"eager scatter x20: {(time.perf_counter()-t0)*1e3:.1f}ms", flush=True)
