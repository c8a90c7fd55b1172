import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
STEPS = 1100
def bench(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    ts=[]
    for _ in range(3):
        t0=time.time(); r=f(*args); jax.block_until_ready(r); ts.append(time.time()-t0)
    print(f"{name}: {min(ts)*1e3:.2f} ms ({min(ts)/STEPS*1e6:.2f} us/step)")

def make_reduce(B, W, dtype):
    arr = jnp.zeros((B, W), dtype)
    def fn(x):
        def step(c, i):
            w = jnp.sum(arr + c[:, None], axis=1)
            return c + (w.astype(jnp.uint32) & jnp.uint32(1)), ()
        return jax.lax.scan(step, x, jnp.arange(STEPS, dtype=jnp.int32), unroll=8)[0]
    return fn, jnp.zeros(B, jnp.uint32)

def make_elemwise(B, W, dtype):
    arr = jnp.zeros((B, W), dtype)
    def fn(x):
        def step(c, i):
            w = (arr * 2 + 1)[:, 0]
            return c + (w.astype(jnp.uint32) & jnp.uint32(1)), ()
        return jax.lax.scan(step, x, jnp.arange(STEPS, dtype=jnp.int32), unroll=8)[0]
    return fn, jnp.zeros(B, jnp.uint32)

for B, W, dt in [(1024, 8, jnp.uint32), (1024, 64, jnp.uint32), (1024, 128, jnp.uint32),
                 (1024, 64, jnp.float32), (128, 1024, jnp.uint32), (8, 1024, jnp.uint32)]:
    fn, x0 = make_reduce(B, W, dt)
    bench(f"reduce [{B},{W}] {dt.__name__}", fn, x0)
fn, x0 = make_elemwise(1024, 64, jnp.uint32)
bench("elemwise [1024,64] u32", fn, x0)

# carried 2D array elementwise (no reduction)
def carried(x):
    arr0 = jnp.zeros((1024, 64), jnp.uint32)
    def step(carry, i):
        arr, c = carry
        arr = arr + jnp.uint32(1)
        return (arr, c), ()
    return jax.lax.scan(step, (arr0, x), jnp.arange(STEPS, dtype=jnp.int32), unroll=8)[0][1]
bench("carried [1024,64] +1", carried, jnp.zeros(1024, jnp.uint32))
