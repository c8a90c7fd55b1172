import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
B, STEPS = 1024, 1100
x0 = jnp.zeros(B, jnp.uint32)

def bench(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    ts=[]
    for _ in range(3):
        t0=time.time(); r=f(*args); jax.block_until_ready(r); ts.append(time.time()-t0)
    print(f"{name}: {min(ts)*1e3:.2f} ms ({min(ts)/STEPS*1e6:.2f} us/step)")

def trivial(x):
    def step(c, i):
        return c + jnp.uint32(1), ()
    return jax.lax.scan(step, x, jnp.arange(STEPS, dtype=jnp.int32))[0]

def trivial_unroll(x):
    def step(c, i):
        return c + jnp.uint32(1), ()
    return jax.lax.scan(step, x, jnp.arange(STEPS, dtype=jnp.int32), unroll=8)[0]

stack = jnp.zeros((B, 832), jnp.uint32)
b = jnp.arange(B)
def gather_unroll(x):
    def step(c, i):
        idx2 = (c.astype(jnp.int32) + i) % 832
        w = stack[b, idx2]
        return c + (w & jnp.uint32(1)), ()
    return jax.lax.scan(step, x, jnp.arange(STEPS, dtype=jnp.int32), unroll=8)[0]

win = jnp.zeros((B, 64), jnp.uint32)
def winops_unroll(x):
    def step(carry, i):
        win, c = carry
        idx2 = (c.astype(jnp.int32) + i) % 64
        w = jnp.sum(jnp.where(jnp.arange(64)[None,:]==idx2[:,None], win, 0), axis=1)
        win = win.at[b, (idx2+1)%64].set(w+1)
        return (win, c + (w & jnp.uint32(1))), ()
    return jax.lax.scan(step, (win, x), jnp.arange(STEPS, dtype=jnp.int32), unroll=8)[0][1]

bench("trivial scan", trivial, x0)
bench("trivial scan unroll=8", trivial_unroll, x0)
bench("row-gather scan unroll=8", gather_unroll, x0)
bench("window ops scan unroll=8", winops_unroll, x0)
