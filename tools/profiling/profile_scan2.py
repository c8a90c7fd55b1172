import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
B, STEPS, W = 1024, 1100, 64
b = jnp.arange(B)
def bench(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    ts=[]
    for _ in range(3):
        t0=time.time(); r=f(*args); jax.block_until_ready(r); ts.append(time.time()-t0)
    print(f"{name}: {min(ts)*1e3:.2f} ms ({min(ts)/STEPS*1e6:.2f} us/step)")

win0 = jnp.zeros((B, W), jnp.uint32)
x0 = jnp.zeros(B, jnp.uint32)

def onehot_gather_only(x):
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    def step(c, i):
        idx2 = (c.astype(jnp.int32) + i) % W
        w = jnp.sum(jnp.where(cols == idx2[:, None], win0, 0), axis=1)
        return c + (w & jnp.uint32(1)), ()
    return jax.lax.scan(step, x, jnp.arange(STEPS, dtype=jnp.int32), unroll=8)[0]

def scatter_only(x):
    def step(carry, i):
        win, c = carry
        idx2 = (c.astype(jnp.int32) + i) % W
        win = win.at[b, idx2].set(i.astype(jnp.uint32))
        return (win, c + jnp.uint32(1)), ()
    return jax.lax.scan(step, (win0, x), jnp.arange(STEPS, dtype=jnp.int32), unroll=8)[0][1]

def onehot_scatter(x):
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    def step(carry, i):
        win, c = carry
        idx2 = (c.astype(jnp.int32) + i) % W
        win = jnp.where(cols == idx2[:, None], i.astype(jnp.uint32), win)
        return (win, c + jnp.uint32(1)), ()
    return jax.lax.scan(step, (win0, x), jnp.arange(STEPS, dtype=jnp.int32), unroll=8)[0][1]

def reduction_only(x):
    def step(c, i):
        w = jnp.sum(win0 + c[:, None], axis=1)
        return c + (w & jnp.uint32(1)), ()
    return jax.lax.scan(step, x, jnp.arange(STEPS, dtype=jnp.int32), unroll=8)[0]

bench("onehot gather only", onehot_gather_only, x0)
bench("scatter .at.set", scatter_only, x0)
bench("onehot scatter (where)", onehot_scatter, x0)
bench("plain reduction", reduction_only, x0)
