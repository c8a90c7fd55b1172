import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B, CAP, STEPS = 1024, 832, 1100
rng = np.random.default_rng(0)
stack = jnp.asarray(rng.integers(0, 2**32, size=(B, CAP), dtype=np.uint64).astype(np.uint32))
stackT = stack.T
idx0 = jnp.asarray(rng.integers(0, CAP, size=B, dtype=np.int64).astype(np.int32))

def bench(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args); jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0=time.time(); r = f(*args); jax.block_until_ready(r); ts.append(time.time()-t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms total, {min(ts)/STEPS*1e6:.1f} us/step")

b = jnp.arange(B)

def loop_gather_rows(stack, idx):
    def step(carry, i):
        idx2 = (carry + i) % CAP
        w = stack[b, idx2]
        return idx2 + (w.astype(jnp.int32) & 1), w.sum()
    return jax.lax.scan(step, idx, jnp.arange(STEPS, dtype=jnp.int32))[1]

def loop_gather_take(stack, idx):
    def step(carry, i):
        idx2 = (carry + i) % CAP
        w = jnp.take_along_axis(stack, idx2[:, None], axis=1)[:, 0]
        return idx2 + (w.astype(jnp.int32) & 1), w.sum()
    return jax.lax.scan(step, idx, jnp.arange(STEPS, dtype=jnp.int32))[1]

def loop_gather_onehot(stack, idx):
    cols = jnp.arange(CAP, dtype=jnp.int32)
    def step(carry, i):
        idx2 = (carry + i) % CAP
        w = jnp.sum(jnp.where(cols[None, :] == idx2[:, None], stack, 0), axis=1)
        return idx2 + (w.astype(jnp.int32) & 1), w.sum()
    return jax.lax.scan(step, idx, jnp.arange(STEPS, dtype=jnp.int32))[1]

def loop_gather_T(stackT, idx):
    def step(carry, i):
        idx2 = (carry + i) % CAP
        w = stackT[idx2, b]
        return idx2 + (w.astype(jnp.int32) & 1), w.sum()
    return jax.lax.scan(step, idx, jnp.arange(STEPS, dtype=jnp.int32))[1]

def loop_scatter_rows(stack, idx):
    def step(carry, i):
        st, idx2 = carry
        idx2 = (idx2 + i) % CAP
        st = st.at[b, idx2].set(i.astype(jnp.uint32))
        return (st, idx2), ()
    return jax.lax.scan(step, (stack, idx), jnp.arange(STEPS, dtype=jnp.int32))[0][0]

def loop_window(stack, idx):
    W = 64
    win = stack[:, :W]
    def step(carry, i):
        win, idx2 = carry
        idx2 = (idx2 + i) % W
        w = jnp.sum(jnp.where(jnp.arange(W)[None,:] == idx2[:,None], win, 0), axis=1)
        win = win.at[b, (idx2+1) % W].set(w + 1)
        return (win, idx2), w.sum()
    return jax.lax.scan(step, (win, idx0 % W), jnp.arange(STEPS, dtype=jnp.int32))[1]

bench("row gather [B,CAP]", loop_gather_rows, stack, idx0)
bench("take_along_axis", loop_gather_take, stack, idx0)
bench("onehot sum", loop_gather_onehot, stack, idx0)
bench("transposed [CAP,B]", loop_gather_T, stackT, idx0)
bench("row scatter", loop_scatter_rows, stack, idx0)
bench("window W=64 gather+scatter", loop_window, stack, idx0)
