# sanity: pallas on axon TPU — fori_loop, onehot gather, scratch, u32 math
import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B, W, STEPS = 256, 128, 1100

def kernel(win_ref, idx_ref, out_ref):
    def body(i, carry):
        idx = carry  # [B] i32... represent as [B,1]? use 2D
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
        onehot = cols == idx
        w = jnp.sum(jnp.where(onehot, win_ref[:].astype(jnp.int32), 0), axis=1, keepdims=True)
        return (idx + (w & 1)) % W
    idx0 = idx_ref[:]
    out = jax.lax.fori_loop(0, STEPS, body, idx0.astype(jnp.int32))
    out_ref[:] = out

@jax.jit
def run(win, idx):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(win, idx)

win = jnp.asarray(np.random.randint(0, 2**31, size=(B, W)).astype(np.uint32))
idx = jnp.zeros((B, 1), jnp.int32)
r = run(win, idx); jax.block_until_ready(r)
ts=[]
for _ in range(3):
    t0=time.time(); r = run(win, idx); jax.block_until_ready(r); ts.append(time.time()-t0)
print(f"pallas {STEPS} onehot-gather steps on [{B},{W}]: {min(ts)*1e3:.2f} ms ({min(ts)/STEPS*1e6:.3f} us/step)")
