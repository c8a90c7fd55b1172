import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
B, CAPP, NMAX = 256, 896, 1100

def kernel(buf_ref, p_ref, emit_ref, syms_ref):
    rows_buf = jax.lax.broadcasted_iota(jnp.int32, (CAPP, B), 0)
    rows_sym = jax.lax.broadcasted_iota(jnp.int32, (NMAX, B), 0)
    p0 = p_ref[:]                           # [1, B]
    def body(i, carry):
        ptr, x = carry                      # [1,B] each
        # per-lane variable shifts + masks
        pmask = jax.lax.shift_left(jnp.int32(1), p0) - 1
        srl = jax.lax.shift_right_logical(x, p0)
        # scalar divide
        q = jnp.int32(1 << 30) // jnp.maximum(i + 1, 1)
        # onehot gather from buf at ptr-1
        w = jnp.sum(jnp.where(rows_buf == (ptr - 1), buf_ref[:], 0), axis=0, keepdims=True)
        # onehot scatter to buf at ptr
        buf_ref[:] = jnp.where(rows_buf == ptr, x, buf_ref[:])
        # rank: count smaller among first i
        smaller = (rows_sym < i) & (syms_ref[:] < x)
        rank = jnp.sum(smaller.astype(jnp.int32), axis=0, keepdims=True)
        # store symbol at row i
        syms_ref[:] = jnp.where(rows_sym == i, x, syms_ref[:])
        emit_ref[:] = jnp.where(rows_sym == i, w + rank + q + pmask + srl, emit_ref[:])
        x2 = x + w + rank
        return ((ptr + (w & 1) - ((rank & 1)), x2))
    ptr0 = jnp.full((1, B), CAPP // 2, jnp.int32)
    x0 = p_ref[:] * 7
    jax.lax.fori_loop(0, NMAX, body, (ptr0, x0))

@jax.jit
def run(buf, p):
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((NMAX, B), jnp.int32),),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),),
        scratch_shapes=[pltpu.VMEM((NMAX, B), jnp.int32)],
    )(buf, p)

buf = jnp.asarray(np.random.randint(0, 2**31, size=(CAPP, B)).astype(np.int32))
p = jnp.asarray((np.arange(B) % 17).reshape(1, B).astype(np.int32))
(out,) = run(buf, p); jax.block_until_ready(out)
ts=[]
for _ in range(3):
    t0=time.time(); (out,) = run(buf, p); jax.block_until_ready(out); ts.append(time.time()-t0)
print(f"full-shape step loop: {min(ts)*1e3:.2f} ms ({min(ts)/NMAX*1e6:.3f} us/step)")
