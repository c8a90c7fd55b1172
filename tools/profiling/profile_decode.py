# scratch: find where decode time goes on TPU
import time, numpy as np, jax, jax.numpy as jnp
from vector_db_id_compression_tpu.codecs import roc_device as rd

rng = np.random.default_rng(7)
NLIST, NTOTAL = 1024, 1<<20
assignment = rng.integers(0, NLIST, size=NTOTAL)
lengths_l = np.bincount(assignment, minlength=NLIST).astype(np.int32)
n_max = int(lengths_l.max())
sorted_ids = np.zeros((NLIST, n_max), dtype=np.uint64)
for ln in range(NLIST):
    m = np.flatnonzero(assignment == ln).astype(np.uint64)
    sorted_ids[ln, :len(m)] = m
prec = np.full(NLIST, 20, np.int32)
cap = rd.stack_capacity(n_max, 20)
pool = rd.default_pool(n_max)
lengths = jnp.asarray(lengths_l); precision = jnp.asarray(prec)

t0=time.time()
states, order = rd.roc_encode_batch(jnp.asarray(sorted_ids), lengths, precision, pool, rd.fresh_states(NLIST, cap), 2)
jax.block_until_ready(states); print("encode total (compile+run):", time.time()-t0)
t0=time.time()
states2, _ = rd.roc_encode_batch(jnp.asarray(sorted_ids), lengths, precision, pool, rd.fresh_states(NLIST, cap), 2)
jax.block_until_ready(states2); print("encode steady:", time.time()-t0)

# decode variants: full, pops-only (rank replaced by zeros)
from functools import partial
import vector_db_id_compression_tpu.codecs.roc_device as R

@partial(jax.jit, static_argnums=(4,))
def decode_pops_only(states, lengths, precision, pool, n_max):
    B = lengths.shape[0]
    def step(st, i):
        active = i < lengths
        symbol, st = R._pop_symbol(st, pool, precision, active, 2)
        st = R._push_mod(st, pool, jnp.zeros(B, jnp.uint32), jnp.uint32(i + 1), active)
        return st, symbol
    st, out = jax.lax.scan(step, states, jnp.arange(n_max, dtype=jnp.int32))
    return out

for name, fn in [("full", lambda: rd.roc_decode_batch(states, lengths, precision, pool, n_max, 2)),
                 ("pops_only", lambda: decode_pops_only(states, lengths, precision, pool, n_max))]:
    r = fn(); jax.block_until_ready(r)
    ts=[]
    for _ in range(3):
        t0=time.time(); r = fn(); jax.block_until_ready(r); ts.append(time.time()-t0)
    print(name, f"{min(ts)*1e3:.1f} ms")
