import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from vector_db_id_compression_tpu import native
from vector_db_id_compression_tpu.codecs import roc_device as rd
from vector_db_id_compression_tpu.codecs.roc import precision_for_max_id_safe
import vector_db_id_compression_tpu.ops.roc_encode_pallas as rep

rng = np.random.default_rng(7)
NLIST, NTOTAL = 1024, 1 << 20
a = rng.integers(0, NLIST, size=NTOTAL)
lengths = np.bincount(a, minlength=NLIST).astype(np.int32)
n_max = int(lengths.max())
lists = [np.flatnonzero(a == ln).astype(np.uint64) for ln in range(NLIST)]
ids = np.zeros((NLIST, n_max), np.uint64)
for i, l in enumerate(lists):
    ids[i, :len(l)] = l   # already sorted (flatnonzero ascending)
prec = np.array([precision_for_max_id_safe(int(l.max())) for l in lists], np.int32)

t0 = time.time()
states, order, ok = rep.roc_encode_pallas(ids, lengths, prec)
np.asarray(states.head)
print(f"pallas encode (incl. compile): {time.time()-t0:.2f}s ok={ok}", flush=True)

# bit-exact vs native
cap = rd.stack_capacity(n_max, int(prec.max()))
heads, stacks, lens, orders, mt = native.roc_encode_lists(lists, prec, cap=cap)
h = np.asarray(states.head); sl = np.asarray(states.stack_len)
st = np.asarray(states.stack); mtc = np.asarray(states.mt_ctr)
assert np.array_equal(h, heads), "heads differ"
assert np.array_equal(sl, lens), "stack lens differ"
for i in range(NLIST):
    assert np.array_equal(st[i, :sl[i]], stacks[i, :lens[i]]), i
assert np.array_equal(mtc.astype(np.int64), mt.astype(np.int64))
print("bit-exact vs native C++: OK", flush=True)

# sustained: marginal per-encode over K pipelined calls
enc = rep.RocPallasEncoder(n_max, int(prec.max()))
B = 1024
ids_j = jnp.asarray(ids); len_j = jnp.asarray(lengths); prec_j = jnp.asarray(prec)
pool = jnp.asarray(rd.default_pool(rep.POOL_ROWS), jnp.uint32)
def timed(K):
    @jax.jit
    def f():
        acc = jnp.uint64(0)
        x = ids_j
        for _ in range(K):
            x = jax.lax.optimization_barrier(x)
            head, stack, slen, mtc, err, order = rep._encode_full(
                x, len_j, prec_j, enc.n_max, enc.capp, False, pool)
            acc = acc + head[0] + head[-1] + jnp.uint64(stack[0,0])
        return acc
    np.asarray(f())
    ts = []
    for _ in range(3):
        t0 = time.time(); np.asarray(f()); ts.append(time.time()-t0)
    return min(ts)
t1, t8 = timed(1), timed(8)
per = (t8 - t1) / 7
print(f"K=1 {t1*1e3:.1f}ms K=8 {t8*1e3:.1f}ms → sustained {per*1e3:.1f} ms "
      f"= {NTOTAL/per/1e6:.0f} Mids/s encode", flush=True)
