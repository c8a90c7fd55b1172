import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from vector_db_id_compression_tpu.codecs import roc_device as rd
from vector_db_id_compression_tpu.codecs.roc import precision_for_max_id_safe
from vector_db_id_compression_tpu.ops.roc_pallas import roc_decode_pallas

rng = np.random.default_rng(7)
NLIST, NTOTAL = 1024, 1<<20
assignment = rng.integers(0, NLIST, size=NTOTAL)
lengths_l = np.bincount(assignment, minlength=NLIST).astype(np.int32)
n_max = int(lengths_l.max())
sorted_ids = np.zeros((NLIST, n_max), dtype=np.uint64)
prec = np.zeros(NLIST, np.int32)
for ln in range(NLIST):
    m = np.flatnonzero(assignment == ln).astype(np.uint64)
    sorted_ids[ln, :len(m)] = m
    prec[ln] = precision_for_max_id_safe(int(m.max()))
cap = rd.stack_capacity(n_max, int(prec.max()))
pool = rd.default_pool(n_max)
lengths = jnp.asarray(lengths_l); precision = jnp.asarray(prec)

t0=time.time()
states, _ = rd.roc_encode_batch(jnp.asarray(sorted_ids), lengths, precision, pool, rd.fresh_states(NLIST, cap), 2)
jax.block_until_ready(states); print("encode:", time.time()-t0)

# XLA decode ref
ref, _ = rd.roc_decode_batch(states, lengths, precision, pool, n_max, 2)
ref = np.asarray(ref)

t0=time.time()
ids, ok = roc_decode_pallas(states, lengths_l, prec, pool, n_max)
print("pallas decode first (compile):", time.time()-t0, "ok:", ok)
np.testing.assert_array_equal(ids, ref)
print("BIT-EXACT vs XLA decode")
ts=[]
for _ in range(5):
    t0=time.time()
    ids, ok = roc_decode_pallas(states, lengths_l, prec, pool, n_max)
    ts.append(time.time()-t0)
print(f"pallas decode: {min(ts)*1e3:.1f} ms -> {NTOTAL/min(ts)/1e6:.1f} Mids/s")

# isolate device time from wrapper overhead
import vector_db_id_compression_tpu.ops.roc_pallas as rp
import numpy as _np
lengths_np = lengths_l; prec_np = prec
B0 = NLIST
stack = _np.asarray(states.stack, dtype=_np.uint32); stack_len = _np.asarray(states.stack_len, _np.int32)
mt_ctr = _np.asarray(states.mt_ctr, _np.int32); head = _np.asarray(states.head, _np.uint64)
pool_np = _np.asarray(pool, _np.uint32)
B = -(-B0 // rp.LANE_BLOCK) * rp.LANE_BLOCK
cap2 = stack.shape[1]; capp = -(-(rp.POOL_ROWS + cap2 + 8) // 8) * 8
buf = _np.zeros((B, capp), _np.uint32)
draw_idx = mt_ctr[:, None] + (rp.POOL_ROWS - 1 - _np.arange(rp.POOL_ROWS))[None, :]
buf[:B0, :rp.POOL_ROWS] = pool_np[_np.minimum(draw_idx, len(pool_np)-1)]
buf[:B0, rp.POOL_ROWS:rp.POOL_ROWS+cap2] = stack
ptr0 = _np.zeros(B, _np.int32); ptr0[:B0] = rp.POOL_ROWS + stack_len
hi = _np.zeros(B, _np.int32); lo = _np.zeros(B, _np.int32)
hi[:B0] = (head >> _np.uint64(32)).astype(_np.uint32).view(_np.int32)
lo[:B0] = (head & _np.uint64(0xFFFFFFFF)).astype(_np.uint32).view(_np.int32)
lens2 = _np.zeros(B, _np.int32); lens2[:B0] = lengths_np
prec2 = _np.zeros(B, _np.int32); prec2[:B0] = prec_np
n_max_pad = -(-n_max // 8) * 8
dev_args = (jnp.asarray(buf.view(_np.int32).T.copy()), jnp.asarray(hi[None]), jnp.asarray(lo[None]),
            jnp.asarray(ptr0[None]), jnp.asarray(lens2[None]), jnp.asarray(prec2[None]))
out = rp._decode_call(dev_args[0], dev_args[1], dev_args[2], dev_args[3], n_max_pad, capp, 2, dev_args[4], dev_args[5], False)
jax.block_until_ready(out)
ts=[]
for _ in range(5):
    t0=time.time()
    out = rp._decode_call(dev_args[0], dev_args[1], dev_args[2], dev_args[3], n_max_pad, capp, 2, dev_args[4], dev_args[5], False)
    jax.block_until_ready(out)
    ts.append(time.time()-t0)
print(f"pure device decode: {min(ts)*1e3:.1f} ms -> {NTOTAL/min(ts)/1e6:.1f} Mids/s")
