import time, numpy as np, jax, jax.numpy as jnp
from vector_db_id_compression_tpu.codecs import roc_device as rd

def compile_time(B, n_max, prec=20, n_slices=2):
    cap = rd.stack_capacity(n_max, prec)
    pool = rd.default_pool(n_max)
    ids = jnp.zeros((B, n_max), jnp.uint64)
    lens = jnp.full((B,), n_max, jnp.int32)
    pr = jnp.full((B,), prec, jnp.int32)
    st = rd.fresh_states(B, cap)
    t0=time.time()
    enc = jax.jit(rd.roc_encode_batch, static_argnums=(5,)).lower(ids, lens, pr, pool, st, n_slices).compile()
    t_enc = time.time()-t0
    t0=time.time()
    dec = jax.jit(rd.roc_decode_batch, static_argnums=(4,5)).lower(st, lens, pr, pool, n_max, n_slices).compile()
    t_dec = time.time()-t0
    print(f"B={B} n_max={n_max} cap={cap}: encode compile {t_enc:.1f}s decode compile {t_dec:.1f}s")

compile_time(1024, 64)
compile_time(1024, 256)
compile_time(64, 1100)
