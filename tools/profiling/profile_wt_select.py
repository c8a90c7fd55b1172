"""Phase-level profile of the wavelet-tree select walk at 1M scale.

Round-3 verdict: wt fused-sustained 0.125 s vs ref 0.072 s at 1M Flat
nprobe=16 — PARITY.md names the L bottom-up selects as the remaining cost.
This isolates, per call on a [Q] query batch (sustained, pipelined):

  1. full wt_select with path tables (the production translate path);
  2. ONE _select_merged level x L (is the walk just L x level cost?);
  3. the two searchsorteds alone (directory search share);
  4. the window row gather + popcount/cumsum alone (memory share);
  5. the in-word select alone (bit-scan share).

Run on the real TPU: python tools/profiling/profile_wt_select.py [Q]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vector_db_id_compression_tpu.codecs import wavelet_tree as W

N, SIGMA = 1_000_000, 1024
Q = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000

rng = np.random.default_rng(0)
symbols = rng.integers(0, SIGMA, N).astype(np.uint32)
wt = W.build_wavelet_tree(symbols, SIGMA)
counts = np.bincount(symbols, minlength=SIGMA)
tables = jnp.asarray(W.wt_path_tables(counts, wt.levels))
L = wt.levels
print(f"n={N} sigma={SIGMA} L={L} Q={Q} SB={wt.sb_prefix.shape[1]}",
      flush=True)

sym = jnp.asarray(rng.integers(0, SIGMA, Q).astype(np.int64))
off = jnp.asarray([rng.integers(0, counts[s]) for s in np.asarray(sym)],
                  dtype=jnp.int64)
kq = jnp.asarray(rng.integers(0, N // 2, Q).astype(np.int64))
inv = jnp.asarray(rng.integers(0, 2, Q).astype(bool))


def sustained(fn, reps=8):
    x = fn()
    jax.block_until_ready(x)
    t0 = time.time()
    jax.block_until_ready(fn())
    t1 = time.time() - t0
    t0 = time.time()
    outs = [fn() for _ in range(reps)]
    jax.block_until_ready(outs[-1])
    tK = time.time() - t0
    return max((tK - t1) / (reps - 1), 1e-9)


# 1. full walk
full = jax.jit(lambda s, o: W.wt_select(wt, s, o, tables=tables))
t = sustained(lambda: full(sym, off))
print(f"full wt_select (tables): {t*1e3:8.3f} ms  ({t/Q*1e9:6.1f} ns/query)")

# 2. one merged select level x L
one = jax.jit(lambda k, i: W._select_merged(wt, 0, k, i))
t1l = sustained(lambda: one(kq, inv))
print(f"one _select_merged:      {t1l*1e3:8.3f} ms  x L={L} -> "
      f"{t1l*L*1e3:8.3f} ms")

# 3. searchsorted share
def ss_only(k, invq):
    p1 = wt.sb_prefix[0]
    SB = p1.shape[0]
    p0 = (jnp.arange(SB, dtype=jnp.int64) + 1) * W.SB_BITS - p1
    sb1 = jnp.searchsorted(p1, k + 1, side="left")
    sb0 = jnp.searchsorted(p0, k + 1, side="left")
    return jnp.where(invq, sb0, sb1)

t_ss = sustained(lambda: jax.jit(ss_only)(kq, inv))
print(f"2x searchsorted only:    {t_ss*1e3:8.3f} ms")

# 4. window gather + popcount/cumsum
def win_only(k):
    SB = wt.sb_prefix.shape[1]
    sb = jnp.clip(k // W.SB_BITS, 0, SB - 1)
    win = W._window(wt, 0, sb)
    return jnp.cumsum(jax.lax.population_count(win).astype(jnp.int64),
                      axis=-1)[..., -1]

t_w = sustained(lambda: jax.jit(win_only)(kq))
print(f"window gather+popcount:  {t_w*1e3:8.3f} ms")

# 5. in-word select
t_iw = sustained(lambda: jax.jit(W._select_in_word)(
    wt.words[0][jnp.clip(kq // 32, 0, wt.words.shape[1] - 1)], kq % 32))
print(f"in-word select:          {t_iw*1e3:8.3f} ms")

# oracle spot check
got = np.asarray(full(sym, off))
exp_positions = {}
for s in np.unique(np.asarray(sym))[:8]:
    exp_positions[s] = np.flatnonzero(symbols == s)
for i in range(min(Q, 200)):
    s = int(np.asarray(sym)[i])
    if s in exp_positions:
        assert got[i] == exp_positions[s][int(np.asarray(off)[i])]
print("oracle ok", flush=True)
