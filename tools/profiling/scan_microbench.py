"""Microbenchmark the IVF scan building blocks on the real TPU.

Each measured op is wrapped in a jit that REDUCES its outputs to one
scalar, so the sync (np.asarray, NOTES.md methodology) transfers 4
bytes instead of the full result — the first draft synced a 1.15 GB
gather output through the ~15 MB/s axon tunnel and read 152 s for an
on-chip op. The scalar depends on every output element, so the timing
still covers all compute.

Measures:
  1. row gather vecs[lane]           — the pair path's payload fetch
  2. pair einsum pd,pdn->pn          — the pair path's distance kernel
  3. full _scan_flat_bucket          — gather + einsum + masked top-k
  4. dense einsum qd,bdn->qbn + topk — the dense/fused path's kernel
  5. lax.top_k over [nq, M] keys     — isolate the sort cost

Purpose: recalibrate the dense-vs-pair cost model in search/ivf.py
(search_positional) with measured constants; the 1M P1 sweep shows the
pair path at nprobe>=4 costing ~5.5s where the fused dense program does
the same work in 0.75s sustained.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from vector_db_id_compression_tpu.search.ivf import (
    _scan_flat_bucket, _scan_flat_allpairs)


def scalarize(tree):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in
               jax.tree_util.tree_leaves(tree))


def timeit(fn, *args, reps=5):
    jfn = jax.jit(lambda *a: scalarize(fn(*a)))
    np.asarray(jfn(*args))  # compile+warm
    t0 = time.time()
    outs = [jfn(*args) for _ in range(reps)]
    np.asarray(outs[-1])
    dt = (time.time() - t0) / reps
    del outs
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    B, d, n_pad = 1024, 32, 1100
    nq, k = 1000, 20
    rng = np.random.default_rng(0)
    vecs = jnp.asarray(rng.standard_normal((B, d, n_pad), dtype=np.float32))
    xq = jnp.asarray(rng.standard_normal((nq, d), dtype=np.float32))
    lengths = jnp.full((B,), n_pad - 7, jnp.int32)

    for P in (1024, 8192, 65536):
        lane = jnp.asarray(rng.integers(0, B, P).astype(np.int32))
        q_idx = jnp.asarray(rng.integers(0, nq, P).astype(np.int32))
        gb = P * d * n_pad * 4 / 1e9

        t = timeit(lambda v, l: v[l], vecs, lane)
        print(f"[P={P:6d}] gather rows of [d,n_pad]: {t*1e3:9.2f} ms "
              f"({gb/t:6.1f} GB/s)", flush=True)
        t = timeit(lambda v, l: v[l], vecs, jnp.sort(lane))
        print(f"[P={P:6d}] gather, sorted lanes:     {t*1e3:9.2f} ms "
              f"({gb/t:6.1f} GB/s)", flush=True)

        Y = jax.jit(lambda v, l: v[l])(vecs, lane)
        X = xq[q_idx]
        t = timeit(lambda X, Y: jnp.einsum(
            "pd,pdn->pn", X, Y, preferred_element_type=jnp.float32), X, Y)
        print(f"[P={P:6d}] pair einsum pd,pdn->pn:   {t*1e3:9.2f} ms",
              flush=True)
        del X, Y

        t = timeit(lambda *a: _scan_flat_bucket(*a, k),
                   xq, vecs, lengths, (q_idx, lane))
        print(f"[P={P:6d}] _scan_flat_bucket:        {t*1e3:9.2f} ms",
              flush=True)

    t = timeit(lambda *a: _scan_flat_allpairs(*a, k, 0),
               xq, vecs, lengths)
    keys = nq * B * n_pad
    print(f"_scan_flat_allpairs nq={nq}:  {t*1e3:9.2f} ms  "
          f"({keys/t/1e9:5.2f} Gkeys/s incl matmul)", flush=True)

    for M in (n_pad, 16 * n_pad, 128 * n_pad):
        D = jnp.asarray(rng.standard_normal((nq, M), dtype=np.float32))
        t = timeit(lambda D: jax.lax.top_k(D, k), D)
        print(f"top_k [nq={nq}, M={M:8d}], k={k}: {t*1e3:9.2f} ms  "
              f"({nq*M/t/1e9:5.2f} Gkeys/s)", flush=True)


if __name__ == "__main__":
    main()
