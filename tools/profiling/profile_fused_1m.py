"""Phase-level profile of the FUSED (ShardedIVF) search at 1M IVF1024,PQ16.

Round-2 verdict: roc dt_fused_sustained 1.14-1.22 s vs ref 0.59-0.63 s while
the Pallas all-lane decode is ~5 ms by ablation. This script isolates where
the extra ~0.5 s/1k-queries goes:

  1. full fused program sustained, ref vs roc;
  2. the same program with the translate stage ablated
     (VDBIDC_ABLATE_TRANSLATE=1 -> positional labels out);
  3. the standalone all-lane Pallas decode (_run_decode) sustained;
  4. reports which roc mode engaged (roc_pl vs roc XLA chain) + kernel shape.

Run on the real TPU. Caches the built index at /tmp/profile_1m_pq16.npz.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.environ.get("VDBIDC_COMPILE_CACHE",
                                     "/root/repo/.jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from vector_db_id_compression_tpu.bench.datasets import SyntheticDataset
from vector_db_id_compression_tpu.bench.bench_invlists import build_index
from vector_db_id_compression_tpu.search import ivf as M
from vector_db_id_compression_tpu.store.invlists import RocInvertedLists
from vector_db_id_compression_tpu.parallel.search import ShardedIVF

CACHE = "/tmp/profile_1m_pq16.npz"
NQ, K = 1000, 20


def get_index():
    ds = SyntheticDataset(d=32, nb=1_000_000, nq=NQ, nt=100_000)
    if os.path.exists(CACHE):
        t0 = time.time()
        index = M.load_index(CACHE)
        print(f"loaded cached index in {time.time()-t0:.1f}s", flush=True)
    else:
        t0 = time.time()
        index = build_index(ds, "IVF1024,PQ16")
        print(f"built index in {time.time()-t0:.1f}s", flush=True)
        M.save_index(CACHE, index)
    return ds, index


def sustained(sh, xq, k, nprobe, pipeline=8):
    """(one_shot_s, sustained_s) — same methodology as bench_invlists."""
    sh.search(xq, k, nprobe)  # compile + warm
    one = float("inf")
    for _ in range(3):
        t0 = time.time()
        sh.search(xq, k, nprobe)
        one = min(one, time.time() - t0)
    nq_c, k_, np_ = next(kk for kk in sh._compiled
                         if kk[1] == k and kk[2] == nprobe)
    jitted = sh._compiled[(nq_c, k_, np_)]
    xq_dev = jnp.asarray(np.asarray(xq[:nq_c], np.float32))
    if len(xq_dev) < nq_c:
        xq_dev = jnp.pad(xq_dev, ((0, nq_c - len(xq_dev)), (0, 0)))
    t0 = time.time()
    _, I1 = jitted(xq_dev)
    np.asarray(I1)
    t1 = time.time() - t0
    t0 = time.time()
    outs = [jitted(xq_dev) for _ in range(pipeline)]
    np.asarray(outs[-1][1])
    tK = time.time() - t0
    n_chunks = -(-len(xq) // nq_c)
    sus = max((tK - t1) / (pipeline - 1), 1e-9) * n_chunks
    return one, sus


def main():
    ds, index = get_index()
    xq = ds.get_queries()
    mesh = Mesh(np.array(jax.devices()[:1]), axis_names=("lists",))

    t0 = time.time()
    roc = RocInvertedLists(index.invlists)
    print(f"roc container built in {time.time()-t0:.1f}s", flush=True)

    print("\n--- ref (raw ids) fused ---", flush=True)
    sh_ref = ShardedIVF(mesh, index, index.invlists)
    print(f"mode={sh_ref._mode} n_pad={sh_ref.n_pad} "
          f"scan_float={sh_ref._scan_is_float}", flush=True)
    for nprobe in (4, 16):
        one, sus = sustained(sh_ref, xq, K, nprobe)
        print(f"  nprobe={nprobe:3d} one={one*1e3:8.1f}ms "
              f"sustained={sus*1e3:8.1f}ms", flush=True)

    print("\n--- roc fused ---", flush=True)
    index.replace_invlists(roc)
    sh_roc = ShardedIVF(mesh, index, roc)
    pallas = getattr(sh_roc, "_pallas", None)
    print(f"mode={sh_roc._mode} pallas={'ENGAGED ' + str(pallas[1]) if pallas else 'OFF (XLA chain)'}",
          flush=True)
    D_ref, I_ref = sh_ref.search(xq, K, 16)
    D_roc, I_roc = sh_roc.search(xq, K, 16)
    np.testing.assert_array_equal(I_roc, I_ref)
    print("  roc fused I == ref fused I  (translate correct)", flush=True)
    for nprobe in (4, 16):
        one, sus = sustained(sh_roc, xq, K, nprobe)
        print(f"  nprobe={nprobe:3d} one={one*1e3:8.1f}ms "
              f"sustained={sus*1e3:8.1f}ms", flush=True)

    print("\n--- roc fused, translate ABLATED ---", flush=True)
    os.environ["VDBIDC_ABLATE_TRANSLATE"] = "1"
    sh_abl = ShardedIVF(mesh, index, roc)
    for nprobe in (4, 16):
        one, sus = sustained(sh_abl, xq, K, nprobe)
        print(f"  nprobe={nprobe:3d} one={one*1e3:8.1f}ms "
              f"sustained={sus*1e3:8.1f}ms", flush=True)
    del os.environ["VDBIDC_ABLATE_TRANSLATE"]

    if pallas is not None:
        print("\n--- standalone all-lane Pallas decode ---", flush=True)
        from vector_db_id_compression_tpu.ops.roc_pallas import _run_decode
        arrs, (n_max_pad, capp) = pallas
        buf, hi, lo, ptr0, lens, prec = arrs[:6]
        ids, _ = _run_decode(buf, hi, lo, ptr0, lens, prec, n_max_pad, capp,
                             False, jnp.asarray(True), True)
        np.asarray(ids)  # warm
        t0 = time.time()
        ids, _ = _run_decode(buf, hi, lo, ptr0, lens, prec, n_max_pad, capp,
                             False, jnp.asarray(True), True)
        np.asarray(ids)
        t1 = time.time() - t0
        t0 = time.time()
        outs = [_run_decode(buf, hi, lo, ptr0, lens, prec, n_max_pad, capp,
                            False, jnp.asarray(True), True)[0] for _ in range(8)]
        np.asarray(outs[-1])
        tK = time.time() - t0
        print(f"  n_max_pad={n_max_pad} capp={capp} "
              f"one={t1*1e3:.1f}ms sustained={(tK-t1)/7*1e3:.1f}ms",
              flush=True)


if __name__ == "__main__":
    main()
