"""Profile the 1-by-1 / grouped ID-translation paths at 1M scale on TPU.

Times each container's get_single_ids_batch / decode_select on a
20k-label batch (the nq=1000 x k=20 shortlist of the P1 sweep), separating
dispatch latency from marginal cost via back-to-back repeats.

    python tools/profiling/translate_profile.py
"""

import time

import numpy as np

import jax


def main():
    import jax.numpy as jnp  # noqa: F401

    from vector_db_id_compression_tpu.store.invlists import (
        AVAILABLE_COMPRESSED_IVFS,
        InvertedLists,
    )

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(1234)
    nlist, ntotal, code_size = 1024, 1_000_000, 4
    a = rng.integers(0, nlist, size=ntotal)
    il = InvertedLists(nlist, code_size)
    order = np.argsort(a, kind="stable")
    bounds = np.searchsorted(a[order], np.arange(nlist + 1))
    for ln in range(nlist):
        members = order[bounds[ln]: bounds[ln + 1]].astype(np.uint64)
        il.ids[ln] = members
        il.codes[ln] = np.zeros(len(members) * code_size, np.uint8)

    Q = 20_000
    lengths = np.array([len(il.ids[ln]) for ln in range(nlist)])
    nonempty = np.flatnonzero(lengths > 0)  # empty lists: offs would be 0
    lns = nonempty[rng.integers(0, len(nonempty), size=Q)].astype(np.int64)
    offs = (rng.random(Q) * lengths[lns]).astype(np.int32)
    expect = np.array([il.ids[ln][off] for ln, off in zip(lns, offs)],
                      dtype=np.uint64)

    for name in ("packed-bits", "elias-fano", "roc", "wavelet-tree"):
        t0 = time.time()
        c = AVAILABLE_COMPRESSED_IVFS[name](il)
        t_build = time.time() - t0
        if getattr(c, "supports_random_access", False):
            fn = lambda: c.get_single_ids_batch(lns, offs)
        else:
            fn = lambda: c.decode_select(lns, offs)
        got = np.asarray(fn())
        np.testing.assert_array_equal(got.astype(np.uint64), expect)
        ts = []
        for _ in range(5):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        print(f"{name:14s} build {t_build:6.1f}s  translate "
              f"min {min(ts)*1e3:8.2f} ms  med {sorted(ts)[2]*1e3:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
