"""Codec scale bench: batched ROC encode+decode at reference scale and above.

The reference validates its codec at n=65k ids (test_codec.cpp:54-106) and
runs the full pipeline at 10M-1B ids (README.md:139-197). This driver runs
the *codec layer alone* at arbitrary scale — an IVF-shaped workload of
``--ntotal`` uniform ids over ``--nlist`` lists — and reports:

  - host build (native C++ batch encoder) wall time + stream bits/id,
  - on-chip decode of EVERY list: one-shot latency and the whole-batch
    throughput measured with the output reduced to a scalar on device (so
    the number is kernel time, not a multi-hundred-MB transfer;
    NOTES.md "measure transfers separately from kernels"),
  - on-chip Pallas encode throughput where the kernel envelope allows.

Prints one JSON row per invocation:

    python -m vector_db_id_compression_tpu.bench.codec_scale \
        --ntotal 100000000 --nlist 65536 >> results/codec_scale_tpu.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_workload(ntotal: int, nlist: int, seed: int):
    """Uniform IVF-shaped id lists (same generator family as bench.py and
    the reference harness): returns (ids u64[nlist, n_max] ascending-padded,
    lengths i32[nlist], prec i32[nlist])."""
    from ..codecs.roc import precision_for_max_id_safe

    rng = np.random.default_rng(seed)
    assignment = rng.integers(0, nlist, size=ntotal)
    order = np.argsort(assignment, kind="stable")  # members stay ascending
    lengths = np.bincount(assignment, minlength=nlist).astype(np.int32)
    bounds = np.zeros(nlist + 1, dtype=np.int64)
    np.cumsum(lengths, out=bounds[1:])
    n_max = int(lengths.max())
    ids = np.zeros((nlist, n_max), dtype=np.uint64)
    rows = assignment[order]
    cols = np.arange(ntotal, dtype=np.int64) - bounds[rows]
    ids[rows, cols] = order.astype(np.uint64)
    # per-list max member = last element of each (ascending) group
    prec = np.ones(nlist, dtype=np.int32)
    nz = lengths > 0
    maxs = np.zeros(nlist, dtype=np.int64)
    maxs[nz] = order[bounds[1:][nz] - 1]
    prec[nz] = [precision_for_max_id_safe(int(m)) for m in maxs[nz]]
    return ids, lengths, prec


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ntotal", type=int, default=10_000_000)
    p.add_argument("--nlist", type=int, default=8192)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--skip-device-encode", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .. import native
    from ..codecs import roc_device as rd
    from ..ops import roc_pallas as rp

    log(f"devices: {jax.devices()}")
    t0 = time.time()
    ids, lengths, prec = build_workload(args.ntotal, args.nlist, args.seed)
    n_max = int(lengths.max())
    log(f"workload: ntotal={args.ntotal} nlist={args.nlist} n_max={n_max} "
        f"prec_max={int(prec.max())} built in {time.time()-t0:.1f}s")

    # ---- host build: native C++ batch encoder (bit-exact with the device
    # encoder — tests/test_native.py) --------------------------------------
    cap = rd.stack_capacity(n_max, int(prec.max()))
    t0 = time.time()
    if native.available():
        heads, stacks, lens, _, mt = native.roc_encode_lists(
            [ids[ln, : lengths[ln]] for ln in range(args.nlist)],
            prec, cap=cap)
        states = rd.RocStates(
            head=jnp.asarray(heads), stack=jnp.asarray(stacks),
            stack_len=jnp.asarray(lens),
            mt_ctr=jnp.asarray(mt.astype(np.int32)),
            err=jnp.zeros(args.nlist, dtype=bool))
    else:
        states, _ = rd.roc_encode_batch(
            jnp.asarray(ids), jnp.asarray(lengths), jnp.asarray(prec),
            rd.default_pool(n_max), rd.fresh_states(args.nlist, cap),
            rd.n_slices_for(int(prec.max())))
        jax.block_until_ready(states)
    t_enc_host = time.time() - t0
    stream_bytes = int(np.asarray(states.size_bytes).sum())
    bits_per_id = 8.0 * stream_bytes / args.ntotal
    log(f"encode (host native={native.available()}): {t_enc_host:.1f}s "
        f"-> {args.ntotal/t_enc_host/1e6:.1f} Mids/s, {bits_per_id:.3f} bits/id")

    # ---- on-chip decode ---------------------------------------------------
    interp = jax.default_backend() == "cpu"  # Pallas interpret for CPU tests
    pool = rd.default_pool(n_max)
    # lanes sorted by length (desc): the kernel's step loop runs to each
    # grid block's max lane length, so sorting makes block bounds track the
    # length distribution instead of every block paying the global tail
    # (same construction as the container/fused prepared translates)
    sort_order = np.argsort(-lengths, kind="stable")
    states_s = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a)[sort_order]), states)
    lengths_s, prec_s = lengths[sort_order], prec[sort_order]
    dec = rp.RocPallasDecoder(states_s, lengths_s, prec_s, pool, n_max)

    # spot-check round-trip on a few lanes before timing
    probe = np.asarray([0, args.nlist // 2, args.nlist - 1])
    got, ok = dec.decode_lanes(probe, interpret=interp)
    assert ok, "pallas decoder flagged fallback"
    got = np.asarray(got)
    for i, row in enumerate(probe):
        ln = int(sort_order[row])
        n = int(lengths[ln])
        np.testing.assert_array_equal(
            np.sort(got[i, :n].astype(np.uint64)), ids[ln, :n])

    # one-shot latency incl. the id transfer to host
    ts = []
    for _ in range(args.runs):
        t0 = time.time()
        np.asarray(dec.decode(interpret=interp)[0])
        ts.append(time.time() - t0)
    one_shot_s = min(ts)
    log(f"decode one-shot (incl. {4*args.nlist*n_max/1e6:.0f} MB id pull): "
        f"{one_shot_s*1e3:.1f} ms -> {args.ntotal/one_shot_s/1e6:.1f} Mids/s")

    # whole-batch kernel throughput: output reduced to a scalar ON DEVICE so
    # the sync doesn't time a multi-hundred-MB host transfer
    # buffers as ARGUMENTS (closure constants inflate the remote compile
    # payload past the tunnel's request limit at 30M+ ids)
    @jax.jit
    def decode_reduced(buf, hi, lo, ptr0, lens, prec_row):
        out, err = rp._run_decode(
            buf, hi, lo, ptr0, lens, prec_row,
            dec._n_max_pad, dec._capp, interp, dec._pool_ok)
        return out[0, 0] + out[-1, -1] + jnp.sum(out[:: max(dec.B0 // 64, 1), 0])

    dargs = (dec._buf, dec._hi, dec._lo, dec._ptr0, dec._lens,
             dec._prec_row)
    np.asarray(decode_reduced(*dargs))  # compile + warm
    ts = []
    for _ in range(args.runs):
        t0 = time.time()
        np.asarray(decode_reduced(*dargs))
        ts.append(time.time() - t0)
    dec_s = min(ts)
    dec_rate = args.ntotal / dec_s
    log(f"decode on-chip (scalar-reduced sync): {dec_s*1e3:.1f} ms "
        f"-> {dec_rate/1e6:.1f} Mids/s")

    # ---- on-chip encode (optional; envelope-gated) ------------------------
    enc_rate = None
    if not args.skip_device_encode:
        try:
            from ..ops import roc_encode_pallas as rep

            enc = rep.RocPallasEncoder(n_max, int(prec.max()))
            ids_j = jnp.asarray(ids[sort_order])
            len_j, prec_j = jnp.asarray(lengths_s), jnp.asarray(prec_s)
            enc_pool = jnp.asarray(rd.default_pool(rep.POOL_ROWS), jnp.uint32)

            # arrays ride as ARGUMENTS: closed-over device arrays are baked
            # into the program as constants, and at 30M+ ids the remote
            # compile payload blows the tunnel's request-size limit (413)
            @jax.jit
            def encode_reduced(ids_a, len_a, prec_a):
                head, stack, slen, mtc, err, order = rep._encode_full(
                    ids_a, len_a, prec_a, enc.n_max, enc.capp, interp,
                    enc_pool)
                return head[0] + head[-1] + jnp.sum(slen)

            np.asarray(encode_reduced(ids_j, len_j, prec_j))
            ts = []
            for _ in range(args.runs):
                t0 = time.time()
                np.asarray(encode_reduced(ids_j, len_j, prec_j))
                ts.append(time.time() - t0)
            enc_rate = args.ntotal / min(ts)
            log(f"encode on-chip: {min(ts)*1e3:.1f} ms "
                f"-> {enc_rate/1e6:.1f} Mids/s")
        except Exception as e:  # informational — decode is the metric
            log(f"device encode skipped: {e}")

    print(json.dumps({
        "ntotal": args.ntotal, "nlist": args.nlist, "n_max": n_max,
        "bits_per_id": round(bits_per_id, 4),
        "host_encode_s": round(t_enc_host, 3),
        "decode_oneshot_mids_s": round(args.ntotal / one_shot_s / 1e6, 2),
        "decode_mids_s": round(dec_rate / 1e6, 2),
        "encode_mids_s": (round(enc_rate / 1e6, 2) if enc_rate else None),
    }), flush=True)


if __name__ == "__main__":
    main()
