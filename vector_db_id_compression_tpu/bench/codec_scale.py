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

Long-list routing (``--interleave auto``, the default): the decode kernel's
per-step rank pass is O(i) in the list position, so per-id cost grows
linearly with list length — the wrong direction for 1B ids in 65k lists.
Lists longer than 1.5x ``--chunk-target`` are split into S contiguous
sorted-value chunks via the interleaved-ROC chunk plan
(codecs/roc_interleaved.py: rebasing each chunk to its minimum recovers
~log2 S bits/symbol, cancelling the multiset-splitting loss to first
order), turning one n-step quadratic chain into S independent
(n/S)-length lanes that decode in lockstep. ``--interleave off``
reproduces the strict single-stream reference format.

Very large batches decode in ``--lane-chunk`` lane groups (each group is
one prepared Pallas decoder; groups are length-sorted so every group
compiles a tight n_max) — this bounds device memory at 1B-id scale.

Prints one JSON row per invocation:

    python -m vector_db_id_compression_tpu.bench.codec_scale \
        --ntotal 100000000 --nlist 65536 >> results/codec_scale_tpu.jsonl
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
    del assignment
    bounds = np.zeros(nlist + 1, dtype=np.int64)
    np.cumsum(lengths, out=bounds[1:])
    n_max = int(lengths.max())
    ids = np.zeros((nlist, n_max), dtype=np.uint64)
    rows = np.repeat(np.arange(nlist, dtype=np.int64), lengths)
    cols = np.arange(ntotal, dtype=np.int64) - bounds[rows]
    ids[rows, cols] = order.astype(np.uint64)
    # per-list max member = last element of each (ascending) group
    prec = np.ones(nlist, dtype=np.int32)
    nz = lengths > 0
    maxs = np.zeros(nlist, dtype=np.int64)
    maxs[nz] = order[bounds[1:][nz] - 1]
    prec[nz] = [precision_for_max_id_safe(int(m)) for m in maxs[nz]]
    return ids, lengths, prec


def build_entries(ids, lengths, prec, mode: str, chunk_target: int):
    """Expand lists into codec lanes ("entries"). ``mode`` 'off': one entry
    per list, reference single-stream format. 'auto': lists longer than
    1.5x chunk_target are cut into S = ceil(n / chunk_target) sorted-value
    chunks (interleaved-ROC chunk plan — shared contract with the
    container, codecs/roc_interleaved.py:chunk_plan).

    Returns (ent_arrays list[u64[]], ent_len i32[E], ent_prec i32[E],
    ent_lo u64[E], ent_list i64[E], ent_bound i64[E] chunk start within the
    list, extra_lanes int)."""
    from ..codecs.roc_interleaved import chunk_plan

    nlist = len(lengths)
    ent_arrays, ent_len, ent_prec, ent_lo, ent_list, ent_bound = \
        [], [], [], [], [], []
    extra = 0
    thresh = int(1.5 * chunk_target)
    for ln in range(nlist):
        n = int(lengths[ln])
        if n == 0:
            continue
        row = ids[ln, :n]
        if mode == "auto" and n > thresh:
            S = -(-n // chunk_target)
            sizes, bnds, lo, pr, rebased = chunk_plan(row, S)
            for s in range(S):
                ent_arrays.append(rebased[s])
                ent_len.append(int(sizes[s]))
                ent_prec.append(int(pr[s]))
                ent_lo.append(lo[s])
                ent_list.append(ln)
                ent_bound.append(int(bnds[s]))
            extra += S - 1
        else:
            ent_arrays.append(row)
            ent_len.append(n)
            ent_prec.append(int(prec[ln]))
            ent_lo.append(np.uint64(0))
            ent_list.append(ln)
            ent_bound.append(0)
    return (ent_arrays, np.asarray(ent_len, np.int32),
            np.asarray(ent_prec, np.int32), np.asarray(ent_lo, np.uint64),
            np.asarray(ent_list, np.int64), np.asarray(ent_bound, np.int64),
            extra)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ntotal", type=int, default=10_000_000)
    p.add_argument("--nlist", type=int, default=8192)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--interleave", choices=["auto", "off"], default="auto",
                   help="auto: chunk lists past 1.5x --chunk-target into "
                        "interleaved lanes; off: strict single-stream "
                        "reference format")
    p.add_argument("--chunk-target", type=int, default=512,
                   help="target chunk length for auto interleaving: per-id "
                        "decode cost is U-shaped in lane length (fixed "
                        "per-step codec cost at the short end, the O(i) "
                        "rank pass + O(capp) stack ops at the long end); "
                        "the measured optimum sits near n~500 (225@207 / "
                        "300@546 / 225@768 / 150@1719 Mids/s)")
    p.add_argument("--lane-chunk", type=int, default=262144,
                   help="decode at most this many lanes per prepared "
                        "decoder (bounds device memory at 1B scale)")
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
    n_max_list = int(lengths.max())
    log(f"workload: ntotal={args.ntotal} nlist={args.nlist} "
        f"n_max={n_max_list} prec_max={int(prec.max())} "
        f"built in {time.time()-t0:.1f}s")

    t0 = time.time()
    (ent_arrays, ent_len, ent_prec, ent_lo, ent_list, ent_bound,
     extra_lanes) = build_entries(
        ids, lengths, prec, args.interleave, args.chunk_target)
    E = len(ent_arrays)
    n_max = int(ent_len.max())
    log(f"entries: {E} lanes (extra from chunking: {extra_lanes}), "
        f"lane n_max={n_max}, planned in {time.time()-t0:.1f}s")

    # ---- host build: native C++ batch encoder (bit-exact with the device
    # encoder — tests/test_native.py) --------------------------------------
    cap = rd.stack_capacity(n_max, int(ent_prec.max()))
    t0 = time.time()
    if native.available():
        heads, stacks, lens, _, mt = native.roc_encode_lists(
            ent_arrays, ent_prec, cap=cap)
        states_np = (heads, stacks, lens, mt.astype(np.int32))
    else:
        pad = np.zeros((E, n_max), np.uint64)
        for e, a in enumerate(ent_arrays):
            pad[e, : len(a)] = a
        st, _ = rd.roc_encode_batch(
            jnp.asarray(pad), jnp.asarray(ent_len), jnp.asarray(ent_prec),
            rd.default_pool(n_max), rd.fresh_states(E, cap),
            rd.n_slices_for(int(ent_prec.max())))
        jax.block_until_ready(st)
        states_np = (np.asarray(st.head), np.asarray(st.stack),
                     np.asarray(st.stack_len),
                     np.asarray(st.mt_ctr).astype(np.int32))
    t_enc_host = time.time() - t0
    heads, stacks, lens_np, mt_np = states_np
    stream_bytes = int(8 * E + 4 * lens_np.astype(np.int64).sum())
    # envelope for chunked lanes: 8B lo + 4B length + 1B precision per
    # EXTRA lane (same accounting as InterleavedRoc.size_bytes)
    env_bytes = 13 * extra_lanes
    bits_per_id = 8.0 * (stream_bytes + env_bytes) / args.ntotal
    log(f"encode (host native={native.available()}): {t_enc_host:.1f}s "
        f"-> {args.ntotal/t_enc_host/1e6:.1f} Mids/s, "
        f"{bits_per_id:.3f} bits/id (envelope {env_bytes} B)")

    # ---- on-chip decode, in length-sorted lane groups ---------------------
    interp = jax.default_backend() == "cpu"  # Pallas interpret for CPU tests
    sort_order = np.argsort(-ent_len, kind="stable")
    groups = [sort_order[g: g + args.lane_chunk]
              for g in range(0, E, args.lane_chunk)]

    def build_group(rows):
        st = rd.RocStates(
            head=jnp.asarray(heads[rows]), stack=jnp.asarray(stacks[rows]),
            stack_len=jnp.asarray(lens_np[rows]),
            mt_ctr=jnp.asarray(mt_np[rows]),
            err=jnp.zeros(len(rows), dtype=bool))
        g_nmax = max(int(ent_len[rows].max()), 1)
        return rp.RocPallasDecoder(
            st, ent_len[rows], ent_prec[rows],
            rd.default_pool(g_nmax), g_nmax)

    total_dec_s = 0.0
    total_oneshot_s = 0.0
    rate_largest = None
    for gi, rows in enumerate(groups):
        dec = build_group(rows)
        g_ids = int(ent_len[rows].astype(np.int64).sum())

        # spot-check round-trip on a few lanes before timing (chunk lanes
        # validate against the list slice they cover, rebased by lo)
        probe = np.asarray([0, len(rows) // 2, len(rows) - 1])
        got, ok = dec.decode_lanes(probe, interpret=interp)
        assert ok, "pallas decoder flagged fallback"
        got = np.asarray(got)
        for i, r in enumerate(probe):
            e = int(rows[r])
            n = int(ent_len[e])
            want = ids[ent_list[e],
                       ent_bound[e]: ent_bound[e] + n] - ent_lo[e]
            np.testing.assert_array_equal(
                np.sort(got[i, :n].astype(np.uint64)), np.sort(want))

        # one-shot latency incl. the id transfer to host
        ts = []
        for _ in range(args.runs):
            t0 = time.time()
            np.asarray(dec.decode(interpret=interp)[0])
            ts.append(time.time() - t0)
        total_oneshot_s += min(ts)

        # group kernel throughput: output reduced to a scalar ON DEVICE so
        # the sync doesn't time a multi-hundred-MB host transfer; buffers
        # ride as ARGUMENTS (closure constants inflate the remote compile
        # payload past the tunnel's request limit at 30M+ ids)
        B0, nmp, capp = dec.B0, dec._n_max_pad, dec._capp

        @jax.jit
        def decode_reduced(buf, hi, lo, ptr0, lens, prec_row):
            out, err = rp._run_decode(
                buf, hi, lo, ptr0, lens, prec_row, nmp, capp, interp,
                dec._pool_ok)
            return (out[0, 0] + out[-1, -1]
                    + jnp.sum(out[:: max(B0 // 64, 1), 0]))

        dargs = (dec._buf, dec._hi, dec._lo, dec._ptr0, dec._lens,
                 dec._prec_row)
        np.asarray(decode_reduced(*dargs))  # compile + warm
        ts = []
        for _ in range(args.runs):
            t0 = time.time()
            np.asarray(decode_reduced(*dargs))
            ts.append(time.time() - t0)
        g_s = min(ts)
        total_dec_s += g_s
        log(f"group {gi}: {len(rows)} lanes, {g_ids} ids, "
            f"n_max={dec.n_max}: {g_s*1e3:.1f} ms "
            f"-> {g_ids/g_s/1e6:.1f} Mids/s")
        if gi == 0:
            rate_largest = g_ids / g_s
        del dec, dargs

    dec_rate = args.ntotal / total_dec_s
    log(f"decode on-chip (scalar-reduced sync, {len(groups)} group(s)): "
        f"{total_dec_s*1e3:.1f} ms -> {dec_rate/1e6:.1f} Mids/s")
    log(f"decode one-shot total (incl. id pulls): {total_oneshot_s*1e3:.1f} "
        f"ms -> {args.ntotal/total_oneshot_s/1e6:.1f} Mids/s")

    # ---- on-chip encode (optional; envelope-gated) ------------------------
    # measured over the first (longest-lane) lane-chunk group only, so the
    # gate sizes on the group, not the full batch
    enc_rate = None
    if (not args.skip_device_encode
            and min(E, args.lane_chunk) * n_max <= (1 << 28)):
        try:
            from ..ops import roc_encode_pallas as rep

            rows = sort_order[: min(E, args.lane_chunk)]
            Bp = -(-len(rows) // rp.LANE_BLOCK) * rp.LANE_BLOCK
            pad = np.zeros((Bp, n_max), np.uint64)
            for i, e in enumerate(rows):
                pad[i, : len(ent_arrays[e])] = ent_arrays[e]
            e_ids = int(ent_len[rows].astype(np.int64).sum())
            enc = rep.RocPallasEncoder(n_max, int(ent_prec.max()))
            ids_j = jnp.asarray(pad)
            len_j = jnp.asarray(np.pad(ent_len[rows],
                                       (0, Bp - len(rows))))
            prec_j = jnp.asarray(np.pad(ent_prec[rows],
                                        (0, Bp - len(rows)),
                                        constant_values=1))
            enc_pool = jnp.asarray(rd.default_pool(rep.POOL_ROWS), jnp.uint32)

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
            enc_rate = e_ids / min(ts)
            log(f"encode on-chip ({len(rows)} lanes): {min(ts)*1e3:.1f} ms "
                f"-> {enc_rate/1e6:.1f} Mids/s")
        except Exception as e:  # informational — decode is the metric
            log(f"device encode skipped: {e}")

    print(json.dumps({
        "ntotal": args.ntotal, "nlist": args.nlist, "n_max": n_max_list,
        "interleave": args.interleave, "lanes": E,
        "lane_n_max": n_max,
        "bits_per_id": round(bits_per_id, 4),
        "host_encode_s": round(t_enc_host, 3),
        "decode_oneshot_mids_s": round(
            args.ntotal / total_oneshot_s / 1e6, 2),
        "decode_mids_s": round(dec_rate / 1e6, 2),
        "decode_mids_s_largest_group": (
            round(rate_largest / 1e6, 2) if rate_largest else None),
        "encode_mids_s": (round(enc_rate / 1e6, 2) if enc_rate else None),
    }), flush=True)


if __name__ == "__main__":
    main()
