"""Sharded deferred-ID-decoding IVF search — the whole query path over a
device mesh.

SURVEY.md §2.4 maps the reference's per-list OpenMP parallelism
(custom_invlists_impl.cpp:420-525) onto a 1-D "lists" mesh axis; round 1
sharded only the codec. This module shards the *search* end-to-end in ONE
shard_map program per query batch:

  coarse:    each shard scores its centroid slice ([nq, d] x [d, B_loc] on
             the MXU), takes a local top-nprobe, and the per-shard
             candidates ride ``all_gather`` into a replicated global
             top-nprobe merge (lexicographic (distance, id) tie-break, so
             the probe set is independent of the shard count);
  scan:      each shard scans only ITS probed lists (positional labels,
             ids untouched), local masked top-k;
  merge:     ``all_gather`` of per-shard shortlists + replicated
             (distance, label) merge — the collective replacing the
             reference's single-threaded heap merge;
  translate: grouped deferred decoding, sharded — each shard gathers the
             *touched* subset of its own compressed lists into a static
             T_cap-lane buffer, runs the batched ANS decode chain on just
             those lanes, translates the labels it owns, and the shards'
             partial translations combine with a ``psum`` (every label is
             owned by exactly one shard).

Lists are sharded contiguously (shard s owns rows [s*B_loc, (s+1)*B_loc)),
so artifact/list order is deterministic and N-device results match 1-device
results (asserted in tests/test_parallel.py). Process-count agnostic: under
``jax.distributed.initialize`` (parallel.multihost) the same program spans
hosts with the collectives riding ICI/DCN.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..codecs import roc_device as rd
from ..codecs.elias_fano import EliasFanoBatch, ef_select
from ..codecs.rrr import RRRPlanes
from ..codecs.wavelet_tree import WaveletTree, wt_select, wt_select_rrr
from ..core.bits import BitVectorBatch as _BVB, build_bitvector_batch
from ..store.invlists import (
    EliasFanoInvertedLists,
    InvertedLists,
    PackedBitsInvertedLists,
    RocInvertedLists,
    WaveletTreeInvertedLists,
)

_OFF_MASK = jnp.int64((1 << 32) - 1)


class ShardedIVF:
    """IVF flat/pq/qinco search sharded over a 'lists' mesh.

    ``index`` is a trained search.ivf.IndexIVF; ``container`` selects the ID
    translation path: None / InvertedLists → raw sharded id table;
    RocInvertedLists → sharded grouped ANS decode of the touched lists (the
    deferred-decoding flagship). PQ storage scans the *decoded* f32
    reconstructions — the ADC distance equals the exact L2 to the
    reconstruction (see search/ivf.py), so the scan stays on the MXU matmul
    path instead of per-pair LUT gathers.
    """

    def __init__(self, mesh: Mesh, index, container=None):
        assert index.storage in ("flat", "qinco", "pq"), "unknown storage"
        self.mesh = mesh
        self.n_shards = mesh.size
        self.nlist = index.nlist
        self.d = index.d
        container = container if container is not None else index.invlists
        self.container = container

        N = self.n_shards
        self.nlist_pad = ((self.nlist + N - 1) // N) * N
        self.b_loc = self.nlist_pad // N
        lengths = np.zeros(self.nlist_pad, dtype=np.int32)
        lengths[: self.nlist] = np.asarray(container.lengths, np.int32)
        self.n_pad = max(int(lengths.max()), 1)

        # scan payload in the ACTIVE container's code order (same invariant
        # as IndexIVF.replace_invlists)
        get_codes = (
            container.get_codes if hasattr(container, "get_codes")
            else (lambda ln: container.codes[ln])
        )
        # channel-major [lists, d, n_pad]: the minormost dim must be the long
        # one — a [.., n_pad, d] layout tile-pads d up to 128 lanes in HBM
        # (4x at d=32), which OOMs at 10M ids (see search/ivf.py _ScanBucket)
        vecs = np.zeros((self.nlist_pad, index.d, self.n_pad), np.float32)
        for ln in range(self.nlist):
            c = np.asarray(get_codes(ln), np.uint8)
            n = len(c) // index.code_size
            if n == 0:
                continue
            if index.storage == "flat":
                vecs[ln, :, :n] = c.view(np.float32).reshape(n, -1).T
            elif index.storage == "pq":  # decoded reconstructions (MXU scan)
                rows = c.reshape(n, index.code_size)
                vecs[ln, :, :n] = index.pq.decode(rows).T
            else:  # qinco: linear reconstructions (see search/ivf.py NOTE)
                rows = c.reshape(n, index.code_size)
                vecs[ln, :, :n] = (
                    index.qinco.lin_decode(rows[:, : index.qinco.M])
                    + index.centroids[ln]
                ).T

        cents = np.zeros((self.nlist_pad, index.d), np.float32)
        cents[: self.nlist] = index.centroids

        shard_l = NamedSharding(mesh, P("lists"))
        self._cents = jax.device_put(jnp.asarray(cents),
                                     NamedSharding(mesh, P("lists", None)))
        self._vecs = jax.device_put(
            jnp.asarray(vecs), NamedSharding(mesh, P("lists", None, None)))
        self._lengths = jax.device_put(jnp.asarray(lengths), shard_l)

        # ---- translation tables ------------------------------------------
        # each container maps onto the translate stage differently: ROC is
        # grouped full-list decode of the touched lanes; packed/EF are O(1)
        # random access on lane-sharded words; the wavelet tree is one
        # global structure (replicated, each shard translates the labels it
        # owns); raw is a sharded id table
        if isinstance(container, RocInvertedLists):
            self._mode = "roc"
            st, prec = _roc_states_in_list_order(container, self.nlist_pad)
            spec = rd.RocStates(*(P("lists"),) * 5)
            self._states = jax.tree_util.tree_map(
                lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
                st, spec)
            self._prec = jax.device_put(jnp.asarray(prec), shard_l)
            self._n_slices = rd.n_slices_for(int(prec.max(initial=1)))
            self._pallas = self._try_pallas_translate(st, lengths, prec)
        elif isinstance(container, PackedBitsInvertedLists):
            self._mode = "packed"
            self._pb_width = container.bits
            W = max(
                int(np.asarray(pb.words).shape[1]) for pb in container._packed)
            words = np.zeros((self.nlist_pad, W), np.uint32)
            for ln in range(self.nlist):
                if ln not in container._list_to_bucket:
                    continue  # empty list: no packed words, never queried
                bi, lane = container._list_to_bucket[ln]
                w = np.asarray(container._packed[bi].words)[lane]
                words[ln, : len(w)] = w
            self._pb_words = jax.device_put(
                jnp.asarray(words), NamedSharding(mesh, P("lists", None)))
        elif isinstance(container, EliasFanoInvertedLists):
            self._mode = "ef"
            self._ef_arrays = _ef_in_list_order(container, self.nlist_pad,
                                                mesh)
        elif isinstance(container, WaveletTreeInvertedLists):
            self._mode = "wt" if container.wt_type == 0 else "wt1"
            # global structure over ntotal — replicated across the mesh;
            # static fields (n, levels) ride the closure, arrays the args
            wt = container.wt
            self._wt_static = (wt.n, wt.levels)
            fields = (wt[:2] if self._mode == "wt"
                      else (wt.classes, wt.off_words, wt.sb_off_start,
                            wt.sb_rank))
            self._wt_arrays = tuple(
                jax.device_put(a, NamedSharding(mesh, P())) for a in fields)
        else:
            self._mode = "raw"
            ids = np.zeros((self.nlist_pad, self.n_pad), np.uint64)
            for ln in range(self.nlist):
                v = (container.ids[ln] if isinstance(container, InvertedLists)
                     else container.get_ids(ln))
                ids[ln, : len(v)] = v
            self._ids = jax.device_put(
                jnp.asarray(ids), NamedSharding(mesh, P("lists", None)))
        self._compiled = {}

    # -------------------------------------------------- Pallas translation

    def _try_pallas_translate(self, st, lengths, prec):
        """Prepare the single-kernel Pallas decoder for the fused translate
        stage: decode ALL local lanes in one ``fori_loop`` kernel (~ms at 1M
        ids) instead of the XLA scan chain (~25us/element step). Returns the
        mesh-sharded kernel inputs, or None when out of envelope (non-TPU
        mesh, lane count not LANE_BLOCK-divisible, precision > 32, VMEM).

        The ok-flag is validated HERE with one full decode: per-lane decode
        is deterministic and the fused program always decodes every local
        lane, so a clean ctor-time decode guarantees the in-program err flag
        stays false — no dynamic fallback needed inside the jitted program.
        """
        from ..ops import roc_pallas as rp

        devs = np.asarray(self.mesh.devices).reshape(-1)
        maxp = int(np.asarray(prec).max(initial=0))
        # b_loc % 256: the decoder pads lanes to a 256 multiple globally AND
        # each shard's local lane count must hit a kernel lane block
        if (devs[0].platform != "tpu"
                or self.b_loc % 256 != 0
                or not rp.RocPallasDecoder.supports(maxp, self.n_pad)):
            return None
        try:
            dec = rp.RocPallasDecoder(
                jax.tree_util.tree_map(jnp.asarray, st), lengths, prec,
                rd.default_pool(self.n_pad), self.n_pad)
        except ValueError:  # VMEM envelope
            return None
        _, ok = dec.decode()
        if not ok:
            return None
        col = NamedSharding(self.mesh, P(None, "lists"))
        arrs = tuple(
            jax.device_put(a, col)
            for a in (dec._buf, dec._hi, dec._lo, dec._ptr0, dec._lens,
                      dec._prec_row))
        return arrs, (dec._n_max_pad, dec._capp)

    # ------------------------------------------------------------------ API

    def search(self, xq: np.ndarray, k: int, nprobe: int):
        """Deferred-decoding search → (D f32[nq, k], I i64[nq, k]); ids are
        fully translated, -1 for empty slots. One device program per query
        chunk (chunked so the scan's [nq_c, B_loc*n_pad] distance slab stays
        under ~VDBIDC_SCAN_BUDGET f32 elements per shard)."""
        xq = np.asarray(xq, np.float32)
        nq = len(xq)
        budget = int(os.environ.get("VDBIDC_SCAN_BUDGET", str(2 ** 28)))
        nq_c = max(1, min(nq, budget // max(self.b_loc * self.n_pad, 1)))
        if nq_c >= nq:
            return self._search_chunk(xq, k, nprobe)
        D = np.empty((nq, k), np.float32)
        I = np.empty((nq, k), np.int64)
        for qs in range(0, nq, nq_c):
            qe = min(qs + nq_c, nq)
            chunk = xq[qs:qe]
            if qe - qs < nq_c:  # pad the ragged tail to reuse the program
                chunk = np.concatenate(
                    [chunk, np.zeros((nq_c - (qe - qs), xq.shape[1]),
                                     np.float32)])
            Dc, Ic = self._search_chunk(chunk, k, nprobe)
            D[qs:qe] = Dc[: qe - qs]
            I[qs:qe] = Ic[: qe - qs]
        return D, I

    def _search_chunk(self, xq: np.ndarray, k: int, nprobe: int):
        nq = len(xq)
        key = (nq, k, nprobe)
        if key not in self._compiled:
            self._compiled[key] = self._build(nq, k, nprobe)
        D, I = self._compiled[key](jnp.asarray(xq))
        return np.asarray(D), np.asarray(I)

    # ------------------------------------------------------------ the program

    def _build(self, nq: int, k: int, nprobe: int):
        B_loc, n_pad, d = self.b_loc, self.n_pad, self.d
        nlist, mode = self.nlist, self._mode
        pl_nmax = pl_capp = 0
        if mode == "roc" and getattr(self, "_pallas", None) is not None:
            mode = "roc_pl"
            pl_nmax, pl_capp = self._pallas[1]
        T_cap = max(1, min(B_loc, nq * nprobe))
        np_loc = min(nprobe, B_loc)
        n_slices = self._n_slices if mode == "roc" else 0
        pool = rd.default_pool(n_pad) if mode == "roc" else None
        pb_width = self._pb_width if mode == "packed" else 0
        wt_static = self._wt_static if mode in ("wt", "wt1") else None
        # scan cost model (same as search/ivf.py): the dense all-lanes scan
        # streams the payload once but pays top-k over EVERY (query, lane)
        # slot — nq * B_loc * n_pad keys, ~100x/key the cost of streaming
        # (NOTES.md) — so it only wins near full probe. The pair path
        # gathers each probed lane per probing query (more HBM traffic) but
        # sorts only nq * nprobe * n_pad keys: a 64x top-k saving at
        # nprobe=16 / B_loc=1024, which is why the dense fused search was
        # flat at ~0.6 s while the host pair path ran 0.2 s at 1M ids.
        pair_scan = 4 * nprobe < B_loc
        P_cap = nq * nprobe
        budget = int(os.environ.get("VDBIDC_SCAN_BUDGET", str(2 ** 28)))

        def local(xq, cents_l, vecs_l, lengths_l, *trans):
            s = jax.lax.axis_index("lists")
            base = (s * B_loc).astype(jnp.int64)
            gl = base + jnp.arange(B_loc, dtype=jnp.int64)   # global list ids

            # ---- coarse: local slice scores + replicated global merge ----
            dots = jnp.dot(xq, cents_l.T, preferred_element_type=jnp.float32)
            c2 = jnp.sum(cents_l * cents_l, axis=1)
            cd2 = jnp.where((gl < nlist)[None, :], c2[None, :] - 2.0 * dots,
                            jnp.inf)
            loc_d, loc_i = jax.lax.top_k(-cd2, np_loc)       # [nq, np_loc]
            loc_id = base + loc_i.astype(jnp.int64)
            all_d = jax.lax.all_gather(-loc_d, "lists")      # [N, nq, np_loc]
            all_id = jax.lax.all_gather(loc_id, "lists")
            Ng = all_d.shape[0]
            cand_d = jnp.moveaxis(all_d, 0, 1).reshape(nq, Ng * np_loc)
            cand_i = jnp.moveaxis(all_id, 0, 1).reshape(nq, Ng * np_loc)
            order = jnp.lexsort((cand_i, cand_d), axis=1)[:, :nprobe]
            probes = jnp.take_along_axis(cand_i, order, axis=1)  # [nq, nprobe]

            # ---- scan: only my probed lists ------------------------------
            lp = probes - base                                # local or out
            in_range = (lp >= 0) & (lp < B_loc)
            if pair_scan:
                # gather the probed (query, lane) pairs; top-k per pair only
                flat_lp = jnp.where(in_range, lp, B_loc).astype(
                    jnp.int32).reshape(-1)                    # [nq*nprobe]
                sel = jnp.nonzero(flat_lp < B_loc, size=P_cap,
                                  fill_value=P_cap)[0]
                valid_pair = sel < P_cap
                sel_safe = jnp.minimum(sel, P_cap - 1).astype(jnp.int32)
                q_idx = sel_safe // nprobe
                p_idx = sel_safe % nprobe
                lane = flat_lp[sel_safe]       # may be B_loc on pad rows
                k_p = min(k, n_pad)
                # slab the pair gather so the [C, d, n_pad] payload stays
                # under the scan budget (same chunking as the host path)
                C = max(1, min(P_cap, budget // max(d * n_pad, 1)))
                n_slabs = -(-P_cap // C)
                Ppad = n_slabs * C
                lane_p, q_p = lane, q_idx
                if Ppad > P_cap:
                    lane_p = jnp.concatenate(
                        [lane, jnp.zeros(Ppad - P_cap, jnp.int32)])
                    q_p = jnp.concatenate(
                        [q_idx, jnp.zeros(Ppad - P_cap, jnp.int32)])

                def slab(i, out):
                    st = i * C
                    ln_s = jax.lax.dynamic_slice(lane_p, (st,), (C,))
                    q_s = jax.lax.dynamic_slice(q_p, (st,), (C,))
                    rows = vecs_l[jnp.minimum(ln_s, B_loc - 1)]
                    dots_p = jnp.einsum(
                        "cd,cdn->cn", xq[q_s], rows,
                        preferred_element_type=jnp.float32)
                    y2_p = jnp.sum(rows * rows, axis=1)
                    d2_p = y2_p - 2.0 * dots_p
                    ok = (jnp.arange(n_pad, dtype=jnp.int32)[None, :]
                          < lengths_l[jnp.minimum(ln_s, B_loc - 1)][:, None])
                    d2_p = jnp.where(ok, d2_p, jnp.inf)
                    nk, oi = jax.lax.top_k(-d2_p, k_p)
                    return (jax.lax.dynamic_update_slice(out[0], nk, (st, 0)),
                            jax.lax.dynamic_update_slice(out[1], oi, (st, 0)))

                negp, offp = jax.lax.fori_loop(
                    0, n_slabs, slab,
                    (jnp.full((Ppad, k_p), -jnp.inf, jnp.float32),
                     jnp.zeros((Ppad, k_p), jnp.int32)))
                negp, offp = negp[:P_cap], offp[:P_cap]
                labp = (((base + lane.astype(jnp.int64))[:, None] << 32)
                        | offp.astype(jnp.int64))
                okl = valid_pair[:, None] & jnp.isfinite(-negp)
                labp = jnp.where(okl, labp, jnp.int64(-1))
                negp = jnp.where(okl, negp, -jnp.inf)
                # scatter pair shortlists to their (query, probe) slot —
                # unique per pair — then local top-k across the probes
                q_tgt = jnp.where(valid_pair, q_idx, nq)  # nq = dropped
                cd = jnp.full((nq, nprobe, k_p), -jnp.inf, jnp.float32).at[
                    q_tgt, p_idx].set(negp, mode="drop")
                cl = jnp.full((nq, nprobe, k_p), -1, jnp.int64).at[
                    q_tgt, p_idx].set(labp, mode="drop")
                kk = min(k, nprobe * k_p)
                neg, pos = jax.lax.top_k(cd.reshape(nq, nprobe * k_p), kk)
                lab = jnp.take_along_axis(
                    cl.reshape(nq, nprobe * k_p), pos, axis=1)
                if kk < k:
                    neg = jnp.pad(neg, ((0, 0), (0, k - kk)),
                                  constant_values=-jnp.inf)
                    lab = jnp.pad(lab, ((0, 0), (0, k - kk)),
                                  constant_values=-1)
                lab = jnp.where(jnp.isfinite(-neg), lab, jnp.int64(-1))
            else:
                probed = jnp.zeros((nq, B_loc), bool).at[
                    jnp.arange(nq)[:, None],
                    jnp.where(in_range, lp, B_loc).astype(jnp.int32),
                ].set(True, mode="drop")
                # vecs_l is channel-major [B_loc, d, n_pad]
                dots2 = jnp.einsum("qd,bdn->qbn", xq, vecs_l,
                                   preferred_element_type=jnp.float32)
                y2 = jnp.sum(vecs_l * vecs_l, axis=1)    # [B_loc, n_pad]
                d2 = y2[None] - 2.0 * dots2              # [nq, B_loc, n_pad]
                slot_ok = (jnp.arange(n_pad, dtype=jnp.int32)[None, :]
                           < lengths_l[:, None])
                d2 = jnp.where(probed[:, :, None] & slot_ok[None], d2,
                               jnp.inf)
                flat_d = d2.reshape(nq, B_loc * n_pad)
                kk = min(k, B_loc * n_pad)
                neg, pos = jax.lax.top_k(-flat_d, kk)
                if kk < k:
                    neg = jnp.pad(neg, ((0, 0), (0, k - kk)),
                                  constant_values=-jnp.inf)
                    pos = jnp.pad(pos, ((0, 0), (0, k - kk)))
                b_idx = (pos // n_pad).astype(jnp.int64)
                off = (pos % n_pad).astype(jnp.int64)
                lab = ((base + b_idx) << 32) | off
                lab = jnp.where(jnp.isfinite(-neg), lab, jnp.int64(-1))

            # ---- merge: replicated global top-k --------------------------
            g_d = jnp.moveaxis(jax.lax.all_gather(-neg, "lists"), 0, 1
                               ).reshape(nq, Ng * k)
            g_l = jnp.moveaxis(jax.lax.all_gather(lab, "lists"), 0, 1
                               ).reshape(nq, Ng * k)
            key_l = jnp.where(g_l < 0, jnp.int64(2**62), g_l)
            order = jnp.lexsort((key_l, g_d), axis=1)[:, :k]
            D = jnp.take_along_axis(g_d, order, axis=1)
            L = jnp.take_along_axis(g_l, order, axis=1)       # [nq, k]

            # ---- translate: each shard resolves the labels it owns -------
            lns = L >> 32
            offs = (L & _OFF_MASK).astype(jnp.int32)
            lloc = lns - base
            mine = (L >= 0) & (lloc >= 0) & (lloc < B_loc)
            lane = jnp.where(mine, lloc, 0).astype(jnp.int32)
            if mode == "roc_pl":
                # single-kernel Pallas decode of EVERY local lane (cheaper
                # at scale than any touched-lane bookkeeping: ~ms for 1M
                # ids); ok-flag pre-validated at ctor, so err is discarded
                from ..ops.roc_pallas import _run_decode

                buf_l, hi_l, lo_l, ptr_l, lens_l, prec_l = trans
                ids_all, _ = _run_decode(buf_l, hi_l, lo_l, ptr_l, lens_l,
                                         prec_l, pl_nmax, pl_capp, False,
                                         jnp.asarray(True))
                vals = ids_all[lane, jnp.minimum(offs, pl_nmax - 1)]
                found = mine
            elif mode in ("roc", "raw"):
                # grouped: gather the touched lanes into a static T_cap
                # buffer, full-list decode (ROC) or table lookup (raw)
                touched = jnp.zeros(B_loc, bool).at[
                    jnp.where(mine, lloc, B_loc).astype(jnp.int32)
                ].set(True, mode="drop")
                rows = jnp.nonzero(touched, size=T_cap, fill_value=B_loc)[0]
                row_valid = rows < B_loc
                rsafe = jnp.minimum(rows, B_loc - 1).astype(jnp.int32)
                rlen = jnp.where(row_valid, lengths_l[rsafe], 0
                                 ).astype(jnp.int32)
                if mode == "roc":
                    states, prec = trans
                    sub = jax.tree_util.tree_map(lambda a: a[rsafe], states)
                    dec, _ = rd.roc_decode_batch(sub, rlen, prec[rsafe],
                                                 pool, n_pad, n_slices)
                else:
                    (ids_l,) = trans
                    dec = ids_l[rsafe]
                # local-list -> touched-row inverse map
                row_of = jnp.full(B_loc + 1, T_cap, jnp.int32).at[
                    jnp.where(row_valid, rsafe, B_loc)
                ].set(jnp.arange(T_cap, dtype=jnp.int32), mode="drop")
                r = row_of[lane]
                found = mine & (r < T_cap)
                dec_pad = jnp.concatenate(
                    [dec, jnp.zeros((1, n_pad), dec.dtype)], axis=0)
                vals = dec_pad[jnp.where(found, r, T_cap), offs]
            elif mode == "packed":
                # O(1) random access on lane-sharded packed words
                (words_l,) = trans
                start = offs.astype(jnp.int64) * pb_width
                w0 = (start >> 5).astype(jnp.int32)
                sh_b = (start & 31).astype(jnp.uint64)
                Wp = words_l.shape[1]
                lo = words_l[lane, jnp.minimum(w0, Wp - 1)].astype(jnp.uint64)
                hi = words_l[lane, jnp.minimum(w0 + 1, Wp - 1)
                             ].astype(jnp.uint64)
                vals = ((lo | (hi << jnp.uint64(32))) >> sh_b) & jnp.uint64(
                    (1 << pb_width) - 1)
                found = mine
            elif mode == "ef":
                hw, hsb, hnb, lw, el, em = trans
                ef_l = EliasFanoBatch(
                    high=_BVB(hw, hsb, hnb), low_words=lw, l=el, m=em)
                vals = ef_select(ef_l, lane, offs)
                found = mine
            else:  # wt / wt1: replicated global tree, select per label
                sym = jnp.where(mine, lns, 0)
                if mode == "wt":
                    words_w, sbp_w = trans
                    wt = WaveletTree(words_w, sbp_w, *wt_static)
                    vals = wt_select(wt, sym, offs)
                else:
                    cls_w, ow_w, sos_w, sbr_w = trans
                    rrr = RRRPlanes(cls_w, ow_w, sos_w, sbr_w, *wt_static)
                    vals = wt_select_rrr(rrr, sym, offs)
                found = mine
            part = jnp.where(found, vals.astype(jnp.int64), 0)
            I = jax.lax.psum(part, "lists")
            I = jnp.where(L >= 0, I, jnp.int64(-1))

            x2 = jnp.sum(xq * xq, axis=1, keepdims=True)
            D = jnp.where(L >= 0, D + x2, jnp.inf)
            return D, I

        if mode == "roc_pl":
            trans_specs = (P(None, "lists"),) * 6
            trans_args = self._pallas[0]
        elif mode == "roc":
            trans_specs = (rd.RocStates(*(P("lists"),) * 5), P("lists"))
            trans_args = (self._states, self._prec)
        elif mode == "packed":
            trans_specs = (P("lists"),)
            trans_args = (self._pb_words,)
        elif mode == "ef":
            trans_specs = (P("lists"),) * 6
            trans_args = self._ef_arrays
        elif mode in ("wt", "wt1"):
            trans_specs = (P(),) * len(self._wt_arrays)
            trans_args = self._wt_arrays
        else:
            trans_specs = (P("lists"),)
            trans_args = (self._ids,)

        fn = shard_map(
            local, mesh=self.mesh,
            in_specs=(P(), P("lists"), P("lists"), P("lists"), *trans_specs),
            out_specs=(P(), P()),
            check_vma=False,  # replicated outputs are identical by
            #                   construction (post-all_gather compute)
        )
        # the tables ride as ARGUMENTS, not closure constants: closed-over
        # arrays are baked into the program (huge compile payloads — the
        # axon tunnel rejects them at 1M scale with HTTP 413, and every
        # compile re-ships the index)
        jitted = jax.jit(fn)
        args = (self._cents, self._vecs, self._lengths, *trans_args)
        return lambda xq: jitted(xq, *args)


def _ef_in_list_order(c: EliasFanoInvertedLists, nlist_pad: int, mesh: Mesh):
    """Flatten bucketized EF batches into one global-list-order batch of
    lane-sharded plain arrays (hw, hsb, hnb, low, l, m)."""
    HW = max(int(np.asarray(ef.high.words).shape[1]) for ef in c._efs)
    LW = max(int(np.asarray(ef.low_words).shape[1]) for ef in c._efs)
    high = np.zeros((nlist_pad, HW), np.uint32)
    nbits = np.zeros(nlist_pad, np.int32)
    low = np.zeros((nlist_pad, LW), np.uint32)
    l = np.zeros(nlist_pad, np.int32)
    m = np.zeros(nlist_pad, np.int32)
    for ln in range(c.nlist):
        if ln not in c._list_to_bucket:
            continue  # empty list: m=0 lanes are never select()ed
        bi, lane = c._list_to_bucket[ln]
        ef = c._efs[bi]
        hw = np.asarray(ef.high.words)[lane]
        lw = np.asarray(ef.low_words)[lane]
        high[ln, : len(hw)] = hw
        low[ln, : len(lw)] = lw
        nbits[ln] = int(np.asarray(ef.high.nbits)[lane])
        l[ln] = int(np.asarray(ef.l)[lane])
        m[ln] = int(np.asarray(ef.m)[lane])
    bvb = build_bitvector_batch(jnp.asarray(high), jnp.asarray(nbits))
    row = NamedSharding(mesh, P("lists"))
    mat = NamedSharding(mesh, P("lists", None))
    return (
        jax.device_put(bvb.words, mat),
        jax.device_put(bvb.sb_prefix, mat),
        jax.device_put(bvb.nbits, row),
        jax.device_put(jnp.asarray(low), mat),
        jax.device_put(jnp.asarray(l), row),
        jax.device_put(jnp.asarray(m), row),
    )


def _roc_states_in_list_order(c: RocInvertedLists, nlist_pad: int):
    """Flatten a RocInvertedLists' bucketized states into one global-list-
    order RocStates batch (stacks padded to the max bucket capacity)."""
    cap = max(int(np.asarray(st.stack).shape[1]) for st in c._states)
    head = np.full(nlist_pad, rd.RANS_L, np.uint64)
    stack = np.zeros((nlist_pad, cap), np.uint32)
    stack_len = np.zeros(nlist_pad, np.int32)
    mt_ctr = np.zeros(nlist_pad, np.int32)
    prec = np.ones(nlist_pad, np.int32)
    for bi, bucket in enumerate(c._buckets):
        st = jax.tree_util.tree_map(np.asarray, c._states[bi])
        pr = np.asarray(c._precisions[bi])
        for lane, ln in enumerate(bucket.list_ids):
            ln = int(ln)
            head[ln] = st.head[lane]
            w = st.stack.shape[1]
            stack[ln, :w] = st.stack[lane]
            stack_len[ln] = st.stack_len[lane]
            mt_ctr[ln] = st.mt_ctr[lane]
            prec[ln] = pr[lane]
    states = rd.RocStates(
        head=jnp.asarray(head), stack=jnp.asarray(stack),
        stack_len=jnp.asarray(stack_len), mt_ctr=jnp.asarray(mt_ctr),
        err=jnp.zeros(nlist_pad, bool),
    )
    return states, prec
