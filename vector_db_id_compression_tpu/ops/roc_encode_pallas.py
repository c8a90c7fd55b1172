"""ROC encode as a single Pallas TPU kernel.

Companion to ops/roc_pallas.py (the decoder): keeps all codec state resident
in VMEM and runs the whole sequential encode chain — per element
(reference codec.cpp:123-138):

    nmax  = n - i
    idx   = pop_with_finer_precision(state, nmax)       # sample w/o repl.
    pos, symbol = select_remove(idx)                    # order statistics
    codec_push(state, symbol, precision)                # two 16-bit slices

TPU-native structure decisions (what differs from the reference BST loop):

  - order statistics by **array compaction**: the sorted remaining ids live
    densely in rows [0, n-i) of a VMEM scratch; select(idx) is one masked
    row reduce and removal is a cyclic roll + masked select (Mosaic has no
    cumsum/gather, but static rolls and wide masked ops are near-free);
  - exact u64 ÷ u16 via schoolbook long division in four 16-bit digits —
    each digit step is a native 32-bit vector divide (nmax < 2^16);
  - the MT19937 "initial bits" pool is pre-composed below the stack in one
    unified buffer exactly like the decoder, so stack underflow is the same
    pop instruction reading below the stack base; the d-th draw always reads
    row POOL_ROWS-1-d, and pushes may overwrite already-drawn rows safely
    (LIFO discipline: a row's latest write is always pushed-not-yet-popped);
  - final per-lane stack = rows [min_ptr, ptr); mt draws = POOL_ROWS-min_ptr.

Bit-exact with the host encoder (codecs/roc.py) and the native C++ encoder —
asserted in tests/test_roc_encode_pallas.py.

Restrictions (callers fall back to codecs.roc_device / native):
  - symbol precision <= 32, list length < 2^16 (same as the decoder).
"""

from __future__ import annotations

import sys
from functools import partial

if sys.getrecursionlimit() < 100_000:
    sys.setrecursionlimit(100_000)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codecs import roc_device as rd
from .roc_pallas import LANE_BLOCK, _VMEM_BUDGET, _sll, _srl, _ult

POOL_ROWS = 32  # encode draws a handful of initial-bit words per list


def _lane_bytes(n_max: int, capp: int) -> int:
    """Per-lane scoped-VMEM bytes of one encode grid step: ids_in +
    order_out + 2 scratch (n_max rows each), double-buffered in/out, +
    buf_out (capp rows). Calibrated against Mosaic scoped-OOM reports:
    n=4864/c=3688 -> 139.7 KB/lane at 256 lanes, n=11168/c=9816 ->
    330.8 KB/lane at 128 lanes (within 5%) — but a 10M-scale bucket
    (16.04M scoped at 256 lanes) still beat the raw formula by ~10%, so
    budget with a 15% safety factor; an overshoot only shifts a bucket to
    the (bit-identical) host/XLA encoder, and the build additionally
    catches Mosaic compile failures and falls back."""
    return ((6 * n_max + 2 * capp + 32) * 4 * 23) // 20
_RANS_L_I32 = -2147483648  # 2^31 as an i32 bit pattern


def _digit_bits(n_max: int) -> int:
    """Long-division digit width: cur = r*2^w + d must stay < 2^31 with
    r < nmax <= n_max, so 16-bit digits need n_max <= 2^15 and 8-bit digits
    cover the full n_max < 2^16 envelope."""
    return 16 if n_max <= (1 << 15) else 8


def _encode_kernel(n_max: int, capp: int):
    def kernel(ids_in, pool_in, len_in, prec_in,
               buf_out, hi_out, lo_out, ptr_out, minptr_out, err_out,
               order_out, ids_s, pos_s):
        B = len_in.shape[1]
        rows_buf = jax.lax.broadcasted_iota(jnp.int32, (capp, B), 0)
        rows_sym = jax.lax.broadcasted_iota(jnp.int32, (n_max, B), 0)
        lengths = len_in[:]
        prec = prec_in[:]
        # unified buffer: pool prefix (pre-reversed), stack above
        buf_out[:] = jnp.zeros((capp, B), jnp.int32)
        buf_out[0:POOL_ROWS, :] = pool_in[:]
        ids_s[:] = ids_in[:]
        pos_s[:] = rows_sym
        order_out[:] = jnp.zeros((n_max, B), jnp.int32)

        def pop_word(ptr, take, err):
            w = jnp.sum(
                jnp.where(rows_buf == (ptr - 1), buf_out[:], jnp.int32(0)),
                axis=0, keepdims=True, dtype=jnp.int32,
            )
            err = err | (take & (ptr <= 0)).astype(jnp.int32)
            return w, ptr - take.astype(jnp.int32), err

        def push_word(ptr, word, put, err):
            buf_out[:] = jnp.where((rows_buf == ptr) & put, word, buf_out[:])
            err = err | (put & (ptr >= capp)).astype(jnp.int32)
            return ptr + put.astype(jnp.int32), err

        def body(i, carry):
            hi, lo, ptr, minptr, err = carry
            active = i < lengths
            nmax = jnp.maximum(lengths - i, jnp.int32(1))

            # ---- pop_with_finer_precision(nmax) (codec.cpp:21-42) --------
            # q31 = 2^31 // nmax without i32 overflow (via 2^30)
            a30 = jnp.int32(1 << 30)
            q30 = a30 // nmax
            r30 = a30 % nmax
            q31 = 2 * q30 + (2 * r30) // nmax
            # spill when head >= nmax*q31 << 32  <=>  hi >=u nmax*q31
            thresh = nmax * q31  # == 2^31 - (2^31 % nmax); u32-exact
            spill = _ult(thresh - 1, hi) & active  # hi >=u thresh
            ptr, err = push_word(ptr, lo, spill, err)
            lo0 = jnp.where(spill, hi, lo)
            hi0 = jnp.where(spill, jnp.int32(0), hi)
            # u64 (hi0, lo0) // nmax by schoolbook long division; digit
            # width is a compile-time choice (see _digit_bits)
            dw = _digit_bits(n_max)
            dmask = (1 << dw) - 1
            digits = [
                _srl(word, sh) & dmask
                for word in (hi0, lo0)
                for sh in range(32 - dw, -1, -dw)
            ]
            r = jnp.zeros_like(hi0)
            qs = []
            for d in digits:
                cur = _sll(r, dw) | d          # < nmax * 2^dw < 2^31: safe
                qs.append(cur // nmax)
                r = cur % nmax
            idx = r
            per_word = 32 // dw
            q_hi = jnp.zeros_like(hi0)
            q_lo = jnp.zeros_like(lo0)
            for j in range(per_word):
                q_hi = _sll(q_hi, dw) | qs[j]
                q_lo = _sll(q_lo, dw) | qs[per_word + j]
            # refill if PRE-divide head < 2^31 (only possible after a spill)
            refill = (hi0 == 0) & (lo0 >= 0) & active
            w, ptr, err = pop_word(ptr, refill, err)
            minptr = jnp.minimum(minptr, ptr)
            hi1 = jnp.where(refill, q_lo, q_hi)
            lo1 = jnp.where(refill, w, q_lo)
            hi = jnp.where(active, hi1, hi)
            lo = jnp.where(active, lo1, lo)

            # ---- select_remove(idx) on the compacted remaining ids --------
            hit = rows_sym == idx
            symbol = jnp.sum(jnp.where(hit, ids_s[:], jnp.int32(0)),
                             axis=0, keepdims=True, dtype=jnp.int32)
            pos = jnp.sum(jnp.where(hit, pos_s[:], jnp.int32(0)),
                          axis=0, keepdims=True, dtype=jnp.int32)
            # rows shift up by 1 (cyclic; i32 shift operand — x64 mode would
            # trace a python int as i64, which Mosaic rejects)
            up_ids = pltpu.roll(ids_s[:], jnp.int32(n_max - 1), 0)
            up_pos = pltpu.roll(pos_s[:], jnp.int32(n_max - 1), 0)
            move = (rows_sym >= idx) & active
            ids_s[:] = jnp.where(move, up_ids, ids_s[:])
            pos_s[:] = jnp.where(move, up_pos, pos_s[:])
            order_out[pl.ds(i, 1), :] = jnp.where(active, pos,
                                                  jnp.zeros_like(pos))

            # ---- codec_push(symbol, precision): slices LOW first ----------
            # (codec.cpp:92-105; p = 0 slices are exact no-ops)
            for lower in (0, 16):
                p = jnp.clip(prec - lower, jnp.int32(0), jnp.int32(16))
                s = _srl(symbol, lower) & 0xFFFF
                # spill when hi >=u (2^31 >> p)
                t = _srl(jnp.full_like(hi, _RANS_L_I32), p)
                do = (p > 0) & active
                spill2 = _ult(t - 1, hi) & do
                ptr, err = push_word(ptr, lo, spill2, err)
                lo2 = jnp.where(spill2, hi, lo)
                hi2 = jnp.where(spill2, jnp.int32(0), hi)
                # head = (head << p) + s
                new_hi = _sll(hi2, p) | jnp.where(
                    p == 0, jnp.int32(0), _srl(lo2, (32 - p) & 31))
                new_lo = _sll(lo2, p) + s
                hi = jnp.where(do, new_hi, hi)
                lo = jnp.where(do, new_lo, lo)

            return hi, lo, ptr, minptr, err

        hi0 = jnp.zeros((1, B), jnp.int32)
        lo0 = jnp.full((1, B), _RANS_L_I32, jnp.int32)  # head = 2^31
        ptr0 = jnp.full((1, B), POOL_ROWS, jnp.int32)
        err0 = jnp.zeros((1, B), jnp.int32)
        hi, lo, ptr, minptr, err = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n_max), body,
            (hi0, lo0, ptr0, ptr0, err0))
        hi_out[:] = hi
        lo_out[:] = lo
        ptr_out[:] = ptr
        minptr_out[:] = minptr
        err_out[:] = err

    return kernel


@partial(jax.jit, static_argnums=(4, 5, 6))
def _encode_call(ids, pool, lens, prec, n_max, capp, interpret):
    B = ids.shape[1]
    lane_block = next(
        (lb for lb in (1024, 512, 256, 128)
         if B % lb == 0 and _lane_bytes(n_max, capp) * lb <= _VMEM_BUDGET),
        None,
    )
    if lane_block is None:  # guarded by RocPallasEncoder.supports
        raise ValueError(
            f"bucket (n_max={n_max}, capp={capp}) exceeds the Pallas encode "
            "VMEM envelope at the smallest lane block")
    grid = B // lane_block
    kernel = _encode_kernel(n_max, capp)
    specs_col = lambda shape0: pl.BlockSpec(
        (shape0, lane_block), lambda g: (g - g, g), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[specs_col(n_max), specs_col(POOL_ROWS), specs_col(1),
                  specs_col(1)],
        out_specs=[specs_col(capp)] + [specs_col(1)] * 5 + [specs_col(n_max)],
        out_shape=[
            jax.ShapeDtypeStruct((capp, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((n_max, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_max, lane_block), jnp.int32),
            pltpu.VMEM((n_max, lane_block), jnp.int32),
        ],
        interpret=interpret,
    )(ids, pool, lens, prec)


@partial(jax.jit, static_argnums=(3, 4, 5))
def _encode_full(sorted_ids, lengths, precision, n_max, capp, interpret,
                 pool):
    """All-device encode: returns (head u64[B], stack u32[B, cap], stack_len,
    mt_ctr, err, order i32[B, n_max])."""
    B = sorted_ids.shape[0]
    ids_cols = jax.lax.bitcast_convert_type(
        sorted_ids.astype(jnp.uint32), jnp.int32).T        # [n_max, B]
    pool_rows = jax.lax.bitcast_convert_type(
        pool[:POOL_ROWS][::-1], jnp.int32)                 # draw d at row -1-d
    pool_cols = jnp.broadcast_to(pool_rows[:, None], (POOL_ROWS, B))
    lens = lengths.astype(jnp.int32)[None, :]
    prec = precision.astype(jnp.int32)[None, :]

    buf, hi, lo, ptr, minptr, err, order = _encode_call(
        ids_cols, pool_cols, lens, prec, n_max, capp, interpret)

    hi_u = jax.lax.bitcast_convert_type(hi[0], jnp.uint32).astype(jnp.uint64)
    lo_u = jax.lax.bitcast_convert_type(lo[0], jnp.uint32).astype(jnp.uint64)
    head = (hi_u << jnp.uint64(32)) | lo_u
    stack_len = (ptr - minptr)[0]
    mt_ctr = (POOL_ROWS - minptr)[0]
    # align each lane's stack rows [minptr, ptr) to start at 0
    buf_u = jax.lax.bitcast_convert_type(buf.T, jnp.uint32)  # [B, capp]
    j = jnp.arange(capp, dtype=jnp.int32)[None, :]
    src = jnp.minimum(minptr[0][:, None] + j, capp - 1)
    stack = jnp.take_along_axis(buf_u, src, axis=1)
    stack = jnp.where(j < stack_len[:, None], stack, jnp.uint32(0))
    err_any = (err[0] != 0)
    return head, stack, stack_len, mt_ctr, err_any, order.T


class RocPallasEncoder:
    """One-shot batched ROC encoder on TPU. Produces RocStates bit-exact with
    the host/native encoders plus the sampling-order permutation."""

    @staticmethod
    def supports(max_precision: int, n_max: int) -> bool:
        if not (max_precision <= 32 and n_max < (1 << 16)):
            return False
        # the smallest lane block (128) must fit the scoped-VMEM budget —
        # long-list buckets (n_max in the thousands) exceed it and must take
        # the native/XLA encode path instead (this gated a compile-time VMEM
        # OOM in the 1M-id IVF1024 sweep: bucket n_pad 4864 needs ~19 MB/128
        # lanes vs the ~16 MB scoped limit)
        n_pad = -(-n_max // 8) * 8
        capp = -(-(POOL_ROWS + rd.stack_capacity(n_max, max_precision)
                   + 8) // 8) * 8
        return _lane_bytes(n_pad, capp) * 128 <= _VMEM_BUDGET

    def __init__(self, n_max: int, max_precision: int):
        if not self.supports(max_precision, n_max):
            raise ValueError("pallas encode supports precision <= 32, "
                             "n_max < 2^16")
        self.n_max = -(-n_max // 8) * 8
        self.capp = -(-(POOL_ROWS + rd.stack_capacity(n_max, max_precision)
                        + 8) // 8) * 8

    def encode(self, sorted_ids, lengths, precision, interpret: bool = False):
        """sorted_ids u64[B, n_max] (ascending per lane, zero-padded),
        lengths i32[B], precision i32[B] → (RocStates, order i32[B, n_max],
        ok). B is padded to a LANE_BLOCK multiple internally."""
        sorted_ids = jnp.asarray(sorted_ids, jnp.uint64)
        B0 = sorted_ids.shape[0]
        B = -(-B0 // LANE_BLOCK) * LANE_BLOCK
        pad = B - B0
        if sorted_ids.shape[1] < self.n_max:
            sorted_ids = jnp.pad(
                sorted_ids, ((0, 0), (0, self.n_max - sorted_ids.shape[1])))
        sorted_ids = jnp.pad(sorted_ids, ((0, pad), (0, 0)))
        lengths = jnp.pad(jnp.asarray(lengths, jnp.int32), (0, pad))
        precision = jnp.pad(jnp.asarray(precision, jnp.int32), (0, pad))
        pool = jnp.asarray(rd.default_pool(POOL_ROWS), jnp.uint32)

        head, stack, stack_len, mt_ctr, err, order = _encode_full(
            sorted_ids, lengths, precision, self.n_max, self.capp,
            interpret, pool)
        states = rd.RocStates(
            head=head[:B0], stack=stack[:B0], stack_len=stack_len[:B0],
            mt_ctr=mt_ctr[:B0], err=err[:B0],
        )
        return states, order[:B0], not bool(err[:B0].any())


def roc_encode_pallas(sorted_ids, lengths, precision, interpret: bool = False):
    """Convenience wrapper: encode a [B, n_max] batch; see RocPallasEncoder."""
    lengths = np.asarray(lengths, np.int32)
    precision = np.asarray(precision, np.int32)
    n_max = int(np.asarray(sorted_ids).shape[1])
    enc = RocPallasEncoder(n_max, int(precision.max(initial=1)))
    return enc.encode(sorted_ids, lengths, precision, interpret=interpret)
