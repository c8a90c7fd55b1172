"""ROC decode as a single Pallas TPU kernel.

The XLA scan implementation (codecs.roc_device) pays ~25us of kernel overhead
per element step regardless of op size; this kernel keeps all codec state
resident in VMEM and runs the whole sequential chain in one `fori_loop`, so a
step costs actual VPU cycles (~100-1000x less). Bit-exact with the scan path
and therefore with the C++ reference (verified in tests via interpret mode and
against the host oracle).

Restrictions (callers fall back to codecs.roc_device otherwise):
  - symbol precision <= 32 bits (ids < 2^32 — true for every published
    workload incl. BigANN1B);
  - list length < 2^16 per bucket (the in-kernel 64x16-bit multiply bound).

Layout: everything transposed to [columns, lanes] with lanes minor (Mosaic
requires 128-aligned dynamic indexing only on the minor dim; our dynamic
element index then lives on the sublane axis where uniform-row writes are
native). The 64-bit rANS head is an (hi, lo) i32 pair with unsigned semantics
by construction: hi < 2^31 always (head < 2^63), lo uses xor/logical-shift
tricks. The MT19937 initial-bits pool is pre-composed *below* the stack in
one buffer, so "stack empty -> draw from mt" (reference codec.h:32-40) is the
same pop instruction reading below the stack base.

Per element step (inverse of reference codec.cpp:140-152):
  codec_pop (two 16-bit slices, high first)  -> symbol
  rank = #smaller among previously inserted  (one masked compare+reduce)
  push_with_finer_precision(rank, i+1)       (scalar modulus per step)
"""

from __future__ import annotations

import sys
from functools import partial

# Mosaic lowering of pallas_call nested under jit recurses deeply
if sys.getrecursionlimit() < 100_000:
    sys.setrecursionlimit(100_000)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codecs import roc_device as rd

LANE_BLOCK = 256

# scoped-VMEM headroom for one grid step (the hardware limit is ~16 MiB;
# Mosaic double-buffers grid blocks, so in/out block bytes count twice)
_VMEM_BUDGET = 14 * 2 ** 20


def _dec_lane_bytes(n_max: int, capp: int) -> int:
    """Per-lane scoped-VMEM bytes of one decode grid step.

    Measured (1M-scale fused-search OOM, n_max_pad=3568, capp=1120,
    lane_block=256): scoped allocation 16.23 MiB = 63.4 KiB/lane — in/out
    double-buffered PLUS the scratch copies, i.e. ~(3·capp + 3·n_max)
    words, not the (2·capp + 2·n_max) the old model assumed. Budget with
    a margin above the observed coefficient (the symbol scratch is padded
    to a RANK_BLOCK multiple — _syms_rows)."""
    return (4 * capp + 2 * n_max + _syms_rows(n_max) + 64) * 4
POOL_ROWS = 32  # decode rarely draws initial bits; err flag + fallback if exceeded

_I32_MIN = -2147483648  # python int: weak-typed, avoids device-const capture


def _ult(a, b):
    """Unsigned 32-bit a < b on i32 carriers."""
    return (a ^ _I32_MIN) < (b ^ _I32_MIN)


def _srl(x, p):
    return jax.lax.shift_right_logical(x, jnp.asarray(p, jnp.int32))


def _sll(x, p):
    return jax.lax.shift_left(x, jnp.asarray(p, jnp.int32))


RANK_BLOCK = 512  # rows per blocked-rank step (see _decode_kernel)


def _syms_rows(n_max: int) -> int:
    """Symbol-scratch rows: n_max padded to a RANK_BLOCK multiple so the
    blocked rank pass's pl.ds windows never run off the buffer (Pallas
    clamps out-of-bounds dynamic slices, which would misalign the rows)."""
    rb = min(RANK_BLOCK, n_max)
    return -(-n_max // rb) * rb


def _decode_kernel(n_max: int, capp: int, n_slices: int,
                   emit_rev: bool = False, S: int = 1):
    """Returns the kernel fn for given static shapes.

    ``emit_rev=False``: emit each symbol at its final decode position
    ``length-1-i`` (a masked full-buffer pass per step — right for
    callers that consume the whole output, e.g. the standalone decoder,
    where it replaces an expensive post-kernel un-reversal gather).
    ``emit_rev=True``: emit at row ``i`` (one uniform-row write — O(1)
    instead of O(n_max) traffic per step); the output holds decode-
    iteration order, i.e. REVERSED sampling order, and callers that
    random-access element ``j`` of a lane read row ``length-1-j``. Right
    for in-program translate stages that gather only a few elements.

    ``S > 1``: CHAINED decode (store.graph RocBlockGraph format) — per
    lane, S multisets threaded through one ANS state, slot 0 first; the
    per-slot lengths/precisions arrive as [S, B] rows and slot s's output
    occupies emit rows [s*n_max, (s+1)*n_max). S=1 is the plain format.

    Two more traffic bounds (all modes):
      - each slot's step loop runs to ``max(lengths in this grid block)``,
        not n_max — lanes sorted/bucketed by length make blocks stop early;
      - the rank pass reads only ceil(i/RANK_BLOCK) row blocks of the
        symbol scratch (previous insertions live in rows < i), turning
        the O(n_max) compare into O(i). (The scratch is shared across
        slots without clearing: step i reads rows < i, which the current
        slot has already overwritten.)
    """

    def kernel(buf_in, hi_in, lo_in, ptr_in, len_in, prec_in,
               emit_out, hi_out, lo_out, ptr_out, err_out,
               buf_s, syms_s):
        B = hi_in.shape[1]
        rows_buf = jax.lax.broadcasted_iota(jnp.int32, (capp, B), 0)
        rows_sym = jax.lax.broadcasted_iota(jnp.int32, (S * n_max, B), 0)
        RB = min(RANK_BLOCK, n_max)
        rows_rb = jax.lax.broadcasted_iota(jnp.int32, (RB, B), 0)
        buf_s[:] = buf_in[:]

        def pop_word(ptr, take, err):
            """One 32-bit refill word per lane from the unified stack+pool
            buffer; decrements ptr where taken."""
            w = jnp.sum(
                jnp.where(rows_buf == (ptr - 1), buf_s[:], jnp.int32(0)),
                axis=0, keepdims=True, dtype=jnp.int32,
            )
            err = err | (take & (ptr <= 0)).astype(jnp.int32)
            return w, ptr - take.astype(jnp.int32), err

        def slot_body(s, lengths, prec):
            """Per-step decode body for chained slot s (static)."""

            def body(i, carry):
                hi, lo, ptr, err = carry
                active = i < lengths

                # ---- codec_pop: slices high -> low (codec.cpp:107-121) ---
                symbol = jnp.zeros_like(lo)
                for si in range(n_slices - 1, -1, -1):
                    lower = 16 * si
                    p = jnp.clip(prec - lower, jnp.int32(0), jnp.int32(16))
                    mask = _sll(jnp.int32(1), p) - 1
                    cfs = lo & mask
                    lo1 = jnp.where(
                        p == 0, lo,
                        _srl(lo, p) | _sll(hi & mask, (32 - p) & 31)
                    )
                    hi1 = _srl(hi, p)
                    refill = (hi1 == 0) & (lo1 >= 0) & active
                    w, ptr, err = pop_word(ptr, refill, err)
                    hi2 = jnp.where(refill, lo1, hi1)
                    lo2 = jnp.where(refill, w, lo1)
                    hi = jnp.where(active, hi2, hi)
                    lo = jnp.where(active, lo2, lo)
                    symbol = jnp.where(active, _sll(symbol, 16) | cfs,
                                       symbol)

                # ---- insert + rank (count strictly smaller already
                # inserted; blocked: previous insertions live in rows < i) -
                def rank_blk(b, acc):
                    blk = syms_s[pl.ds(b * RB, RB), :]
                    sm = ((rows_rb + b * RB) < i) & _ult(blk, symbol)
                    return acc + jnp.sum(sm, axis=0, keepdims=True,
                                         dtype=jnp.int32)

                # i32 divisor: a bare python RB becomes a weak i64 under
                # x64 and floor_divide's internal i64->i32 convert is
                # unlowerable in Mosaic (infinite _convert_helper recursion)
                rank = jax.lax.fori_loop(
                    jnp.int32(0),
                    jax.lax.div(i + RB - 1, jnp.int32(RB)), rank_blk,
                    jnp.zeros_like(lo))
                syms_s[pl.ds(i, 1), :] = symbol

                # ---- push_with_finer_precision(rank, i+1)
                # (codec.cpp:44-63) --
                nm = i + 1  # scalar modulus
                # q32 = floor(2^31 / nm) without i32 overflow: via 2^30
                a = jnp.int32(1 << 30)
                q30, r30 = a // nm, a % nm
                q32 = 2 * q30 + (2 * r30) // nm
                spill = (hi >= q32) & active
                # write lo at ptr (visible to the refill below via buf_s)
                buf_s[:] = jnp.where((rows_buf == ptr) & spill, lo, buf_s[:])
                err = err | (spill & (ptr >= capp)).astype(jnp.int32)
                ptr = ptr + spill.astype(jnp.int32)
                lo0 = jnp.where(spill, hi, lo)
                hi0 = jnp.where(spill, jnp.int32(0), hi)
                # head = head0 * nm + rank   (nm < 2^16)
                p0 = (lo0 & 0xFFFF) * nm
                p1 = _srl(lo0, 16) * nm
                t = _srl(p0, 16) + p1
                new_lo = (p0 & 0xFFFF) | _sll(t, 16)
                carry_hi = _srl(t, 16)
                new_hi = hi0 * nm + carry_hi
                lo_r = new_lo + rank
                new_hi = new_hi + _ult(lo_r, new_lo).astype(jnp.int32)
                refill2 = (new_hi == 0) & (lo_r >= 0) & active
                w2, ptr, err = pop_word(ptr, refill2, err)
                hi = jnp.where(active, jnp.where(refill2, lo_r, new_hi), hi)
                lo = jnp.where(active, jnp.where(refill2, w2, lo_r), lo)

                if emit_rev:
                    # decode-iteration order: one uniform-row write (callers
                    # random-access element j of a lane at row length-1-j)
                    emit_out[pl.ds(s * n_max + i, 1), :] = jnp.where(
                        active, symbol, jnp.int32(0))
                else:
                    # emit straight at the final decode position n-1-i
                    # (per-lane row, so a masked full-buffer write — right
                    # when the whole output is consumed: it replaces the
                    # expensive post-kernel un-reversal gather)
                    emit_out[:] = jnp.where(
                        (rows_sym == (s * n_max + lengths - 1 - i)) & active,
                        symbol, emit_out[:]
                    )
                return hi, lo, ptr, err

            return body

        hi0 = hi_in[:]
        lo0 = lo_in[:]
        ptr0 = ptr_in[:]
        err0 = jnp.zeros(ptr0.shape, dtype=jnp.int32)
        emit_out[:] = jnp.zeros((S * n_max, B), jnp.int32)
        carry = (hi0, lo0, ptr0, err0)
        for s in range(S):  # chained slots thread the state, slot 0 first
            lengths = len_in[s:s + 1, :]
            prec = prec_in[s:s + 1, :]
            # i32 bounds keep the loop index i32 even under x64 mode
            # (Mosaic's 64-bit conversion lowering is pathological). The
            # bound is this grid block's max length — lanes sorted/bucketed
            # by length make most blocks stop far before n_max.
            n_steps = jnp.minimum(jnp.max(lengths), jnp.int32(n_max))
            carry = jax.lax.fori_loop(
                jnp.int32(0), n_steps, slot_body(s, lengths, prec), carry
            )
        hi, lo, ptr, err = carry
        hi_out[:] = hi
        lo_out[:] = lo
        ptr_out[:] = ptr
        err_out[:] = err

    return kernel


def _pad_to(x: np.ndarray, axis: int, size: int, fill=0):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, size - x.shape[axis])
    return np.pad(x, pad, constant_values=fill)


@partial(jax.jit, static_argnums=(4, 5, 6, 9, 10, 11, 12))
def _decode_call(buf, hi, lo, ptr, n_max, capp, n_slices,
                 lengths, precision, interpret=False,
                 lane_block=LANE_BLOCK, emit_rev=False, S=1):
    """``S``: chained slots per lane (lengths/precision are [S, B]; the
    emit output is [S*n_max, B], slot s at rows [s*n_max, (s+1)*n_max))."""
    B = buf.shape[1]
    grid = B // lane_block
    kernel = _decode_kernel(n_max, capp, n_slices, emit_rev, S)
    # note: the row index must match the loop-index dtype (i32) — a python 0
    # literal becomes i64 under x64 mode and Mosaic rejects the mixed return
    specs_col = lambda shape0: pl.BlockSpec(
        (shape0, lane_block), lambda g: (g - g, g), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            specs_col(capp), specs_col(1), specs_col(1), specs_col(1),
            specs_col(S), specs_col(S),
        ],
        out_specs=[
            specs_col(S * n_max), specs_col(1), specs_col(1), specs_col(1),
            specs_col(1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S * n_max, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((capp, lane_block), jnp.int32),
            pltpu.VMEM((_syms_rows(n_max), lane_block), jnp.int32),
        ],
        interpret=interpret,
    )(buf, hi, lo, ptr, lengths, precision)
    return out


@partial(jax.jit, static_argnums=(6, 7))
def _prepare_inputs(stack, stack_len, mt_ctr, head, lengths, precision,
                    n_max, capp, pool):
    """One-time (per decoder) composition of the kernel's device inputs:
    unified pool+stack buffer transposed to [capp, B], split head, pointers.
    Inputs are lane-major (B first); B must be a multiple of LANE_BLOCK."""
    B, cap = stack.shape
    # pool prefix, reversed, starting at each lane's mt_ctr
    draw_idx = mt_ctr[:, None] + (POOL_ROWS - 1 - jnp.arange(POOL_ROWS))[None, :]
    pool_ok = jnp.all(draw_idx < pool.shape[0])
    pool_part = pool[jnp.minimum(draw_idx, pool.shape[0] - 1)]  # [B, POOL_ROWS]
    # capp is sized from max(stack_len), not encode capacity — decode only
    # drains the stack (net), so rows beyond it are never touched and a
    # smaller buffer shrinks the per-step spill read-modify-write
    rows = capp - POOL_ROWS
    stack_part = (stack[:, :rows] if rows <= cap else jnp.concatenate(
        [stack, jnp.zeros((B, rows - cap), jnp.uint32)], axis=1))
    buf = jnp.concatenate([pool_part, stack_part], axis=1)
    buf = jax.lax.bitcast_convert_type(buf, jnp.int32).T
    ptr0 = (POOL_ROWS + stack_len).astype(jnp.int32)[None, :]
    hi = jax.lax.bitcast_convert_type(
        (head >> jnp.uint64(32)).astype(jnp.uint32), jnp.int32)[None, :]
    lo = jax.lax.bitcast_convert_type(
        (head & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), jnp.int32)[None, :]
    lens = lengths.astype(jnp.int32)[None, :]
    prec = precision.astype(jnp.int32)[None, :]
    return buf, hi, lo, ptr0, lens, prec, pool_ok


@partial(jax.jit, static_argnums=(6, 7, 8, 10))
def _run_decode(buf, hi, lo, ptr0, lens, prec, n_max, capp, interpret,
                pool_ok, emit_rev=False):
    """Slim per-call path: kernel + validity mask. Returns ids as u32 — the
    kernel supports precision <= 32, so ids always fit (halves the
    device-to-host bytes on the axon tunnel). With ``emit_rev`` the row
    order of each lane is decode-iteration order (element j of a lane
    lives at row length-1-j) — see _decode_kernel."""
    B = buf.shape[1]
    # widest lane block that divides B AND fits the scoped-VMEM budget
    # (in buf [capp] + out emit [n_max], double-buffered, + scratch rows)
    # per-lane scoped bytes: in buf [capp] + out emit [n_max], each
    # double-buffered across grid steps, + scratch (capp + n_max rows)
    lane_block = next(
        (lb for lb in (1024, 512, 256, 128)
         if B % lb == 0 and _dec_lane_bytes(n_max, capp) * lb
         <= _VMEM_BUDGET),
        None,
    )
    if lane_block is None:  # guarded by RocPallasDecoder.supports/__init__
        raise ValueError(
            f"bucket (n_max={n_max}, capp={capp}) exceeds the Pallas decode "
            "VMEM envelope at the smallest lane block")
    emit, hi_f, lo_f, ptr_f, err = _decode_call(
        buf, hi, lo, ptr0, n_max, capp, 2, lens, prec, interpret, lane_block,
        emit_rev
    )
    emit_u = jax.lax.bitcast_convert_type(emit.T, jnp.uint32)
    j = jnp.arange(n_max, dtype=jnp.int32)[None, :]
    ids = jnp.where(j < lens.reshape(-1)[:, None], emit_u, jnp.uint32(0))
    err_any = jnp.any(err != 0) | ~pool_ok
    return ids, err_any


def _chain_lane_bytes(n_max: int, capp: int, S: int) -> int:
    """Per-lane scoped-VMEM bytes of one CHAINED decode grid step (same
    coefficient model as _dec_lane_bytes with the S*n_max emit)."""
    return (4 * capp + 2 * S * n_max + _syms_rows(n_max) + 64) * 4


@partial(jax.jit, static_argnums=(6, 7, 8, 9))
def _run_decode_chained(buf, hi, lo, ptr0, lens, prec, n_max, capp, S,
                        interpret, pool_ok):
    """Chained (RocBlockGraph-format) decode: lens/prec are [S, B] i32 —
    slot s of lane b holds lens[s, b] symbols. Returns (ids u32[B, S,
    n_max] in per-slot encode sampling order, err_any)."""
    B = buf.shape[1]
    lane_block = next(
        (lb for lb in (1024, 512, 256, 128)
         if B % lb == 0 and _chain_lane_bytes(n_max, capp, S) * lb
         <= _VMEM_BUDGET),
        None,
    )
    if lane_block is None:
        raise ValueError(
            f"chained block (n_max={n_max}, S={S}, capp={capp}) exceeds the "
            "Pallas decode VMEM envelope at the smallest lane block")
    emit, hi_f, lo_f, ptr_f, err = _decode_call(
        buf, hi, lo, ptr0, n_max, capp, 2, lens, prec, interpret, lane_block,
        False, S
    )
    emit_u = jax.lax.bitcast_convert_type(emit.T, jnp.uint32)
    emit_u = emit_u.reshape(B, S, n_max)
    j = jnp.arange(n_max, dtype=jnp.int32)[None, None, :]
    ids = jnp.where(j < lens.T[:, :, None], emit_u, jnp.uint32(0))
    err_any = jnp.any(err != 0) | ~pool_ok
    return ids, err_any


def _prepare_and_decode(stack, stack_len, mt_ctr, head, lengths, precision,
                        n_max, capp, interpret, pool):
    """Compatibility one-shot wrapper (prep + decode in one call)."""
    buf, hi, lo, ptr0, lens, prec, ok = _prepare_inputs(
        stack, stack_len, mt_ctr, head, lengths, precision, n_max, capp, pool)
    return _run_decode(buf, hi, lo, ptr0, lens, prec, n_max, capp, interpret,
                       ok)


class RocPallasDecoder:
    """Prepared, device-resident ROC decoder over a lane batch.

    Build once per container bucket; ``decode()`` and ``decode_lanes()`` are
    thin all-device calls. Falls back signaled via ok=False (pool underflow /
    capacity edge cases) — callers then use codecs.roc_device."""

    @staticmethod
    def supports(max_precision: int, n_max: int) -> bool:
        return max_precision <= 32 and n_max < (1 << 16)

    def __init__(self, states: rd.RocStates, lengths, precision, pool,
                 n_max: int, capp: int | None = None):
        """``capp`` optionally pins the kernel stack-buffer height (rows)
        instead of deriving it from max(stack_len) — multi-process builds
        pass the GLOBAL maximum so every process compiles the same kernel
        shape over its local lanes."""
        lengths = np.asarray(lengths, dtype=np.int32)
        precision = np.asarray(precision, dtype=np.int32)
        if not self.supports(int(precision.max(initial=0)), n_max):
            raise ValueError("pallas decode supports precision <= 32, n_max < 2^16")
        self.B0 = lengths.shape[0]
        B = -(-self.B0 // LANE_BLOCK) * LANE_BLOCK
        pad = B - self.B0
        self._stack = jnp.pad(states.stack, ((0, pad), (0, 0)))
        self._stack_len = jnp.pad(states.stack_len, (0, pad))
        self._mt_ctr = jnp.pad(states.mt_ctr, (0, pad))
        self._head = jnp.pad(states.head, (0, pad),
                             constant_values=np.uint64(1 << 31))
        self._lengths = jnp.asarray(np.pad(lengths, (0, pad)))
        self._prec = jnp.asarray(np.pad(precision, (0, pad)))
        self._pool = jnp.asarray(pool, dtype=jnp.uint32)
        self.n_max = n_max
        # decode never grows the stack past its initial height (+1 transient
        # word per step before the matching refill) — size the kernel buffer
        # from the actual max stack height, not the encode-side capacity
        max_len = (int(np.max(np.asarray(states.stack_len), initial=0))
                   if capp is None else capp)
        self._capp = -(-(POOL_ROWS + max_len + 8) // 8) * 8
        self._n_max_pad = -(-n_max // 8) * 8
        if _dec_lane_bytes(self._n_max_pad, self._capp) * 128 > _VMEM_BUDGET:
            raise ValueError(
                f"bucket (n_max={n_max}, capp={self._capp}) exceeds the "
                "Pallas decode VMEM envelope — use the XLA scan path")
        # compose the kernel inputs ONCE — decode() is then just the kernel,
        # with no per-call prep on the device
        (self._buf, self._hi, self._lo, self._ptr0, self._lens,
         self._prec_row, self._pool_ok) = _prepare_inputs(
            self._stack, self._stack_len, self._mt_ctr, self._head,
            self._lengths, self._prec, self._n_max_pad, self._capp,
            self._pool,
        )

    def decode(self, interpret: bool = False):
        """→ (ids u32[B0, n_max] device array, ok bool). IDs fit in u32 by
        the kernel's precision<=32 contract; callers widen as needed."""
        ids, err = _run_decode(
            self._buf, self._hi, self._lo, self._ptr0, self._lens,
            self._prec_row, self._n_max_pad, self._capp, interpret,
            self._pool_ok,
        )
        return ids[: self.B0, : self.n_max], not bool(err)

    def decode_lanes(self, lane_idx: np.ndarray, interpret: bool = False,
                     check: bool = True):
        """Decode a subset of lanes (padded to a LANE_BLOCK multiple).

        ``check=False`` skips the err-flag pull: ``bool(err)`` is a host
        sync that serializes every caller-side bucket chain on the device
        link. Per-lane decode is deterministic, so a caller that validated
        one clean full decode() may trust every subset decode and keep the
        pipeline async (ids are still lazy device values)."""
        q0 = len(lane_idx)
        Q = -(-q0 // LANE_BLOCK) * LANE_BLOCK
        idx = jnp.asarray(
            np.pad(np.asarray(lane_idx, np.int64), (0, Q - q0)), jnp.int32
        )
        ids, err = _run_decode(
            self._buf[:, idx], self._hi[:, idx], self._lo[:, idx],
            self._ptr0[:, idx], self._lens[:, idx], self._prec_row[:, idx],
            self._n_max_pad, self._capp, interpret, self._pool_ok,
        )
        return ids[:q0, : self.n_max], (not bool(err)) if check else True


    def decode_lanes_traced(self, idx, interpret: bool = False):
        """Jittable subset decode: ``idx`` i32[Q] (traced OK; Q static and
        a multiple of 128). Returns ids u32[Q, n_max] in encode sampling
        order. No err pull — callers validate one full decode() at build
        time (per-lane decode is deterministic)."""
        idx = idx.astype(jnp.int32)
        ids, _ = _run_decode(
            self._buf[:, idx], self._hi[:, idx], self._lo[:, idx],
            self._ptr0[:, idx], self._lens[:, idx], self._prec_row[:, idx],
            self._n_max_pad, self._capp, interpret, jnp.asarray(True),
        )
        return ids[:, : self.n_max]


class RocChainedPallasDecoder:
    """Prepared device-resident decoder for CHAINED block states
    (store.graph RocBlockGraph: S multisets threaded through one ANS state
    per lane). Build once per container; ``decode_lanes_traced`` runs the
    whole chain for a gathered lane subset inside a jitted program — the
    in-traversal fetch path of search.graph_device."""

    def __init__(self, states: rd.RocStates, degs, prec, pool, K: int):
        degs = np.asarray(degs, dtype=np.int32)        # [L, S]
        prec = np.asarray(prec, dtype=np.int32)        # [L, S]
        L, S = degs.shape
        if not RocPallasDecoder.supports(int(prec.max(initial=1)), K):
            raise ValueError("pallas decode supports precision <= 32, "
                             "n_max < 2^16")
        self.S, self.K = S, K
        self.L0 = L
        B = -(-L // LANE_BLOCK) * LANE_BLOCK
        pad = B - L
        stack = jnp.pad(jnp.asarray(states.stack), ((0, pad), (0, 0)))
        stack_len = jnp.pad(jnp.asarray(states.stack_len), (0, pad))
        mt_ctr = jnp.pad(jnp.asarray(states.mt_ctr), (0, pad))
        head = jnp.pad(jnp.asarray(states.head), (0, pad),
                       constant_values=np.uint64(1 << 31))
        max_len = int(np.max(np.asarray(states.stack_len), initial=0))
        self._capp = -(-(POOL_ROWS + max_len + 8) // 8) * 8
        self._n_max_pad = -(-K // 8) * 8
        if _chain_lane_bytes(self._n_max_pad, self._capp, S) * 128 \
                > _VMEM_BUDGET:
            raise ValueError("chained block exceeds the Pallas decode VMEM "
                             "envelope — use the XLA scan path")
        dummy = jnp.zeros(B, jnp.int32)
        (self._buf, self._hi, self._lo, self._ptr0, _, _,
         self._pool_ok) = _prepare_inputs(
            stack, stack_len, mt_ctr, head, dummy, dummy,
            self._n_max_pad, self._capp, jnp.asarray(pool, jnp.uint32))
        self._lens = jnp.asarray(
            np.pad(degs, ((0, pad), (0, 0))).T.copy())   # [S, B]
        self._prec = jnp.asarray(np.pad(prec, ((0, pad), (0, 0))).T.copy())

    def decode(self, interpret: bool = False):
        """Full decode of every lane → (ids u32[L0, S, n_max], ok)."""
        ids, err = _run_decode_chained(
            self._buf, self._hi, self._lo, self._ptr0, self._lens,
            self._prec, self._n_max_pad, self._capp, self.S, interpret,
            self._pool_ok)
        return ids[: self.L0, :, : self.K], not bool(err)

    def decode_lanes_traced(self, idx, interpret: bool = False):
        """Jittable chained subset decode: ids u32[Q, S, n_max] for lane
        indices ``idx`` (Q static, multiple of 128). No err pull — callers
        validate one full decode() at build time."""
        idx = idx.astype(jnp.int32)
        ids, _ = _run_decode_chained(
            self._buf[:, idx], self._hi[:, idx], self._lo[:, idx],
            self._ptr0[:, idx], self._lens[:, idx], self._prec[:, idx],
            self._n_max_pad, self._capp, self.S, interpret,
            jnp.asarray(True))
        return ids[:, :, : self.K]


def roc_decode_pallas(states: rd.RocStates, lengths, precision, pool, n_max: int,
                      interpret: bool = False):
    """One-shot convenience wrapper (prepares and decodes). Returns numpy
    (ids u32[B, n_max] zero-padded in encode sampling order, ok) — u32 by
    the kernel's precision<=32 contract; widen before u64 arithmetic."""
    dec = RocPallasDecoder(states, lengths, precision, pool, n_max)
    ids, ok = dec.decode(interpret=interpret)
    return np.asarray(ids), ok
