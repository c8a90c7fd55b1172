"""Ablation: which part of the ROC decode kernel costs the 90ms?

Builds modified copies of the kernel with (a) the rank scan stubbed, (b) the
pop_word buffer reduce stubbed, (c) both, and times each on the real TPU.
Results are WRONG numerically — timing only.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import vector_db_id_compression_tpu.ops.roc_pallas as rp
from vector_db_id_compression_tpu import native
from vector_db_id_compression_tpu.codecs import roc_device as rd
from vector_db_id_compression_tpu.codecs.roc import precision_for_max_id_safe


def make_workload(nlist=1024, ntotal=1 << 20, seed=7):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, nlist, size=ntotal)
    lengths = np.bincount(a, minlength=nlist).astype(np.int32)
    n_max = int(lengths.max())
    lists = [np.flatnonzero(a == ln).astype(np.uint64) for ln in range(nlist)]
    prec = np.array([precision_for_max_id_safe(int(l.max())) for l in lists],
                    np.int32)
    cap = rd.stack_capacity(n_max, int(prec.max()))
    heads, stacks, lens, _, mt = native.roc_encode_lists(lists, prec, cap=cap)
    states = rd.RocStates(jnp.asarray(heads), jnp.asarray(stacks),
                          jnp.asarray(lens), jnp.asarray(mt.astype(np.int32)),
                          jnp.zeros(nlist, bool))
    return states, lengths, prec, n_max


def timed(dec):
    ids, ok = dec.decode()
    jax.block_until_ready(ids)
    ts = []
    for _ in range(3):
        t0 = time.time()
        ids = dec.decode()[0]
        jax.block_until_ready(ids)
        ts.append(time.time() - t0)
    return min(ts)


def main():
    states, lengths, prec, n_max = make_workload()
    pool = rd.default_pool(n_max)

    base = rp.RocPallasDecoder(states, lengths, prec, pool, n_max)
    t = timed(base)
    print(f"full kernel:      {t*1e3:7.1f} ms  ({(1<<20)/t/1e6:.1f} Mids/s)",
          flush=True)

    orig_kernel = rp._decode_kernel

    def ablate(no_rank=False, no_pop=False, label=""):
        def patched(n_max_, capp, n_slices):
            k = orig_kernel(n_max_, capp, n_slices)
            # rebuild with source-level switches by shadowing inner ops is
            # impractical; instead monkeypatch the module-level helpers the
            # kernel closes over
            return k
        # source-level ablation: temporarily swap helper functions
        raise SystemExit("see inline variants below")

    # Variant kernels: copy of _decode_kernel with switches
    def make_kernel(n_max_, capp, n_slices, no_rank, no_pop):
        _ult, _srl, _sll = rp._ult, rp._srl, rp._sll
        _I32_MIN = rp._I32_MIN

        def kernel(buf_in, hi_in, lo_in, ptr_in, len_in, prec_in,
                   emit_out, hi_out, lo_out, ptr_out, err_out,
                   buf_s, syms_s):
            B = hi_in.shape[1]
            rows_buf = jax.lax.broadcasted_iota(jnp.int32, (capp, B), 0)
            rows_sym = jax.lax.broadcasted_iota(jnp.int32, (n_max_, B), 0)
            buf_s[:] = buf_in[:]
            lengths_ = len_in[:]
            prec_ = prec_in[:]

            def pop_word(ptr, take, err):
                if no_pop:
                    w = buf_s[0:1, :]
                else:
                    w = jnp.sum(
                        jnp.where(rows_buf == (ptr - 1), buf_s[:], jnp.int32(0)),
                        axis=0, keepdims=True, dtype=jnp.int32)
                err = err | (take & (ptr <= 0)).astype(jnp.int32)
                return w, ptr - take.astype(jnp.int32), err

            def body(i, carry):
                hi, lo, ptr, err = carry
                active = i < lengths_
                symbol = jnp.zeros_like(lo)
                for si in range(n_slices - 1, -1, -1):
                    lower = 16 * si
                    p = jnp.clip(prec_ - lower, jnp.int32(0), jnp.int32(16))
                    mask = _sll(jnp.int32(1), p) - 1
                    cfs = lo & mask
                    lo1 = jnp.where(p == 0, lo,
                                    _srl(lo, p) | _sll(hi & mask, (32 - p) & 31))
                    hi1 = _srl(hi, p)
                    refill = (hi1 == 0) & (lo1 >= 0) & active
                    w, ptr, err = pop_word(ptr, refill, err)
                    hi = jnp.where(active, jnp.where(refill, lo1, hi1), hi)
                    lo = jnp.where(active, jnp.where(refill, w, lo1), lo)
                    symbol = jnp.where(active, _sll(symbol, 16) | cfs, symbol)

                if no_rank:
                    rank = jnp.zeros_like(symbol)
                else:
                    smaller = (rows_sym < i) & _ult(syms_s[:], symbol)
                    rank = jnp.sum(smaller, axis=0, keepdims=True,
                                   dtype=jnp.int32)
                syms_s[pl.ds(i, 1), :] = symbol

                nm = i + 1
                a = jnp.int32(1 << 30)
                q30, r30 = a // nm, a % nm
                q32 = 2 * q30 + (2 * r30) // nm
                spill = (hi >= q32) & active
                buf_s[:] = jnp.where((rows_buf == ptr) & spill, lo, buf_s[:])
                err = err | (spill & (ptr >= capp)).astype(jnp.int32)
                ptr = ptr + spill.astype(jnp.int32)
                lo0 = jnp.where(spill, hi, lo)
                hi0 = jnp.where(spill, jnp.int32(0), hi)
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
                emit_out[pl.ds(i, 1), :] = jnp.where(active, symbol,
                                                     jnp.zeros_like(symbol))
                return hi, lo, ptr, err

            hi0 = hi_in[:]
            lo0 = lo_in[:]
            ptr0 = ptr_in[:]
            err0 = jnp.zeros(ptr0.shape, dtype=jnp.int32)
            emit_out[:] = jnp.zeros((n_max_, B), jnp.int32)
            hi, lo, ptr, err = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(n_max_), body, (hi0, lo0, ptr0, err0))
            hi_out[:] = hi
            lo_out[:] = lo
            ptr_out[:] = ptr
            err_out[:] = err

        return kernel

    for no_rank, no_pop, label in [(True, False, "no rank scan"),
                                   (False, True, "no pop reduce"),
                                   (True, True, "neither")]:
        def patched(n_max_, capp, n_slices, nr=no_rank, npo=no_pop):
            return make_kernel(n_max_, capp, n_slices, nr, npo)

        rp._decode_kernel = patched
        rp._decode_call.clear_cache()
        rp._prepare_and_decode.clear_cache()
        dec = rp.RocPallasDecoder(states, lengths, prec, pool, n_max)
        t = timed(dec)
        print(f"{label:16s}: {t*1e3:7.1f} ms", flush=True)
    rp._decode_kernel = orig_kernel


if __name__ == "__main__":
    main()
