"""QINCo-style neural residual quantizer (flax), the flagship model.

The reference's large-scale pipeline (search_ivf_qinco.py:185-315) loads a
pretrained *torch* QINCo model and uses it only to decode shortlist codes for
neural re-ranking after deferred-ID-decoding search. This module provides the
TPU-native equivalent: an implicit neural codebook residual quantizer
(QINCo-family: each step's codebook is conditioned on the prefix
reconstruction through a small MLP), with

  - ``decode``: codes u8/i32[B, M] -> reconstruction f32[B, d] — the op the
    search pipeline calls on shortlists (search_ivf_qinco.py:282-287);
  - ``encode``: greedy per-step argmin over adapted codebooks;
  - ``make_train_step``: full jittable training step (reconstruction loss
    through all quantization steps, straight-through codeword selection,
    adam) designed to shard as dp over batch x tp over the hidden dimension.

Everything is dense batched matmul ([B, ksub, *] x [*, hidden]) — MXU food.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


class QincoStep(nn.Module):
    """One residual step: codebook adapted by conditioning on x_hat."""

    d: int
    ksub: int
    hidden: int

    @nn.compact
    def __call__(self, x_hat: jax.Array) -> jax.Array:
        """x_hat [B, d] -> adapted codebook [B, ksub, d]."""
        # dtype pinned: x64 mode is enabled package-wide for the codec layer,
        # but the model must stay f32 (TPU MXU path)
        base = self.param(
            "codebook", nn.initializers.normal(0.02), (self.ksub, self.d),
            jnp.float32,
        )
        B = x_hat.shape[0]
        cond = jnp.broadcast_to(x_hat[:, None, :], (B, self.ksub, self.d))
        h = jnp.concatenate(
            [jnp.broadcast_to(base[None], (B, self.ksub, self.d)), cond], axis=-1
        )
        h = nn.Dense(self.hidden, name="adapt_in")(h)
        h = nn.relu(h)
        delta = nn.Dense(self.d, name="adapt_out")(h)
        return base[None] + delta


class Qinco(nn.Module):
    """M-step residual quantizer with implicit neural codebooks."""

    d: int
    M: int
    ksub: int = 256
    hidden: int = 256

    def setup(self):
        self.steps = [
            QincoStep(self.d, self.ksub, self.hidden, name=f"step{m}")
            for m in range(self.M)
        ]

    def decode(self, codes: jax.Array) -> jax.Array:
        """codes i32[B, M] -> x_hat f32[B, d]."""
        B = codes.shape[0]
        x_hat = jnp.zeros((B, self.d), dtype=jnp.float32)
        for m in range(self.M):
            cb = self.steps[m](x_hat)                       # [B, ksub, d]
            sel = jnp.take_along_axis(
                cb, codes[:, m][:, None, None].astype(jnp.int32), axis=1
            )[:, 0]
            x_hat = x_hat + sel
        return x_hat

    def encode(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """x [B, d] -> (codes i32[B, M], x_hat f32[B, d]), greedy argmin."""
        B = x.shape[0]
        x_hat = jnp.zeros_like(x)
        codes = []
        for m in range(self.M):
            cb = self.steps[m](x_hat)
            r = x - x_hat
            d2 = jnp.sum((cb - r[:, None, :]) ** 2, axis=-1)  # [B, ksub]
            c = jnp.argmin(d2, axis=-1).astype(jnp.int32)
            sel = jnp.take_along_axis(cb, c[:, None, None], axis=1)[:, 0]
            x_hat = x_hat + sel
            codes.append(c)
        return jnp.stack(codes, axis=1), x_hat

    def __call__(self, x: jax.Array) -> jax.Array:
        """Training forward: total reconstruction loss across steps (deep
        supervision on every prefix, straight-through selection)."""
        x_hat = jnp.zeros_like(x)
        loss = 0.0
        for m in range(self.M):
            cb = self.steps[m](x_hat)
            r = x - x_hat
            d2 = jnp.sum((cb - r[:, None, :]) ** 2, axis=-1)
            c = jnp.argmin(jax.lax.stop_gradient(d2), axis=-1)
            sel = jnp.take_along_axis(cb, c[:, None, None], axis=1)[:, 0]
            x_hat = x_hat + sel
            loss = loss + jnp.mean(jnp.sum((x - x_hat) ** 2, axis=-1))
        return loss / self.M


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_train_step(model: Qinco, lr: float = 1e-3):
    """Returns (init_fn, train_step). train_step is a pure jittable function
    (params/opt sharded by the caller; batch dp-sharded)."""
    tx = optax.adam(lr)

    def init_fn(rng, sample):
        params = model.init(rng, sample)
        return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    def train_step(state: TrainState, batch: jax.Array):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, batch)
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return init_fn, train_step
