"""Time-step embeddings for score networks.

Mirrors the reference's sinusoidal positional embedding
(``lib/algorithms/advanced/model.py:37-51``) and Gaussian Fourier features
(``model.py:10-21``) so converted checkpoints produce identical activations.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn


def get_timestep_embedding(timesteps: jnp.ndarray, embedding_dim: int,
                           max_positions: int = 10000) -> jnp.ndarray:
    """Sinusoidal positional embedding. ``timesteps``: [B] floats (0..999)."""
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class GaussianFourierProjection(nn.Module):
    """Gaussian random features, fixed after init (ref model.py:10-21).

    ``W`` is stored as a parameter (it appears in torch checkpoints as a
    ``requires_grad=False`` parameter named ``gauss_proj.W``); it receives no
    gradient because sin/cos of a constant input path is all the optimizer
    ever sees of it in eval, and training masks it out of the EMA like the
    reference does (EMA tracks only ``requires_grad`` params, ref ema.py:28).
    """

    embed_dim: int
    scale: float = 30.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        W = self.param("W", nn.initializers.normal(stddev=self.scale), (self.embed_dim // 2,))
        W = jnp.asarray(W, jnp.float32)
        x_proj = x[:, None] * W[None, :] * 2 * jnp.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)
