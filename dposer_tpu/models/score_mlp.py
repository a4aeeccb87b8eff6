"""Score networks for flat pose vectors (flax.linen).

``ScoreModelFC`` reproduces the reference architecture exactly
(``lib/algorithms/advanced/model.py:93-196``): pre-Linear with per-layer time
injection, GroupNorm(32) + SiLU + dropout, ``n_blocks`` residual blocks of two
(Linear + time-Linear + GroupNorm + act + dropout) sub-layers with skip
``h = h + h2``, a post-Linear back to pose dim, and optional ``/sigma(t)``
output scaling from a 1000-entry geometric sigma table (ref ``model.py:24-34,
159, 192-194``). Matching topology + naming makes PyTorch checkpoint
conversion a pure name/layout map (see ``dposer_tpu.utils.checkpoint``).

TPU notes: the whole network is dense matmuls -> MXU. Time embeddings depend
only on ``t``; samplers pass a *scalar* ``t`` so the temb path is computed
once per step with batch dim 1 and broadcast against the batch (the reference
recomputes it per row).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .time_embedding import GaussianFourierProjection, get_timestep_embedding


def get_sigmas(sigma_min: float, sigma_max: float, num_scales: int) -> np.ndarray:
    """Geometric noise ladder, descending (ref model.py:24-34)."""
    return np.exp(np.linspace(math.log(sigma_max), math.log(sigma_min), num_scales)).astype(np.float32)


def get_act(name: str):
    name = name.lower()
    if name == "elu":
        return nn.elu
    if name == "relu":
        return nn.relu
    if name == "lrelu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    if name == "swish":
        return nn.silu
    raise NotImplementedError("activation function does not exist!")


class ScoreModelFC(nn.Module):
    """Flat-pose score MLP with per-block time-feature projections."""

    n_poses: int = 21
    pose_dim: int = 6
    hidden_dim: int = 1024
    embed_dim: int = 512
    n_blocks: int = 2
    dropout: float = 0.1
    act_name: str = "swish"
    embedding_type: str = "positional"  # or 'fourier'
    fourier_scale: float = 16.0
    scale_by_sigma: bool = True
    sigma_min: float = 0.01
    sigma_max: float = 50.0
    num_scales: int = 1000

    @nn.compact
    def __call__(self, batch: jnp.ndarray, t: jnp.ndarray, *,
                 train: bool = False) -> jnp.ndarray:
        """batch: [B, n_poses*pose_dim]; t: [B] or scalar "label" time.

        For VP/subVP-continuous models ``t`` is the label ``t_cont * 999``;
        for VE it is the noise sigma (positional path still indexes the sigma
        table with ``t.astype(int)``, matching ref model.py:159).
        """
        act = get_act(self.act_name)
        bs = batch.shape[0]
        t = jnp.atleast_1d(t)

        if self.embedding_type == "fourier":
            used_sigmas = t
            temb = GaussianFourierProjection(embed_dim=self.embed_dim,
                                             scale=self.fourier_scale,
                                             name="gauss_proj")(jnp.log(t))
        elif self.embedding_type == "positional":
            sigmas = jnp.asarray(get_sigmas(self.sigma_min, self.sigma_max, self.num_scales))
            used_sigmas = sigmas[t.astype(jnp.int32)]
            temb = get_timestep_embedding(t, self.embed_dim)
        else:
            raise ValueError(f"time embedding type {self.embedding_type} unknown.")

        temb = nn.Dense(self.embed_dim, name="shared_time_embed_0")(temb)
        temb = act(temb)

        dropout = nn.Dropout(rate=self.dropout, deterministic=not train)

        h = nn.Dense(self.hidden_dim, name="pre_dense")(batch)
        h = h + nn.Dense(self.hidden_dim, name="pre_dense_t")(temb)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="pre_gnorm")(h)
        h = act(h)
        h = dropout(h)

        for idx in range(self.n_blocks):
            h1 = nn.Dense(self.hidden_dim, name=f"b{idx + 1}_dense1")(h)
            h1 = h1 + nn.Dense(self.hidden_dim, name=f"b{idx + 1}_dense1_t")(temb)
            h1 = nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"b{idx + 1}_gnorm1")(h1)
            h1 = act(h1)
            h1 = dropout(h1)

            h2 = nn.Dense(self.hidden_dim, name=f"b{idx + 1}_dense2")(h1)
            h2 = h2 + nn.Dense(self.hidden_dim, name=f"b{idx + 1}_dense2_t")(temb)
            h2 = nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"b{idx + 1}_gnorm2")(h2)
            h2 = act(h2)
            h2 = dropout(h2)

            h = h + h2

        res = nn.Dense(self.n_poses * self.pose_dim, name="post_dense")(h)

        if self.scale_by_sigma:
            res = res / used_sigmas.reshape((-1, 1))

        return res


class TimeMLPs(nn.Module):
    """Plain time-conditioned MLP baseline (ref model.py:69-90)."""

    n_poses: int = 21
    pose_dim: int = 6
    hidden_dim: int = 64
    n_blocks: int = 2
    dropout: float = 0.1
    act_name: str = "swish"

    @nn.compact
    def __call__(self, batch: jnp.ndarray, t: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        act = get_act(self.act_name)
        t = jnp.broadcast_to(jnp.atleast_1d(t), (batch.shape[0],))
        h = jnp.concatenate([batch, t[:, None]], axis=1)
        h = act(nn.Dense(self.hidden_dim, name="dense_in")(h))
        for idx in range(self.n_blocks):
            h = nn.Dense(self.hidden_dim, name=f"dense_{idx}")(h)
            h = act(h)
            h = nn.Dropout(rate=self.dropout, deterministic=not train)(h)
        return nn.Dense(self.n_poses * self.pose_dim, name="dense_out")(h)


def make_model_apply(model: nn.Module, dropout_rng_impl: str = "rbg"):
    """Standard raw-network apply closure for the loss/step builders:
    ``model_apply(params, x, labels, key, train) -> out``.

    dropout_rng_impl: "rbg" (default) re-keys the dropout stream onto the
    TPU-native XLA RngBitGenerator — threefry mask generation is ~23% of
    the whole train step's device time at the flagship config (measured,
    see PERFORMANCE.md); the bernoulli mask distribution is unchanged and
    runs are still deterministic per key. "threefry" keeps the JAX default
    (dropout streams then match earlier releases of this framework).
    Under GSPMD the rbg mask bits may depend on the sharding layout (XLA
    RngBitGenerator semantics) — fine for training; the sharded ==
    single-device equality contract covers the dropout-free numerics
    (tests/test_parallel.py).
    """
    assert dropout_rng_impl in ("rbg", "threefry")
    use_rbg = dropout_rng_impl == "rbg"

    def model_apply(params, x, labels, key=None, train=False):
        if train:
            if use_rbg:
                key = jax.random.wrap_key_data(
                    jax.random.bits(key, (4,), jnp.uint32), impl="rbg")
            return model.apply({"params": params}, x, labels, train=True,
                               rngs={"dropout": key})
        return model.apply({"params": params}, x, labels)

    return model_apply


def create_score_model(config, n_poses: int = 21) -> nn.Module:
    """Build the score model described by an ml_collections config
    (mirrors construction at ref run/train.py:154-174)."""
    pose_dim = 3 if config.data.rot_rep == "axis" else 6
    if config.model.type == "ScoreModelFC":
        return ScoreModelFC(
            n_poses=n_poses,
            pose_dim=pose_dim,
            hidden_dim=config.model.HIDDEN_DIM,
            embed_dim=config.model.EMBED_DIM,
            n_blocks=config.model.N_BLOCKS,
            dropout=config.model.dropout,
            act_name=config.model.nonlinearity,
            embedding_type=config.model.embedding_type,
            fourier_scale=config.model.get("fourier_scale", 16.0),
            scale_by_sigma=config.model.scale_by_sigma,
            sigma_min=config.model.sigma_min,
            sigma_max=config.model.sigma_max,
            num_scales=config.model.num_scales,
        )
    if config.model.type == "TimeMLPs":
        return TimeMLPs(
            n_poses=n_poses,
            pose_dim=pose_dim,
            hidden_dim=config.model.HIDDEN_DIM,
            n_blocks=config.model.N_BLOCKS,
            dropout=config.model.dropout,
            act_name=config.model.nonlinearity,
        )
    raise NotImplementedError("unsupported model")
