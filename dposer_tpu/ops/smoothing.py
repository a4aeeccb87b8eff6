"""Temporal smoothing & interpolation helpers (ref ``lib/utils/misc.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def add_noise(key: jax.Array, gts: jnp.ndarray, std: float = 0.5,
              noise_type: str = "gaussian") -> jnp.ndarray:
    """Perturb ground truth with gaussian/uniform noise (ref misc.py:11-24)."""
    if std == 0.0:
        return gts
    if noise_type == "gaussian":
        return gts + std * jax.random.normal(key, gts.shape, gts.dtype)
    if noise_type == "uniform":
        return gts + std * (jax.random.uniform(key, gts.shape, gts.dtype) - 0.5)
    raise NotImplementedError(noise_type)


def linear_interpolation(A: jnp.ndarray, B: jnp.ndarray, frames: int) -> jnp.ndarray:
    """[...,] x [...,] -> [frames, ...] linear blend (ref misc.py:58-61)."""
    alpha = jnp.linspace(0.0, 1.0, frames)[:, None]
    return (1 - alpha) * A + alpha * B


def slerp_interpolation(A: jnp.ndarray, B: jnp.ndarray, frames: int) -> jnp.ndarray:
    """Spherical interpolation between two flat latents (ref misc.py:64-69).
    Degenerates to linear interpolation for (anti)parallel inputs, where
    sin(omega)=0 would make the slerp weights NaN (the reference NaNs)."""
    omega = jnp.arccos(jnp.clip((A * B).sum() / (jnp.linalg.norm(A) * jnp.linalg.norm(B)), -1.0, 1.0))
    alpha = jnp.linspace(0.0, 1.0, frames)[:, None]
    so = jnp.sin(omega)
    safe = jnp.where(jnp.abs(so) < 1e-7, 1.0, so)
    slerp = (jnp.sin((1 - alpha) * omega) / safe) * A \
        + (jnp.sin(alpha * omega) / safe) * B
    return jnp.where(jnp.abs(so) < 1e-7, linear_interpolation(A, B, frames),
                     slerp)


def _conv1d_same(data: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """[T, D] convolved along T with a [K] kernel, torch-conv1d 'same'-ish
    padding semantics (pad = K//2 both sides; output length T for odd K)."""
    k = kernel.shape[0]
    pad = k // 2
    x = data.T[:, None, :]  # [D, 1, T]
    w = kernel[None, None, :]  # [1, 1, K]
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out[:, 0, :].T


def moving_average(data: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """[T, D] boxcar filter along time (ref misc.py:72-81)."""
    kernel = jnp.ones(window_size) / window_size
    return _conv1d_same(data, kernel)


def gaussian_smoothing(data: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """[T, D] gaussian filter along time (ref misc.py:84-95).

    NOTE: matches torch's cross-correlation conv1d with padding=K//2; for odd
    window sizes the output length equals the input length.
    """
    offs = jnp.arange(window_size, dtype=jnp.float32) - window_size // 2
    kernel = jnp.exp(-0.5 * (offs / sigma) ** 2)
    kernel = kernel / kernel.sum()
    # both torch F.conv1d and lax conv are cross-correlation: no kernel flip
    return _conv1d_same(data, kernel)
