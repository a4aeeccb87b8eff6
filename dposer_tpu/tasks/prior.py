"""Shared DPoser-prior machinery for the test-time optimization engines.

The three task engines (completion ref ``run/completion.py:95-207``, motion
denoising ref ``run/motion_denoising.py:63-300``, SMPLify prior ref
``run/smplify.py:17-115``) all share: one/multi-step denoising through the
guided reverse SDE, the DPoser loss (perturb -> denoise -> weighted L2), and
the discrete time-sampling strategies. Gradients do NOT flow through the
denoiser (the reference detaches x0_hat, ref completion.py:110) — only
through the clean-pose argument of the L2.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..diffusion.sde import SDE, batch_mul


def one_step_denoise(sde: SDE, score_fn: Callable, x_t: jnp.ndarray, t: jnp.ndarray):
    """x0_hat = (x_t + sigma^2 * score) / alpha, SNR = alpha / sqrt(sigma^2)
    (ref completion.py:105-110). Stop-gradient applied to both outputs."""
    score = score_fn(x_t, t)
    alpha, sigma = sde.return_alpha_sigma(t)
    sigma2 = sigma ** 2
    x0_hat = (x_t + batch_mul(sigma2, score)) / alpha
    snr = alpha / jnp.sqrt(sigma2)[..., None]
    return jax.lax.stop_gradient(x0_hat), jax.lax.stop_gradient(snr)


def multi_step_denoise(sde: SDE, score_fn: Callable, x_t: jnp.ndarray,
                       t: jnp.ndarray, t_end: jnp.ndarray, N: int = 10):
    """DDIM-style multi-step denoise (ref completion.py:112-129)."""
    x_current = x_t
    for i in range(N):
        a0, a1 = i / N, (i + 1) / N
        t_cur = (1 - a0) * t + a0 * t_end
        t_bef = (1 - a1) * t + a1 * t_end
        alpha_c, sigma_c = sde.return_alpha_sigma(t_cur)
        alpha_b, sigma_b = sde.return_alpha_sigma(t_bef)
        score = score_fn(x_current, t_cur)
        noise_pred = -score * sigma_c[:, None]
        x_current = alpha_b / alpha_c * (x_current - sigma_c[:, None] * noise_pred) \
            + sigma_b[:, None] * noise_pred
    alpha, sigma = sde.return_alpha_sigma(t)
    snr = alpha / sigma[..., None]
    return jax.lax.stop_gradient(x_current), jax.lax.stop_gradient(snr)


def sample_quan_t(key: jax.Array, step: jnp.ndarray, total_steps: int, sde_N: int,
                  time_strategy: str = "3", sample_trun: float = 5.0,
                  sample_time: int = 900, offset: int = 2) -> jnp.ndarray:
    """Discrete time index for the prior loss at optimization ``step``.

    Strategies (ref completion.py:185-192, motion_denoising.py:240-247,
    smplify.py:153-166): '1' random, '2' fixed ``sample_time``,
    '3' truncated annealing: ``N - floor((total-step-1) * (N/(trun*total)))
    - offset`` (offset 2 for completion/denoise, 5 for SMPLify).
    """
    if time_strategy == "1":
        return jax.random.randint(key, (), 0, sde_N)
    if time_strategy == "2":
        if not 0 <= sample_time < sde_N:
            # torch would IndexError on timesteps[sample_time]; a jitted
            # JAX gather silently clamps to the last grid point instead —
            # raise host-side so a reduced-N task can't quietly run every
            # prior evaluation at the wrong noise level
            raise ValueError(f"sample_time={sample_time} outside the sde "
                             f"time grid [0, {sde_N})")
        return jnp.asarray(sample_time, jnp.int32)
    if time_strategy == "3":
        return (sde_N
                - jnp.floor((total_steps - step - 1) * (sde_N / (sample_trun * total_steps))).astype(jnp.int32)
                - offset)
    raise NotImplementedError("unsupported time sampling strategy")


class DPoserPrior:
    """The DPoser plug-in prior: perturb -> denoise -> weighted L2.

    ``score_fn`` closes over model params (eval mode). ``sde`` carries the
    task's step count N (reduced from 1000 for fitting tasks).
    """

    def __init__(self, sde: SDE, score_fn: Callable, eps: float = 1e-3):
        self.sde = sde
        self.score_fn = score_fn
        self.timesteps = sde.timesteps(eps)

    def loss(self, key: jax.Array, x0: jnp.ndarray, vec_t: jnp.ndarray,
             weighted: bool = False, multi_denoise: bool = False,
             reduction: str = "mean", batch_size: Optional[int] = None,
             z: Optional[jnp.ndarray] = None):
        """DPoser loss (ref completion.py:131-149 / motion_denoising.py:125-143).

        reduction 'mean': torch MSELoss-mean semantics (completion);
        'sum_per_batch': sum / batch_size (motion denoising & SMPLify).
        ``z`` injects the perturbation normal (parity tests).
        """
        if z is None:
            z = jax.random.normal(key, x0.shape, x0.dtype)
        mean, std = self.sde.marginal_prob(x0, vec_t)
        perturbed = mean + batch_mul(std, z)
        if multi_denoise:
            denoised, snr = multi_step_denoise(self.sde, self.score_fn, perturbed,
                                               vec_t, t_end=vec_t / 20.0, N=10)
        else:
            denoised, snr = one_step_denoise(self.sde, self.score_fn, perturbed, vec_t)
        weight = 0.5 * jnp.sqrt(1 + snr) if weighted else 0.5
        sq = weight * (x0 - denoised) ** 2
        if reduction == "mean":
            return jnp.mean(sq)
        return jnp.sum(sq) / (batch_size or x0.shape[0])

    def red_diff_loss(self, key: jax.Array, x0: jnp.ndarray, vec_t: jnp.ndarray):
        """RED-Diff guidance (ref motion_denoising.py:145-154): SNR^-1-weighted
        inner product between the (detached) noise-prediction residual and x0.
        Shipped for capability parity; the reference keeps it unused."""
        z = jax.random.normal(key, x0.shape, x0.dtype)
        mean, std = self.sde.marginal_prob(x0, vec_t)
        perturbed = mean + batch_mul(std, z)
        score = self.score_fn(perturbed, vec_t)
        alpha, sigma = self.sde.return_alpha_sigma(vec_t)
        sigma2 = sigma ** 2
        noise_pred = -batch_mul(std, score)
        inverse_snr = jnp.sqrt(sigma2) / alpha[:, 0]
        residual = jax.lax.stop_gradient(noise_pred - z)
        return jnp.mean(inverse_snr * jnp.einsum("ij,ij->i", residual, x0))
