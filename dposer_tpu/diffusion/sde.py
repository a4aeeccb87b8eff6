"""Continuous-time SDEs (VP / sub-VP / VE) as closed-form coefficient libraries.

Capability parity with the reference's class hierarchy in
``lib/algorithms/advanced/sde_lib.py`` — but TPU-first: each SDE is a frozen,
hashable dataclass of *static* floats whose methods are pure jnp functions of
``(x, t)``. Because instances are hashable they can be closed over (or passed
as static args) by ``jax.jit``; every coefficient is analytic, so nothing ever
leaves the device.

Numerics preserved exactly (checkpoint parity depends on these):

- sub-VP ``marginal_prob`` "std" is ``1 - exp(2*lmc)`` — NOT square-rooted
  (ref ``sde_lib.py:216``), while VP uses ``sqrt(1 - exp(2*lmc))``
  (ref ``sde_lib.py:155``). The score adapter, one-step denoiser and losses
  all consume this convention.
- ``return_alpha_sigma`` mirrors the same asymmetry (ref ``sde_lib.py:177-181,
  227-231, 289-292``).
- Reverse drift: ``drift - diffusion**2 * score * (0.5 if probability_flow
  else 1.0)`` (ref ``sde_lib.py:98-109``).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def batch_mul(a: Array, x: Array) -> Array:
    """Multiply a per-sample scalar ``a`` ([...]) against ``x`` ([..., D])."""
    return a[..., None] * x if a.ndim == x.ndim - 1 else a * x


@dataclasses.dataclass(frozen=True)
class SDE:
    """Base SDE: dx = f(x, t) dt + g(t) dw on t in [0, T]."""

    N: int = 1000
    T: float = 1.0

    # --- interface -------------------------------------------------------
    def sde(self, x: Array, t: Array) -> Tuple[Array, Array]:
        raise NotImplementedError

    def marginal_prob(self, x: Array, t: Array) -> Tuple[Array, Array]:
        raise NotImplementedError

    def prior_sampling(self, key: jax.Array, shape) -> Array:
        raise NotImplementedError

    def prior_logp(self, z: Array) -> Array:
        raise NotImplementedError

    def return_alpha_sigma(self, t: Array) -> Tuple[Array, Array]:
        raise NotImplementedError

    # --- shared ----------------------------------------------------------
    def discretize(self, x: Array, t: Array) -> Tuple[Array, Array]:
        """Euler-Maruyama discretization x_{i+1} = x_i + f_i + G_i z_i."""
        dt = 1.0 / self.N
        drift, diffusion = self.sde(x, t)
        return drift * dt, diffusion * math.sqrt(dt)

    def timesteps(self, eps: float, dtype=jnp.float32) -> Array:
        """The sampler time grid linspace(T, eps, N) (ref sampling.py:449)."""
        return jnp.linspace(self.T, eps, self.N, dtype=dtype)

    def reverse_sde(self, score_fn: Callable, probability_flow: bool = False):
        """Drift/diffusion of the reverse-time SDE/ODE (ref sde_lib.py:75-119).

        Returns ``rsde(x, t) -> (drift, diffusion)``.
        """

        def rsde(x: Array, t: Array) -> Tuple[Array, Array]:
            drift, diffusion = self.sde(x, t)
            score = score_fn(x, t)
            drift = drift - batch_mul(diffusion ** 2, score) * (0.5 if probability_flow else 1.0)
            diffusion = jnp.zeros_like(diffusion) if probability_flow else diffusion
            return drift, diffusion

        return rsde

    def reverse_sde_guided(self, score_fn: Callable):
        """Reverse SDE that also returns (alpha, sigma^2, score) for guidance
        and one-step denoising (ref sde_lib.py:98-109 with guide=True)."""

        def rsde(x: Array, t: Array):
            drift, diffusion = self.sde(x, t)
            score = score_fn(x, t)
            drift = drift - batch_mul(diffusion ** 2, score)
            alpha, sigma = self.return_alpha_sigma(t)
            return drift, diffusion, alpha, sigma ** 2, score

        return rsde

    def reverse_discretize(self, score_fn: Callable, probability_flow: bool = False):
        """Discretized reverse iteration (ref sde_lib.py:111-117)."""

        def rdisc(x: Array, t: Array) -> Tuple[Array, Array]:
            f, G = self.discretize(x, t)
            # NOTE: the reference keeps the FULL score factor in
            # probability-flow mode too (ref sde_lib.py:114-115 reads
            # ``* (1.0 if self.probability_flow else 1.)`` — it dropped
            # upstream ScoreSDE's 0.5 here). Faithful reproduction;
            # pinned by test_sde.py::test_reverse_discretize_matches_reference.
            rev_f = f - batch_mul(G ** 2, score_fn(x, t))
            rev_G = jnp.zeros_like(G) if probability_flow else G
            return rev_f, rev_G

        return rdisc


@dataclasses.dataclass(frozen=True)
class VPSDE(SDE):
    """Variance-preserving SDE (ref sde_lib.py:122-181)."""

    beta_0: float = 0.1
    beta_1: float = 20.0

    def discrete_betas(self) -> Array:
        return jnp.linspace(self.beta_0 / self.N, self.beta_1 / self.N, self.N)

    def alphas(self) -> Array:
        return 1.0 - self.discrete_betas()

    def sde(self, x, t):
        beta_t = self.beta_0 + t * (self.beta_1 - self.beta_0)
        drift = batch_mul(-0.5 * beta_t, x)
        diffusion = jnp.sqrt(beta_t)
        return drift, diffusion

    def _log_mean_coeff(self, t):
        return -0.25 * t ** 2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0

    def marginal_prob(self, x, t):
        lmc = self._log_mean_coeff(t)
        mean = batch_mul(jnp.exp(lmc), x)
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * lmc))
        return mean, std

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape)

    def prior_logp(self, z):
        n = z.shape[-1]
        return -n / 2.0 * math.log(2 * math.pi) - jnp.sum(z ** 2, axis=-1) / 2.0

    def discretize(self, x, t):
        """DDPM discretization (ref sde_lib.py:167-175)."""
        timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
        beta = self.discrete_betas()[timestep]
        alpha = self.alphas()[timestep]
        f = batch_mul(jnp.sqrt(alpha), x) - x
        G = jnp.sqrt(beta)
        return f, G

    def return_alpha_sigma(self, t):
        lmc = self._log_mean_coeff(t)
        alpha = jnp.exp(lmc)[..., None]
        sigma = jnp.sqrt(1.0 - jnp.exp(2.0 * lmc))
        return alpha, sigma


@dataclasses.dataclass(frozen=True)
class SubVPSDE(SDE):
    """sub-VP SDE (ref sde_lib.py:184-231). NOTE the non-sqrt "std"."""

    beta_0: float = 0.1
    beta_1: float = 20.0

    def discrete_betas(self) -> Array:
        return jnp.linspace(self.beta_0 / self.N, self.beta_1 / self.N, self.N)

    def alphas(self) -> Array:
        return 1.0 - self.discrete_betas()

    def sde(self, x, t):
        beta_t = self.beta_0 + t * (self.beta_1 - self.beta_0)
        drift = batch_mul(-0.5 * beta_t, x)
        discount = 1.0 - jnp.exp(-2 * self.beta_0 * t - (self.beta_1 - self.beta_0) * t ** 2)
        diffusion = jnp.sqrt(beta_t * discount)
        return drift, diffusion

    def _log_mean_coeff(self, t):
        return -0.25 * t ** 2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0

    def marginal_prob(self, x, t):
        lmc = self._log_mean_coeff(t)
        mean = batch_mul(jnp.exp(lmc), x)
        std = 1.0 - jnp.exp(2.0 * lmc)  # deliberately NOT sqrt (ref :216)
        return mean, std

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape)

    def prior_logp(self, z):
        n = z.shape[-1]
        return -n / 2.0 * math.log(2 * math.pi) - jnp.sum(z ** 2, axis=-1) / 2.0

    def return_alpha_sigma(self, t):
        lmc = self._log_mean_coeff(t)
        alpha = jnp.exp(lmc)[..., None]
        sigma = 1.0 - jnp.exp(2.0 * lmc)  # matches marginal_prob convention (ref :227-231)
        return alpha, sigma


@dataclasses.dataclass(frozen=True)
class VESDE(SDE):
    """Variance-exploding SDE (ref sde_lib.py:234-292)."""

    sigma_min: float = 0.01
    sigma_max: float = 50.0

    def discrete_sigmas(self) -> Array:
        return jnp.exp(jnp.linspace(math.log(self.sigma_min), math.log(self.sigma_max), self.N))

    def sde(self, x, t):
        sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        drift = jnp.zeros_like(x)
        diffusion = sigma * math.sqrt(2 * (math.log(self.sigma_max) - math.log(self.sigma_min)))
        return drift, diffusion

    def marginal_prob(self, x, t):
        std = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        return x, std

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape) * self.sigma_max

    def prior_logp(self, z):
        n = z.shape[-1]
        return (-n / 2.0 * math.log(2 * math.pi * self.sigma_max ** 2)
                - jnp.sum(z ** 2, axis=-1) / (2 * self.sigma_max ** 2))

    def discretize(self, x, t):
        """SMLD (NCSN) discretization (ref sde_lib.py:279-287)."""
        timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
        sigmas = self.discrete_sigmas()
        sigma = sigmas[timestep]
        adjacent = jnp.where(timestep == 0, jnp.zeros_like(t), sigmas[jnp.maximum(timestep - 1, 0)])
        f = jnp.zeros_like(x)
        G = jnp.sqrt(sigma ** 2 - adjacent ** 2)
        return f, G

    def return_alpha_sigma(self, t):
        alpha = jnp.ones(t.shape + (1,)) if hasattr(t, "shape") else jnp.array([[1.0]])
        sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        return alpha, sigma


def build_sde(config, N: int | None = None) -> SDE:
    """Construct the SDE named by ``config.training.sde`` (ref train.py:196-212).

    Returns the SDE (see :func:`sampling_eps_for` for the matching eps).
    """
    name = config.training.sde.lower()
    n = N if N is not None else config.model.num_scales
    if name == "vpsde":
        return VPSDE(beta_0=config.model.beta_min, beta_1=config.model.beta_max, N=n)
    if name == "subvpsde":
        return SubVPSDE(beta_0=config.model.beta_min, beta_1=config.model.beta_max, N=n)
    if name == "vesde":
        return VESDE(sigma_min=config.model.sigma_min, sigma_max=config.model.sigma_max, N=n)
    raise NotImplementedError(f"SDE {config.training.sde} unknown.")


def sampling_eps_for(sde: SDE) -> float:
    """Default integration cutoff (ref train.py:200-212)."""
    return 1e-5 if isinstance(sde, VESDE) else 1e-3
