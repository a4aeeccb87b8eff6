"""Predictor-Corrector and ODE samplers as single fused ``lax.scan`` loops.

Capability parity with ref ``lib/algorithms/advanced/sampling.py`` — the
1000-iteration Python loop (ref ``:456-461``) becomes ONE jitted scan; the
predictor/corrector registry survives as a name->function table.

Semantics preserved:

- time grid ``linspace(T, eps, N)`` (ref ``:449``)
- per step: corrector update, then predictor update, trajectory collects the
  post-predictor ``x`` (ref ``:459-461``)
- Euler-Maruyama: ``dt = -1/N``, ``x_mean = x + drift*dt``,
  ``x = x_mean + diffusion*sqrt(-dt)*z`` (ref ``:182-188``)
- imputation for completion: after every update, re-noise the observation to
  time t and overwrite observed dims, ``x = x*(1-mask) + noised_obs*mask``
  (ref ``:410-427``)
- ``denoise=True`` returns the final ``x_mean`` (ref ``:466``)

TPU-first details: ``t`` is a *scalar* inside the scan (the whole batch
shares a timestep), so the time-embedding path of the score net runs once per
step with batch dim 1 and broadcasts — the reference recomputes it per row.
Per-step PRNG comes from ``fold_in`` on the carried key.
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from . import ode as ode_lib
from .sde import SDE, VESDE, VPSDE, SubVPSDE, batch_mul

_PREDICTORS = {}
_CORRECTORS = {}


def register_predictor(name):
    def _register(fn):
        _PREDICTORS[name] = fn
        return fn

    return _register


def register_corrector(name):
    def _register(fn):
        _CORRECTORS[name] = fn
        return fn

    return _register


def get_predictor(name):
    return _PREDICTORS[name.lower()]


def get_corrector(name):
    return _CORRECTORS[name.lower()]


# ---------------------------------------------------------------------------
# Predictors: (sde, score_fn, probability_flow) -> update(key, x, t) -> (x, x_mean)
# ---------------------------------------------------------------------------

@register_predictor("euler_maruyama")
def euler_maruyama_predictor(sde: SDE, score_fn, probability_flow=False):
    rsde = sde.reverse_sde(score_fn, probability_flow)
    dt = -1.0 / sde.N
    sqrt_mdt = math.sqrt(1.0 / sde.N)

    def update(key, x, t):
        z = jax.random.normal(key, x.shape, x.dtype)
        drift, diffusion = rsde(x, t)
        x_mean = x + drift * dt
        noise_scale = diffusion * sqrt_mdt
        x_new = x_mean + (batch_mul(noise_scale, z) if jnp.ndim(t) else noise_scale * z)
        return x_new, x_mean

    return update


@register_predictor("reverse_diffusion")
def reverse_diffusion_predictor(sde: SDE, score_fn, probability_flow=False):
    rdisc = sde.reverse_discretize(score_fn, probability_flow)

    def update(key, x, t):
        f, G = rdisc(x, t)
        z = jax.random.normal(key, x.shape, x.dtype)
        x_mean = x - f
        x_new = x_mean + batch_mul(G, z) if jnp.ndim(t) else x_mean + G * z
        return x_new, x_mean

    return update


@register_predictor("ancestral_sampling")
def ancestral_sampling_predictor(sde: SDE, score_fn, probability_flow=False):
    """Ancestral sampling; VP/VE only (ref sampling.py:223-259)."""
    if probability_flow:
        raise AssertionError("Probability flow not supported by ancestral sampling")

    if isinstance(sde, VESDE):
        sigmas = sde.discrete_sigmas()

        def update(key, x, t):
            timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
            sigma = sigmas[timestep]
            adjacent = jnp.where(timestep == 0, jnp.zeros_like(t),
                                 sigmas[jnp.maximum(timestep - 1, 0)])
            score = score_fn(x, t)
            x_mean = x + batch_mul(sigma ** 2 - adjacent ** 2, score) if jnp.ndim(t) \
                else x + score * (sigma ** 2 - adjacent ** 2)
            std = jnp.sqrt((adjacent ** 2 * (sigma ** 2 - adjacent ** 2)) / (sigma ** 2))
            noise = jax.random.normal(key, x.shape, x.dtype)
            x_new = x_mean + batch_mul(std, noise) if jnp.ndim(t) else x_mean + std * noise
            return x_new, x_mean

        return update

    if isinstance(sde, VPSDE):
        betas = sde.discrete_betas()

        def update(key, x, t):
            timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
            beta = betas[timestep]
            score = score_fn(x, t)
            num = x + batch_mul(beta, score) if jnp.ndim(t) else x + beta * score
            x_mean = num / jnp.sqrt(1.0 - beta) if not jnp.ndim(t) \
                else batch_mul(1.0 / jnp.sqrt(1.0 - beta), num)
            noise = jax.random.normal(key, x.shape, x.dtype)
            x_new = x_mean + batch_mul(jnp.sqrt(beta), noise) if jnp.ndim(t) \
                else x_mean + jnp.sqrt(beta) * noise
            return x_new, x_mean

        return update

    raise NotImplementedError(f"SDE class {type(sde).__name__} not yet supported.")


@register_predictor("none")
def none_predictor(sde, score_fn, probability_flow=False):
    def update(key, x, t):
        return x, x

    return update


# ---------------------------------------------------------------------------
# Correctors: (sde, score_fn, snr, n_steps) -> update(key, x, t) -> (x, x_mean)
# ---------------------------------------------------------------------------

def _corrector_alpha(sde: SDE, t):
    if isinstance(sde, (VPSDE, SubVPSDE)):
        timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
        return sde.alphas()[timestep]
    return jnp.ones_like(t)


@register_corrector("langevin")
def langevin_corrector(sde: SDE, score_fn, snr, n_steps):
    def update(key, x, t):
        alpha = _corrector_alpha(sde, t)
        x_mean = x

        def body(i, carry):
            x, x_mean = carry
            grad = score_fn(x, t)
            noise = jax.random.normal(jax.random.fold_in(key, i), x.shape, x.dtype)
            grad_norm = jnp.linalg.norm(grad.reshape(grad.shape[0], -1), axis=-1).mean()
            noise_norm = jnp.linalg.norm(noise.reshape(noise.shape[0], -1), axis=-1).mean()
            step_size = (snr * noise_norm / grad_norm) ** 2 * 2 * alpha
            x_mean = x + batch_mul(step_size, grad) if jnp.ndim(t) else x + step_size * grad
            x = x_mean + batch_mul(jnp.sqrt(step_size * 2), noise) if jnp.ndim(t) \
                else x_mean + jnp.sqrt(step_size * 2) * noise
            return x, x_mean

        x, x_mean = jax.lax.fori_loop(0, n_steps, body, (x, x_mean))
        return x, x_mean

    return update


@register_corrector("ald")
def ald_corrector(sde: SDE, score_fn, snr, n_steps):
    """Annealed Langevin dynamics (NCSN/v2; ref sampling.py:305-339)."""

    def update(key, x, t):
        alpha = _corrector_alpha(sde, t)
        std = sde.marginal_prob(x, t)[1]
        x_mean = x

        def body(i, carry):
            x, x_mean = carry
            grad = score_fn(x, t)
            noise = jax.random.normal(jax.random.fold_in(key, i), x.shape, x.dtype)
            step_size = (snr * std) ** 2 * 2 * alpha
            x_mean = x + batch_mul(step_size, grad) if jnp.ndim(t) else x + step_size * grad
            x = x_mean + batch_mul(jnp.sqrt(step_size * 2), noise) if jnp.ndim(t) \
                else x_mean + noise * jnp.sqrt(step_size * 2)
            return x, x_mean

        x, x_mean = jax.lax.fori_loop(0, n_steps, body, (x, x_mean))
        return x, x_mean

    return update


@register_corrector("none")
def none_corrector(sde, score_fn, snr, n_steps):
    def update(key, x, t):
        return x, x

    return update


# ---------------------------------------------------------------------------
# PC sampler — one fused scan
# ---------------------------------------------------------------------------

def get_pc_sampler(sde: SDE, shape: Tuple[int, ...], score_fn: Callable,
                   predictor: str = "euler_maruyama", corrector: str = "none",
                   inverse_scaler: Optional[Callable] = None, snr: float = 0.16,
                   n_steps: int = 1, probability_flow: bool = False,
                   denoise: bool = True, eps: float = 1e-3,
                   imputation: bool = False, start_step: int = 0,
                   return_trajectory: bool = False, jit: bool = True):
    """Build a jitted PC sampler.

    Returns ``sampler(key, observation=None, mask=None, z=None)`` ->
    ``(trajs | None, x_final)`` where ``x_final`` is ``x_mean`` when
    ``denoise`` (ref sampling.py:429-466). ``observation``/``mask`` are only
    consulted when ``imputation=True`` (ref args.task == 'completion').
    """
    predictor_update = get_predictor(predictor)(sde, score_fn, probability_flow)
    corrector_update = get_corrector(corrector)(sde, score_fn, snr, n_steps)
    timesteps = sde.timesteps(eps)

    def impute(key, x, t, observation, mask):
        masked_mean, std = sde.marginal_prob(observation, t)
        noise = jax.random.normal(key, x.shape, x.dtype)
        masked_data = masked_mean + (batch_mul(std, noise) if jnp.ndim(t) else std * noise)
        return x * (1 - mask) + masked_data * mask

    def sampler(key, observation=None, mask=None, z=None):
        if z is None:
            key, sub = jax.random.split(key)
            x = sde.prior_sampling(sub, shape)
        else:
            x = z

        def step(carry, i):
            x, _ = carry
            t = timesteps[i]
            kc, kci, kp, kpi = jax.random.split(jax.random.fold_in(key, i), 4)
            x, x_mean = corrector_update(kc, x, t)
            if imputation:
                x = impute(kci, x, t, observation, mask)
            x, x_mean = predictor_update(kp, x, t)
            if imputation:
                x = impute(kpi, x, t, observation, mask)
            y = x if return_trajectory else jnp.zeros((0,), x.dtype)
            return (x, x_mean), y

        (x, x_mean), trajs = jax.lax.scan(
            step, (x, x), jnp.arange(start_step, sde.N, dtype=jnp.int32))

        x_final = x_mean if denoise else x
        if inverse_scaler is not None:
            x_final = inverse_scaler(x_final)
        return (trajs if return_trajectory else None), x_final

    return jax.jit(sampler) if jit else sampler


# ---------------------------------------------------------------------------
# Guided Euler-Maruyama step (MCG/DPS-style; ref sampling.py:191-207)
# ---------------------------------------------------------------------------

def get_guided_em_update(sde: SDE, score_fn, grad_step: float = 1.0):
    """One guided EM update: take the EM step, then descend the gradient of
    ``||obs*mask - x0_hat*mask||`` w.r.t. x_t through the one-step denoiser."""
    rsde_guided = sde.reverse_sde_guided(score_fn)
    dt = -1.0 / sde.N
    sqrt_mdt = math.sqrt(1.0 / sde.N)

    def update(key, x_t, t, observation, mask):
        z = jax.random.normal(key, x_t.shape, x_t.dtype)

        def norm_fn(xt):
            drift, diffusion, alpha, sigma2, score = rsde_guided(xt, t)
            x0_hat = (xt + batch_mul(jnp.atleast_1d(sigma2), score)
                      if jnp.ndim(sigma2) else xt + sigma2 * score) / alpha
            return jnp.linalg.norm(observation * mask - x0_hat * mask), (drift, diffusion)

        (norm, (drift, diffusion)), norm_grad = jax.value_and_grad(norm_fn, has_aux=True)(x_t)
        y_mean = x_t + drift * dt
        y_hat = y_mean + (batch_mul(diffusion, z) * sqrt_mdt if jnp.ndim(t)
                          else diffusion * sqrt_mdt * z)
        y_hat = y_hat - grad_step * norm_grad
        return y_hat, y_mean

    return update


# ---------------------------------------------------------------------------
# Probability-flow ODE sampler (ref sampling.py:471-542) — fully on-device
# ---------------------------------------------------------------------------

def get_ode_sampler(sde: SDE, shape: Tuple[int, ...], score_fn: Callable,
                    inverse_scaler: Optional[Callable] = None, denoise: bool = False,
                    rtol: float = 1e-5, atol: float = 1e-5, eps: float = 1e-3,
                    jit: bool = True):
    """Deterministic PF-ODE sampler with the on-device RK45."""
    pf_rsde = sde.reverse_sde(score_fn, probability_flow=True)
    rdisc = sde.reverse_discretize(score_fn, probability_flow=False)

    def drift_fn(t, x):
        vec_t = jnp.full((x.shape[0],), t, x.dtype)
        return pf_rsde(x, vec_t)[0]

    def sampler(key, z=None):
        if z is None:
            key, sub = jax.random.split(key)
            x = sde.prior_sampling(sub, shape)
        else:
            x = z
        sol = ode_lib.rk45(drift_fn, sde.T, eps, x, rtol=rtol, atol=atol)
        x = jnp.where(sol.status == 0, sol.y, jnp.nan)  # fail loudly on truncation
        if denoise:
            # one reverse-diffusion predictor step without noise (ref :492-498)
            vec_eps = jnp.full((x.shape[0],), eps, x.dtype)
            f, _ = rdisc(x, vec_eps)
            x = x - f
        if inverse_scaler is not None:
            x = inverse_scaler(x)
        return sol.nfe, x

    return jax.jit(sampler) if jit else sampler


def get_sampling_fn(config, sde: SDE, shape, score_fn, inverse_scaler, eps,
                    **overrides):
    """Config-driven dispatch mirroring ref ``sampling.py:80-124``."""
    method = config.sampling.method.lower()
    if method == "ode":
        return get_ode_sampler(sde, shape, score_fn, inverse_scaler=inverse_scaler,
                               denoise=config.sampling.noise_removal, eps=eps, **overrides)
    if method == "pc":
        return get_pc_sampler(
            sde, shape, score_fn,
            predictor=config.sampling.predictor,
            corrector=config.sampling.corrector,
            inverse_scaler=inverse_scaler,
            snr=config.sampling.snr,
            n_steps=config.sampling.n_steps_each,
            probability_flow=config.sampling.probability_flow,
            denoise=config.sampling.noise_removal,
            eps=eps, **overrides)
    raise ValueError(f"Sampler name {config.sampling.method} unknown.")
