"""Probability-flow-ODE exact log-likelihood (bits/dim).

Capability parity with ref ``lib/algorithms/advanced/likelihood.py:26-113``.
The Hutchinson-Skilling divergence is computed with ``jax.jvp`` (forward-mode,
one extra RHS cost) instead of the reference's autograd-of-sum trick, and the
whole augmented ODE integrates on-device with the jitted RK45 — the reference
round-trips device->numpy on every scipy RHS evaluation.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from . import ode as ode_lib
from .sde import SDE


def get_div_fn(fn: Callable) -> Callable:
    """Hutchinson divergence of ``fn(x, t)`` via one forward-mode jvp.

    Returns ``div_fn(x, t, eps) -> (fn(x, t), divergence)`` — the jvp
    computes the primal anyway, so RHS callers get drift + divergence from
    TWO network forwards per call instead of three."""

    def div_fn(x, t, eps):
        primal, jvp_val = jax.jvp(lambda xx: fn(xx, t), (x,), (eps,))
        return primal, jnp.sum(jvp_val * eps, axis=tuple(range(1, x.ndim)))

    return div_fn


def get_likelihood_fn(sde: SDE, score_fn: Callable,
                      inverse_scaler: Optional[Callable] = None,
                      hutchinson_type: str = "Rademacher",
                      rtol: float = 1e-5, atol: float = 1e-5,
                      eps: float = 1e-5, jit: bool = True):
    """Returns ``likelihood_fn(key, data) -> (bpd [B], z [B, D], nfe)``.

    ``inverse_scaler`` is accepted for reference-signature parity and
    (like the reference, whose dequantization offset is commented out —
    ref likelihood.py:46,109) unused: poses are evaluated in the
    normalized space the model was trained in.
    """
    pf_rsde = sde.reverse_sde(score_fn, probability_flow=True)

    def drift_fn(x, vec_t):
        return pf_rsde(x, vec_t)[0]

    div_fn = get_div_fn(drift_fn)

    def likelihood_fn(key, data):
        shape = data.shape
        if hutchinson_type == "Gaussian":
            epsilon = jax.random.normal(key, shape, data.dtype)
        elif hutchinson_type == "Rademacher":
            epsilon = jax.random.rademacher(key, shape, data.dtype)
        else:
            raise NotImplementedError(f"Hutchinson type {hutchinson_type} unknown.")

        def ode_func(t, state):
            x = state[:, :-1]
            vec_t = jnp.full((shape[0],), t, data.dtype)
            drift, logp_grad = div_fn(x, vec_t, epsilon)
            return jnp.concatenate([drift, logp_grad[:, None]], axis=1)

        init = jnp.concatenate([data, jnp.zeros((shape[0], 1), data.dtype)], axis=1)
        sol = ode_lib.rk45(ode_func, eps, sde.T, init, rtol=rtol, atol=atol)
        # fail loudly on max_steps truncation (a truncated integral is a
        # silently wrong likelihood; round-3 rk45 fix)
        y = jnp.where(sol.status == 0, sol.y, jnp.nan)
        z = y[:, :-1]
        delta_logp = y[:, -1]
        prior_logp = sde.prior_logp(z)
        n_dim = math.prod(shape[1:])
        bpd = -(prior_logp + delta_logp) / math.log(2) / n_dim
        return bpd, z, sol.nfe

    return jax.jit(likelihood_fn) if jit else likelihood_fn


def get_latent_encoder(sde: SDE, score_fn: Callable, rtol: float = 1e-5,
                       atol: float = 1e-5, eps: float = 1e-3, jit: bool = True):
    """Forward PF-ODE data->latent encoder (for interpolation; ref
    run/demo.py:412-445 uses the likelihood fn's z for this)."""
    pf_rsde = sde.reverse_sde(score_fn, probability_flow=True)

    def drift_fn(t, x):
        vec_t = jnp.full((x.shape[0],), t, x.dtype)
        return pf_rsde(x, vec_t)[0]

    def encode(data):
        sol = ode_lib.rk45(drift_fn, eps, sde.T, data, rtol=rtol, atol=atol)
        sol = sol._replace(y=jnp.where(sol.status == 0, sol.y, jnp.nan))
        return sol.y, sol.nfe

    return jax.jit(encode) if jit else encode


def get_fast_likelihood_fn(sde: SDE, model, params, n_steps: int = 100,
                           hutchinson_type: str = "Rademacher",
                           eps: float = 1e-5, jit: bool = True):
    """Tabled fixed-grid RK4 likelihood (fast path; the adaptive
    :func:`get_likelihood_fn` stays the accuracy oracle).

    Same contract — ``likelihood_fn(key, data) -> (bpd [B], z [B, D], nfe)``
    — but the PF-ODE drift coefficients and all x-independent network
    quantities are precomputed on a ``2*n_steps+1`` stage-time grid
    (``fast_sampler.precompute_time_tables``), so the adaptive solver's
    per-RHS weight re-streaming and ``while_loop`` control overhead
    disappear: 4 jvp evaluations per step through the 6-matmul fast
    forward. ``nfe`` is the static RHS count ``4*n_steps``.
    """
    from .fast_sampler import (_labels_for, _pf_tables, make_fast_forward,
                               precompute_time_tables)

    M = n_steps
    taus = jnp.linspace(eps, sde.T, 2 * M + 1)  # forward: data -> prior
    h = (sde.T - eps) / M
    labels = _labels_for(sde, taus)
    a1, a2 = _pf_tables(sde, taus)
    tprojs, out_scale = precompute_time_tables(model, params, labels)
    if out_scale is not None:
        a2 = a2 * out_scale
    fwd = make_fast_forward(model, params, tprojs, None)

    def likelihood_fn(key, data):
        shape = data.shape
        if hutchinson_type == "Gaussian":
            epsilon = jax.random.normal(key, shape, data.dtype)
        elif hutchinson_type == "Rademacher":
            epsilon = jax.random.rademacher(key, shape, data.dtype)
        else:
            raise NotImplementedError(f"Hutchinson type {hutchinson_type} unknown.")

        def ode_fn(x, j):
            f = lambda xx: a1[j] * xx + a2[j] * fwd(xx, j)  # noqa: E731
            drift, jv = jax.jvp(f, (x,), (epsilon,))
            return drift, jnp.sum(jv * epsilon, axis=-1)

        def step(carry, i):
            x, lp = carry
            j = 2 * i
            d1, v1 = ode_fn(x, j)
            d2, v2 = ode_fn(x + 0.5 * h * d1, j + 1)
            d3, v3 = ode_fn(x + 0.5 * h * d2, j + 1)
            d4, v4 = ode_fn(x + h * d3, j + 2)
            x = x + (h / 6.0) * (d1 + 2.0 * d2 + 2.0 * d3 + d4)
            lp = lp + (h / 6.0) * (v1 + 2.0 * v2 + 2.0 * v3 + v4)
            return (x, lp), None

        (z, delta_logp), _ = jax.lax.scan(
            step, (data, jnp.zeros((shape[0],), data.dtype)),
            jnp.arange(M, dtype=jnp.int32))
        prior_logp = sde.prior_logp(z)
        n_dim = math.prod(shape[1:])
        bpd = -(prior_logp + delta_logp) / math.log(2) / n_dim
        return bpd, z, 4 * M

    return jax.jit(likelihood_fn) if jit else likelihood_fn
