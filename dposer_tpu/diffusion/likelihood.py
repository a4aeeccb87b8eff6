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
    """Divergence of ``fn(x, t)`` via the Hutchinson estimator with jvp."""

    def div_fn(x, t, eps):
        _, jvp_val = jax.jvp(lambda xx: fn(xx, t), (x,), (eps,))
        return jnp.sum(jvp_val * eps, axis=tuple(range(1, x.ndim)))

    return div_fn


def get_likelihood_fn(sde: SDE, score_fn: Callable,
                      inverse_scaler: Optional[Callable] = None,
                      hutchinson_type: str = "Rademacher",
                      rtol: float = 1e-5, atol: float = 1e-5,
                      eps: float = 1e-5, jit: bool = True):
    """Returns ``likelihood_fn(key, data) -> (bpd [B], z [B, D], nfe)``."""
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
            drift = drift_fn(x, vec_t)
            logp_grad = div_fn(x, vec_t, epsilon)
            return jnp.concatenate([drift, logp_grad[:, None]], axis=1)

        init = jnp.concatenate([data, jnp.zeros((shape[0], 1), data.dtype)], axis=1)
        sol = ode_lib.rk45(ode_func, eps, sde.T, init, rtol=rtol, atol=atol)
        z = sol.y[:, :-1]
        delta_logp = sol.y[:, -1]
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
        return sol.y, sol.nfe

    return jax.jit(encode) if jit else encode
