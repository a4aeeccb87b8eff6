"""Model-output -> score adapter.

Reproduces the critical conventions of ref ``lib/algorithms/advanced/utils.py:127-186``:

- VP/subVP continuous: ``labels = t * 999``; ``std = marginal_prob(0, t)[1]``
  (for subVP this is the *non-sqrt* quantity); ``score = -model_out / std``.
- VP discrete: ``labels = t * (N - 1)``; ``std = sqrt_1m_alphas_cumprod[labels]``.
- VE continuous: ``labels = marginal_prob(0, t)[1]`` (the sigma itself);
  model output IS the score.
- VE discrete: ``labels = round((T - t) * (N - 1))``.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from .sde import SDE, VESDE, VPSDE, SubVPSDE, batch_mul

ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def get_score_fn(sde: SDE, model_fn: ModelFn, continuous: bool = True) -> Callable:
    """Wrap ``model_fn(x, labels) -> out`` into ``score_fn(x, t) -> score``.

    ``model_fn`` should already close over params/train-mode, e.g.
    ``lambda x, labels: model.apply({'params': params}, x, labels)``.
    """
    if isinstance(sde, (VPSDE, SubVPSDE)):

        def score_fn(x, t):
            if continuous or isinstance(sde, SubVPSDE):
                labels = t * 999
                out = model_fn(x, labels)
                std = sde.marginal_prob(jnp.zeros_like(x), t)[1]
            else:
                labels = t * (sde.N - 1)
                out = model_fn(x, labels)
                sqrt_1m = jnp.sqrt(1.0 - jnp.cumprod(sde.alphas()))
                std = sqrt_1m[labels.astype(jnp.int32)]
            # batch_mul handles std of shape [B] (per-sample) or scalar alike
            return -batch_mul(1.0 / std, out)

        return score_fn

    if isinstance(sde, VESDE):

        def score_fn(x, t):
            if continuous:
                labels = sde.marginal_prob(jnp.zeros_like(x), t)[1]
            else:
                labels = jnp.round((sde.T - t) * (sde.N - 1))
            return model_fn(x, labels)

        return score_fn

    raise NotImplementedError(f"SDE class {type(sde).__name__} not yet supported.")
