"""Exponential moving average of parameters as a functional pytree transform.

Capability parity with ref ``lib/algorithms/ema.py:10-98`` — the stateful
store/copy_to/restore protocol collapses into pure functions over an
``EMAState`` pytree (one fused ``tree_map`` per update; the torch version
loops parameter-by-parameter on host).

Matches the reference numerics exactly, including the warmup decay
``min(decay, (1 + n) / (10 + n))`` (ref ema.py:46).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EMAState:
    shadow_params: Any
    num_updates: jnp.ndarray  # int32 scalar; < 0 means "disabled" (use_num_updates=False)
    decay: float = struct.field(pytree_node=False, default=0.9999)


def ema_init(params: Any, decay: float = 0.9999, use_num_updates: bool = True) -> EMAState:
    if decay < 0.0 or decay > 1.0:
        raise ValueError("Decay must be between 0 and 1")
    num = jnp.asarray(0 if use_num_updates else -1, jnp.int32)
    return EMAState(shadow_params=jax.tree.map(jnp.asarray, params),
                    num_updates=num, decay=decay)


def ema_update(state: EMAState, params: Any) -> EMAState:
    """One EMA step: s <- s - (1 - decay) * (s - p) (ref ema.py:32-51)."""
    use_num = state.num_updates >= 0
    num = jnp.where(use_num, state.num_updates + 1, state.num_updates)
    decay = jnp.where(
        use_num,
        jnp.minimum(state.decay, (1.0 + num) / (10.0 + num)),
        state.decay,
    )
    one_minus = 1.0 - decay
    shadow = jax.tree.map(lambda s, p: s - one_minus * (s - p),
                          state.shadow_params, params)
    return state.replace(shadow_params=shadow, num_updates=num)


def ema_params(state: EMAState) -> Any:
    """The averaged parameters (ref ``copy_to``); functional, so the caller
    simply keeps its original params around instead of store/restore."""
    return state.shadow_params
