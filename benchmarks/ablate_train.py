"""Attribute the train step's device time on the real TPU.

Times K-step scanned variants of the fused train step (loss+grad+clip+
Adam+EMA) with pieces removed, at the reference batch 1280. One D2H read
per dispatch (run.train's cadence); K=64 makes the ~25 ms dispatch cost a
~0.4 ms/step constant shared by every variant, so deltas are device time.

    python -u benchmarks/ablate_train.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
import ml_collections
import optax

from dposer_tpu.diffusion import losses as losses_lib
from dposer_tpu.diffusion.ema import ema_update
from dposer_tpu.diffusion.sde import SubVPSDE
from dposer_tpu.models import ScoreModelFC
from dposer_tpu.models.score_mlp import make_model_apply

BATCH, DIM, K = 1280, 63, 64


def build(dropout=0.1):
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=1024, embed_dim=512,
                         n_blocks=2, dropout=dropout)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, DIM)),
                        jnp.zeros((1,)))["params"]
    c = ml_collections.ConfigDict()
    c.optim = ml_collections.ConfigDict(dict(
        optimizer="Adam", lr=2e-4, beta1=0.9, eps=1e-8, warmup=5000,
        grad_clip=1.0, weight_decay=0))
    c.model = ml_collections.ConfigDict(dict(ema_rate=0.9999))
    state, tx = losses_lib.init_train_state(c, params)
    loss_fn = losses_lib.get_sde_loss_fn(SubVPSDE(N=1000), train=True,
                                         model_apply=make_model_apply(model),
                                         reduce_mean=True, continuous=True)
    return state, tx, loss_fn


def make_variant(tx, loss_fn, mode, state):
    """mode: full | no_ema | no_clip_ema | sgd | grad_only | loss_only.
    Returns (fn, state) — state's opt_state is re-initialized when the
    variant swaps the optimizer chain."""
    if mode == "no_clip_ema":
        tx = optax.adam(2e-4, b1=0.9, eps=1e-8)
        state = state.replace(opt_state=tx.init(state.params))
    if mode == "sgd":
        tx = optax.sgd(1e-5)
        state = state.replace(opt_state=tx.init(state.params))

    def step_fn(state, key, batch):
        if mode == "loss_only":
            loss = loss_fn(state.params, key, batch)
            return state.replace(step=state.step + 1), {"step_loss": loss}
        loss, grads = jax.value_and_grad(loss_fn)(state.params, key, batch)
        if mode == "grad_only":
            # consume grads without the optimizer chain
            gsum = sum(jnp.sum(g) for g in jax.tree.leaves(grads))
            return state.replace(step=state.step + 1), {"step_loss": loss + 0 * gsum}
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema if mode in ("no_ema", "no_clip_ema", "sgd") \
            else ema_update(state.ema, params)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, ema=ema), {"step_loss": loss}

    return jax.jit(losses_lib.multi_step(step_fn)), state


def timeit(name, fn, state, batches):
    key = jax.random.PRNGKey(2)
    for _ in range(2):
        state2, ld = fn(state, key, batches)
        np.asarray(ld["step_loss"])
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        state2, ld = fn(state, key, batches)
        np.asarray(ld["step_loss"])
    t = (time.perf_counter() - t0) / reps / K
    print(f"{name:34s} {t * 1e3:7.3f} ms/step  ({1 / t:7.0f} steps/s)",
          flush=True)
    return t


def main():
    print(f"devices: {jax.devices()}", flush=True)
    batches = jax.random.normal(jax.random.PRNGKey(1), (K, BATCH, DIM))

    state, tx, loss_fn = build(dropout=0.1)
    for mode in ("full", "no_ema", "no_clip_ema", "sgd", "grad_only",
                 "loss_only"):
        fn, st = make_variant(tx, loss_fn, mode, state)
        timeit(mode, fn, st, batches)

    state0, tx0, loss0 = build(dropout=0.0)
    fn, st = make_variant(tx0, loss0, "full", state0)
    timeit("full, dropout=0", fn, st, batches)

    # batch scaling: is the step compute- or overhead-bound?
    for b in (2560, 5120):
        bb = jax.random.normal(jax.random.PRNGKey(3), (K, b, DIM))
        fn, st = make_variant(tx, loss_fn, "full", state)
        t = timeit(f"full, batch {b}", fn, st, bb)
        print(f"    -> {b / t / 1e3:8.0f}k poses/s", flush=True)


if __name__ == "__main__":
    main()
