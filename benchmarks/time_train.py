"""Training-step throughput on the TPU: steps-per-dispatch sweep.

Flagship model (1024/512/2), reference batch 1280 (ref
configs/default_amass_configs.py:22). K steps scanned per dispatch amortize
the ~25-30 us tunneled dispatch overhead.

    python -u benchmarks/time_train.py            # XLA step (the default)
    python -u benchmarks/time_train.py --kernel   # fused Pallas train step
    python -u benchmarks/time_train.py --bf16     # bf16 network compute

--kernel reproduces the PERFORMANCE.md "fused train-step kernel" A/B
(measured: PARITY — 1.134 vs 1.131 ms/step through the indexed path).
--bf16 casts the params + input to bf16 inside the loss (fp32 master
weights and optimizer; the same cast the fused kernel applies) — probes
how much of the step is fp32 activation traffic. Expected small: matmuls
already run single-pass bf16 under the default TPU dot precision, and
the kernel-parity result shows the floor sits in dW + optimizer +
per-step overheads.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
import ml_collections

from dposer_tpu.diffusion import losses as losses_lib
from dposer_tpu.diffusion.sde import SubVPSDE
from dposer_tpu.models import ScoreModelFC
from dposer_tpu.models.score_mlp import make_model_apply

BATCH, DIM = 1280, 63


def build(kernel: bool = False, bf16: bool = False):
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=1024, embed_dim=512,
                         n_blocks=2, dropout=0.1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, DIM)),
                        jnp.zeros((1,)))["params"]
    c = ml_collections.ConfigDict()
    c.optim = ml_collections.ConfigDict(dict(
        optimizer="Adam", lr=2e-4, beta1=0.9, eps=1e-8, warmup=5000,
        grad_clip=1.0, weight_decay=0))
    c.model = ml_collections.ConfigDict(dict(ema_rate=0.9999))
    state, tx = losses_lib.init_train_state(c, params)
    if kernel:
        from dposer_tpu.ops.pallas.fused_train import get_pallas_step_fn
        step_fn = get_pallas_step_fn(SubVPSDE(N=1000), model, tx,
                                     reduce_mean=True, batch_hint=BATCH)
    else:
        model_apply = make_model_apply(model)
        if bf16:
            fp32_apply = model_apply

            def model_apply(p, x, t, *a, **kw):
                pb = jax.tree.map(lambda v: v.astype(jnp.bfloat16), p)
                return fp32_apply(pb, x.astype(jnp.bfloat16), t, *a, **kw
                                  ).astype(jnp.float32)

        step_fn = losses_lib.get_step_fn(SubVPSDE(N=1000), train=True,
                                         model_apply=model_apply,
                                         tx=tx, reduce_mean=True)
    return state, step_fn


def main():
    print(f"devices: {jax.devices()}", flush=True)
    from dposer_tpu import parallel as par

    kernel = "--kernel" in sys.argv[1:]
    bf16 = "--bf16" in sys.argv[1:]
    if kernel:
        print("train step: fused Pallas fwd+bwd kernel", flush=True)
    elif bf16:
        print("train step: XLA, bf16 network compute", flush=True)
    state0, step_fn = build(kernel=kernel, bf16=bf16)
    mesh = par.make_mesh()
    # commit to the programs' replicated in_sharding up front — an
    # uncommitted first-call state doubles every K's compile (see run.train)
    state0 = jax.device_put(state0, par.replicate(mesh))
    key = jax.random.PRNGKey(2)

    # Methodology (hard-won on the axon tunnel): one D2H read per dispatch —
    # exactly run.train's cadence. Async enqueue-only timing (or even
    # block_until_ready) wildly under-reports here: the tunnel acks enqueues
    # long before execution, and deeply queued dispatch chains degrade.
    for K in (1, 8, 32, 64, 128, 256):
        if K == 1:
            fn = par.data_parallel_step(step_fn, mesh)
            batches = par.shard_batch(
                mesh, jax.random.normal(jax.random.PRNGKey(1), (BATCH, DIM)))
        else:
            fn = par.data_parallel_multi_step(
                losses_lib.multi_step(step_fn), mesh)
            batches = par.shard_global_multi_batch(mesh, np.asarray(
                jax.random.normal(jax.random.PRNGKey(1), (K, BATCH, DIM))))
        state = state0
        for _ in range(3):
            state, ld = fn(state, key, batches)
            np.asarray(ld["step_loss"])
        reps = 10
        t0 = time.perf_counter()
        for i in range(reps):
            state, ld = fn(state, key, batches)
            np.asarray(ld["step_loss"])  # real completion via D2H
        t = (time.perf_counter() - t0) / reps / K
        print(f"K={K:3d}: {t * 1e3:7.3f} ms/step  "
              f"({BATCH / t:12.0f} poses/s, {1 / t:7.0f} steps/s)", flush=True)


if __name__ == "__main__":
    main()
