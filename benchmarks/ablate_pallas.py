"""Ablation timing of the fused-EM Pallas kernel on the real TPU.

Attributes per-step time to GN / SiLU / noise / DMA by building kernel
variants with pieces disabled (measurement-only; semantics intentionally
wrong for ablated parts). Times are steady-state: M runs enqueued
back-to-back with one device-to-host read forcing completion of the last
(ordered execution bounds all M) — a single timed call on this tunneled
host otherwise includes ~25 ms of fixed RPC dispatch latency. Run ONE at a
time on the tunneled chip:

    python -u benchmarks/ablate_pallas.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dposer_tpu.diffusion.sde import SubVPSDE
from dposer_tpu.utils.benchtime import steady_state
from dposer_tpu.models import ScoreModelFC
from dposer_tpu.ops.pallas.fused_em import get_pallas_em_sampler

BATCH, DIM, N = 500, 63, 1000
M_PIPE = 8


def build():
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=1024, embed_dim=512,
                         n_blocks=2, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, DIM)),
                        jnp.zeros((1,)))["params"]
    return model, params, SubVPSDE(N=N)


def time_variant(name, model, params, sde, **kw):
    t0 = time.perf_counter()
    sampler = get_pallas_em_sampler(sde, model, params, (BATCH, DIM), eps=1e-3,
                                    **kw)
    _, x = sampler(jax.random.PRNGKey(1))
    np.asarray(x)  # force true completion before timing
    compile_s = time.perf_counter() - t0
    ms = steady_state(lambda i: sampler(jax.random.PRNGKey(2 + i))[1],
                      m_pipe=M_PIPE) * 1e3
    print(f"{name:34s} {ms:8.2f} ms/1000steps  ({BATCH / ms * 1e3:7.0f} poses/s)"
          f"  [compile {compile_s:.0f}s]", flush=True)
    return ms


def main():
    print(f"devices: {jax.devices()}", flush=True)
    model, params, sde = build()
    time_variant("host-rng baseline", model, params, sde, rng_mode="host")
    time_variant("kernel-rng baseline", model, params, sde, rng_mode="kernel")
    time_variant("kernel-rng, gn=mm", model, params, sde, rng_mode="kernel",
                 gn="mm")
    time_variant("kernel-rng, no noise", model, params, sde, rng_mode="kernel",
                 _ablate=frozenset({"noise"}))
    time_variant("kernel-rng, no GN", model, params, sde, rng_mode="kernel",
                 _ablate=frozenset({"gn"}))
    time_variant("kernel-rng, no SiLU", model, params, sde, rng_mode="kernel",
                 _ablate=frozenset({"silu"}))
    time_variant("kernel-rng, matmul skeleton", model, params, sde,
                 rng_mode="kernel", _ablate=frozenset({"gn", "silu", "noise"}))


if __name__ == "__main__":
    main()
