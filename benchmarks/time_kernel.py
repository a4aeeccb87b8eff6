"""Time the fused-EM Pallas kernel variants on the real TPU.

    python -u benchmarks/time_kernel.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dposer_tpu.diffusion.sde import SubVPSDE
from dposer_tpu.models import ScoreModelFC
from dposer_tpu.ops.pallas.fused_em import get_pallas_em_sampler
from dposer_tpu.utils.benchtime import steady_state

DIM, N = 63, 1000


def build():
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=1024, embed_dim=512,
                         n_blocks=2, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, DIM)),
                        jnp.zeros((1,)))["params"]
    return model, params, SubVPSDE(N=N)


def timeit(name, sampler, batch, m_pipe=8, **callkw):
    """Steady-state timing: enqueue m_pipe runs, force completion of the
    last with a D2H read (ordered device execution bounds all of them) —
    a single timed call on this tunneled host includes ~25 ms of fixed RPC
    dispatch latency (see PERFORMANCE.md)."""
    t0 = time.perf_counter()
    _, x = sampler(jax.random.PRNGKey(1), **callkw)
    assert np.isfinite(np.asarray(x)).all(), f"{name}: non-finite output"
    compile_s = time.perf_counter() - t0
    t = steady_state(lambda i: sampler(jax.random.PRNGKey(2 + i), **callkw)[1],
                     m_pipe=m_pipe)
    print(f"{name:38s} {t * 1e3:8.2f} ms/{N}steps  ({batch / t:7.0f} poses/s)"
          f"  [compile {compile_s:.0f}s]  out_std={np.asarray(x).std():.3f}",
          flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    model, params, sde = build()
    B = 500
    s = get_pallas_em_sampler(sde, model, params, (B, DIM), rng_mode="kernel")
    timeit("EM, kernel-rng (headline)", s, B)
    s = get_pallas_em_sampler(sde, model, params, (B, DIM), rng_mode="host")
    timeit("EM, host-rng", s, B)

    # APD/SI metrics protocol: langevin corrector, eps 5e-3 (ref demo.py:142)
    s = get_pallas_em_sampler(sde, model, params, (B, DIM), eps=5e-3,
                              corrector="langevin", snr=0.16,
                              rng_mode="kernel")
    timeit("EM+langevin, kernel-rng (metrics)", s, B)

    # opt-in W8A8 serving mode (scales don't affect timing, so fixed
    # plausible ranges stand in for quant.calibrate_act_amax here)
    amax = np.array([6.0, 3.0, 3.0, 5.0, 3.0, 6.0], np.float32)
    s = get_pallas_em_sampler(sde, model, params, (B, DIM), rng_mode="kernel",
                              quant="int8", act_amax=amax)
    timeit("EM, kernel-rng, int8", s, B)
    s = get_pallas_em_sampler(sde, model, params, (B, DIM), eps=5e-3,
                              corrector="langevin", snr=0.16,
                              rng_mode="kernel", quant="int8", act_amax=amax)
    timeit("EM+langevin, kernel-rng, int8", s, B)

    # completion2 protocol: imputation
    obs = 0.3 * jax.random.normal(jax.random.PRNGKey(7), (B, DIM))
    mask = jnp.zeros((B, DIM)).at[:, 10:30].set(1.0)
    s = get_pallas_em_sampler(sde, model, params, (B, DIM), imputation=True,
                              rng_mode="kernel")
    timeit("EM+imputation, kernel-rng", s, B, observation=obs, mask=mask)

    B = 4096
    s = get_pallas_em_sampler(sde, model, params, (B, DIM), rng_mode="kernel")
    timeit("EM, kernel-rng, batch 4096 (grid)", s, B)

    # hybrid completion serving (DDIM-25 head + lgv-100 pc tail, two
    # dispatches, NFE 225): protocol batch (50x5 hypos tiled = 250) and
    # the serving batch the few-step kernels peak at
    from dposer_tpu.diffusion.few_step import get_pallas_hybrid_sampler

    for B in (250, 4096):
        obs = 0.3 * jax.random.normal(jax.random.PRNGKey(7), (B, DIM))
        mask = jnp.zeros((B, DIM)).at[:, 10:30].set(1.0)
        s = get_pallas_hybrid_sampler(
            sde, model, params, (B, DIM), n_head=25, m_tail=100,
            tail_corrector="langevin", imputation=True, rng_mode="kernel")
        timeit(f"hybrid-lgv-25+100 imputation, batch {B}", s, B,
               observation=obs, mask=mask)


if __name__ == "__main__":
    main()
