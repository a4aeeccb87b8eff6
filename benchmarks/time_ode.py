"""Steady-state TPU timings for the ODE paths (round-3 fast fixed-grid
paths vs the adaptive RK45 oracle).

Methodology per PERFORMANCE.md "Dispatch latency vs device time": enqueue M
runs back-to-back, force completion of the LAST output with a D2H read.

    python benchmarks/time_ode.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dposer_tpu.diffusion import sde as sde_lib
from dposer_tpu.diffusion.fast_sampler import (get_fast_ode_sampler,
                                               get_fast_pc_sampler)
from dposer_tpu.diffusion.likelihood import (get_fast_likelihood_fn,
                                             get_likelihood_fn)
from dposer_tpu.diffusion.sampling import get_ode_sampler
from dposer_tpu.diffusion.score_fn import get_score_fn
from dposer_tpu.models import ScoreModelFC

BATCH = 500
DIM = 63


def steady(fn, args, m=8):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[-1])  # compile + settle
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(m)]
    np.asarray(jax.tree.leaves(outs[-1])[-1])
    return (time.perf_counter() - t0) / m


def main():
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=1024,
                         embed_dim=512, n_blocks=2, dropout=0.0,
                         scale_by_sigma=True, num_scales=1000)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, DIM)),
                        jnp.zeros((1,)))["params"]
    sde = sde_lib.SubVPSDE(N=1000)
    score_fn = get_score_fn(sde, lambda x, t: model.apply({"params": params}, x, t),
                            continuous=True)
    key = jax.random.PRNGKey(1)
    z = jax.random.normal(jax.random.PRNGKey(2), (BATCH, DIM))
    rows = []

    # --- PF-ODE sampling, batch 500 -------------------------------------
    ad = get_ode_sampler(sde, (BATCH, DIM), score_fn, denoise=False,
                         rtol=1e-5, atol=1e-5, eps=1e-3)
    t = steady(ad, (key,), m=4)
    nfe = int(ad(key)[0])
    rows.append(("PF-ODE adaptive RK45 (oracle)", t, f"{BATCH / t:,.0f} poses/s, nfe={nfe}"))

    fast = get_fast_ode_sampler(sde, model, params, (BATCH, DIM),
                                n_steps=125, eps=1e-3, denoise=False)
    t = steady(fast, (key,))
    rows.append(("PF-ODE fixed-grid RK4 (125 steps, tabled)", t,
                 f"{BATCH / t:,.0f} poses/s"))

    try:
        from dposer_tpu.ops.pallas.fused_ode import get_pallas_ode_sampler

        pal_rk4 = get_pallas_ode_sampler(sde, model, params, (BATCH, DIM),
                                         n_steps=125, eps=1e-3, denoise=False)
        t = steady(pal_rk4, (key,))
        rows.append(("PF-ODE RK4, Pallas kernel (125 steps)", t,
                     f"{BATCH / t:,.0f} poses/s"))
    except Exception as e:  # noqa: BLE001
        rows.append(("PF-ODE RK4, Pallas kernel", float("nan"), str(e)))

    # --- few-step deterministic samplers (same PF-ODE flow) -------------
    from dposer_tpu.diffusion.few_step import (get_ddim_sampler,
                                               get_dpm_sampler,
                                               get_pallas_ddim_sampler)

    ddim = get_ddim_sampler(sde, model, params, (BATCH, DIM), n_steps=50,
                            eps=1e-3, denoise=False)
    t = steady(ddim, (key,))
    rows.append(("DDIM 50 steps (tabled XLA)", t, f"{BATCH / t:,.0f} poses/s"))
    try:
        pal_ddim = get_pallas_ddim_sampler(sde, model, params, (BATCH, DIM),
                                           n_steps=50, eps=1e-3,
                                           denoise=False, rng_mode="kernel")
        t = steady(pal_ddim, (key,))
        rows.append(("DDIM 50 steps, Pallas kernel", t,
                     f"{BATCH / t:,.0f} poses/s"))
    except Exception as e:  # noqa: BLE001
        rows.append(("DDIM 50 steps, Pallas kernel", float("nan"), str(e)))
    dpm = get_dpm_sampler(sde, model, params, (BATCH, DIM), n_steps=20,
                          eps=1e-3, denoise=False)
    t = steady(dpm, (key,))
    rows.append(("DPM-Solver++(2M) 20 steps (tabled XLA)", t,
                 f"{BATCH / t:,.0f} poses/s"))

    fast_pf = get_fast_pc_sampler(sde, model, params, (BATCH, DIM), eps=1e-5,
                                  denoise=True, probability_flow=True)
    t = steady(fast_pf, (key,))
    rows.append(("PF-Euler decode, tabled XLA scan (1000 steps)", t,
                 f"{BATCH / t:,.0f} poses/s"))

    try:
        from dposer_tpu.ops.pallas.fused_em import get_pallas_em_sampler

        pal = get_pallas_em_sampler(sde, model, params, (BATCH, DIM), eps=1e-5,
                                    denoise=True, probability_flow=True,
                                    rng_mode="kernel")
        t = steady(pal, (key,))
        rows.append(("PF-Euler decode, Pallas kernel (1000 steps)", t,
                     f"{BATCH / t:,.0f} poses/s"))
    except Exception as e:  # noqa: BLE001
        rows.append(("PF-Euler decode, Pallas kernel", float("nan"), str(e)))

    # --- likelihood, batch 50 -------------------------------------------
    data = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (50, DIM))
    ad_lik = get_likelihood_fn(sde, score_fn, rtol=1e-4, atol=1e-4, eps=1e-4)
    t = steady(ad_lik, (key, data), m=4)
    nfe = int(ad_lik(key, data)[2])
    rows.append(("likelihood adaptive RK45, batch 50", t, f"nfe={nfe}"))

    f_lik = get_fast_likelihood_fn(sde, model, params, n_steps=100, eps=1e-4)
    t = steady(f_lik, (key, data))
    rows.append(("likelihood fixed-grid RK4 (100 steps), batch 50", t,
                 "nfe=400"))

    try:
        from dposer_tpu.ops.pallas.fused_lik import get_pallas_likelihood_fn

        k_lik = get_pallas_likelihood_fn(sde, model, params, (50, DIM),
                                         n_steps=100, eps=1e-4)
        t = steady(k_lik, (key, data))
        rows.append(("likelihood Pallas kernel (100 steps), batch 50", t,
                     "nfe=400, in-kernel jvp"))
    except Exception as e:  # noqa: BLE001
        rows.append(("likelihood Pallas kernel", float("nan"), str(e)))

    print(f"\nbackend: {jax.default_backend()}")
    for name, t, note in rows:
        print(f"  {name:48s} {t * 1e3:9.1f} ms   {note}")


if __name__ == "__main__":
    main()
