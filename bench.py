"""Headline benchmark: 500-sample x 1000-step subVP pose generation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

- value: poses/sec of the flagship sampler (ScoreModelFC 1024/512/2 blocks,
  axis rep, batch 500) on the default JAX backend (TPU when available).
  On TPU this is steady-state throughput: M protocol runs are enqueued
  back-to-back and completion of the last output is forced with a
  device-to-host read (device execution is ordered, so this bounds ALL M
  runs). Enqueueing this way amortizes the ~25 ms/dispatch RPC latency of
  the tunneled host, which is a property of the host link, not the chip —
  see PERFORMANCE.md "Dispatch latency vs device time".
- vs_baseline: ratio against the reference PyTorch implementation measured
  on this machine's CPU (torch model + EM python loop, the reference's
  compute pattern, extrapolated from a short run). Falls back to a recorded
  constant when torch or the reference tree is unavailable.
"""
import json
import os
import sys
import time

N_SAMPLES = 500
N_STEPS = 1000
POSE_DIM = 63
# Torch-CPU reference rate measured on this host (2026-08-16 session, the
# same session as the PERFORMANCE.md headline table). Used only when torch
# or /root/reference is unavailable AND no cached measurement exists, so
# vs_baseline never degrades to null. Host-load caveat: torch-CPU throughput
# varies ~2x with load, so ratios against this constant are approximate.
FALLBACK_BASELINE_POSES_PER_SEC = 4.45
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_baseline_cache.json")


def measure_tpu() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from dposer_tpu.diffusion.sde import SubVPSDE
    from dposer_tpu.models import ScoreModelFC

    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=1024, embed_dim=512,
                         n_blocks=2, dropout=0.1)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, POSE_DIM)), jnp.zeros((1,)))["params"]
    sde = SubVPSDE(N=N_STEPS)

    # headline path: the single-kernel Pallas sampler; fall back to the
    # fused-scan XLA sampler on backends without Mosaic
    on_tpu = jax.default_backend() == "tpu"
    try:
        from dposer_tpu.ops.pallas.fused_em import get_pallas_em_sampler

        sampler = get_pallas_em_sampler(sde, model, params,
                                        (N_SAMPLES, POSE_DIM), eps=1e-3,
                                        rng_mode="kernel")
        _, x = sampler(jax.random.PRNGKey(1))
        x.block_until_ready()
    except Exception:
        from dposer_tpu.diffusion.sampling import get_pc_sampler
        from dposer_tpu.diffusion.score_fn import get_score_fn

        score_fn = get_score_fn(sde, lambda x, t: model.apply({"params": params}, x, t))
        sampler = get_pc_sampler(sde, (N_SAMPLES, POSE_DIM), score_fn,
                                 predictor="euler_maruyama", corrector="none",
                                 denoise=True, eps=1e-3)
        _, x = sampler(jax.random.PRNGKey(1))
        x.block_until_ready()
    np.asarray(x)  # force true completion before timing (tunnel queues async)

    from dposer_tpu.utils.benchtime import steady_state

    t = steady_state(lambda i: sampler(jax.random.PRNGKey(2 + i))[1],
                     m_pipe=8 if on_tpu else 1)
    return N_SAMPLES / t


def measure_torch_cpu_baseline(probe_steps: int = 20) -> float:
    """Reference compute pattern: torch ScoreModelFC + per-step python EM loop
    on CPU (the reference's own model/sde code, loaded read-only)."""
    import importlib.util

    import numpy as np
    import torch

    torch.set_num_threads(os.cpu_count() or 1)

    ref_root = "/root/reference"
    if not os.path.isdir(ref_root):
        raise FileNotFoundError(ref_root)

    def load(rel, name):
        spec = importlib.util.spec_from_file_location(name, os.path.join(ref_root, rel))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    refm = load("lib/algorithms/advanced/model.py", "bench_ref_model")
    refs = load("lib/algorithms/advanced/sde_lib.py", "bench_ref_sde")

    import ml_collections

    c = ml_collections.ConfigDict()
    c.model = ml_collections.ConfigDict(dict(
        dropout=0.1, embedding_type="positional", fourier_scale=16,
        nonlinearity="swish", scale_by_sigma=True, sigma_min=0.01,
        sigma_max=50.0, num_scales=N_STEPS))
    model = refm.ScoreModelFC(c, n_poses=21, pose_dim=3, hidden_dim=1024,
                              embed_dim=512, n_blocks=2)
    model.eval()
    sde = refs.subVPSDE(0.1, 20.0, N=N_STEPS)

    timesteps = torch.linspace(1.0, 1e-3, N_STEPS)
    x = torch.randn(N_SAMPLES, POSE_DIM)
    dt = -1.0 / N_STEPS

    def em_step(x, t):
        vec_t = torch.ones(N_SAMPLES) * t
        drift, diffusion = sde.sde(x, vec_t)
        _, std = sde.marginal_prob(torch.zeros_like(x), vec_t)
        with torch.no_grad():
            score = -model(x, vec_t * 999) / std[:, None]
        drift = drift - diffusion[:, None] ** 2 * score
        x_mean = x + drift * dt
        return x_mean + diffusion[:, None] * np.sqrt(-dt) * torch.randn_like(x)

    x = em_step(x, timesteps[0])  # warmup
    t0 = time.perf_counter()
    for i in range(1, 1 + probe_steps):
        x = em_step(x, timesteps[i])
    elapsed_per_step = (time.perf_counter() - t0) / probe_steps
    return N_SAMPLES / (elapsed_per_step * N_STEPS)


def get_baseline() -> "tuple[float, str]":
    """Return (poses_per_sec, source) where source is cache|fresh|fallback."""
    if os.path.exists(BASELINE_CACHE):
        try:
            return json.load(open(BASELINE_CACHE))["poses_per_sec"], "cache"
        except Exception:
            pass
    try:
        baseline = measure_torch_cpu_baseline()
        try:
            json.dump({"poses_per_sec": baseline}, open(BASELINE_CACHE, "w"))
        except OSError:
            pass
        return baseline, "fresh"
    except Exception:
        return FALLBACK_BASELINE_POSES_PER_SEC, "fallback"


def main():
    value = measure_tpu()
    baseline, source = get_baseline()
    vs = value / baseline if baseline and baseline == baseline else None
    print(json.dumps({
        "metric": "subvp_generation_poses_per_sec",
        "value": round(value, 2),
        "unit": "poses/s (500 samples x 1000 steps)",
        "vs_baseline": None if vs is None else round(vs, 2),
        "baseline_source": source,
    }))


if __name__ == "__main__":
    main()
