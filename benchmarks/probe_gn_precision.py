"""Precision probe for ``score_net.group_norm_vpu``'s ONE-PASS variance
(ADVICE r2 #4 / VERDICT r3 Weak #5): measure, don't hand-wave.

The kernel computes group stats in fp32 off the fp32 matmul accumulators as
``var = E[h^2] - E[h]^2`` (score_net.py:226-239). One-pass cancels
catastrophically when ``mean^2 >> var`` — the relative error grows like
``eps_f32 * (1 + mu^2/var)``. This probe emulates the kernel's exact
arithmetic (sequential 128-lane tile adds, lane-strided groups, fp32
throughout) and reports the worst-case relative error of the NORMALIZED
OUTPUT (the quantity that feeds the next matmul) against an fp64 two-pass
reference, over:

- widths 1024 (flagship) / 2048 / 4096
- adversarial activation scales (tiny/huge variance) and offsets
  (mean/std ratios way beyond anything the network produces)
- REAL pre-GN activations captured from the flagship checkpoint across a
  full reverse-diffusion trajectory (--ckpt-path), reporting the observed
  |mu|/std ratio so the adversarial columns can be placed in context.

Decision rule (documented in PERFORMANCE.md "GroupNorm one-pass variance"):
keep one-pass if the output error at the REAL mu/std ratio is <= 1e-5 with
at least a 10x ratio margin before the error crosses 1e-3; otherwise switch
to the centered two-pass form. Measured 2026-08-19: worst real ratio 3.19
-> error ~8e-6; the 1e-3 crossing sits near ratio ~50 (a 16x margin). KEEP.

    python benchmarks/probe_gn_precision.py            # synthetic table
    python benchmarks/probe_gn_precision.py --config configs/subvp/... \
        --ckpt-path output/.../best_model              # + real activations
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NUM_GROUPS = 32
GN_EPS = 1e-5  # score_net.GN_EPS (matches the flax model's epsilon)


def onepass_kernel_emulation(h32):
    """Exactly group_norm_vpu's stat math (score_net.py:226-239) in numpy:
    fp32 sequential tile accumulation, lane-strided groups (feature p in
    group p % 32 AFTER the build's pre-permutation — equivalently, plain
    contiguous groups BEFORE it; we probe in pre-permutation layout with
    reshape, which is the same set of summands in the same dtype)."""
    B, H = h32.shape
    gs = H // NUM_GROUPS
    g = h32.reshape(B, NUM_GROUPS, gs)
    # sequential fp32 adds over the group (the tile/roll tree only changes
    # association order; bound by emulating plain left-to-right, worst case)
    s1 = np.zeros((B, NUM_GROUPS), np.float32)
    s2 = np.zeros((B, NUM_GROUPS), np.float32)
    for k in range(gs):
        t = g[:, :, k]
        s1 += t
        s2 += t * t
    inv = np.float32(1.0 / gs)
    mu = s1 * inv
    var = s2 * inv - mu * mu
    a = 1.0 / np.sqrt(np.maximum(var, 0.0) + np.float32(GN_EPS))
    return ((g - mu[:, :, None]) * a[:, :, None]).reshape(B, H)


def twopass_f32(h32):
    B, H = h32.shape
    g = h32.reshape(B, NUM_GROUPS, H // NUM_GROUPS)
    mu = g.mean(axis=2, dtype=np.float32)
    hc = g - mu[:, :, None]
    var = (hc * hc).mean(axis=2, dtype=np.float32)
    a = 1.0 / np.sqrt(var + np.float32(GN_EPS))
    return (hc * a[:, :, None]).reshape(B, H)


def reference_f64(h32):
    B, H = h32.shape
    g = h32.astype(np.float64).reshape(B, NUM_GROUPS, H // NUM_GROUPS)
    mu = g.mean(axis=2)
    hc = g - mu[:, :, None]
    var = (hc * hc).mean(axis=2)
    a = 1.0 / np.sqrt(var + GN_EPS)
    return (hc * a[:, :, None]).reshape(B, H)


def rel_err(x, ref):
    scale = np.maximum(np.abs(ref).max(), 1e-30)
    return np.abs(x.astype(np.float64) - ref).max() / scale


def probe_case(rng, H, std, offset, B=256):
    h = (offset + std * rng.standard_normal((B, H))).astype(np.float32)
    ref = reference_f64(h)
    return rel_err(onepass_kernel_emulation(h), ref), rel_err(twopass_f32(h), ref)


def real_activations(args):
    """Capture pre-GN activations across a full trajectory of the flagship
    sampler (XLA fast path, CPU ok) and return them grouped per GN site."""
    os.environ.setdefault("DPOSER_PLATFORM", "cpu")
    import jax
    import jax.numpy as jnp

    from ml_collections.config_flags import config_flags  # noqa: F401
    from run.common import load_model_for_inference

    import importlib.util
    spec = importlib.util.spec_from_file_location("cfg", args.config)
    cfg_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cfg_mod)
    config = cfg_mod.get_config()

    model, params, sde, eps, score_fn = load_model_for_inference(
        config, args.ckpt_path, sde_N=100)

    # drive x through the reverse SDE; at each step re-run the flax model
    # with capture_intermediates and reconstruct each GN's INPUT as the sum
    # of its two Dense contributions (score_mlp.py:94-109: h = dense(x) +
    # dense_t(temb) feeds GroupNorm)
    pairs = [("pre_dense", "pre_dense_t")]
    for b in range(1, model.n_blocks + 1):
        pairs += [(f"b{b}_dense1", f"b{b}_dense1_t"),
                  (f"b{b}_dense2", f"b{b}_dense2_t")]

    key = jax.random.PRNGKey(0)
    x = sde.prior_sampling(key, (64, 63))
    ts = np.linspace(sde.T, 1e-3, 100, dtype=np.float32)
    worst = 0.0
    for i, t in enumerate(ts):
        tt = jnp.full((64,), t)
        _, st = model.apply({"params": params}, x, tt * 999,
                            capture_intermediates=True, mutable=["intermediates"])
        inter = st["intermediates"]
        for a, b in pairs:
            h = (np.asarray(inter[a]["__call__"][0], np.float64)
                 + np.asarray(inter[b]["__call__"][0], np.float64))
            g = h.reshape(h.shape[0], NUM_GROUPS, -1)
            mu = np.abs(g.mean(axis=2))
            sd = g.std(axis=2) + 1e-12
            worst = max(worst, float((mu / sd).max()))
        # one reverse-diffusion step to keep x on-trajectory
        score = score_fn(x, tt)
        dt = -1.0 / 100
        drift, diff = sde.sde(x, tt)
        x = x + (drift - diff[:, None] ** 2 * score) * dt
        if i % 25 == 0:
            print(f"  t={t:.3f}: worst |mu|/std so far {worst:.2f}", flush=True)
    return worst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--ckpt-path", type=str, default=None)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    print("| hidden | distribution (|mu|/std) | one-pass err | two-pass err |")
    print("|---|---|---|---|")
    for H in (1024, 2048, 4096):
        for std, off, label in (
                (1.0, 0.0, "N(0,1) (0)"),
                (1.0, 4.0, "N(4,1) (4)"),
                (1.0, 64.0, "N(64,1) (64)"),
                (1.0, 512.0, "N(512,1) (512)"),
                (1e-3, 1.0, "N(1,1e-3) (1000)"),
                (1e4, 0.0, "N(0,1e4) (0)"),
                (1e-4, 0.0, "N(0,1e-4) (0)")):
            e1, e2 = probe_case(rng, H, std, off)
            print(f"| {H} | {label} | {e1:.2e} | {e2:.2e} |")

    if args.ckpt_path:
        print("\nreal flagship activations (full 100-step trajectory):")
        worst = real_activations(args)
        print(f"worst observed |mu|/std across GN sites/steps: {worst:.2f}")


if __name__ == "__main__":
    main()
