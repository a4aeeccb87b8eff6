"""Post-training int8 quantization for the fused sampler kernels.

The bf16 EM kernel is at its measured speed-of-light (PERFORMANCE.md: the
6-matmul chain sits at ~90% of the MXU issue floor, and the VPU work is
the architecture), so the one remaining single-chip throughput lever is
the MXU's int8 path (``benchmarks/mxu_micro.py``: 1.44x the bf16 chain
including in-loop requantization). This module provides the calibration
half of an opt-in W8A8 serving mode:

- weights: symmetric per-output-channel int8 (scales fold into the one
  fp32 rescale row the kernel already applies per matmul)
- activations: symmetric per-tensor int8 with STATIC scales calibrated on
  a real sampling trajectory (this module), baked into the kernel as
  immediates
- the OUTPUT HEAD stays bf16 — the one matmul with no normalizer after
  it; quantizing it injects error directly into the score (measured:
  APD 0.89 -> 1.33 on the flagship from the head ALONE, while the five
  hidden-side matmuls together cost < 2%). It is ~1.5% of the FLOPs.

Quantization error is bounded and measured, not assumed: the sampler's
noise injection dominates per-step rounding exactly as it does for bf16,
and `tests/test_quant.py` pins sample-moment equality on a trained model.
The default path everywhere stays bf16; quantization is opt-in via
``get_pallas_em_sampler(..., quant="int8", act_amax=...)``.

No reference counterpart (the reference samples in fp32 torch; this is a
TPU-serving capability).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...diffusion.fast_sampler import (_corrector_tables, _labels_for,
                                       _pred_tables, get_act,
                                       precompute_time_tables)
from ...diffusion.sde import SDE
from ...models.score_mlp import ScoreModelFC


def n_matmuls(model: ScoreModelFC) -> int:
    """Matmul count of the fused forward: pre + 2*n_blocks + post."""
    return 2 + 2 * model.n_blocks


def _make_amax_forward(model: ScoreModelFC, params, tprojs, out_scale,
                       per_channel: bool = False):
    """``fwd(x, i) -> (model_out, amaxes)`` — the fast-sampler replica
    (``make_fast_forward``) instrumented to record the absolute max of
    every matmul *input*, in kernel matmul order: x, h_pre,
    (h1, h_res)*n_blocks, h_post. ``amaxes`` is a stacked [n_mm] scalar
    vector, or a list of per-channel vectors when ``per_channel``."""
    from ...diffusion.fast_sampler import _group_norm

    act = get_act(model.act_name)
    reduce_in = ((lambda v: jnp.max(jnp.abs(v), axis=0)) if per_channel
                 else (lambda v: jnp.max(jnp.abs(v))))

    def fwd(x, i):
        amaxes = [reduce_in(x)]
        p = params["pre_dense"]
        h = x @ p["kernel"] + p["bias"] + tprojs["pre_dense_t"][i]
        g = params["pre_gnorm"]
        h = act(_group_norm(h, g["scale"], g["bias"]))
        for blk in range(model.n_blocks):
            amaxes.append(reduce_in(h))
            q = params[f"b{blk + 1}_dense1"]
            h1 = h @ q["kernel"] + q["bias"] + tprojs[f"b{blk + 1}_dense1_t"][i]
            g = params[f"b{blk + 1}_gnorm1"]
            h1 = act(_group_norm(h1, g["scale"], g["bias"]))
            amaxes.append(reduce_in(h1))
            q = params[f"b{blk + 1}_dense2"]
            h2 = h1 @ q["kernel"] + q["bias"] + tprojs[f"b{blk + 1}_dense2_t"][i]
            g = params[f"b{blk + 1}_gnorm2"]
            h2 = act(_group_norm(h2, g["scale"], g["bias"]))
            h = h + h2
        amaxes.append(reduce_in(h))
        p = params["post_dense"]
        res = h @ p["kernel"] + p["bias"]
        if out_scale is not None:
            res = res * out_scale[i]
        return res, (amaxes if per_channel else jnp.stack(amaxes))

    return fwd


def calibrate_act_amax(sde: SDE, model: ScoreModelFC, params,
                       shape: Tuple[int, ...], key,
                       eps: float = 1e-3, margin: float = 1.1,
                       corrector: str = "none", snr: float = 0.16,
                       n_corrector_steps: int = 1,
                       predictor: str = "euler_maruyama") -> np.ndarray:
    """Per-matmul-input activation ranges along a real sampling trajectory.

    Runs the fp32 tabled EM (or PC, with ``corrector='langevin'``) loop for
    the full ``sde.N`` steps at batch ``shape[0]`` and records the running
    max |input| of each of the ``n_matmuls(model)`` matmuls, times
    ``margin``. The result feeds ``get_pallas_em_sampler(quant='int8',
    act_amax=...)``; clipping of beyond-calibration outliers is part of the
    quantizer's contract (symmetric saturating int8).

    One trajectory batch is enough in practice (ranges are dominated by the
    GN/SiLU envelope, not the sample); pass a larger batch or fold several
    keys for extra margin.
    """
    assert corrector in ("none", "langevin")
    timesteps = sde.timesteps(eps)
    labels = _labels_for(sde, timesteps)
    cx, cout, cnoise = _pred_tables(sde, timesteps, predictor)
    tprojs, out_scale = precompute_time_tables(model, params, labels)
    fwd = _make_amax_forward(model, params, tprojs, out_scale)
    score_scale, alpha = _corrector_tables(sde, timesteps, out_scale)
    if out_scale is not None:
        cout = cout * out_scale
    n_corr = n_corrector_steps if corrector == "langevin" else 0

    def step(carry, i):
        x, amax = carry
        ki = jax.random.fold_in(key, i)
        for j in range(n_corr):
            out, am = fwd(x, i)
            amax = jnp.maximum(amax, am)
            score = score_scale[i] * out
            z = jax.random.normal(jax.random.fold_in(ki, j), x.shape)
            grad_norm = jnp.mean(jnp.linalg.norm(score, axis=-1))
            noise_norm = jnp.mean(jnp.linalg.norm(z, axis=-1))
            step_size = (snr * noise_norm / grad_norm) ** 2 * 2.0 * alpha[i]
            x = x + step_size * score + jnp.sqrt(2.0 * step_size) * z
        out, am = fwd(x, i)
        amax = jnp.maximum(amax, am)
        x_mean = cx[i] * x + cout[i] * out
        z = jax.random.normal(jax.random.fold_in(ki, 7), x.shape)
        x = x_mean + cnoise[i] * z
        return (x, amax), None

    x0 = sde.prior_sampling(jax.random.fold_in(key, 2 ** 31), shape)
    amax0 = jnp.zeros((n_matmuls(model),), jnp.float32)

    @jax.jit
    def run(x0):
        (xN, amax), _ = jax.lax.scan(step, (x0, amax0),
                                     jnp.arange(timesteps.shape[0]))
        return amax

    amax = np.asarray(run(x0), np.float64) * margin
    if not np.all(amax > 0):
        raise ValueError(f"calibration produced non-positive ranges: {amax}")
    return amax.astype(np.float32)


def quantize_cols(Wf: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-column int8: returns (W_q int8 [in, out],
    scales fp32 [out]) with ``W ~= W_q * scales``. All-zero columns
    (padding) quantize to zero with scale zero."""
    s = jnp.max(jnp.abs(Wf), axis=0) / 127.0
    q = jnp.clip(jnp.round(Wf / jnp.maximum(s, 1e-30)), -127, 127)
    return q.astype(jnp.int8), s.astype(jnp.float32)


def calibrate_act_amax_per_channel(sde: SDE, model: ScoreModelFC, params,
                                   shape: Tuple[int, ...], key,
                                   eps: float = 1e-3, margin: float = 1.1,
                                   corrector: str = "none", snr: float = 0.16,
                                   n_corrector_steps: int = 1,
                                   predictor: str = "euler_maruyama"):
    """PER-CHANNEL activation ranges along a real sampling trajectory:
    a list of ``n_matmuls`` fp32 arrays (``[dim]`` for the input matmul,
    ``[hidden]`` for the rest), each the running max |input| per channel.

    Motivation (measured on the round-4 400k flagship): trained GN scales
    develop OUTLIER CHANNELS — two matmul inputs peak at ~100 while the
    typical channel is O(1-5), so a per-TENSOR int8 scale leaves ordinary
    channels with only a few quantization levels and the sampled
    distribution inflates (APD 1.34 vs 0.90, bpd diverges). Per-channel
    ranges feed the SmoothQuant-style fold in ``smooth_fold`` /
    ``build_network_operands(act_amax=<per-channel>)``, which restores
    protocol-level quality at the same kernel cost.
    """
    assert corrector in ("none", "langevin")
    timesteps = sde.timesteps(eps)
    labels = _labels_for(sde, timesteps)
    cx, cout, cnoise = _pred_tables(sde, timesteps, predictor)
    tprojs, out_scale = precompute_time_tables(model, params, labels)
    fwd = _make_amax_forward(model, params, tprojs, out_scale,
                             per_channel=True)
    score_scale, alpha = _corrector_tables(sde, timesteps, out_scale)
    if out_scale is not None:
        cout = cout * out_scale
    n_corr = n_corrector_steps if corrector == "langevin" else 0

    def step(carry, i):
        x, amax = carry
        ki = jax.random.fold_in(key, i)
        for j in range(n_corr):
            out, am = fwd(x, i)
            amax = jax.tree.map(jnp.maximum, amax, am)
            score = score_scale[i] * out
            z = jax.random.normal(jax.random.fold_in(ki, j), x.shape)
            grad_norm = jnp.mean(jnp.linalg.norm(score, axis=-1))
            noise_norm = jnp.mean(jnp.linalg.norm(z, axis=-1))
            step_size = (snr * noise_norm / grad_norm) ** 2 * 2.0 * alpha[i]
            x = x + step_size * score + jnp.sqrt(2.0 * step_size) * z
        out, am = fwd(x, i)
        amax = jax.tree.map(jnp.maximum, amax, am)
        x_mean = cx[i] * x + cout[i] * out
        z = jax.random.normal(jax.random.fold_in(ki, 7), x.shape)
        x = x_mean + cnoise[i] * z
        return (x, amax), None

    x0 = sde.prior_sampling(jax.random.fold_in(key, 2 ** 31), shape)
    dim = shape[-1]
    amax0 = ([jnp.zeros((dim,), jnp.float32)]
             + [jnp.zeros((model.hidden_dim,), jnp.float32)
                for _ in range(n_matmuls(model) - 1)])

    @jax.jit
    def run(x0):
        (xN, amax), _ = jax.lax.scan(step, (x0, amax0),
                                     jnp.arange(timesteps.shape[0]))
        return amax

    out = [np.asarray(a, np.float64) * margin for a in run(x0)]
    if not all(np.all(np.isfinite(a)) and a.max() > 0 for a in out):
        raise ValueError("per-channel calibration produced invalid ranges")
    # channels that never light up (or padded) get the tensor max so the
    # fold is a no-op for them
    return [np.where(a > 0, a, a.max()).astype(np.float32) for a in out]


def smooth_fold(amax_ch: np.ndarray, Wf: np.ndarray, alpha: float = 0.5):
    """SmoothQuant-style difficulty migration for one matmul: per-input-
    channel scales ``s_k = amax_ch_k^alpha / wmax_k^(1-alpha)`` (normalized
    to geometric-mean 1 so typical magnitudes are untouched), returning
    ``(inv_in [in], W_folded [in, out], amax_t)`` with the EXACT algebra

        h @ W == (h / s) @ (s[:, None] * W)

    ``inv_in = 127 / (s * amax_t)`` is the runtime per-channel quantization
    row (one VPU multiply, same cost as the per-tensor scalar) and
    ``amax_t = max_k(amax_ch_k / s_k)`` the folded per-tensor range.
    Outlier activation channels (trained GN scales reach ~100 vs O(1)
    typical) get divided down instead of stealing the whole int8 range."""
    amax_ch = np.asarray(amax_ch, np.float64)
    wmax = np.abs(np.asarray(Wf, np.float64)).max(axis=1)
    valid = (amax_ch > 0) & (wmax > 0)
    s = np.ones_like(amax_ch)
    s[valid] = amax_ch[valid] ** alpha / wmax[valid] ** (1.0 - alpha)
    s /= np.exp(np.log(s[valid]).mean()) if valid.any() else 1.0
    amax_t = float((amax_ch / s).max())
    inv_in = (127.0 / (s * amax_t)).astype(np.float32)
    return inv_in, (s[:, None] * np.asarray(Wf, np.float64)).astype(np.float32), amax_t


def make_fast_forward_int8(model: ScoreModelFC, params, tprojs, out_scale,
                           act_amax, alpha: float = 0.5) -> "callable":
    """Step-indexed XLA twin of the kernel's int8 forward — identical
    quantization math (same per-column weight scales, same static
    activation scales, saturating round) in plain jnp, for tests and for
    measuring quantization error without a TPU. Operates in the
    UNPERMUTED parameter domain; int32 accumulation is order-exact, so it
    matches the kernel up to fp32 GN/SiLU ordering.

    ``act_amax``: per-tensor ``[n_mm]`` scalars (legacy), or the
    per-channel list from ``calibrate_act_amax_per_channel`` — then each
    matmul applies the ``smooth_fold`` migration with ``alpha``.

    Like the kernel, the OUTPUT HEAD stays unquantized (bf16 there, fp32
    here): it is the only matmul with no normalizer after it, so its
    quantization error lands directly on the score — measured on the
    round-4 flagship, an int8 head alone inflates APD 0.89 -> 1.33 while
    the five hidden-side matmuls together cost < 2% (and the head is only
    ~1.5% of the FLOPs). ``act_amax``'s final entry is accepted and
    ignored for calibration-interface stability."""
    from ...diffusion.fast_sampler import _group_norm

    act = get_act(model.act_name)
    n_mm = n_matmuls(model)
    per_channel = isinstance(act_amax, (list, tuple))
    if not per_channel:
        act_amax = np.asarray(act_amax, np.float32)
        if act_amax.shape != (n_mm,):
            raise ValueError(f"act_amax must have shape ({n_mm},)")
    elif len(act_amax) != n_mm:
        raise ValueError(f"per-channel act_amax must have {n_mm} entries")

    names = (["pre_dense"]
             + [f"b{b + 1}_dense{j}" for b in range(model.n_blocks)
                for j in (1, 2)]
             + ["post_dense"])
    Wq, sw, inv_in, deq = {}, {}, {}, {}
    for k, name in enumerate(names):
        Wf = np.asarray(params[name]["kernel"], np.float32)
        if per_channel:
            inv_k, Wf, amax_t = smooth_fold(act_amax[k], Wf, alpha=alpha)
            inv_in[name] = jnp.asarray(inv_k)
            deq_t = amax_t / 127.0
        else:
            inv_in[name] = jnp.full((Wf.shape[0],), 127.0 / act_amax[k],
                                    jnp.float32)
            deq_t = float(act_amax[k]) / 127.0
        Wq[name], sw[name] = quantize_cols(jnp.asarray(Wf))
        deq[name] = deq_t * sw[name]

    Wpost_f = jnp.asarray(params["post_dense"]["kernel"], jnp.float32)

    def qmm(h, k, name):
        if name == "post_dense":
            return h @ Wpost_f
        hq = jnp.clip(jnp.round(h * inv_in[name]), -127, 127).astype(jnp.int8)
        acc = jnp.dot(hq, Wq[name], preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * deq[name]

    def fwd(x, i):
        h = qmm(x, 0, "pre_dense") + params["pre_dense"]["bias"] \
            + tprojs["pre_dense_t"][i]
        g = params["pre_gnorm"]
        h = act(_group_norm(h, g["scale"], g["bias"]))
        for blk in range(model.n_blocks):
            q = f"b{blk + 1}_dense1"
            h1 = qmm(h, 1 + 2 * blk, q) + params[q]["bias"] \
                + tprojs[f"{q}_t"][i]
            g = params[f"b{blk + 1}_gnorm1"]
            h1 = act(_group_norm(h1, g["scale"], g["bias"]))
            q = f"b{blk + 1}_dense2"
            h2 = qmm(h1, 2 + 2 * blk, q) + params[q]["bias"] \
                + tprojs[f"{q}_t"][i]
            g = params[f"b{blk + 1}_gnorm2"]
            h2 = act(_group_norm(h2, g["scale"], g["bias"]))
            h = h + h2
        res = qmm(h, n_mm - 1, "post_dense") + params["post_dense"]["bias"]
        if out_scale is not None:
            res = res * out_scale[i]
        return res

    return fwd
