"""Checkpointing: PyTorch release-checkpoint conversion + native orbax state.

The reference ships/loads ``.pth`` dicts with schema
``{model_state_dict, optimizer_state_dict, epoch, ema: {decay, num_updates,
shadow_params}, step}`` (ref ``run/train.py:395-401``). This module maps them
into flax parameter pytrees for :class:`dposer_tpu.models.ScoreModelFC`:

- ``Linear.weight`` ([out, in]) -> ``kernel`` ([in, out], transposed)
- ``GroupNorm.weight/bias`` -> ``scale``/``bias``
- ``shared_time_embed.0`` (Sequential index) -> ``shared_time_embed_0``
- the ``sigmas`` buffer is recomputed, never loaded
- ``pre_dense_cond`` exists in torch checkpoints but is dead weight (never
  used in ``forward``, ref model.py:111); it is skipped, but still counted
  when aligning EMA ``shadow_params`` (a plain list ordered by
  ``model.parameters()``, ref ema.py:28-29).

Native checkpoints use orbax (params/opt_state/EMA/step in one pytree).
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Torch -> flax conversion
# ---------------------------------------------------------------------------

_GNORM_KEYS = {"weight": "scale", "bias": "bias"}


def torch_parameter_order(n_blocks: int = 2, embedding_type: str = "positional") -> List[str]:
    """Names of ScoreModelFC params in torch ``model.parameters()`` order
    (attribute registration order), ``requires_grad`` only.

    This order defines the alignment of EMA ``shadow_params`` lists.
    """
    names: List[str] = []

    def linear(prefix):
        names.extend([f"{prefix}.weight", f"{prefix}.bias"])

    linear("pre_dense")
    linear("pre_dense_t")
    linear("pre_dense_cond")  # dead layer, still registered (ref model.py:111)
    linear("pre_gnorm")  # GroupNorm also has weight+bias
    # fourier gauss_proj.W is requires_grad=False -> excluded (ref model.py:17)
    linear("shared_time_embed.0")
    for idx in range(n_blocks):
        for sub in ("dense1", "dense1_t", "gnorm1", "dense2", "dense2_t", "gnorm2"):
            linear(f"b{idx + 1}_{sub}")
    linear("post_dense")
    return names


def _to_numpy(t) -> np.ndarray:
    # ALWAYS copy: torch .numpy() returns a view of torch-owned memory, and
    # jax device_put on CPU may alias numpy buffers zero-copy. Combined with
    # JAX async dispatch, a later in-place torch mutation (optimizer step,
    # ema.copy_to) would corrupt the converted params.
    if isinstance(t, np.ndarray):
        return t.copy()
    return t.detach().cpu().numpy().copy()  # torch tensor


def _flax_name(torch_prefix: str) -> str:
    return "shared_time_embed_0" if torch_prefix == "shared_time_embed.0" else torch_prefix


def convert_score_model_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """torch ``model_state_dict`` -> flax ``params`` dict for ScoreModelFC."""
    params: Dict[str, Dict[str, jnp.ndarray]] = {}
    for key, value in state_dict.items():
        if key == "sigmas" or key.startswith("pre_dense_cond"):
            continue
        arr = np.asarray(_to_numpy(value), dtype=np.float32)
        if key == "gauss_proj.W":
            params.setdefault("gauss_proj", {})["W"] = jnp.asarray(arr)
            continue
        prefix, leaf = key.rsplit(".", 1)
        name = _flax_name(prefix)
        is_gnorm = "gnorm" in name
        if is_gnorm:
            params.setdefault(name, {})[_GNORM_KEYS[leaf]] = jnp.asarray(arr)
        elif leaf == "weight":
            params.setdefault(name, {})["kernel"] = jnp.asarray(arr.T)
        elif leaf == "bias":
            params.setdefault(name, {})["bias"] = jnp.asarray(arr)
        else:
            raise ValueError(f"unrecognized checkpoint entry: {key}")
    return params


def convert_ema_shadow_params(shadow_params: List[Any], n_blocks: int = 2,
                              embedding_type: str = "positional") -> Dict[str, Any]:
    """Ordered EMA shadow list -> flax params dict (same layout transforms)."""
    order = torch_parameter_order(n_blocks, embedding_type)
    if len(order) != len(shadow_params):
        raise ValueError(
            f"EMA shadow length {len(shadow_params)} != expected {len(order)} "
            f"for n_blocks={n_blocks}")
    state_dict = {name: tensor for name, tensor in zip(order, shadow_params)}
    return convert_score_model_state_dict(state_dict)


def convert_time_mlps_state_dict(state_dict: Dict[str, Any],
                                 n_blocks: int = 2) -> Dict[str, Any]:
    """torch TimeMLPs (a Sequential named ``net``) -> flax params.

    torch layout (ref model.py:69-90): net.0 = input Linear, then per block
    [Linear, act, Dropout] at indices 2, 5, 8, ..., final Linear last.
    """
    idx_map = {"net.0": "dense_in"}
    for b in range(n_blocks):
        idx_map[f"net.{2 + 3 * b}"] = f"dense_{b}"
    idx_map[f"net.{2 + 3 * n_blocks}"] = "dense_out"

    params: Dict[str, Dict[str, jnp.ndarray]] = {}
    for key, value in state_dict.items():
        prefix, leaf = key.rsplit(".", 1)
        name = idx_map[prefix]
        arr = np.asarray(_to_numpy(value), dtype=np.float32)
        if leaf == "weight":
            params.setdefault(name, {})["kernel"] = jnp.asarray(arr.T)
        else:
            params.setdefault(name, {})["bias"] = jnp.asarray(arr)
    return params


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Read a reference ``.pth`` checkpoint (requires torch, host-side only)."""
    import torch  # local import: conversion is an offline host utility

    return torch.load(path, map_location="cpu", weights_only=False)


def convert_torch_checkpoint(path_or_dict, n_blocks: int = 2,
                             embedding_type: str = "positional") -> Dict[str, Any]:
    """Full checkpoint conversion.

    Returns ``{'params', 'ema_params' (or None), 'step', 'ema_num_updates',
    'ema_decay'}``.
    """
    ckpt = load_torch_checkpoint(path_or_dict) if isinstance(path_or_dict, (str, os.PathLike)) else path_or_dict
    out: Dict[str, Any] = {
        "params": convert_score_model_state_dict(ckpt["model_state_dict"]),
        "step": int(ckpt.get("step", 0)),
        "ema_params": None,
        "ema_decay": None,
        "ema_num_updates": None,
    }
    ema = ckpt.get("ema")
    if ema is not None:
        out["ema_params"] = convert_ema_shadow_params(
            ema["shadow_params"], n_blocks=n_blocks, embedding_type=embedding_type)
        out["ema_decay"] = float(ema["decay"])
        out["ema_num_updates"] = None if ema["num_updates"] is None else int(ema["num_updates"])
    return out


def load_params_for_inference(path: str, n_blocks: int = 2,
                              embedding_type: str = "positional",
                              use_ema: bool = True) -> Tuple[Dict[str, Any], int]:
    """Load a checkpoint (torch ``.pth`` or native orbax dir) and return the
    inference params (EMA-averaged when available, matching ref
    ``run/demo.py:114-118``) plus the training step."""
    if os.path.isdir(path):
        state = restore_train_state(path)
        params = state["ema"]["shadow_params"] if (use_ema and state.get("ema")) else state["params"]
        return params, int(state.get("step", 0))
    cv = convert_torch_checkpoint(path, n_blocks=n_blocks, embedding_type=embedding_type)
    params = cv["ema_params"] if (use_ema and cv["ema_params"] is not None) else cv["params"]
    return params, cv["step"]


# ---------------------------------------------------------------------------
# Flax -> torch export (the inverse mapping)
# ---------------------------------------------------------------------------

def _torch_prefix(flax_name: str) -> str:
    return "shared_time_embed.0" if flax_name == "shared_time_embed_0" else flax_name


def export_score_model_state_dict(params: Dict[str, Any],
                                  sigma_min: float = 0.01,
                                  sigma_max: float = 50.0,
                                  num_scales: int = 1000) -> Dict[str, np.ndarray]:
    """flax ``params`` -> torch ``model_state_dict`` (numpy values).

    Exact inverse of :func:`convert_score_model_state_dict`, plus the two
    entries the reference model registers but this framework does not carry:

    - ``pre_dense_cond.{weight,bias}``: dead layer (never used in forward,
      ref model.py:111) but present in ``nn.Module.state_dict()``, so a
      strict ``load_state_dict`` on the reference side requires it. Emitted
      as zeros of shape [hidden, hidden]/[hidden].
    - ``sigmas``: a registered buffer recomputed from the SMLD ladder
      (ref utils.py:48-58), geometric from sigma_max down to sigma_min.
    """
    sd: Dict[str, np.ndarray] = {}
    hidden = None
    for name, leaves in params.items():
        prefix = _torch_prefix(name)
        if name == "gauss_proj":
            sd["gauss_proj.W"] = np.asarray(leaves["W"], dtype=np.float32)
            continue
        if "gnorm" in name:
            sd[f"{prefix}.weight"] = np.asarray(leaves["scale"], dtype=np.float32)
            sd[f"{prefix}.bias"] = np.asarray(leaves["bias"], dtype=np.float32)
            continue
        sd[f"{prefix}.weight"] = np.asarray(leaves["kernel"], dtype=np.float32).T
        sd[f"{prefix}.bias"] = np.asarray(leaves["bias"], dtype=np.float32)
        if name == "pre_dense":
            hidden = int(np.asarray(leaves["kernel"]).shape[1])
    if hidden is None:
        raise ValueError("params missing 'pre_dense' — not a ScoreModelFC tree")
    sd["pre_dense_cond.weight"] = np.zeros((hidden, hidden), dtype=np.float32)
    sd["pre_dense_cond.bias"] = np.zeros((hidden,), dtype=np.float32)
    sd["sigmas"] = np.exp(np.linspace(np.log(sigma_max), np.log(sigma_min),
                                      num_scales)).astype(np.float32)
    return sd


def export_torch_checkpoint(params: Dict[str, Any],
                            ema_params: Optional[Dict[str, Any]] = None,
                            step: int = 0,
                            n_blocks: int = 2,
                            embedding_type: str = "positional",
                            ema_decay: float = 0.9999,
                            ema_num_updates: Optional[int] = None,
                            sigma_min: float = 0.01,
                            sigma_max: float = 50.0,
                            num_scales: int = 1000) -> Dict[str, Any]:
    """Build a reference-schema ``.pth`` checkpoint dict from flax params.

    Returns the dict ``{model_state_dict, optimizer_state_dict, epoch, step,
    ema: {decay, num_updates, shadow_params}}`` that the reference's own
    pipelines consume (``run/demo.py:114-118``, ``run/completion.py:236-240``
    load model_state_dict + ema strictly). ``shadow_params`` is an ordered
    torch-tensor list aligned to ``model.parameters()`` registration order
    (ref ema.py:28-29), with zeros in the dead ``pre_dense_cond`` slots.
    Values are torch tensors; save with ``torch.save``.
    """
    import torch  # host-side export utility

    def to_torch_sd(flax_params):
        sd = export_score_model_state_dict(flax_params, sigma_min=sigma_min,
                                           sigma_max=sigma_max,
                                           num_scales=num_scales)
        # copy: np.asarray over jax buffers yields non-writable views, which
        # torch.from_numpy would alias (undefined behavior on torch writes)
        return {k: torch.from_numpy(np.array(v, dtype=np.float32, copy=True))
                for k, v in sd.items()}

    model_sd = to_torch_sd(params)
    ckpt: Dict[str, Any] = {
        "model_state_dict": model_sd,
        "optimizer_state_dict": None,  # inference export; not resumable
        "epoch": 0,
        "step": int(step),
    }
    shadow_source = to_torch_sd(ema_params) if ema_params is not None else model_sd
    order = torch_parameter_order(n_blocks, embedding_type)
    ckpt["ema"] = {
        "decay": float(ema_decay),
        # our convention stores "disabled warmup counter" as negative
        # (ema.py:23); torch's is None
        "num_updates": (None if ema_num_updates is None or ema_num_updates < 0
                        else int(ema_num_updates)),
        "shadow_params": [shadow_source[name].clone() for name in order],
    }
    return ckpt


def save_torch_checkpoint(path: str, *args, **kwargs) -> None:
    """``export_torch_checkpoint`` + ``torch.save`` to ``path``."""
    import torch

    torch.save(export_torch_checkpoint(*args, **kwargs), path)


# ---------------------------------------------------------------------------
# Native orbax checkpoints
# ---------------------------------------------------------------------------

def save_train_state(path: str, state: Dict[str, Any]) -> None:
    """Save a train-state pytree (params/opt_state/ema/step) with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)


def restore_train_state(path: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path, item=target)


def _main():
    """CLI: convert checkpoints in either direction.

        # reference .pth -> native orbax directory
        python -m dposer_tpu.utils.checkpoint ckpt.pth out_dir \
            [--n-blocks 2] [--embedding-type positional]

        # native orbax directory -> reference-schema .pth
        python -m dposer_tpu.utils.checkpoint train_dir/best_model out.pth

    Direction is inferred: a directory source exports to .pth, a file
    source converts to orbax.
    """
    import argparse

    parser = argparse.ArgumentParser(description="Convert DPoser checkpoints "
                                     "between PyTorch .pth and native orbax.")
    parser.add_argument("src", help=".pth checkpoint or orbax directory")
    parser.add_argument("dst", help="output orbax directory or .pth path")
    parser.add_argument("--n-blocks", type=int, default=2)
    parser.add_argument("--embedding-type", type=str, default="positional")
    args = parser.parse_args()

    if os.path.isdir(args.src):  # export: orbax train state -> .pth
        state = restore_train_state(args.src)
        ema = state.get("ema") or {}
        save_torch_checkpoint(
            args.dst, state["params"],
            ema_params=ema.get("shadow_params"),
            step=int(state.get("step", 0)),
            n_blocks=args.n_blocks, embedding_type=args.embedding_type,
            ema_decay=float(ema.get("decay", 0.9999)),
            ema_num_updates=(None if ema.get("num_updates") is None
                             else int(ema["num_updates"])))
        n = sum(np.asarray(p).size for p in jax.tree.leaves(state["params"]))
        print(f"exported {args.src} (step {int(state.get('step', 0))}, "
              f"{n / 1e6:.2f}M params) -> {args.dst}")
        return

    cv = convert_torch_checkpoint(args.src, n_blocks=args.n_blocks,
                                  embedding_type=args.embedding_type)
    state = {"params": cv["params"], "step": cv["step"]}
    if cv["ema_params"] is not None:
        state["ema"] = {"shadow_params": cv["ema_params"],
                        # torch None = use_num_updates disabled -> our convention is a
                        # NEGATIVE counter (ema.py:23); `or 0` would re-enable
                        # the warmup ramp and yank the loaded shadow ~82%
                        # toward raw params on the first resumed step
                        "num_updates": (-1 if cv["ema_num_updates"] is None
                                        else cv["ema_num_updates"]),
                        "decay": cv["ema_decay"]}
    save_train_state(args.dst, state)
    n = sum(np.asarray(p).size for p in jax.tree.leaves(cv["params"]))
    print(f"converted {args.src} (step {cv['step']}, {n / 1e6:.2f}M params) -> {args.dst}")


if __name__ == "__main__":
    _main()
