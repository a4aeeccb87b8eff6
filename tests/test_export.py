"""JAX -> torch ``.pth`` export: the inverse of the checkpoint converter.

Closes the trained-model parity loop (VERDICT r3 Missing #1): a checkpoint
trained by THIS framework must be loadable by the reference's own pipelines
(strict ``load_state_dict`` on ref model.py's ScoreModelFC + ref ema.py's
``ExponentialMovingAverage.load_state_dict``, the exact protocol of ref
``run/demo.py:114-118``), and converting the exported ``.pth`` back must be
bit-identical to the original flax params.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dposer_tpu.models import ScoreModelFC
from dposer_tpu.utils.checkpoint import (
    convert_torch_checkpoint,
    export_torch_checkpoint,
    save_torch_checkpoint,
    torch_parameter_order,
)

HIDDEN, EMBED, N_BLOCKS, DIM = 128, 64, 2, 63


def _random_params(seed):
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=HIDDEN,
                         embed_dim=EMBED, n_blocks=N_BLOCKS, dropout=0.0)
    key = jax.random.PRNGKey(seed)
    params = model.init(key, jnp.zeros((1, DIM)), jnp.zeros((1,)))["params"]
    # break init symmetry (zero biases would hide transpose bugs)
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.fold_in(key, 7), len(leaves))
    leaves = [l + 0.1 * jax.random.normal(k, l.shape)
              for l, k in zip(leaves, keys)]
    return model, jax.tree.unflatten(treedef, leaves)


def test_export_roundtrip_bit_identical(tmp_path, torch):
    """params -> .pth -> convert back == identical (params, EMA, step)."""
    _, params = _random_params(0)
    _, ema_params = _random_params(1)
    path = str(tmp_path / "export.pth")
    save_torch_checkpoint(path, params, ema_params=ema_params, step=123456,
                          ema_decay=0.9999, ema_num_updates=123456)
    cv = convert_torch_checkpoint(path, n_blocks=N_BLOCKS)
    assert cv["step"] == 123456
    assert cv["ema_decay"] == 0.9999
    assert cv["ema_num_updates"] == 123456
    for name, a, b in (("params", params, cv["params"]),
                       ("ema", ema_params, cv["ema_params"])):
        fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
        assert len(fa) == len(fb), name
        for x, y in zip(fa, fb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=name)


def test_export_negative_num_updates_maps_to_none(tmp_path, torch):
    """Our 'warmup disabled' convention (negative counter) -> torch None."""
    _, params = _random_params(2)
    ckpt = export_torch_checkpoint(params, ema_params=params, step=1,
                                   ema_num_updates=-1)
    assert ckpt["ema"]["num_updates"] is None


def test_reference_strict_load_and_forward_parity(tmp_path, torch,
                                                  ref_model_lib, ref_ema_lib):
    """The reference's OWN inference-load protocol (ref run/demo.py:106-118)
    accepts our export: strict model.load_state_dict + ema.load_state_dict +
    ema.copy_to, then the torch forward matches our flax forward with the
    exported EMA weights."""
    import ml_collections

    model, params = _random_params(3)
    _, ema_params = _random_params(4)
    path = str(tmp_path / "export.pth")
    save_torch_checkpoint(path, params, ema_params=ema_params, step=200000,
                          ema_decay=0.9999, ema_num_updates=200000)

    c = ml_collections.ConfigDict()
    c.model = ml_collections.ConfigDict(dict(
        dropout=0.0, embedding_type="positional", fourier_scale=16,
        nonlinearity="swish", scale_by_sigma=True, sigma_min=0.01,
        sigma_max=50.0, num_scales=1000))
    tmodel = ref_model_lib.ScoreModelFC(c, n_poses=21, pose_dim=3,
                                        hidden_dim=HIDDEN, embed_dim=EMBED,
                                        n_blocks=N_BLOCKS)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    tmodel.load_state_dict(ckpt["model_state_dict"])  # strict=True default
    tparams = [p for p in tmodel.parameters() if p.requires_grad]
    assert len(ckpt["ema"]["shadow_params"]) == len(tparams) \
        == len(torch_parameter_order(N_BLOCKS))
    ema = ref_ema_lib.ExponentialMovingAverage(tparams, decay=0.9999)
    ema.load_state_dict(ckpt["ema"])
    ema.copy_to(tparams)
    tmodel.eval()

    rng = np.random.default_rng(5)
    x = rng.normal(size=(4, DIM)).astype(np.float32)
    t = rng.uniform(1e-3, 1.0, size=(4,)).astype(np.float32) * 999
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(x), torch.from_numpy(t),
                         condition=None, mask=None).numpy()
    ours = np.asarray(model.apply({"params": ema_params}, jnp.asarray(x),
                                  jnp.asarray(t)))
    # fp32 accumulation-order differences (XLA vs torch AVX kernels); the
    # same tolerance as the converted-checkpoint parity tests
    np.testing.assert_allclose(ours, ref_out, rtol=3e-3, atol=1e-3)


def test_export_cli_direction_inference(tmp_path, torch):
    """orbax dir -> .pth via the module CLI; back-convert equals original."""
    import subprocess
    import sys

    from dposer_tpu.utils.checkpoint import save_train_state

    _, params = _random_params(6)
    state_dir = str(tmp_path / "best_model")
    save_train_state(state_dir, {
        "params": params,
        "ema": {"shadow_params": params, "num_updates": 42, "decay": 0.999},
        "step": 42})
    out_pth = str(tmp_path / "exported.pth")
    p = subprocess.run([sys.executable, "-m", "dposer_tpu.utils.checkpoint",
                        state_dir, out_pth],
                       capture_output=True, text=True, timeout=240)
    assert p.returncode == 0, p.stderr
    assert "exported" in p.stdout
    cv = convert_torch_checkpoint(out_pth, n_blocks=N_BLOCKS)
    assert cv["step"] == 42 and cv["ema_num_updates"] == 42
    for x, y in zip(jax.tree.leaves(params), jax.tree.leaves(cv["params"])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
