"""Fused train-step kernel (ops/pallas/fused_train.py) — CPU-side checks.

The kernel is validated in two stages:
- **exactness** (here, interpret mode, compute_dtype=fp32): loss and every
  grad leaf match ``jax.value_and_grad`` of the XLA loss to ~1e-5 — proves
  the hand-written backward (GN/SiLU/dropout chain, adjoint seed, grad
  assembly) implements exactly the right math;
- **bf16 production mode + dropout** run on the real TPU
  (``benchmarks/time_train.py --fused`` and the train-CLI routing), since
  CPU interpret mode has no Mosaic PRNG for the dropout masks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dposer_tpu.diffusion import losses as losses_lib
from dposer_tpu.diffusion.sde import SubVPSDE, VPSDE, VESDE
from dposer_tpu.models import ScoreModelFC
from dposer_tpu.models.score_mlp import make_model_apply
from dposer_tpu.ops.pallas.fused_train import (get_pallas_step_fn,
                                               get_pallas_train_loss_and_grad)

B, D = 64, 63


def _setup(dropout=0.0, hidden=128):
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=hidden,
                         embed_dim=32, n_blocks=2, dropout=dropout)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, D)),
                        jnp.zeros((1,)))["params"]
    batch = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (B, D))
    return model, params, batch


def _worst_rel(g_ref, g_k):
    worst = ("", 0.0)
    for (pa, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g_ref),
                               jax.tree_util.tree_leaves_with_path(g_k)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
        if rel > worst[1]:
            worst = (str(pa), float(rel))
    return worst


@pytest.mark.parametrize("sde_cls", [SubVPSDE, VPSDE])
@pytest.mark.parametrize("reduce_mean", [True, False])
@pytest.mark.parametrize("lw", [False, True])
def test_fp32_grads_match_jax_grad(sde_cls, reduce_mean, lw):
    sde = sde_cls(N=1000)
    model, params, batch = _setup()
    key = jax.random.PRNGKey(7)
    loss_fn = losses_lib.get_sde_loss_fn(
        sde, True, make_model_apply(model), reduce_mean=reduce_mean,
        likelihood_weighting=lw)
    l_ref, g_ref = jax.value_and_grad(loss_fn)(params, key, batch)
    lg = get_pallas_train_loss_and_grad(
        sde, model, reduce_mean=reduce_mean, likelihood_weighting=lw,
        interpret=True, compute_dtype=jnp.float32)
    l_k, g_k = lg(params, key, batch)
    np.testing.assert_allclose(float(l_k), float(l_ref), rtol=1e-4)
    name, rel = _worst_rel(g_ref, g_k)
    assert rel < 5e-4, f"{name}: rel {rel}"


def test_bf16_grads_close_and_aligned():
    """Production bf16 mode: grads are mixed-precision-rounded but must stay
    tightly aligned with the fp32 reference (cosine, relative norm)."""
    sde = SubVPSDE(N=1000)
    model, params, batch = _setup()
    key = jax.random.PRNGKey(7)
    loss_fn = losses_lib.get_sde_loss_fn(sde, True, make_model_apply(model),
                                         reduce_mean=True)
    l_ref, g_ref = jax.value_and_grad(loss_fn)(params, key, batch)
    lg = get_pallas_train_loss_and_grad(sde, model, reduce_mean=True,
                                        interpret=True)
    l_k, g_k = lg(params, key, batch)
    np.testing.assert_allclose(float(l_k), float(l_ref), rtol=3e-3)
    for (pa, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g_ref),
                               jax.tree_util.tree_leaves_with_path(g_k)):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        cos = float((a * b).sum()
                    / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
        assert cos > 0.995, f"{pa}: cosine {cos}"
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
        assert rel < 0.12, f"{pa}: rel {rel}"


def test_gridded_equals_single_block():
    sde = SubVPSDE(N=1000)
    model, params, batch = _setup()
    key = jax.random.PRNGKey(7)
    lg1 = get_pallas_train_loss_and_grad(sde, model, reduce_mean=True,
                                         interpret=True,
                                         compute_dtype=jnp.float32)
    lg2 = get_pallas_train_loss_and_grad(sde, model, reduce_mean=True,
                                         batch_block=16, interpret=True,
                                         compute_dtype=jnp.float32)
    l1, g1 = lg1(params, key, batch)
    l2, g2 = lg2(params, key, batch)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    name, rel = _worst_rel(g1, g2)
    assert rel < 1e-4, f"{name}: rel {rel}"


def test_step_fn_contract_and_training_equivalence():
    """get_pallas_step_fn composes with multi_step and, at fp32/dropout=0,
    reproduces the XLA step's loss trajectory."""
    import ml_collections

    sde = SubVPSDE(N=1000)
    model, params, batch = _setup()
    c = ml_collections.ConfigDict()
    c.optim = ml_collections.ConfigDict(dict(
        optimizer="Adam", lr=2e-3, beta1=0.9, eps=1e-8, warmup=0,
        grad_clip=1.0, weight_decay=0))
    c.model = ml_collections.ConfigDict(dict(ema_rate=0.999))
    state0, tx = losses_lib.init_train_state(c, params)

    ref_step = losses_lib.get_step_fn(sde, True, make_model_apply(model),
                                      tx=tx, reduce_mean=True)
    pal_step = get_pallas_step_fn(sde, model, tx, reduce_mean=True,
                                  interpret=True,
                                  compute_dtype=jnp.float32)
    key = jax.random.PRNGKey(3)
    batches = jnp.stack([batch + 0.01 * i for i in range(4)])
    st_a, ld_a = losses_lib.multi_step(ref_step)(state0, key, batches)
    st_b, ld_b = losses_lib.multi_step(pal_step)(state0, key, batches)
    np.testing.assert_allclose(np.asarray(ld_b["step_loss"]),
                               np.asarray(ld_a["step_loss"]), rtol=1e-4)
    assert int(st_b.step) == 4
    name, rel = _worst_rel(st_a.params, st_b.params)
    assert rel < 1e-3, f"params diverged: {name} rel {rel}"
    name, rel = _worst_rel(st_a.ema.shadow_params, st_b.ema.shadow_params)
    assert rel < 1e-3, f"ema diverged: {name} rel {rel}"


def test_scope_guards():
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=100,  # % 128 != 0
                         embed_dim=32, n_blocks=2)
    with pytest.raises(NotImplementedError):
        get_pallas_train_loss_and_grad(SubVPSDE(), model)
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=128, embed_dim=32,
                         n_blocks=2, embedding_type="fourier")
    with pytest.raises(NotImplementedError):
        get_pallas_train_loss_and_grad(SubVPSDE(), model)
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=128, embed_dim=32,
                         n_blocks=2)
    with pytest.raises(NotImplementedError):
        get_pallas_train_loss_and_grad(VESDE(), model)
    # deeper than the 8-row GN tables support: refuse (silent OOB-row
    # drops otherwise)
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=2048,
                         embed_dim=512, n_blocks=8)
    with pytest.raises(NotImplementedError, match="n_blocks"):
        get_pallas_train_loss_and_grad(SubVPSDE(), model)
    # wide model whose resident W + W^T exceed the VMEM budget even at
    # the minimum 128-row block: must refuse at BUILD time (inside
    # run.train --train-kernel auto's fallback try), not at first dispatch
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=4096,
                         embed_dim=512, n_blocks=3)
    with pytest.raises(NotImplementedError, match="VMEM"):
        get_pallas_train_loss_and_grad(SubVPSDE(), model)
    # boundary model (hidden=2176, n_blocks=2): a small batch runs
    # single-block within budget — building without a hint must succeed —
    # but the flagship batch cannot fit any layout, so the batch_hint
    # check refuses at build time
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=2176,
                         embed_dim=512, n_blocks=2)
    get_pallas_train_loss_and_grad(SubVPSDE(), model)
    get_pallas_train_loss_and_grad(SubVPSDE(), model, batch_hint=128)
    with pytest.raises(NotImplementedError, match="VMEM"):
        get_pallas_train_loss_and_grad(SubVPSDE(), model, batch_hint=1280)
