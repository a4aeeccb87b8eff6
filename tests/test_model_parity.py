"""ScoreModelFC parity: converted torch checkpoints must produce identical
outputs through the flax model, and EMA numerics must match the reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dposer_tpu.diffusion.ema import ema_init, ema_params, ema_update
from dposer_tpu.models import ScoreModelFC
from dposer_tpu.utils import checkpoint as ckpt_lib


def make_ref_config(embedding_type="positional", scale_by_sigma=True, dropout=0.0):
    import ml_collections

    config = ml_collections.ConfigDict()
    config.model = ml_collections.ConfigDict()
    config.model.dropout = dropout
    config.model.embedding_type = embedding_type
    config.model.fourier_scale = 16
    config.model.nonlinearity = "swish"
    config.model.scale_by_sigma = scale_by_sigma
    config.model.sigma_min = 0.01
    config.model.sigma_max = 50.0
    config.model.num_scales = 1000
    return config


@pytest.fixture(scope="module")
def torch_model(torch, ref_model_lib):
    torch.manual_seed(7)
    config = make_ref_config()
    model = ref_model_lib.ScoreModelFC(config, n_poses=21, pose_dim=3,
                                       hidden_dim=128, embed_dim=64, n_blocks=2)
    model.eval()
    return model


def flax_twin(**overrides):
    kwargs = dict(n_poses=21, pose_dim=3, hidden_dim=128, embed_dim=64,
                  n_blocks=2, dropout=0.0, scale_by_sigma=True,
                  embedding_type="positional")
    kwargs.update(overrides)
    return ScoreModelFC(**kwargs)


def test_forward_parity_after_conversion(torch, torch_model, rng):
    params = ckpt_lib.convert_score_model_state_dict(torch_model.state_dict())
    model = flax_twin()
    x = rng.normal(size=(16, 63)).astype(np.float32)
    t = rng.uniform(0, 999, size=(16,)).astype(np.float32)

    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    out = np.asarray(model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t)))
    # fp32 sin/cos of args up to ~1e3 differ ~6e-5 between libm (torch) and XLA;
    # both are ~4e-5 from the fp64 truth. Tolerance covers that irreducible
    # trig noise amplified through the network (verified in fp64: no
    # systematic mismatch beyond the embedding).
    np.testing.assert_allclose(out, ref_out, rtol=3e-3, atol=1e-3)


def test_forward_parity_fourier(torch, ref_model_lib, rng):
    torch.manual_seed(3)
    config = make_ref_config(embedding_type="fourier", scale_by_sigma=False)
    tmodel = ref_model_lib.ScoreModelFC(config, n_poses=21, pose_dim=6,
                                        hidden_dim=64, embed_dim=32, n_blocks=1)
    tmodel.eval()
    params = ckpt_lib.convert_score_model_state_dict(tmodel.state_dict())
    model = flax_twin(pose_dim=6, hidden_dim=64, embed_dim=32, n_blocks=1,
                      embedding_type="fourier", scale_by_sigma=False, fourier_scale=16.0)
    x = rng.normal(size=(8, 126)).astype(np.float32)
    t = rng.uniform(0.05, 50.0, size=(8,)).astype(np.float32)  # VE sigmas
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    out = np.asarray(model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t)))
    # fourier sin/cos args reach 2π·16·w·log σ (hundreds of radians), so
    # ulp-level libm/codegen differences amplify; the noise floor is
    # HOST-dependent (atol 1e-3 calibrated on one machine failed at 2.9e-3
    # on another). fp64-arbitrated on the failing host: jax-fp32 and
    # torch-fp32 sit 1.96e-3 / 1.04e-3 from the fp64 truth respectively —
    # independent rounding, no systematic mismatch; tolerance covers both.
    np.testing.assert_allclose(out, ref_out, rtol=3e-3, atol=5e-3)


def test_param_structure_matches_flax_init(torch_model, rng):
    """Converted params must be drop-in for flax-initialized params."""
    params = ckpt_lib.convert_score_model_state_dict(torch_model.state_dict())
    model = flax_twin()
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 63)), jnp.zeros((1,)))["params"]
    init_paths = jax.tree_util.tree_structure(init)
    conv_paths = jax.tree_util.tree_structure(params)
    assert init_paths == conv_paths
    for (pa, a), (pb, b) in zip(jax.tree_util.tree_leaves_with_path(init),
                                jax.tree_util.tree_leaves_with_path(params)):
        assert a.shape == b.shape, f"{pa}: {a.shape} vs {b.shape}"


def test_ema_numerics_match_reference(torch, ref_ema_lib, torch_model):
    decay = 0.9999
    tparams = [p for p in torch_model.parameters() if p.requires_grad]
    ema = ref_ema_lib.ExponentialMovingAverage(tparams, decay=decay)

    jstate = ema_init(
        ckpt_lib.convert_ema_shadow_params([p.detach().clone() for p in tparams]),
        decay=decay)

    for step in range(5):
        with torch.no_grad():
            for p in tparams:
                p.add_(0.01 * (step + 1) * torch.randn_like(p))
        ema.update(tparams)
        params_now = ckpt_lib.convert_score_model_state_dict(torch_model.state_dict())
        jstate = ema_update(jstate, params_now)

    ema.copy_to(tparams)
    ref_params = ckpt_lib.convert_score_model_state_dict(torch_model.state_dict())
    ours = ema_params(jstate)
    for (pa, a), (pb, b) in zip(jax.tree_util.tree_leaves_with_path(ref_params),
                                jax.tree_util.tree_leaves_with_path(ours)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6,
                                   err_msg=f"{pa} vs {pb}")
    assert int(jstate.num_updates) == ema.num_updates


def test_full_checkpoint_roundtrip(torch, ref_ema_lib, torch_model, tmp_path, rng):
    """Save a reference-schema .pth, convert it, check EMA-swapped outputs."""
    tparams = [p for p in torch_model.parameters() if p.requires_grad]
    ema = ref_ema_lib.ExponentialMovingAverage(tparams, decay=0.999)
    with torch.no_grad():
        for p in tparams:
            p.add_(0.05 * torch.randn_like(p))
    ema.update(tparams)

    path = tmp_path / "checkpoint-step100.pth"
    torch.save({
        "model_state_dict": torch_model.state_dict(),
        "optimizer_state_dict": None,
        "epoch": 1,
        "ema": ema.state_dict(),
        "step": 100,
    }, path)

    cv = ckpt_lib.convert_torch_checkpoint(str(path))
    assert cv["step"] == 100 and cv["ema_decay"] == 0.999 and cv["ema_num_updates"] == 1

    # EMA copy_to parity (inference-style load, ref run/demo.py:114-118)
    ema.copy_to(tparams)
    x = rng.normal(size=(4, 63)).astype(np.float32)
    t = rng.uniform(0, 999, size=(4,)).astype(np.float32)
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    model = flax_twin()
    out = np.asarray(model.apply({"params": cv["ema_params"]}, jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(out, ref_out, rtol=3e-3, atol=1e-3)

    params, step = ckpt_lib.load_params_for_inference(str(path))
    assert step == 100
    out2 = np.asarray(model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(out2, ref_out, rtol=3e-3, atol=1e-3)


def test_orbax_roundtrip(tmp_path, rng):
    state = {
        "params": {"dense": {"kernel": jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))}},
        "step": 7,
    }
    path = str(tmp_path / "ckpt")
    ckpt_lib.save_train_state(path, state)
    restored = ckpt_lib.restore_train_state(path)
    np.testing.assert_allclose(np.asarray(restored["params"]["dense"]["kernel"]),
                               np.asarray(state["params"]["dense"]["kernel"]))
    assert int(restored["step"]) == 7


def test_time_mlps_parity(torch, ref_model_lib, rng):
    config = make_ref_config()
    torch.manual_seed(11)
    tmodel = ref_model_lib.TimeMLPs(config, n_poses=21, pose_dim=3,
                                    hidden_dim=64, n_blocks=2)
    tmodel.eval()
    from dposer_tpu.models import TimeMLPs
    from dposer_tpu.utils.checkpoint import convert_time_mlps_state_dict

    params = convert_time_mlps_state_dict(tmodel.state_dict(), n_blocks=2)
    model = TimeMLPs(n_poses=21, pose_dim=3, hidden_dim=64, n_blocks=2,
                     dropout=0.0)
    x = rng.normal(size=(8, 63)).astype(np.float32)
    t = rng.uniform(0, 999, size=(8,)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    out = np.asarray(model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_create_score_model_time_mlps():
    import ml_collections

    from dposer_tpu.models import create_score_model

    c = ml_collections.ConfigDict()
    c.data = ml_collections.ConfigDict(dict(rot_rep="axis"))
    c.model = ml_collections.ConfigDict(dict(
        type="TimeMLPs", HIDDEN_DIM=64, N_BLOCKS=2, dropout=0.1,
        nonlinearity="swish"))
    m = create_score_model(c)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 63)), jnp.zeros((1,)))["params"]
    out = m.apply({"params": params}, jnp.zeros((2, 63)), jnp.zeros((2,)))
    assert out.shape == (2, 63)
