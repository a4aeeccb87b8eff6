"""End-to-end checkpoint parity: reference ``.pth`` -> converter -> the FULL
jitted reverse-diffusion sampler must reproduce the reference's own torch
sampling loop.

Closes the loop the per-layer tests leave open (model-forward parity and EMA
sequences are covered separately): a checkpoint in the exact release schema
(ref run/train.py:395-401) with a *real* EMA state is converted and sampled
for all N steps, against the reference's actual ``get_pc_sampler`` loaded
from ``/root/reference`` as a namespace package (ref run/demo.py:114-118 for
the load protocol, sampling.py:375-468 for the loop). Identical per-step
noise is injected on both sides, so the comparison is numerically exact up
to fp32 accumulation.
"""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dposer_tpu.diffusion import sde as sde_lib
from dposer_tpu.diffusion.sampling import get_pc_sampler
from dposer_tpu.diffusion.score_fn import get_score_fn
from dposer_tpu.models import ScoreModelFC
from dposer_tpu.utils.checkpoint import load_params_for_inference

HIDDEN, EMBED, N_BLOCKS = 128, 64, 2
N_STEPS, BATCH, DIM = 50, 8, 63
EPS = 1e-3


@pytest.fixture(scope="module")
def ref_pkg(torch):
    """The reference's sampling/utils modules as a namespace package.

    Appended (not prepended) so the repo's own ``run``/``configs`` win any
    name collision.
    """
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    import lib.algorithms.advanced.sampling as ref_sampling
    import lib.algorithms.advanced.utils as ref_utils
    return ref_sampling, ref_utils


@pytest.fixture(scope="module")
def release_ckpt(tmp_path_factory, torch, ref_model_lib, ref_ema_lib):
    """A synthesized checkpoint in the release schema with a real (non-trivial)
    EMA state: parameters are perturbed a few times with ema.update between,
    so shadow_params != model_state_dict and the EMA mapping is exercised."""
    import ml_collections

    c = ml_collections.ConfigDict()
    c.model = ml_collections.ConfigDict(dict(
        dropout=0.0, embedding_type="positional", fourier_scale=16,
        nonlinearity="swish", scale_by_sigma=True, sigma_min=0.01,
        sigma_max=50.0, num_scales=1000))
    torch.manual_seed(123)
    tmodel = ref_model_lib.ScoreModelFC(c, n_poses=21, pose_dim=3,
                                        hidden_dim=HIDDEN, embed_dim=EMBED,
                                        n_blocks=N_BLOCKS)
    params = [p for p in tmodel.parameters() if p.requires_grad]
    ema = ref_ema_lib.ExponentialMovingAverage(params, decay=0.999)
    with torch.no_grad():
        for _ in range(5):  # fake training steps
            for p in params:
                p.add_(0.02 * torch.randn_like(p))
            ema.update(params)
    path = tmp_path_factory.mktemp("ckpt") / "release.pth"
    torch.save({"model_state_dict": tmodel.state_dict(),
                "optimizer_state_dict": None, "epoch": 3,
                "ema": ema.state_dict(), "step": 400000}, path)
    return str(path), c


def _load_torch_eval_model(torch, ref_model_lib, ref_ema_lib, path, c):
    """Reference inference-load protocol (ref run/demo.py:106-118)."""
    model = ref_model_lib.ScoreModelFC(c, n_poses=21, pose_dim=3,
                                       hidden_dim=HIDDEN, embed_dim=EMBED,
                                       n_blocks=N_BLOCKS)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model.load_state_dict(ckpt["model_state_dict"])
    params = [p for p in model.parameters() if p.requires_grad]
    ema = ref_ema_lib.ExponentialMovingAverage(params, decay=0.999)
    ema.load_state_dict(ckpt["ema"])
    ema.copy_to(params)
    model.eval()
    return model


def _jax_side(path):
    params, step = load_params_for_inference(path, n_blocks=N_BLOCKS)
    assert step == 400000
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=HIDDEN,
                         embed_dim=EMBED, n_blocks=N_BLOCKS, dropout=0.0)
    sde = sde_lib.SubVPSDE(N=N_STEPS)
    score_fn = get_score_fn(sde, lambda x, t: model.apply({"params": params}, x, t),
                            continuous=True)
    return model, params, sde, score_fn


def _generic_sampler_noise(key, n_draws_per_step=("kp",)):
    """Precompute the jitted sampler's per-step normal draws in its exact
    PRNG layout (fold_in(key, i) -> split 4 -> kc, kci, kp, kpi) so the torch
    oracle can consume the identical stream."""
    slots = {"kc": 0, "kci": 1, "kp": 2, "kpi": 3}
    out = []
    for i in range(N_STEPS):
        ks = jax.random.split(jax.random.fold_in(key, i), 4)
        out.append([np.asarray(jax.random.normal(ks[slots[s]], (BATCH, DIM)))
                    for s in n_draws_per_step])
    return out  # [N][draws][B, D]


class _InjectRandn:
    """Monkeypatch torch.randn_like to replay a pregenerated stream."""

    def __init__(self, torch, stream):
        self.torch = torch
        self.flat = [x for step in stream for x in step]
        self.i = 0
        self._orig = None

    def __enter__(self):
        self._orig = self.torch.randn_like

        def fake(x, *a, **k):
            out = self.torch.from_numpy(self.flat[self.i].copy()).to(x.dtype)
            self.i += 1
            return out

        self.torch.randn_like = fake
        return self

    def __exit__(self, *exc):
        self.torch.randn_like = self._orig
        assert self.i == len(self.flat), (self.i, len(self.flat))


def test_pth_to_full_sampler_parity(torch, ref_model_lib, ref_ema_lib,
                                    ref_sde_lib, ref_pkg, release_ckpt):
    """.pth -> convert -> full N-step jitted EM sampler == reference torch loop."""
    ref_sampling, _ = ref_pkg
    path, c = release_ckpt
    tmodel = _load_torch_eval_model(torch, ref_model_lib, ref_ema_lib, path, c)
    _, params, sde, score_fn = _jax_side(path)

    key = jax.random.PRNGKey(11)
    z0 = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (BATCH, DIM)))
    noise = _generic_sampler_noise(key, ("kp",))

    # JAX: the production fused-scan sampler, normal PRNG path
    sampler = get_pc_sampler(sde, (BATCH, DIM), score_fn,
                             predictor="euler_maruyama", corrector="none",
                             denoise=True, eps=EPS)
    _, x_jax = sampler(key, z=jnp.asarray(z0))

    # Torch: the reference's own pc sampler with the identical noise stream
    ref_sde = ref_sde_lib.subVPSDE(beta_min=0.1, beta_max=20.0, N=N_STEPS)
    ref_fn = ref_sampling.get_pc_sampler(
        ref_sde, (BATCH, DIM),
        predictor=ref_sampling.get_predictor("euler_maruyama"),
        corrector=ref_sampling.get_corrector("none"),
        inverse_scaler=lambda x: x, snr=0.16, n_steps=1,
        probability_flow=False, continuous=True, denoise=True, eps=EPS,
        device="cpu")
    with _InjectRandn(torch, noise):
        _, x_ref = ref_fn(tmodel, z=torch.from_numpy(z0.copy()))

    # an untrained score net makes the reverse SDE diverge (|x| ~ 1e4 by
    # t=eps), so relative error is the meaningful yardstick for fp32 parity
    np.testing.assert_allclose(np.asarray(x_jax), x_ref.numpy(),
                               rtol=2e-3, atol=1e-3)


def test_pth_to_imputation_sampler_parity(torch, ref_model_lib, ref_ema_lib,
                                          ref_sde_lib, ref_pkg, release_ckpt):
    """The completion2 protocol: masked imputation inside the reverse sampler
    (ref sampling.py:410-427; the reference only engages it when
    args.task == 'completion')."""
    ref_sampling, _ = ref_pkg
    path, c = release_ckpt
    tmodel = _load_torch_eval_model(torch, ref_model_lib, ref_ema_lib, path, c)
    _, params, sde, score_fn = _jax_side(path)

    key = jax.random.PRNGKey(21)
    z0 = np.asarray(jax.random.normal(jax.random.PRNGKey(6), (BATCH, DIM)))
    rng = np.random.default_rng(0)
    observation = (0.4 * rng.normal(size=(BATCH, DIM))).astype(np.float32)
    mask = np.zeros((BATCH, DIM), np.float32)
    mask[:, 12:30] = 1.0
    # per step the loop draws: corrector-imputation, predictor, predictor-
    # imputation — in that order on both sides
    noise = _generic_sampler_noise(key, ("kci", "kp", "kpi"))

    sampler = get_pc_sampler(sde, (BATCH, DIM), score_fn,
                             predictor="euler_maruyama", corrector="none",
                             denoise=True, eps=EPS, imputation=True)
    _, x_jax = sampler(key, observation=jnp.asarray(observation),
                       mask=jnp.asarray(mask), z=jnp.asarray(z0))

    ref_sde = ref_sde_lib.subVPSDE(beta_min=0.1, beta_max=20.0, N=N_STEPS)
    ref_fn = ref_sampling.get_pc_sampler(
        ref_sde, (BATCH, DIM),
        predictor=ref_sampling.get_predictor("euler_maruyama"),
        corrector=ref_sampling.get_corrector("none"),
        inverse_scaler=lambda x: x, snr=0.16, n_steps=1,
        probability_flow=False, continuous=True, denoise=True, eps=EPS,
        device="cpu")

    class _Args:
        task = "completion"

    with _InjectRandn(torch, noise):
        _, x_ref = ref_fn(tmodel, observation=torch.from_numpy(observation.copy()),
                          mask=torch.from_numpy(mask.copy()),
                          z=torch.from_numpy(z0.copy()), args=_Args())

    # masked re-noising makes the untrained-net trajectory even more chaotic
    # than plain generation; any protocol-wiring bug (draw order, mask logic,
    # coefficients) shows as O(1) relative error, so 1e-2 still discriminates
    np.testing.assert_allclose(np.asarray(x_jax), x_ref.numpy(),
                               rtol=1e-2, atol=1e-2)


def test_pth_to_pallas_kernel_parity(torch, ref_model_lib, ref_ema_lib,
                                     ref_sde_lib, ref_pkg, release_ckpt):
    """The flagship Pallas single-kernel sampler (interpret mode) against the
    reference torch loop — converted checkpoint, injected noise."""
    ref_sampling, _ = ref_pkg
    path, c = release_ckpt
    tmodel = _load_torch_eval_model(torch, ref_model_lib, ref_ema_lib, path, c)
    model, params, sde, _ = _jax_side(path)

    from dposer_tpu.ops.pallas.fused_em import get_pallas_em_sampler

    # short horizon: the kernel's bf16 matmuls decohere from fp32 over long
    # chaotic (untrained-net) trajectories; 20 steps keeps drift bounded while
    # still exercising the converted weights through the whole kernel
    n_steps = 20
    sde = sde_lib.SubVPSDE(N=n_steps)
    key = jax.random.PRNGKey(31)
    z0 = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (BATCH, DIM)))
    noise = np.stack([
        np.asarray(jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(8), i),
                                     (BATCH, DIM))) for i in range(n_steps)])

    sampler = get_pallas_em_sampler(sde, model, params, (BATCH, DIM), eps=EPS,
                                    denoise=True, interpret=True)
    _, x_jax = sampler(key, z=jnp.asarray(z0), noise=jnp.asarray(noise))

    ref_sde = ref_sde_lib.subVPSDE(beta_min=0.1, beta_max=20.0, N=n_steps)
    ref_fn = ref_sampling.get_pc_sampler(
        ref_sde, (BATCH, DIM),
        predictor=ref_sampling.get_predictor("euler_maruyama"),
        corrector=ref_sampling.get_corrector("none"),
        inverse_scaler=lambda x: x, snr=0.16, n_steps=1,
        probability_flow=False, continuous=True, denoise=True, eps=EPS,
        device="cpu")
    with _InjectRandn(torch, [[n] for n in noise]):
        _, x_ref = ref_fn(tmodel, z=torch.from_numpy(z0.copy()))

    ref = x_ref.numpy()
    scale = max(1.0, np.abs(ref).max())
    # bf16 matmul operands inside the kernel -> scale-normalized tolerance
    np.testing.assert_allclose(np.asarray(x_jax), ref, atol=2e-2 * scale)
