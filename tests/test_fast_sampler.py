"""Fast fused EM sampler must match the generic PC sampler bitwise-closely."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dposer_tpu.diffusion import sde as sde_lib
from dposer_tpu.diffusion.fast_sampler import get_fast_em_sampler
from dposer_tpu.diffusion.sampling import get_pc_sampler
from dposer_tpu.diffusion.score_fn import get_score_fn
from dposer_tpu.models import ScoreModelFC


@pytest.fixture(scope="module")
def setup():
    # scale_by_sigma off for trajectory-equality tests: the 1/sigma output
    # scaling amplifies per-step fp-reassociation noise ~100x, and a
    # random-init net makes reverse trajectories chaotic, so long-horizon
    # bitwise closeness is only meaningful without the amplifier.
    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=128, embed_dim=64,
                         n_blocks=2, dropout=0.0, scale_by_sigma=False)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 63)),
                        jnp.zeros((1,)))["params"]
    return model, params


@pytest.mark.parametrize("sde", [sde_lib.SubVPSDE(N=50), sde_lib.VPSDE(N=50)])
def test_matches_generic_sampler(setup, sde):
    model, params = setup
    shape = (8, 63)
    score_fn = get_score_fn(sde, lambda x, t: model.apply({"params": params}, x, t))
    generic = get_pc_sampler(sde, shape, score_fn, predictor="euler_maruyama",
                             corrector="none", denoise=True, eps=1e-3)
    fast = get_fast_em_sampler(sde, model, params, shape, eps=1e-3, denoise=True)

    key = jax.random.PRNGKey(7)
    _, x_ref = generic(key)
    _, x_fast = fast(key)
    # identical PRNG stream; differences only from re-associated fp math
    # accumulated over 50 steps
    np.testing.assert_allclose(np.asarray(x_fast), np.asarray(x_ref),
                               rtol=5e-2, atol=5e-3)


def test_single_step_equivalence_with_scale_by_sigma():
    """Per-step x_mean must match the generic EM update including the
    1/sigma(t) output scaling (the trajectory-level test above avoids the
    amplifier; this one pins the algebra at each t)."""
    from dposer_tpu.diffusion.fast_sampler import (_em_tables, _labels_for,
                                                   make_fast_forward,
                                                   precompute_time_tables)
    from dposer_tpu.diffusion.sampling import euler_maruyama_predictor

    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=128, embed_dim=64,
                         n_blocks=1, dropout=0.0, scale_by_sigma=True)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 63)),
                        jnp.zeros((1,)))["params"]
    sde = sde_lib.SubVPSDE(N=50)
    timesteps = sde.timesteps(1e-3)
    score_fn = get_score_fn(sde, lambda x, t: model.apply({"params": params}, x, t))
    em = euler_maruyama_predictor(sde, score_fn)
    cx, cout, cnoise = _em_tables(sde, timesteps)
    labels = _labels_for(sde, timesteps)
    tprojs, out_scale = precompute_time_tables(model, params, labels)
    fwd = make_fast_forward(model, params, tprojs, out_scale)

    x = jax.random.normal(jax.random.PRNGKey(9), (8, 63))
    for i in [0, 10, 25, 49]:
        kp = jax.random.PRNGKey(100 + i)
        _, xm_ref = em(kp, x, timesteps[i])
        xm_fast = cx[i] * x + cout[i] * fwd(x, i)
        scale = max(1.0, float(jnp.abs(xm_ref).max()))
        np.testing.assert_allclose(np.asarray(xm_fast), np.asarray(xm_ref),
                                   atol=2e-3 * scale, err_msg=f"step {i}")


def test_ve_sde_variant(setup):
    model, params = setup
    sde = sde_lib.VESDE(N=50)
    fast = get_fast_em_sampler(sde, model, params, (4, 63), eps=1e-5)
    _, x = fast(jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(x)).all()


def test_pregenerated_noise_distribution(setup):
    """Pregenerated-noise mode uses a different stream but must match the
    generic sampler's output distribution."""
    model, params = setup
    sde = sde_lib.SubVPSDE(N=100)
    fast = get_fast_em_sampler(sde, model, params, (512, 63),
                               pregenerate_noise=True)
    slow = get_fast_em_sampler(sde, model, params, (512, 63))
    _, a = fast(jax.random.PRNGKey(0))
    _, b = slow(jax.random.PRNGKey(1))
    a, b = np.asarray(a), np.asarray(b)
    assert abs(a.mean() - b.mean()) < 0.2 * max(1.0, abs(b.mean()))
    assert abs(a.std() - b.std()) < 0.2 * max(1.0, b.std())


def test_from_latent(setup):
    model, params = setup
    sde = sde_lib.SubVPSDE(N=50)
    fast = get_fast_em_sampler(sde, model, params, (4, 63))
    z = jnp.full((4, 63), 0.3)
    _, x1 = fast(jax.random.PRNGKey(0), z=z)
    _, x2 = fast(jax.random.PRNGKey(0), z=z)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_fast_reverse_diffusion_matches_generic():
    """The reverse-diffusion predictor collapses to the same 3-scalar
    tabled update (cx = 1 - f1, cout = G^2*ss, cnoise = G) — must equal
    the generic reverse_diffusion sampler under the shared PRNG layout."""
    from dposer_tpu.diffusion.fast_sampler import get_fast_pc_sampler
    from dposer_tpu.diffusion.sampling import get_pc_sampler
    from dposer_tpu.diffusion.score_fn import get_score_fn

    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=128, embed_dim=64,
                         n_blocks=2, dropout=0.0, scale_by_sigma=True,
                         num_scales=1000)
    dim = 63
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, dim)),
                        jnp.zeros((1,)))["params"]
    for sde in (sde_lib.SubVPSDE(N=30), sde_lib.VESDE(N=30)):
        score_fn = get_score_fn(sde, lambda x, t: model.apply({"params": params}, x, t),
                                continuous=True)
        z0 = jax.random.normal(jax.random.PRNGKey(5), (8, dim))
        generic = get_pc_sampler(sde, (8, dim), score_fn,
                                 predictor="reverse_diffusion",
                                 corrector="none", denoise=True, eps=1e-3)
        _, a = generic(jax.random.PRNGKey(1), z=z0)
        fast = get_fast_pc_sampler(sde, model, params, (8, dim), eps=1e-3,
                                   denoise=True, predictor="reverse_diffusion")
        _, b = fast(jax.random.PRNGKey(1), z=z0)
        a = np.asarray(a)
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(np.asarray(b), a, atol=1e-3 * scale,
                                   err_msg=type(sde).__name__)


def test_pallas_reverse_diffusion_matches_fast():
    """Kernel (interpret) with predictor='reverse_diffusion' == the fast
    XLA twin under injected noise."""
    from dposer_tpu.diffusion.fast_sampler import get_fast_pc_sampler
    from dposer_tpu.ops.pallas.fused_em import get_pallas_em_sampler

    model = ScoreModelFC(n_poses=21, pose_dim=3, hidden_dim=128, embed_dim=64,
                         n_blocks=2, dropout=0.0, scale_by_sigma=False)
    dim = 63
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, dim)),
                        jnp.zeros((1,)))["params"]
    sde = sde_lib.SubVPSDE(N=30)
    z0 = jax.random.normal(jax.random.PRNGKey(6), (8, dim))
    noise = jax.random.normal(jax.random.PRNGKey(7), (30, 1, 8, dim))
    fast = get_fast_pc_sampler(sde, model, params, (8, dim), eps=1e-3,
                               denoise=True, predictor="reverse_diffusion")
    _, ref = fast(jax.random.PRNGKey(0), z=z0, noise=noise)
    kern = get_pallas_em_sampler(sde, model, params, (8, dim), eps=1e-3,
                                 denoise=True, predictor="reverse_diffusion",
                                 interpret=True)
    _, out = kern(jax.random.PRNGKey(0), z=z0, noise=noise)
    ref = np.asarray(ref)
    scale = max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-3 * scale)


def test_bf16_dtype_knob(setup):
    """dtype=bf16 must trace and run (the time tables used to come out
    fp32, promoting the forward and mismatching the scan carry) and stay
    close to the fp32 trajectory."""
    model, params = setup
    sde = sde_lib.SubVPSDE(N=20)
    key = jax.random.PRNGKey(3)
    s16 = get_fast_em_sampler(sde, model, params, (4, 63), dtype=jnp.bfloat16)
    _, x16 = s16(key)
    assert x16.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(x16, np.float32)).all()
    # a random-init net makes the reverse trajectory chaotic (see the
    # fixture note), so only pin the scale: same order of magnitude as the
    # fp32 run, not elementwise closeness
    _, x32 = get_fast_em_sampler(sde, model, params, (4, 63))(key)
    n16 = float(jnp.mean(jnp.abs(x16.astype(jnp.float32))))
    n32 = float(jnp.mean(jnp.abs(x32)))
    assert 0.3 < n16 / n32 < 3.0
