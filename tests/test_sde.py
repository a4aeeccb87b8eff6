"""Parity of the JAX SDE library against the reference torch implementation."""
import jax.numpy as jnp
import numpy as np
import pytest

from dposer_tpu.diffusion import sde as sde_lib


def _pairs(ref_sde_lib):
    return [
        (sde_lib.VPSDE(beta_0=0.1, beta_1=20.0, N=1000), ref_sde_lib.VPSDE(0.1, 20.0, N=1000)),
        (sde_lib.SubVPSDE(beta_0=0.1, beta_1=20.0, N=1000), ref_sde_lib.subVPSDE(0.1, 20.0, N=1000)),
        (sde_lib.VESDE(sigma_min=0.01, sigma_max=50.0, N=1000), ref_sde_lib.VESDE(0.01, 50.0, N=1000)),
    ]


@pytest.fixture()
def data(rng, torch):
    x = rng.normal(size=(8, 63)).astype(np.float32)
    t = rng.uniform(1e-3, 1.0, size=(8,)).astype(np.float32)
    return x, t


def test_sde_drift_diffusion(ref_sde_lib, torch, data):
    x, t = data
    for ours, ref in _pairs(ref_sde_lib):
        dj, gj = ours.sde(jnp.asarray(x), jnp.asarray(t))
        dt_, gt_ = ref.sde(torch.from_numpy(x), torch.from_numpy(t))
        np.testing.assert_allclose(np.asarray(dj), dt_.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(gj), gt_.numpy().shape), gt_.numpy(), rtol=1e-5, atol=1e-6)


def test_marginal_prob(ref_sde_lib, torch, data):
    x, t = data
    for ours, ref in _pairs(ref_sde_lib):
        mj, sj = ours.marginal_prob(jnp.asarray(x), jnp.asarray(t))
        mt, st = ref.marginal_prob(torch.from_numpy(x), torch.from_numpy(t))
        np.testing.assert_allclose(np.asarray(mj), mt.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sj), st.numpy(), rtol=1e-5, atol=1e-6)


def test_subvp_std_is_not_sqrt():
    """The asymmetric subVP 'std' convention (ref sde_lib.py:216) is load-bearing."""
    s = sde_lib.SubVPSDE()
    t = jnp.asarray([0.5])
    _, std = s.marginal_prob(jnp.zeros((1, 4)), t)
    lmc = -0.25 * 0.5 ** 2 * (20.0 - 0.1) - 0.5 * 0.5 * 0.1
    assert np.isclose(float(std[0]), 1 - np.exp(2 * lmc), atol=1e-6)


def test_alpha_sigma(ref_sde_lib, torch, data):
    x, t = data
    for ours, ref in _pairs(ref_sde_lib):
        aj, sj = ours.return_alpha_sigma(jnp.asarray(t))
        at, st = ref.return_alpha_sigma(torch.from_numpy(t))
        a_ours, a_ref = np.asarray(aj), at.numpy()
        if a_ours.shape != a_ref.shape:  # VE: ref returns a constant [[1.]]
            a_ref = np.broadcast_to(a_ref, a_ours.shape)
        np.testing.assert_allclose(a_ours, a_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sj), st.numpy(), rtol=1e-5, atol=1e-6)


def test_discretize(ref_sde_lib, torch, data):
    x, t = data
    for ours, ref in _pairs(ref_sde_lib):
        fj, gj = ours.discretize(jnp.asarray(x), jnp.asarray(t))
        ft, gt_ = ref.discretize(torch.from_numpy(x), torch.from_numpy(t))
        np.testing.assert_allclose(np.asarray(fj), ft.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(gj), gt_.numpy().shape), gt_.numpy(), rtol=1e-4, atol=1e-5)


def test_prior_logp(ref_sde_lib, torch, data):
    x, _ = data
    for ours, ref in _pairs(ref_sde_lib):
        lj = ours.prior_logp(jnp.asarray(x))
        lt = ref.prior_logp(torch.from_numpy(x))
        np.testing.assert_allclose(np.asarray(lj), lt.numpy(), rtol=1e-5, atol=1e-5)


def test_reverse_sde_matches_reference(ref_sde_lib, torch, data):
    """Reverse drift with a deterministic fake score function."""
    x, t = data

    def score_jax(xx, tt):
        return -xx * (1.0 + tt[..., None])

    def score_torch(xx, tt, condition=None, mask=None):
        return -xx * (1.0 + tt[..., None])

    for (ours, ref) in _pairs(ref_sde_lib):
        for pf in [False, True]:
            rj = ours.reverse_sde(score_jax, probability_flow=pf)
            dj, gj = rj(jnp.asarray(x), jnp.asarray(t))
            rt = ref.reverse(score_torch, probability_flow=pf)
            dt_, gt_ = rt.sde(torch.from_numpy(x), torch.from_numpy(t))
            np.testing.assert_allclose(np.asarray(dj), dt_.numpy(), rtol=1e-4, atol=1e-5)
            if not pf:
                np.testing.assert_allclose(
                    np.broadcast_to(np.asarray(gj), gt_.numpy().shape), gt_.numpy(),
                    rtol=1e-5, atol=1e-6)


def test_reverse_guided_matches_reference(ref_sde_lib, torch, data):
    x, t = data

    def score_jax(xx, tt):
        return -xx * 0.5

    def score_torch(xx, tt, condition=None, mask=None):
        return -xx * 0.5

    for (ours, ref) in _pairs(ref_sde_lib)[:2]:  # VP, subVP (guide path used by tasks)
        rj = ours.reverse_sde_guided(score_jax)
        dj, gj, aj, s2j, scj = rj(jnp.asarray(x), jnp.asarray(t))
        rt = ref.reverse(score_torch, False)
        dt_, gt_, at, s2t, sct = rt.sde(torch.from_numpy(x), torch.from_numpy(t), guide=True)
        np.testing.assert_allclose(np.asarray(dj), dt_.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(aj), at.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(s2j), s2t.numpy(), rtol=1e-5, atol=1e-6)


def test_timesteps_grid():
    s = sde_lib.SubVPSDE(N=1000)
    ts = s.timesteps(eps=1e-3)
    assert ts.shape == (1000,)
    assert np.isclose(float(ts[0]), 1.0) and np.isclose(float(ts[-1]), 1e-3)


def test_reverse_discretize_matches_reference(ref_sde_lib, torch, data):
    """Discretized reverse iteration — including the reference's quirk of
    keeping the FULL score factor in probability-flow mode (ref
    sde_lib.py:114-115 reads ``* (1.0 if self.probability_flow else 1.)``,
    dropping upstream ScoreSDE's 0.5; we reproduce the reference)."""
    x, t = data

    def score_jax(xx, tt):
        return -xx * (1.0 + tt[..., None])

    def score_torch(xx, tt, condition=None, mask=None):
        return -xx * (1.0 + tt[..., None])

    for (ours, ref) in _pairs(ref_sde_lib):
        for pf in [False, True]:
            rj = ours.reverse_discretize(score_jax, probability_flow=pf)
            fj, gj = rj(jnp.asarray(x), jnp.asarray(t))
            rt = ref.reverse(score_torch, probability_flow=pf)
            ft_, gt_ = rt.discretize(torch.from_numpy(x), torch.from_numpy(t))
            np.testing.assert_allclose(np.asarray(fj), ft_.numpy(),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"{type(ours).__name__} pf={pf}")
            np.testing.assert_allclose(
                np.broadcast_to(np.asarray(gj), gt_.numpy().shape),
                gt_.numpy(), rtol=1e-4, atol=1e-6)
