"""Metrics: APD parity vs the reference loop, Evaler, alignment errors."""
import jax.numpy as jnp
import numpy as np
import pytest

from dposer_tpu.ops import metrics as M

from fixtures import make_synthetic_body_model


def ref_apd_loop(joints3d):
    """The reference's O(B^2) definition (lib/utils/metric.py:8-37), numpy."""
    b = joints3d.shape[0]
    total = 0.0
    for i in range(b):
        for j in range(i + 1, b):
            total += 2 * np.linalg.norm(joints3d[i] - joints3d[j], axis=1).mean()
    return total / (b * (b - 1))


def test_apd_matches_reference_loop(rng):
    joints = rng.normal(size=(24, 22, 3)).astype(np.float32)
    ours = float(M.average_pairwise_distance(jnp.asarray(joints)))
    ref = ref_apd_loop(joints)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_apd_zero_for_identical(rng):
    j = np.tile(rng.normal(size=(1, 22, 3)).astype(np.float32), (8, 1, 1))
    assert float(M.average_pairwise_distance(jnp.asarray(j))) < 1e-4


def test_si_returns_nan_without_native(rng):
    # native ext may or may not be built yet; either NaN or finite is valid,
    # but shape must match the batch
    v = rng.normal(size=(3, 9, 3)).astype(np.float32)
    f = np.asarray([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32)
    out = M.self_intersections_percentage(v, f)
    assert out.shape == (3,)


def test_evaler_zero_for_identical(tmp_path, rng):
    from dposer_tpu.body_model.smplx_jax import BodyModel

    path, vids = make_synthetic_body_model(tmp_path / "m.npz", "smplx")
    bm = BodyModel(path, vertex_ids=vids)
    poses = (rng.normal(size=(4, 63)) * 0.2).astype(np.float32)
    ev = M.Evaler(bm)
    res = ev.eval_bodys(poses, poses)
    np.testing.assert_allclose(res["mpvpe_all"], 0.0, atol=1e-3)
    np.testing.assert_allclose(res["mpjpe_body"], 0.0, atol=1e-3)


def test_evaler_multi_hypothesis_takes_min(tmp_path, rng):
    from dposer_tpu.body_model.smplx_jax import BodyModel

    path, vids = make_synthetic_body_model(tmp_path / "m.npz", "smplx")
    bm = BodyModel(path, vertex_ids=vids)
    gts = (rng.normal(size=(3, 63)) * 0.2).astype(np.float32)
    # hypothesis 0 = perturbed, hypothesis 1 = exact -> min must be ~0
    outs = np.stack([gts + 0.3 * rng.normal(size=gts.shape).astype(np.float32), gts], axis=1)
    ev = M.Evaler(bm, part="legs")
    res = ev.multi_eval_bodys(outs, gts)
    np.testing.assert_allclose(res["mpjpe_body"], 0.0, atol=1e-3)
    single = ev.eval_bodys(outs[:, 0], gts)
    assert (single["mpjpe_body"] > res["mpjpe_body"] + 1).all()


def test_pa_mpjpe_invariant_to_similarity(rng):
    from dposer_tpu.ops.rotations import axis_angle_to_matrix

    gt = rng.normal(size=(22, 3))
    R = np.asarray(axis_angle_to_matrix(jnp.asarray(rng.normal(size=3) * 0.5)))
    pred = 1.3 * gt @ R.T + np.array([1.0, 2.0, 3.0])
    assert M.pa_mpjpe(pred, gt) < 1e-3
    assert M.pelvis_aligned_mpjpe(gt + 0.5, gt) < 1e-6
