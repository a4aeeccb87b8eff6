"""Data layer: normalizer parity with checked-in reference stats + dataset."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dposer_tpu.body_model.part_indices import BodyPartIndices
from dposer_tpu.data.amass import AMASSDataset, PoseNormalizer, N_POSES
from dposer_tpu.utils.masks import create_mask, part_mask_indices

REF_STATS = "/root/reference/data/AMASS/amass_processed/version1/train"


@pytest.fixture(scope="module")
def ref_stats_available(torch):
    if not os.path.exists(os.path.join(REF_STATS, "axis_normalize2.pt")):
        pytest.skip("reference stats not present")
    return True


def test_normalizer_zscore_roundtrip(ref_stats_available, rng):
    nz = PoseNormalizer(REF_STATS, normalize=True, min_max=False, rot_rep="axis")
    poses = rng.normal(size=(32, 63)).astype(np.float32) * 0.4
    normed = nz.offline_normalize(jnp.asarray(poses))
    denormed = nz.offline_denormalize(normed)
    np.testing.assert_allclose(np.asarray(denormed), poses, atol=1e-5)
    # matches the raw formula with the reference's stats file
    import torch

    stats = torch.load(os.path.join(REF_STATS, "axis_normalize2.pt"), weights_only=False)
    expect = (poses - stats["mean_poses"].numpy()) / stats["std_poses"].numpy()
    np.testing.assert_allclose(np.asarray(normed), expect, rtol=1e-5, atol=1e-6)


def test_normalizer_minmax_roundtrip(ref_stats_available, rng):
    nz = PoseNormalizer(REF_STATS, normalize=True, min_max=True, rot_rep="axis")
    poses = rng.normal(size=(16, 63)).astype(np.float32) * 0.3
    rt = nz.offline_denormalize(nz.offline_normalize(jnp.asarray(poses)))
    np.testing.assert_allclose(np.asarray(rt), poses, atol=1e-5)


def test_normalizer_rot6d_axis_conversion(ref_stats_available, rng):
    nz = PoseNormalizer(REF_STATS, normalize=True, min_max=False, rot_rep="rot6d")
    aa = (rng.normal(size=(8, 63)) * 0.4).astype(np.float32)
    normed = nz.offline_normalize(jnp.asarray(aa), from_axis=True)
    assert normed.shape == (8, 126)
    back = nz.offline_denormalize(normed, to_axis=True)
    np.testing.assert_allclose(np.asarray(back), aa, atol=2e-4)


def test_normalizer_time_batch_shapes(ref_stats_available, rng):
    nz = PoseNormalizer(REF_STATS, normalize=True, min_max=False, rot_rep="axis")
    poses = rng.normal(size=(5, 4, 63)).astype(np.float32)
    normed = nz.offline_normalize(jnp.asarray(poses))
    assert normed.shape == (5, 4, 63)
    rt = nz.offline_denormalize(normed)
    np.testing.assert_allclose(np.asarray(rt), poses, atol=1e-5)


@pytest.fixture()
def toy_dataset(tmp_path, torch, rng):
    """A synthetic on-disk dataset in the reference layout."""
    root = tmp_path / "amass"
    for subset, n in [("train", 200), ("valid", 40), ("test", 40)]:
        d = root / "version1" / subset
        d.mkdir(parents=True)
        torch.save(torch.from_numpy(rng.normal(size=(n, 63)).astype(np.float32) * 0.5),
                   d / "pose_body.pt")
        torch.save(torch.from_numpy(rng.normal(size=(n, 10)).astype(np.float32)),
                   d / "betas.pt")
    return str(root)


def test_dataset_zscore_stats_and_batches(toy_dataset):
    ds = AMASSDataset(toy_dataset, version="version1", subset="train",
                      rot_rep="axis", normalize=True, min_max=False)
    assert ds.poses.shape[1] == 63
    # normalized train split must be ~N(0,1) per-dim
    np.testing.assert_allclose(ds.poses.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(ds.poses.std(0, ddof=1), 1.0, atol=1e-4)
    # stats cache written -> test split reuses train stats
    ds_test = AMASSDataset(toy_dataset, version="version1", subset="test",
                           rot_rep="axis", normalize=True, min_max=False)
    assert os.path.exists(os.path.join(toy_dataset, "version1", "train", "axis_normalize2.npz"))
    it = ds_test.train_batches(16, seed=0)
    b = next(it)
    assert b.shape == (16, 63)
    # denormalize inverts
    rt = ds_test.Denormalize(jnp.asarray(ds_test.poses[:8]))
    raw = AMASSDataset(toy_dataset, version="version1", subset="test",
                       rot_rep="axis", normalize=False).poses[:8]
    np.testing.assert_allclose(np.asarray(rt), raw, atol=1e-5)


def test_train_index_batches_skip_fast_forward(toy_dataset):
    """skip=S reproduces the stream's batch S onward exactly — including
    across epoch boundaries (200 rows / bs 16 -> 12 batches per epoch with
    drop_last) — so a resumed run.train trains on the rows an
    uninterrupted run would."""
    ds = AMASSDataset(toy_dataset, version="version1", subset="train",
                      rot_rep="axis", normalize=False)
    full = ds.train_index_batches(16, seed=3)
    ref = [next(full) for _ in range(30)]
    for skip in (0, 1, 11, 12, 13, 25):  # within / at / past epoch edges
        ff = ds.train_index_batches(16, seed=3, skip=skip)
        got = [next(ff) for _ in range(4)]
        np.testing.assert_array_equal(np.stack(got),
                                      np.stack(ref[skip:skip + 4]),
                                      err_msg=f"skip={skip}")
    # batch > dataset with drop_last would yield nothing forever: must
    # fail loudly naming the sizes, not hang or ZeroDivisionError
    with pytest.raises(ValueError, match="dataset size"):
        next(ds.train_index_batches(4096, seed=3))


def test_stats_computed_from_train_even_when_test_loads_first(toy_dataset):
    """A test-split dataset on a machine with no stats cache must compute
    the normalization params FROM THE TRAIN SPLIT (the reference computes
    from whatever subset is loaded, silently mis-normalizing and poisoning
    the shared cache for every later run)."""
    ds_test = AMASSDataset(toy_dataset, version="version1", subset="test",
                           rot_rep="axis", normalize=True, min_max=False)
    train_raw = AMASSDataset(toy_dataset, version="version1", subset="train",
                             rot_rep="axis", normalize=False).poses
    np.testing.assert_allclose(ds_test.mean_poses, train_raw.mean(0), atol=1e-6)
    np.testing.assert_allclose(ds_test.std_poses, train_raw.std(0, ddof=1),
                               atol=1e-6)
    # the cache it wrote is the train-split cache -> a train run reuses it
    # and lands at ~N(0,1)
    ds_train = AMASSDataset(toy_dataset, version="version1", subset="train",
                            rot_rep="axis", normalize=True, min_max=False)
    np.testing.assert_allclose(ds_train.poses.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(ds_train.poses.std(0, ddof=1), 1.0, atol=1e-4)


def test_shape_stats_cache_round_trip_without_shapes(toy_dataset):
    """A no-shapes run writes the stats cache; a later return_shape=True
    run must compute/keep FINITE shapes (never normalize by the legacy NaN
    placeholder) and poses must normalize identically."""
    AMASSDataset(toy_dataset, version="version1", subset="train",
                 rot_rep="axis", normalize=True, min_max=True)  # writes cache
    ds = AMASSDataset(toy_dataset, version="version1", subset="train",
                      rot_rep="axis", normalize=True, min_max=True,
                      return_shape=True)
    assert np.isfinite(ds.poses).all()
    assert np.isfinite(ds.shapes).all()  # NaN stats would poison these


def test_denormalize_identity_when_normalization_off(toy_dataset):
    ds = AMASSDataset(toy_dataset, version="version1", subset="train",
                      rot_rep="axis", normalize=False)
    x = ds.poses[:4]
    np.testing.assert_array_equal(np.asarray(ds.Denormalize(x)), x)
    p, s = ds.Denormalize(x, np.ones((4, 10)))
    np.testing.assert_array_equal(np.asarray(p), x)
    np.testing.assert_array_equal(np.asarray(s), np.ones((4, 10)))


def test_dataset_rot6d_and_sampling(toy_dataset):
    ds = AMASSDataset(toy_dataset, version="version1", subset="valid",
                      rot_rep="rot6d", normalize=False, sample_interval=2)
    assert ds.poses.shape == (20, 126)


def test_dataset_shapes_returned(toy_dataset):
    ds = AMASSDataset(toy_dataset, version="version1", subset="train",
                      rot_rep="axis", normalize=True, min_max=False, return_shape=True)
    item = ds[0]
    assert item["poses"].shape == (63,) and item["shapes"].shape == (10,)


def test_body_part_indices_match_reference_values():
    """Frozen expectations from the canonical SMPL-X joint order
    (ref lib/body_model/utils.py:39-47)."""
    assert BodyPartIndices.left_leg == [0, 3, 6, 9]
    assert BodyPartIndices.right_leg == [1, 4, 7, 10]
    assert BodyPartIndices.left_arm == [12, 15, 17, 19]
    assert BodyPartIndices.right_arm == [13, 16, 18, 20]
    assert BodyPartIndices.trunk == [2, 5, 8, 15, 16]
    assert BodyPartIndices.hands == [19, 20]
    assert BodyPartIndices.legs == [0, 1, 3, 4, 6, 7, 9, 10]
    assert BodyPartIndices.arms == [12, 13, 15, 16, 17, 18, 19, 20]


def test_create_mask(rng):
    poses = jnp.asarray(rng.normal(size=(6, 63)).astype(np.float32))
    mask, obs = create_mask(jax.random.PRNGKey(0), poses, part="legs")
    idx = part_mask_indices("legs", 3)
    assert mask.shape == poses.shape and obs.shape == poses.shape
    np.testing.assert_array_equal(np.asarray(mask[:, idx]), 0.0)
    keep = np.setdiff1d(np.arange(63), idx)
    np.testing.assert_array_equal(np.asarray(mask[:, keep]), 1.0)
    # observed dims keep the data, masked dims are replaced
    np.testing.assert_allclose(np.asarray(obs[:, keep]), np.asarray(poses[:, keep]))
    assert not np.allclose(np.asarray(obs[:, idx]), np.asarray(poses[:, idx]))
    # rot6d width
    poses6 = jnp.asarray(rng.normal(size=(4, 126)).astype(np.float32))
    mask6, _ = create_mask(jax.random.PRNGKey(1), poses6, part="right_arm")
    assert float(mask6.sum()) == 4 * (126 - 4 * 6)


def test_smpl_to_openpose_tables():
    from dposer_tpu.body_model.part_indices import smpl_to_openpose

    m = smpl_to_openpose("smplx", use_hands=True, use_face=True)
    assert m.shape == (25 + 21 + 21 + 51,)  # body + 2 hands + face
    assert m[0] == 55 and m[-1] == 126
    m19 = smpl_to_openpose("smpl", openpose_format="coco19")
    assert m19.shape == (19,)
    ms = smpl_to_openpose("smpl")
    assert ms.shape == (25,)
