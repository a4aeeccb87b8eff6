"""Data preparation utilities: HumanEva splitter + AMASS preparation."""
import os

import numpy as np

from dposer_tpu.data.humaneva import split_npz
from dposer_tpu.data.prepare import AMASS_SPLITS, prepare_split


def test_humaneva_split(tmp_path, rng):
    src = tmp_path / "HumanEva"
    src.mkdir()
    poses = rng.normal(size=(150, 165)).astype(np.float32)  # SMPL-X full pose
    np.savez(src / "Walking_1.npz", poses=poses)
    out = tmp_path / "out"
    split_npz(str(src / "Walking_1.npz"), str(out), seq_len=60)
    files = sorted(os.listdir(out / "HumanEva"))
    assert files == ["Walking_1_batch000.npz", "Walking_1_batch001.npz"]
    d = np.load(out / "HumanEva" / "Walking_1_batch000.npz")
    assert d["pose_body"].shape == (60, 63)
    assert d["root_orient"].shape == (60, 3)
    np.testing.assert_allclose(d["pose_body"], poses[:60, 3:66])


def test_prepare_split(tmp_path, rng):
    amass = tmp_path / "amass"
    seq_dir = amass / "CMU" / "subject1"
    seq_dir.mkdir(parents=True)
    np.savez(seq_dir / "walk_stageii.npz",
             poses=rng.normal(size=(200, 165)).astype(np.float64),
             betas=rng.normal(size=(16,)).astype(np.float64))
    out = tmp_path / "processed"
    prepare_split("train", ["CMU"], str(amass), str(out), save_betas=True)
    pose = np.load(out / "train" / "pose_body.npy")
    betas = np.load(out / "train" / "betas.npy")
    # 30% of middle 80% of 200 frames = 48
    assert pose.shape == (48, 63)
    assert betas.shape == (48, 10)
    assert np.load(out / "train" / "root_orient.npy").shape == (48, 3)
    # .pt siblings written when torch available
    assert os.path.exists(out / "train" / "pose_body.pt")


def test_amass_split_definition():
    assert "CMU" in AMASS_SPLITS["train"]
    assert "HumanEva" in AMASS_SPLITS["valid"]
    assert AMASS_SPLITS["test"] == ["Transitions", "SSM"]
