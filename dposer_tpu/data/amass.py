"""AMASS pose dataset + normalizers.

Capability parity with ref ``lib/dataset/AMASS.py`` (AMASSDataset,
Posenormalizer) — numpy/JAX-native, no torch DataLoader. Tensors live as
numpy on host; batches stream to device via the trainer.

Data layout (identical to the reference): ``<root>/<version>/<subset>/
pose_body.pt`` (+``betas.pt``), and normalization-parameter caches computed
on the *train* split:

- ``{rot}_normalize1.pt``: ``{min_poses, max_poses, min_shapes, max_shapes}``
- ``{rot}_normalize2.pt``: ``{mean_poses, std_poses, mean_shapes, std_shapes}``

``.pt`` loading uses torch when present (host-side only); ``.npz`` siblings
with the same dict keys are supported for torch-free deployments and are the
preferred native cache format.
"""
from __future__ import annotations

import os
from typing import Dict, Iterator, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.rotations import axis_angle_to_rot6d, rot6d_to_axis_angle

N_POSES = 21  # SMPL-X body joints in the prior (ref AMASS.py:9)


def _load_tensor_file(path: str) -> Dict[str, np.ndarray] | np.ndarray:
    """Load a ``.pt`` (torch) or ``.npz``/``.npy`` (numpy) tensor file."""
    npz_path = os.path.splitext(path)[0] + ".npz"
    npy_path = os.path.splitext(path)[0] + ".npy"
    if os.path.exists(path) and path.endswith(".pt"):
        import torch  # host-side only

        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict):
            return {k: (None if v is None else np.asarray(v.detach().cpu().numpy().copy()))
                    for k, v in obj.items()}
        return np.asarray(obj.detach().cpu().numpy().copy())
    if os.path.exists(npz_path):
        with np.load(npz_path, allow_pickle=True) as f:
            return {k: f[k] for k in f.files}
    if os.path.exists(npy_path):
        return np.load(npy_path)
    raise FileNotFoundError(f"no tensor file at {path} (.pt/.npz/.npy)")


def _axis_to_rot6d_flat(poses: np.ndarray) -> np.ndarray:
    n = len(poses)
    return np.asarray(axis_angle_to_rot6d(jnp.asarray(poses.reshape(-1, 3)))).reshape(n, -1)


class AMASSDataset:
    """Flat body-pose dataset (ref AMASS.py:12-184).

    Returns dict batches ``{'poses': [B, D]}`` (+``'shapes'``) with D = 63
    (axis) or 126 (rot6d). Normalization params are computed on the train
    split and cached next to the data under the reference's filenames.
    """

    def __init__(self, root_path: str, version: str = "version0", subset: str = "train",
                 sample_interval: Optional[int] = None, rot_rep: str = "rot6d",
                 return_shape: bool = False, normalize: bool = True, min_max: bool = True):
        assert subset in ["train", "valid", "test"]
        assert rot_rep in ["axis", "rot6d"]
        self.root_path = root_path
        self.version = version
        self.subset = subset
        self.rot_rep = rot_rep
        self.return_shape = return_shape
        self.normalize = normalize
        self.min_max = min_max

        self.poses, self.shapes = self._read_data()
        if sample_interval:
            self.poses = self.poses[::sample_interval]
            if self.shapes is not None:
                self.shapes = self.shapes[::sample_interval]
        if self.normalize:
            self._normalize_in_place()
        self.real_data_len = len(self.poses)

    # -- data ----------------------------------------------------------------
    def _read_data(self, subset: Optional[str] = None
                   ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        data_path = os.path.join(self.root_path, self.version,
                                 subset or self.subset)
        poses = _load_tensor_file(os.path.join(data_path, "pose_body.pt"))
        poses = np.asarray(poses, np.float32)
        shapes = None
        if self.return_shape:
            shapes = np.asarray(_load_tensor_file(os.path.join(data_path, "betas.pt")), np.float32)
        if self.rot_rep == "rot6d":
            poses = _axis_to_rot6d_flat(poses)
        return poses, shapes

    # -- normalization ---------------------------------------------------------
    def _stats_path(self) -> str:
        suffix = "_normalize1" if self.min_max else "_normalize2"
        return os.path.join(self.root_path, self.version, "train", self.rot_rep + suffix + ".pt")

    def _load_or_compute_stats(self) -> Dict[str, Optional[np.ndarray]]:
        """Load the cached train-split normalization params, or compute and
        cache them — always FROM THE TRAIN SPLIT. The reference computes
        from whatever subset happens to be loaded (ref AMASS.py:95-121,
        despite its own "Use train dataset for normalize computing"
        comment), so a test-first run on a fresh machine would silently
        normalize with test-derived stats AND poison the shared cache for
        every later run; here a non-train dataset reads the train split's
        tensors to compute them (full split, no subsample)."""
        path = self._stats_path()
        keys = (("min_poses", "max_poses", "min_shapes", "max_shapes")
                if self.min_max else
                ("mean_poses", "std_poses", "mean_shapes", "std_shapes"))
        try:
            raw = _load_tensor_file(path)
            out: Dict[str, Optional[np.ndarray]] = {}
            for k in keys:
                v = raw.get(k)
                # absent keys and legacy 0-d NaN placeholders both mean
                # "no shape stats" — never normalize by NaN
                if v is None or (np.ndim(v) == 0 and not np.isfinite(v).all()):
                    out[k] = None
                else:
                    out[k] = np.asarray(v, np.float32)
            return out
        except FileNotFoundError:
            pass
        if self.subset == "train":
            # reference-identical: stats over the loaded (possibly
            # subsampled) train tensor
            poses, shapes = self.poses, self.shapes
        else:
            try:
                poses, shapes = self._read_data("train")
            except FileNotFoundError as e:
                raise FileNotFoundError(
                    f"normalization stats missing at {path} and no train "
                    f"split to compute them from ({e}); prepare the train "
                    f"split or copy the reference's cached stats") from None
        # compute and cache BOTH families from the same train tensors — the
        # reference ships all four files and PoseNormalizer loads both, so a
        # fresh machine must be able to derive the full set in one pass
        minmax_stats = {
            "min_poses": poses.min(0), "max_poses": poses.max(0),
            "min_shapes": shapes.min(0) if shapes is not None else None,
            "max_shapes": shapes.max(0) if shapes is not None else None,
        }
        zscore_stats = {
            "mean_poses": poses.mean(0),
            # torch.std defaults to Bessel correction (ddof=1), ref AMASS.py:110
            "std_poses": poses.std(0, ddof=1),
            "mean_shapes": shapes.mean(0) if shapes is not None else None,
            "std_shapes": shapes.std(0, ddof=1) if shapes is not None else None,
        }
        train_dir = os.path.dirname(path)
        for suffix, st in (("_normalize1", minmax_stats),
                           ("_normalize2", zscore_stats)):
            out_path = os.path.join(train_dir, self.rot_rep + suffix + ".npz")
            if not os.path.exists(out_path) and not os.path.exists(
                    os.path.join(train_dir, self.rot_rep + suffix + ".pt")):
                np.savez(out_path,
                         **{k: v for k, v in st.items() if v is not None})
        return minmax_stats if self.min_max else zscore_stats

    def _normalize_in_place(self):
        stats = self._load_or_compute_stats()
        if self.min_max:
            self.min_poses, self.max_poses = stats["min_poses"], stats["max_poses"]
            self.min_shapes, self.max_shapes = stats.get("min_shapes"), stats.get("max_shapes")
            self.poses = 2 * (self.poses - self.min_poses) / (self.max_poses - self.min_poses) - 1
            if self.return_shape and self.min_shapes is not None:
                self.shapes = 2 * (self.shapes - self.min_shapes) / (self.max_shapes - self.min_shapes) - 1
        else:
            self.mean_poses, self.std_poses = stats["mean_poses"], stats["std_poses"]
            self.mean_shapes, self.std_shapes = stats.get("mean_shapes"), stats.get("std_shapes")
            self.poses = (self.poses - self.mean_poses) / self.std_poses
            if self.return_shape and self.mean_shapes is not None:
                self.shapes = (self.shapes - self.mean_shapes) / self.std_shapes

    def Denormalize(self, poses, shapes=None):
        """Inverse of the in-place normalization (ref AMASS.py:135-181).
        With ``normalize=False`` this is the identity (the reference would
        crash on its unset stats attributes)."""
        if not self.normalize:
            return poses if shapes is None else (poses, shapes)
        poses = jnp.asarray(poses)
        if self.min_max:
            mn, mx = jnp.asarray(self.min_poses), jnp.asarray(self.max_poses)
            out = 0.5 * ((poses + 1) * (mx - mn) + 2 * mn)
        else:
            out = poses * jnp.asarray(self.std_poses) + jnp.asarray(self.mean_poses)
        if shapes is None:
            return out
        if self.min_max and self.min_shapes is not None:
            mn, mx = jnp.asarray(self.min_shapes), jnp.asarray(self.max_shapes)
            return out, 0.5 * ((shapes + 1) * (mx - mn) + 2 * mn)
        if not self.min_max and self.mean_shapes is not None:
            return out, shapes * jnp.asarray(self.std_shapes) + jnp.asarray(self.mean_shapes)
        return out

    # -- container protocol ----------------------------------------------------
    def __len__(self):
        return len(self.poses)

    def __getitem__(self, idx):
        out = {"poses": self.poses[idx % self.real_data_len]}
        if self.return_shape:
            out["shapes"] = self.shapes[idx % self.real_data_len]
        return out

    # -- batching ---------------------------------------------------------------
    def train_batches(self, batch_size: int, seed: int = 0,
                      drop_last: bool = True) -> Iterator[np.ndarray]:
        """Infinite shuffled epoch stream of pose batches [B, D]."""
        for idx in self.train_index_batches(batch_size, seed, drop_last):
            yield self.poses[idx]

    def train_index_batches(self, batch_size: int, seed: int = 0,
                            drop_last: bool = True,
                            skip: int = 0) -> Iterator[np.ndarray]:
        """The SAME shuffled stream as :meth:`train_batches`, but yielding
        int32 row indices instead of gathered rows. Device-resident training
        (run.train) ships these 4-byte indices to the chip and gathers from
        the HBM-resident dataset there — the host->device traffic per step
        drops by the pose width (63x) and the per-batch host gather
        disappears.

        ``skip`` fast-forwards the stream by that many batches: skipped
        epochs still draw their permutation (the RNG state must advance
        identically), but nothing is gathered — ~20 ms per 1M-row epoch,
        so resuming a 400k-step run costs seconds. run.train passes the
        restored step so a preempted+resumed run trains on exactly the
        rows an uninterrupted one would (the reference's DataLoader
        restarts from scratch on resume)."""
        rng = np.random.default_rng(seed)
        n = len(self.poses)
        end = n - (n % batch_size) if drop_last else n
        per_epoch = (end + batch_size - 1) // batch_size
        if per_epoch == 0:
            raise ValueError(
                f"batch_size {batch_size} > dataset size {n} with "
                f"drop_last: the stream would yield nothing (reduce the "
                f"batch or disable --sample subsampling)")
        for _ in range(skip // per_epoch):
            rng.permutation(n)
        start = (skip % per_epoch) * batch_size
        while True:
            perm = rng.permutation(n)
            for i in range(start, end, batch_size):
                yield perm[i:i + batch_size].astype(np.int32)
            start = 0

    def eval_batches(self, batch_size: int, drop_last: bool = True) -> Iterator[np.ndarray]:
        n = len(self.poses)
        end = n - (n % batch_size) if drop_last else n
        for i in range(0, end, batch_size):
            yield self.poses[i:i + batch_size]


class PoseNormalizer:
    """Stateless normalizer over cached train-split stats (ref AMASS.py:187-259).

    Loads BOTH min-max and z-score parameter files; ``offline_normalize`` /
    ``offline_denormalize`` handle [B, D] and [T, B, D] plus axis<->rot6d.
    All math is jnp and jit-friendly.
    """

    def __init__(self, data_path: str, normalize: bool = True, min_max: bool = True,
                 rot_rep: Optional[str] = None):
        assert rot_rep in ["rot6d", "axis"]
        self.normalize = normalize
        self.min_max = min_max
        self.rot_rep = rot_rep
        p1 = _load_tensor_file(os.path.join(data_path, f"{rot_rep}_normalize1.pt"))
        self.min_poses = jnp.asarray(p1["min_poses"], jnp.float32)
        self.max_poses = jnp.asarray(p1["max_poses"], jnp.float32)
        p2 = _load_tensor_file(os.path.join(data_path, f"{rot_rep}_normalize2.pt"))
        self.mean_poses = jnp.asarray(p2["mean_poses"], jnp.float32)
        self.std_poses = jnp.asarray(p2["std_poses"], jnp.float32)

    def offline_normalize(self, poses, from_axis: bool = False):
        poses = jnp.asarray(poses)
        shape = poses.shape
        if from_axis and self.rot_rep == "rot6d":
            poses = axis_angle_to_rot6d(poses.reshape(-1, 3)).reshape(*shape[:-1], -1)
        if not self.normalize:
            return poses
        if self.min_max:
            return 2 * (poses - self.min_poses) / (self.max_poses - self.min_poses) - 1
        return (poses - self.mean_poses) / self.std_poses

    def offline_denormalize(self, poses, to_axis: bool = False):
        poses = jnp.asarray(poses)
        if not self.normalize:
            out = poses
        elif self.min_max:
            out = 0.5 * ((poses + 1) * (self.max_poses - self.min_poses) + 2 * self.min_poses)
        else:
            out = poses * self.std_poses + self.mean_poses
        if to_axis and self.rot_rep == "rot6d":
            shape = out.shape
            out = rot6d_to_axis_angle(out.reshape(-1, 6)).reshape(*shape[:-1], -1)
        return out


# reference spelling (ref AMASS.py:187)
Posenormalizer = PoseNormalizer
