"""Synthetic SMPL-family model files for body-model tests.

Real SMPL-X releases are license-gated and absent from this environment; the
LBS math is validated on randomly generated models with the exact on-disk
layout of the releases. The kinematic tree uses the REAL published
SMPL-family parent tables (public model-topology constants), so part-wise
metrics behave as they do on the releases (e.g. arm-chain joint positions
respond to arm rotations).
"""
import numpy as np

# Published SMPL-family kinematic parents (body 22 shared by all; SMPL adds
# two hand stubs; SMPL-H/-X add 15-joint hands, SMPL-X also jaw/eyes).
_BODY22 = [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16,
           17, 18, 19]


def _parents(model_type):
    if model_type == "smpl":
        return _BODY22 + [20, 21]
    def hand(wrist, start):
        out = []
        for k in range(5):
            out += [wrist, start + 3 * k, start + 3 * k + 1]
        return out
    if model_type == "smplh":
        return _BODY22 + hand(20, 22) + hand(21, 37)
    # smplx: jaw/leye/reye then the two hands
    return _BODY22 + [15, 15, 15] + hand(20, 25) + hand(21, 40)


def make_synthetic_body_model(path, model_type="smplx", n_verts=120, seed=0,
                              template_scale=1.0):
    """``template_scale`` scales every spatial quantity (template, shape/pose
    blendshapes). 1.0 (default, the historical fixture) yields ~1-2 m bones;
    0.15 yields human-scale ~0.2-0.4 m bones — use that for protocol runs
    where metric scale matters (motion denoising, HMR), since real SMPL-X
    bodies are ~1.7 m and the reference's noise/threshold constants (e.g.
    noise-std 0.04 m, ref run/motion_denoising.py:329-336) assume it."""
    rng = np.random.default_rng(seed)
    n_joints = {"smpl": 24, "smplh": 52, "smplx": 55}[model_type]

    v_template = rng.normal(size=(n_verts, 3)).astype(np.float32)

    if model_type == "smplx":
        shapedirs = np.zeros((n_verts, 3, 400), np.float32)
        shapedirs[:, :, :10] = 0.05 * rng.normal(size=(n_verts, 3, 10))
        shapedirs[:, :, 300:310] = 0.01 * rng.normal(size=(n_verts, 3, 10))
    else:
        shapedirs = 0.05 * rng.normal(size=(n_verts, 3, 10)).astype(np.float32)

    posedirs = 0.001 * rng.normal(size=(n_verts, 3, (n_joints - 1) * 9)).astype(np.float32)

    # joints = averages of distinct vertex groups
    J_regressor = np.zeros((n_joints, n_verts), np.float32)
    group = rng.integers(0, n_joints, size=n_verts)
    for j in range(n_joints):
        members = np.where(group == j)[0]
        if len(members) == 0:
            members = np.array([j % n_verts])
        J_regressor[j, members] = 1.0 / len(members)

    # soft skinning weights biased to each vertex's group joint
    weights = rng.random((n_verts, n_joints)).astype(np.float32) * 0.1
    weights[np.arange(n_verts), group] += 1.0
    weights /= weights.sum(1, keepdims=True)

    # real published kinematic chains (root marker as in releases)
    parents = np.asarray(_parents(model_type), np.int64)
    assert len(parents) == n_joints
    parents[0] = 2 ** 32 - 1
    kintree_table = np.stack([parents, np.arange(n_joints)], 0)

    faces = rng.integers(0, n_verts, size=(64, 3)).astype(np.int32)

    if template_scale != 1.0:
        # applied at the end so the rng draw sequence (and therefore every
        # scale-1.0 golden fixture) is unchanged
        s = np.float32(template_scale)
        v_template = v_template * s
        shapedirs = shapedirs * s
        posedirs = posedirs * s

    data = dict(v_template=v_template, shapedirs=shapedirs, posedirs=posedirs,
                J_regressor=J_regressor, weights=weights,
                kintree_table=kintree_table, f=faces)
    if model_type == "smplx":
        data["lmk_faces_idx"] = rng.integers(0, 64, size=51).astype(np.int32)
        bary = rng.random((51, 3)).astype(np.float32)
        data["lmk_bary_coords"] = (bary / bary.sum(1, keepdims=True)).astype(np.float32)
    np.savez(path, **data)

    # per-model vertex-id table valid for the small vertex count
    vertex_ids = {name: int(rng.integers(0, n_verts)) for name in [
        "nose", "reye", "leye", "rear", "lear",
        "LBigToe", "LSmallToe", "LHeel", "RBigToe", "RSmallToe", "RHeel",
        "lthumb", "lindex", "lmiddle", "lring", "lpinky",
        "rthumb", "rindex", "rmiddle", "rring", "rpinky"]}
    return str(path), vertex_ids


def make_stats_dir(dirpath, dim=63, rng=None, mean=None, std=None):
    """Write normalization stats in the reference layout (.npz). Defaults to
    identity-ish stats; pass ``mean``/``std`` arrays to match a dataset."""
    import os

    rng = rng or np.random.default_rng(0)
    os.makedirs(dirpath, exist_ok=True)
    mean = np.zeros(dim, np.float32) if mean is None else np.asarray(mean, np.float32)
    std = np.ones(dim, np.float32) if std is None else np.asarray(std, np.float32)
    np.savez(os.path.join(dirpath, "axis_normalize1.npz"),
             min_poses=-np.ones(dim, np.float32) * 3,
             max_poses=np.ones(dim, np.float32) * 3,
             min_shapes=np.nan, max_shapes=np.nan)
    np.savez(os.path.join(dirpath, "axis_normalize2.npz"),
             mean_poses=mean, std_poses=std,
             mean_shapes=np.nan, std_shapes=np.nan)
    return str(dirpath)
