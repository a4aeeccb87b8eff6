"""Verification of vendored joint/vertex tables against their authorities.

The tables were hand-written from public SMPL-ecosystem constants; a single
wrong index silently corrupts the 49-joint remap and every HMR metric, so
they are pinned here two ways:

1. numerically against the reference's own (standalone-loadable) modules —
   ``lib/body_model/utils.py`` / ``constants.py``;
2. anatomically against the vendored ``smplx_vert_segmentation.json`` (a
   byte-identical copy of the public SMPL-X part segmentation the eval
   protocol itself uses): every extra-keypoint vertex id must lie inside the
   body segment it names. Frozen values cite the ``smplx`` package's
   ``vertex_ids.py`` as the external authority.
"""
import json
import os

import numpy as np

from conftest import load_reference_module
from dposer_tpu.body_model import constants as our_constants
from dposer_tpu.body_model.part_indices import smpl_to_openpose
from dposer_tpu.body_model.vertex_ids import EXTRA_JOINT_NAMES, VERTEX_IDS

ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "dposer_tpu", "assets")


def test_smpl_to_openpose_matches_reference_all_combos():
    ref = load_reference_module("lib/body_model/utils.py", "ref_bm_utils")
    for mt in ("smpl", "smplh", "smplx"):
        for fmt in ("coco25", "coco19"):
            for uh in (True, False):
                for uf in (True, False):
                    for ufc in (True, False):
                        a = np.asarray(ref.smpl_to_openpose(
                            mt, use_hands=uh, use_face=uf,
                            use_face_contour=ufc, openpose_format=fmt))
                        b = np.asarray(smpl_to_openpose(
                            mt, use_hands=uh, use_face=uf,
                            use_face_contour=ufc, openpose_format=fmt))
                        np.testing.assert_array_equal(
                            b, a, err_msg=f"{mt}/{fmt}/hands={uh}/face={uf}")


def test_49_joint_map_matches_reference():
    """The CLIFF-wrapper joint remap: [JOINT_MAP[n] for n in JOINT_NAMES]
    with the first 25 replaced by the SMPL->SMPLX openpose hack
    (ref lib/body_model/smpl.py:53-57)."""
    ref_c = load_reference_module("lib/body_model/constants.py", "ref_bm_constants")
    ref_joints = [ref_c.JOINT_MAP[n] for n in ref_c.JOINT_NAMES]
    ref_joints[:25] = [55, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5,
                       8, 1, 4, 7, 56, 57, 58, 59, 60, 61, 62, 63, 64, 65]
    ours = [our_constants.JOINT_MAP[n] for n in our_constants.JOINT_NAMES]
    ours[:25] = list(our_constants.SMPLX_OPENPOSE_MAP)
    assert our_constants.JOINT_NAMES == ref_c.JOINT_NAMES
    assert ours == ref_joints


def test_smplx_vertex_ids_frozen():
    """Frozen values; authority: the public ``smplx`` package,
    smplx/vertex_ids.py (Max-Planck SMPL-X release)."""
    assert VERTEX_IDS["smplx"] == {
        "nose": 9120, "reye": 9929, "leye": 9448, "rear": 616, "lear": 6,
        "rthumb": 8079, "rindex": 7669, "rmiddle": 7794, "rring": 7905,
        "rpinky": 8022,
        "lthumb": 5361, "lindex": 4933, "lmiddle": 5058, "lring": 5169,
        "lpinky": 5286,
        "LBigToe": 5770, "LSmallToe": 5780, "LHeel": 8846,
        "RBigToe": 8463, "RSmallToe": 8474, "RHeel": 8635,
    }
    assert VERTEX_IDS["smplh"] == {
        "nose": 332, "reye": 6260, "leye": 2800, "rear": 4071, "lear": 583,
        "rthumb": 6191, "rindex": 5782, "rmiddle": 5905, "rring": 6016,
        "rpinky": 6133,
        "lthumb": 2746, "lindex": 2319, "lmiddle": 2445, "lring": 2556,
        "lpinky": 2673,
        "LBigToe": 3216, "LSmallToe": 3226, "LHeel": 3387,
        "RBigToe": 6617, "RSmallToe": 6624, "RHeel": 6787,
    }
    assert VERTEX_IDS["smpl"] is VERTEX_IDS["smplh"]
    assert set(EXTRA_JOINT_NAMES) == set(VERTEX_IDS["smplx"])


def test_smplx_vertex_ids_land_in_correct_segments():
    """Each SMPL-X keypoint vertex id must lie inside the body segment it
    names, per the vendored segmentation (md5-identical to the reference's
    public asset, itself consumed by the part-wise MPVPE protocol)."""
    with open(os.path.join(ASSETS, "smplx_vert_segmentation.json")) as f:
        seg = {k: set(v) for k, v in json.load(f).items()}
    expected = {
        "nose": {"head"}, "rear": {"head"}, "lear": {"head"},
        "reye": {"rightEye", "eyeballs"}, "leye": {"leftEye", "eyeballs"},
        "LBigToe": {"leftToeBase"}, "LSmallToe": {"leftToeBase"},
        "LHeel": {"leftFoot"},
        "RBigToe": {"rightToeBase"}, "RSmallToe": {"rightToeBase"},
        "RHeel": {"rightFoot"},
        "lthumb": {"leftHand"}, "rthumb": {"rightHand"},
        "lindex": {"leftHandIndex1"}, "lmiddle": {"leftHandIndex1"},
        "lring": {"leftHandIndex1"}, "lpinky": {"leftHandIndex1"},
        "rindex": {"rightHandIndex1"}, "rmiddle": {"rightHandIndex1"},
        "rring": {"rightHandIndex1"}, "rpinky": {"rightHandIndex1"},
    }
    for name, segments in expected.items():
        vid = VERTEX_IDS["smplx"][name]
        hit = {k for k, s in seg.items() if vid in s}
        assert hit & segments, f"{name} (vertex {vid}) in {hit}, want {segments}"
