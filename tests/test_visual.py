"""Visualization + profiling utilities."""
import os

import numpy as np

from dposer_tpu.body_model import visual


def test_render_mesh_over_background(rng):
    bg = np.ones((128, 96, 3)) * 255
    verts = np.array([[-0.3, -0.3, 0.0], [0.3, -0.3, 0.0], [0.0, 0.4, 0.1],
                      [0.0, 0.0, -0.2]])
    faces = np.array([[0, 1, 2], [0, 1, 3], [1, 2, 3], [0, 2, 3]])
    out = visual.render_mesh(bg, verts, faces,
                             {"focal": (100, 100), "princpt": (48, 64)},
                             view="front")
    assert out.shape == bg.shape
    assert (out < 250).any()  # something was drawn
    # a different view renders differently
    out2 = visual.render_mesh(bg, verts, faces,
                              {"focal": (100, 100), "princpt": (48, 64)},
                              view="left")
    assert not np.allclose(out, out2)


def test_save_obj_and_skeleton(tmp_path, rng):
    verts = rng.normal(size=(5, 3))
    faces = np.array([[0, 1, 2], [2, 3, 4]])
    path = tmp_path / "m.obj"
    visual.save_obj(verts, faces, str(path))
    txt = path.read_text()
    assert txt.count("v ") >= 5 and txt.count("f ") == 2

    joints = rng.normal(size=(2, 22, 3))
    visual.vis_skeletons(joints, str(tmp_path / "sk"))
    assert len(os.listdir(tmp_path / "sk")) == 2


def test_seq_to_video(tmp_path, rng):
    import cv2

    rdir = tmp_path / "renders"
    rdir.mkdir()
    for prefix in ("gt", "out"):
        for i in range(4):
            cv2.imwrite(str(rdir / f"{prefix}_{i:04d}.png"),
                        rng.integers(0, 255, (64, 48, 3)).astype(np.uint8))
    video = tmp_path / "v.mp4"
    visual.seq_to_video(str(rdir), str(tmp_path / "merge"), str(video), fps=10)
    assert video.exists() and video.stat().st_size > 0
    assert len(os.listdir(tmp_path / "merge")) == 4


def test_step_timer_and_annotations():
    import jax.numpy as jnp

    from dposer_tpu.utils.profiling import StepTimer, trace_annotation

    t = StepTimer(smoothing=0.5)
    x = jnp.ones((8,))
    with trace_annotation("unit-test-span"):
        for _ in range(5):
            x = x * 1.0
            t.tick(sync=x)
    assert t.steps == 5
    assert t.steps_per_sec and t.steps_per_sec > 0
