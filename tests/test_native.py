"""Native C++ helpers: tri-tri intersection, SI metric, rasterizer."""
import numpy as np
import pytest

native = pytest.importorskip("dposer_tpu.native")


@pytest.fixture(scope="module", autouse=True)
def built():
    try:
        native.build_lib()
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")


def test_tri_tri_basic():
    a = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    # crossing triangle through the first one
    b = np.array([[0.2, 0.2, -0.5], [0.4, 0.2, 0.5], [0.2, 0.4, 0.5]], np.float32)
    assert native.mesh_si.tri_tri_test(a, b)
    # far-away triangle
    c = b + np.array([10.0, 0, 0], np.float32)
    assert not native.mesh_si.tri_tri_test(a, c)
    # parallel plane above
    d = a + np.array([0, 0, 1.0], np.float32)
    assert not native.mesh_si.tri_tri_test(a, d)
    # coplanar overlapping
    e = a + np.array([0.1, 0.1, 0.0], np.float32)
    assert native.mesh_si.tri_tri_test(a, e)
    # coplanar disjoint
    f = a + np.array([5.0, 0.0, 0.0], np.float32)
    assert not native.mesh_si.tri_tri_test(a, f)


def test_si_percentage_clean_mesh():
    # two disjoint triangles -> 0%
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                      [0, 0, 5], [1, 0, 5], [0, 1, 5]], np.float32)[None]
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    out = native.mesh_si.self_intersections_percentage(verts, faces)
    np.testing.assert_allclose(out, [0.0])


def test_si_percentage_crossing_pair():
    # a crossing pair among 4 faces -> 50%
    verts = np.array([
        [0, 0, 0], [1, 0, 0], [0, 1, 0],            # tri 0
        [0.2, 0.2, -0.5], [0.4, 0.2, 0.5], [0.2, 0.4, 0.5],  # tri 1 crosses 0
        [5, 0, 0], [6, 0, 0], [5, 1, 0],            # tri 2 far
        [9, 0, 0], [10, 0, 0], [9, 1, 0],           # tri 3 far
    ], np.float32)[None]
    faces = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]], np.int32)
    out = native.mesh_si.self_intersections_percentage(verts, faces)
    np.testing.assert_allclose(out, [50.0])


def test_si_adjacent_faces_excluded():
    # two faces sharing an edge (vertex) must not count as intersecting
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)[None]
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    out = native.mesh_si.self_intersections_percentage(verts, faces)
    np.testing.assert_allclose(out, [0.0])


def test_si_batch(rng):
    verts = rng.normal(size=(3, 30, 3)).astype(np.float32)
    faces = rng.integers(0, 30, size=(40, 3)).astype(np.int32)
    out = native.mesh_si.self_intersections_percentage(verts, faces)
    assert out.shape == (3,)
    assert ((out >= 0) & (out <= 100)).all()


def test_metrics_integration(rng):
    """ops.metrics.self_intersections_percentage uses the native path."""
    from dposer_tpu.ops.metrics import self_intersections_percentage

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                      [0.2, 0.2, -0.5], [0.4, 0.2, 0.5], [0.2, 0.4, 0.5]],
                     np.float32)[None]
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    out = self_intersections_percentage(verts, faces)
    np.testing.assert_allclose(out, [100.0])


def test_rasterizer_matches_numpy_fallback(rng):
    from dposer_tpu.body_model import visual

    verts = np.array([[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0], [0.0, 0.6, 2.2],
                      [0.0, -0.2, 1.8]], np.float64)
    faces = np.array([[0, 1, 2], [0, 1, 3]], np.int64)
    rgb_n, mask_n = native.raster.rasterize(
        verts.astype(np.float32), faces.astype(np.int32), 64, 64, 80.0, 80.0,
        32.0, 32.0, np.array([0.3, 0.3, -1.0], np.float32),
        np.array([0.65, 0.74, 0.86], np.float32))
    assert mask_n.sum() > 50
    # python fallback on the same scene
    import dposer_tpu.body_model.visual as V

    # bypass native by calling the numpy implementation directly
    import importlib

    rgb_p, mask_p = None, None
    # temporarily break native to force fallback
    orig = V.rasterize_mesh.__globals__["__name__"]
    rgb_p, mask_p = _numpy_raster(verts, faces)
    agree = (mask_n == mask_p).mean()
    assert agree > 0.97  # sub-pixel rounding may differ on edges


def _numpy_raster(verts, faces):
    """Invoke the visual-module fallback path without the native lib."""
    import dposer_tpu.body_model.visual as V
    import dposer_tpu.native as N

    real_raster = N.raster
    try:
        class _Broken:
            @staticmethod
            def rasterize(*a, **k):
                raise RuntimeError("forced fallback")

        N.raster = _Broken
        return V.rasterize_mesh(verts, faces, 64, 64, (80.0, 80.0), (32.0, 32.0))
    finally:
        N.raster = real_raster


def test_si_multithreaded_matches_single():
    """Threaded batch SI == single-thread (per-thread scratch, no races)."""
    from dposer_tpu.native import mesh_si

    rng = np.random.default_rng(5)
    verts = rng.normal(size=(6, 60, 3)).astype(np.float32)
    faces = rng.integers(0, 60, size=(100, 3)).astype(np.int32)
    a = mesh_si.self_intersections_percentage(verts, faces, n_threads=1)
    b = mesh_si.self_intersections_percentage(verts, faces, n_threads=4)
    np.testing.assert_array_equal(a, b)
    assert (a > 0).any()  # random soup certainly self-intersects
