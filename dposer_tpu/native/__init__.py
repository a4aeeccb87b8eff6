"""Native (C++) helpers: mesh self-intersection metric and software rasterizer.

Built lazily from the shipped sources with the system compiler on first use
(cached under ``~/.cache/dposer_tpu``). ctypes bindings — no pybind11.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
from typing import Optional

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "src")
_LIB: Optional[ctypes.CDLL] = None


def _source_hash() -> str:
    h = hashlib.sha256()
    for name in sorted(os.listdir(_SRC_DIR)):
        with open(os.path.join(_SRC_DIR, name), "rb") as f:
            h.update(f.read())
    # -march=native output is host-ISA-specific and the flags depend on the
    # compiler: key the cache by toolchain + machine too, so a shared cache
    # dir (NFS home across heterogeneous nodes) never serves a SIGILL .so
    # and a compiler upgrade invalidates cleanly
    for flag in ("-dumpfullversion", "-dumpmachine"):
        try:
            h.update(subprocess.run(["g++", flag], capture_output=True,
                                    text=True).stdout.encode())
        except OSError:
            pass
    import platform
    h.update(platform.machine().encode())
    return h.hexdigest()[:16]


def build_lib(force: bool = False) -> str:
    cache = os.environ.get("DPOSER_NATIVE_CACHE",
                           os.path.join(os.path.expanduser("~"), ".cache", "dposer_tpu"))
    os.makedirs(cache, exist_ok=True)
    lib_path = os.path.join(cache, f"libdposer_native_{_source_hash()}.so")
    if os.path.exists(lib_path) and not force:
        return lib_path
    srcs = [os.path.join(_SRC_DIR, n) for n in sorted(os.listdir(_SRC_DIR))
            if n.endswith(".cpp")]
    # per-process temp name: concurrent first-use builds (pytest workers,
    # parallel eval jobs) must not interleave writes to one .tmp file and
    # os.replace a corrupted .so into the persistent cache
    tmp_path = f"{lib_path}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", "-o", tmp_path, *srcs]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    os.replace(tmp_path, lib_path)
    return lib_path


def _get_lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(build_lib())
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

        lib.self_intersections_percentage.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int, f32p]
        lib.self_intersections_percentage.restype = None

        lib.self_intersections_percentage_mt.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int, f32p,
            ctypes.c_int]
        lib.self_intersections_percentage_mt.restype = None

        lib.tri_tri_test.argtypes = [f32p, f32p]
        lib.tri_tri_test.restype = ctypes.c_int

        lib.rasterize.argtypes = [f32p, ctypes.c_int, i32p, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_int,
                                  ctypes.c_float, ctypes.c_float,
                                  ctypes.c_float, ctypes.c_float,
                                  f32p, f32p, f32p, u8p]
        lib.rasterize.restype = None
        _LIB = lib
    return _LIB


class mesh_si:
    """Namespace matching ``dposer_tpu.ops.metrics`` expectations."""

    @staticmethod
    def self_intersections_percentage(vertices: np.ndarray, faces: np.ndarray,
                                      n_threads: int = 0) -> np.ndarray:
        """Per-mesh %% of self-intersecting faces. ``n_threads`` 0 = all
        hardware threads (meshes are independent; per-thread scratch)."""
        lib = _get_lib()
        vertices = np.ascontiguousarray(vertices, np.float32)
        faces = np.ascontiguousarray(faces, np.int32)
        if vertices.ndim == 2:
            vertices = vertices[None]
        n_batch, n_verts, _ = vertices.shape
        out = np.zeros(n_batch, np.float32)
        lib.self_intersections_percentage_mt(vertices, n_batch, n_verts, faces,
                                             len(faces), out, n_threads)
        return out

    @staticmethod
    def tri_tri_test(t1: np.ndarray, t2: np.ndarray) -> bool:
        lib = _get_lib()
        return bool(lib.tri_tri_test(np.ascontiguousarray(t1, np.float32).reshape(9),
                                     np.ascontiguousarray(t2, np.float32).reshape(9)))


class raster:
    @staticmethod
    def rasterize(verts, faces, height, width, fx, fy, cx, cy, light_dir,
                  base_color):
        lib = _get_lib()
        verts = np.ascontiguousarray(verts, np.float32)
        faces = np.ascontiguousarray(faces, np.int32)
        rgb = np.zeros((height, width, 3), np.float32)
        mask = np.zeros((height, width), np.uint8)
        lib.rasterize(verts, len(verts), faces, len(faces), height, width,
                      fx, fy, cx, cy,
                      np.ascontiguousarray(light_dir, np.float32),
                      np.ascontiguousarray(base_color, np.float32), rgb, mask)
        return rgb.astype(np.float64), mask.astype(bool)
