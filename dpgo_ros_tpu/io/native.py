"""ctypes bindings to the native C++ ingestion library (native/g2o_parser.cpp).

The library is built on demand (``make -C native``) and cached; all loaders
fall back to the pure-Python parsers transparently when the toolchain or the
build is unavailable. Output is bit-compatible with
:func:`dpgo_ros_tpu.io.g2o.read_g2o` / the CSV loader (parity-tested in
``tests/test_native.py``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional, Tuple

import numpy as np

from dpgo_ros_tpu.types import EdgeType, MeasurementBatch

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdpgo_native.so")
_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    src = os.path.join(_NATIVE_DIR, "g2o_parser.cpp")
    stale = not os.path.exists(_LIB_PATH) or (
        os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    )
    if stale:
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None
    lib.dpgo_g2o_parse.restype = ctypes.c_void_p
    lib.dpgo_g2o_parse.argtypes = [ctypes.c_char_p]
    lib.dpgo_csv_parse.restype = ctypes.c_void_p
    lib.dpgo_csv_parse.argtypes = [ctypes.c_char_p]
    for name in ("dpgo_num_edges", "dpgo_num_vertices", "dpgo_max_id"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int32
        fn.argtypes = [ctypes.c_void_p]
    lib.dpgo_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def _extract(lib, h) -> Tuple[MeasurementBatch, int, Optional[Dict[int, np.ndarray]]]:
    E = lib.dpgo_num_edges(h)
    V = lib.dpgo_num_vertices(h)
    max_id = lib.dpgo_max_id(h)
    src_robot = np.zeros(E, np.int32)
    src_frame = np.zeros(E, np.int32)
    dst_robot = np.zeros(E, np.int32)
    dst_frame = np.zeros(E, np.int32)
    R = np.zeros((E, 3, 3), np.float64)
    t = np.zeros((E, 3), np.float64)
    kappa = np.zeros(E, np.float64)
    tau = np.zeros(E, np.float64)
    weight = np.zeros(E, np.float64)
    fixed = np.zeros(E, np.uint8)
    lib.dpgo_get_edges(
        ctypes.c_void_p(h),
        _ptr(src_robot),
        _ptr(src_frame),
        _ptr(dst_robot),
        _ptr(dst_frame),
        _ptr(R),
        _ptr(t),
        _ptr(kappa),
        _ptr(tau),
        _ptr(weight),
        _ptr(fixed),
    )
    vertices: Optional[Dict[int, np.ndarray]] = None
    if V > 0:
        ids = np.zeros(V, np.int32)
        T = np.zeros((V, 3, 4), np.float64)
        lib.dpgo_get_vertices(ctypes.c_void_p(h), _ptr(ids), _ptr(T))
        vertices = {int(ids[k]): T[k] for k in range(V)}
    lib.dpgo_free(ctypes.c_void_p(h))
    from dpgo_ros_tpu.io.partition import classify_edge_types

    edge_type = classify_edge_types(src_robot, src_frame, dst_robot, dst_frame)
    m = MeasurementBatch(
        src_robot=src_robot,
        src_frame=src_frame,
        dst_robot=dst_robot,
        dst_frame=dst_frame,
        R=R,
        t=t,
        kappa=kappa,
        tau=tau,
        weight=weight,
        fixed_weight=fixed.astype(bool),
        edge_type=edge_type,
    )
    return m, max_id + 1, vertices


def read_g2o_native(path: str):
    """Native g2o parse; returns the same triple as ``io.g2o.read_g2o``
    (edge_type all zeros pre-partition) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    h = lib.dpgo_g2o_parse(path.encode())
    if not h:
        raise FileNotFoundError(path)
    m, n, v = _extract(lib, h)
    # pre-partition g2o carries global ids; edge types assigned later
    m.edge_type[:] = 0
    m.weight[:] = 1.0
    return m, n, v


def read_csv_native(path: str) -> Optional[MeasurementBatch]:
    """Native measurements.csv parse (fixed_weight |= odometry, matching
    the Python loader) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    h = lib.dpgo_csv_parse(path.encode())
    if not h:
        raise FileNotFoundError(path)
    m, _, _ = _extract(lib, h)
    m.fixed_weight |= m.edge_type == EdgeType.ODOMETRY
    return m
