"""ctypes bindings for the native sweep organizer (native/sweep_binner.cpp).

The C++/OpenMP binner keeps host-side ingest off the critical path when
feeding the device at sensor rate x batch; ``organize`` transparently falls
back to the numpy implementation in models/scan_registration when the shared
library has not been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False

_SO_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libsweep_binner.so",
)


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    for name in ("bin_sweep", "bin_sweep_batch"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
    for name in ("bin_sweep_table", "bin_sweep_table_batch"):
        # absent in pre-table builds of the library; rebuilt via make -C native
        fn = getattr(lib, name, None)
        if fn is not None:
            fn.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def bin_sweep_native(
    points: np.ndarray,
    n_rings: int,
    width: int,
    lower_deg: float = -15.0,
    upper_deg: float = 15.0,
    min_range: float = 0.5,
    max_range: float = 150.0,
    axis_remap: bool = True,
    sentinel: float = 1.0e6,
):
    """Organize one raw sweep.  Returns (xyz [R,W,3], mask [R,W], rel [R,W])."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libsweep_binner.so not built (make -C native)")
    pts = np.ascontiguousarray(points, np.float32)
    n = len(pts)
    xyz = np.empty((n_rings, width, 3), np.float32)
    mask = np.empty((n_rings, width), np.uint8)
    rel = np.empty((n_rings, width), np.float32)
    lib.bin_sweep(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(n),
        ctypes.c_int(1 if axis_remap else 0),
        ctypes.c_int(n_rings),
        ctypes.c_int(width),
        ctypes.c_float(lower_deg),
        ctypes.c_float(upper_deg),
        ctypes.c_float(min_range),
        ctypes.c_float(max_range),
        ctypes.c_float(sentinel),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rel.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return xyz, mask.astype(bool), rel


def bin_sweep_batch_native(points: np.ndarray, n_rings: int, width: int, **kw):
    """points: [B, N, 3].  Returns stacked (xyz, mask, rel)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libsweep_binner.so not built (make -C native)")
    pts = np.ascontiguousarray(points, np.float32)
    b, n = pts.shape[:2]
    xyz = np.empty((b, n_rings, width, 3), np.float32)
    mask = np.empty((b, n_rings, width), np.uint8)
    rel = np.empty((b, n_rings, width), np.float32)
    lib.bin_sweep_batch(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(b),
        ctypes.c_int(n),
        ctypes.c_int(1 if kw.get("axis_remap", True) else 0),
        ctypes.c_int(n_rings),
        ctypes.c_int(width),
        ctypes.c_float(kw.get("lower_deg", -15.0)),
        ctypes.c_float(kw.get("upper_deg", 15.0)),
        ctypes.c_float(kw.get("min_range", 0.5)),
        ctypes.c_float(kw.get("max_range", 150.0)),
        ctypes.c_float(kw.get("sentinel", 1.0e6)),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rel.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return xyz, mask.astype(bool), rel


def table_supported() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "bin_sweep_table")


def bin_sweep_table_native(
    points: np.ndarray,
    table_deg: np.ndarray,
    width: int,
    min_range: float = 0.5,
    max_range: float = 150.0,
    axis_remap: bool = True,
    sentinel: float = 1.0e6,
):
    """Organize one raw sweep with a vendor elevation table (ring = nearest
    channel angle, the Pandar40 mapper — lidar_type.h:13-72).  ``table_deg``
    must be ascending; its length is the ring count."""
    lib = _load()
    if lib is None or not hasattr(lib, "bin_sweep_table"):
        raise RuntimeError("libsweep_binner.so lacks bin_sweep_table (make -C native)")
    pts = np.ascontiguousarray(points, np.float32)
    table = np.ascontiguousarray(table_deg, np.float32)
    n_rings = len(table)
    n = len(pts)
    xyz = np.empty((n_rings, width, 3), np.float32)
    mask = np.empty((n_rings, width), np.uint8)
    rel = np.empty((n_rings, width), np.float32)
    lib.bin_sweep_table(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(n),
        ctypes.c_int(1 if axis_remap else 0),
        ctypes.c_int(n_rings),
        ctypes.c_int(width),
        table.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(min_range),
        ctypes.c_float(max_range),
        ctypes.c_float(sentinel),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rel.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return xyz, mask.astype(bool), rel
