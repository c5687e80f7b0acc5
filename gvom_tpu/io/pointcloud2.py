"""PointCloud2 deserialization (host side).

The reference leans on ros_numpy for PointCloud2 → xyz (gvom_ros.py:108).
This module implements the wire format directly so the engine has no ROS
dependency: a NumPy strided fast path, plus a native C extractor
(native/pointcloud.c, ctypes-loaded) for the fully general strided/endian
case — the one place in this system where host-side native code pays
(SURVEY.md §2: the reference has no native components at all).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "PointField",
    "CloudSpec",
    "pointcloud2_to_xyz",
    "array_to_pointcloud2",
    "native_available",
]

# ROS sensor_msgs/PointField datatype codes
_DTYPES = {
    1: np.int8, 2: np.uint8, 3: np.int16, 4: np.uint16,
    5: np.int32, 6: np.uint32, 7: np.float32, 8: np.float64,
}


@dataclass
class PointField:
    name: str
    offset: int
    datatype: int
    count: int = 1


@dataclass
class CloudSpec:
    fields: Sequence[PointField]
    point_step: int
    width: int
    height: int = 1
    is_bigendian: bool = False

    def field(self, name: str) -> PointField:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)


_LIB = None
_LIB_TRIED = False


def _load_native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    root = os.path.join(os.path.dirname(__file__), "..", "..", "native")
    src = os.path.abspath(os.path.join(root, "pointcloud.c"))
    so = os.path.abspath(os.path.join(root, "build", "libgvompc.so"))
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            os.makedirs(os.path.dirname(so), exist_ok=True)
            subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.extract_xyz_f32.restype = ctypes.c_long
        lib.extract_xyz_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load_native() is not None


def pointcloud2_to_xyz(
    data: bytes,
    spec: CloudSpec,
    drop_nan: bool = True,
    use_native: Optional[bool] = None,
) -> np.ndarray:
    """Extract [N,3] float32 xyz from a PointCloud2 payload."""
    fx, fy, fz = spec.field("x"), spec.field("y"), spec.field("z")
    n = spec.width * spec.height
    same_type = fx.datatype == fy.datatype == fz.datatype
    lib = _load_native() if use_native in (None, True) else None

    if lib is not None and same_type and fx.datatype in (7, 8) and not spec.is_bigendian:
        out = np.empty((n, 3), np.float32)
        kept = lib.extract_xyz_f32(
            data, n, spec.point_step, fx.offset, fy.offset, fz.offset,
            int(fx.datatype), int(drop_nan),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out[:kept]
    if use_native is True:
        raise RuntimeError("native extractor unavailable for this layout")

    # NumPy strided fallback: view each column with its own stride
    buf = np.frombuffer(data, dtype=np.uint8, count=n * spec.point_step)
    cols = []
    for f in (fx, fy, fz):
        dt = np.dtype(_DTYPES[f.datatype])
        if spec.is_bigendian:
            dt = dt.newbyteorder(">")
        raw = np.ndarray((n,), dtype=dt, buffer=buf, offset=f.offset, strides=(spec.point_step,))
        cols.append(raw.astype(np.float32))
    xyz = np.stack(cols, axis=1)
    if drop_nan:
        xyz = xyz[np.isfinite(xyz).all(axis=1)]
    return np.ascontiguousarray(xyz)


def array_to_pointcloud2(
    arr: np.ndarray, names: Sequence[str]
) -> Tuple[bytes, CloudSpec]:
    """Encode an [N, K] float32 array as PointCloud2 wire data — the inverse
    of pointcloud2_to_xyz, with the dense all-float32 layout ros_numpy's
    array_to_pointcloud2 produces for the reference's debug clouds
    (gvom_ros.py:170-189): field k at offset 4k, point_step 4K."""
    arr = np.ascontiguousarray(np.asarray(arr, np.float32))
    if arr.ndim != 2 or arr.shape[1] != len(names):
        raise ValueError(f"need [N, {len(names)}] array, got {arr.shape}")
    fields = [PointField(name, 4 * k, 7) for k, name in enumerate(names)]
    spec = CloudSpec(fields=fields, point_step=4 * len(names), width=arr.shape[0])
    return arr.tobytes(), spec
