"""Field I/O: ctypes bindings to the native tiled-serialization library.

The reference stores fields in Houdini's tiled voxel arrays (16^3 tiles,
constant-tile compression); this module provides the framework's
equivalent persistent format via the C++ library
`native/gmg_io.cpp` (compiled on first use with g++ -- no pip/pybind11
dependency).  Constant tiles (far-field SDF regions, exterior padding,
zero velocity components) collapse to a single stored value.

API:
  save_field(path, array)  /  load_field(path) -> np.ndarray
  save_scene(dir, **fields) / load_scene(dir) -> dict
      MAC velocity passes as three entries (e.g. vel_x/vel_y/vel_z).
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_DTYPES = {
    np.dtype(np.float32): 0,
    np.dtype(np.float64): 1,
    np.dtype(np.int8): 2,
    np.dtype(np.int32): 3,
}
_DTYPE_NAMES = {v: k for k, v in _DTYPES.items()}

_ERRORS = {
    -1: "cannot open file",
    -2: "write failed",
    -3: "bad dtype/tile/shape",
    -4: "bad magic or version",
    -5: "shape/dtype mismatch",
    -6: "truncated file",
}

_lib = None


def _library() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _lib
    if _lib is not None:
        return _lib
    src = Path(__file__).parent / "native" / "gmg_io.cpp"
    so = Path(__file__).parent / "native" / "libgmg_io.so"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        # Build into a temp file then rename (atomic under concurrent use).
        with tempfile.NamedTemporaryFile(
            suffix=".so", dir=so.parent, delete=False
        ) as tmp:
            tmp_path = tmp.name
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", tmp_path, str(src)],
                check=True,
                capture_output=True,
                text=True,
            )
            os.replace(tmp_path, so)
        except subprocess.CalledProcessError as e:  # pragma: no cover
            os.unlink(tmp_path)
            raise RuntimeError(f"building gmg_io failed:\n{e.stderr}") from e

    lib = ctypes.CDLL(str(so))
    lib.gmg_save.restype = ctypes.c_int64
    lib.gmg_save.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
    ]
    lib.gmg_info.restype = ctypes.c_int64
    lib.gmg_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.gmg_load.restype = ctypes.c_int64
    lib.gmg_load.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
    ]
    _lib = lib
    return lib


def _check(rc: int, path) -> None:
    if rc != 0:
        raise IOError(f"gmg_io: {_ERRORS.get(rc, rc)} ({path})")


def save_field(path, array, tile: int = 16) -> None:
    """Write a 3-D field in the tiled constant-compressed format."""
    arr = np.ascontiguousarray(np.asarray(array))
    if arr.ndim != 3:
        raise ValueError(f"expected a 3-D field, got shape {arr.shape}")
    if arr.dtype not in _DTYPES:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    rc = _library().gmg_save(
        str(path).encode(), arr.ctypes.data,
        *arr.shape, _DTYPES[arr.dtype], tile,
    )
    _check(rc, path)


def field_info(path) -> tuple[tuple[int, int, int], np.dtype, int]:
    """(shape, dtype, tile) of a stored field."""
    shape = (ctypes.c_int64 * 3)()
    dtype = ctypes.c_int32()
    tile = ctypes.c_int32()
    rc = _library().gmg_info(str(path).encode(), shape, dtype, tile)
    _check(rc, path)
    return tuple(int(s) for s in shape), _DTYPE_NAMES[dtype.value], tile.value


def load_field(path) -> np.ndarray:
    """Read a field written by `save_field`."""
    shape, dtype, _ = field_info(path)
    out = np.empty(shape, dtype=dtype)
    rc = _library().gmg_load(
        str(path).encode(), out.ctypes.data, *shape, _DTYPES[np.dtype(dtype)]
    )
    _check(rc, path)
    return out


def save_scene(directory, **fields) -> None:
    """Write named fields (one .gmgf each) plus a manifest."""
    d = Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    manifest = {}
    for name, arr in fields.items():
        save_field(d / f"{name}.gmgf", arr)
        manifest[name] = f"{name}.gmgf"
    (d / "manifest.json").write_text(json.dumps(manifest, indent=1))


def load_scene(directory) -> dict:
    """Read every field of a scene directory into numpy arrays."""
    d = Path(directory)
    manifest = json.loads((d / "manifest.json").read_text())
    return {name: load_field(d / rel) for name, rel in manifest.items()}
