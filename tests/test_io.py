"""Native tiled field I/O (C++ gmg_io + ctypes bindings)."""

import numpy as np
import pytest

from geometricmultigridpressuresolver_tpu import io as gio


def test_roundtrip_random(tmp_path):
    rng = np.random.default_rng(0)
    for dtype in (np.float32, np.float64, np.int8, np.int32):
        arr = (rng.standard_normal((33, 17, 26)) * 50).astype(dtype)
        p = tmp_path / f"f_{np.dtype(dtype).name}.gmgf"
        gio.save_field(p, arr)
        out = gio.load_field(p)
        assert out.dtype == arr.dtype and out.shape == arr.shape
        np.testing.assert_array_equal(out, arr)


def test_constant_tiles_compress(tmp_path):
    # Mostly-constant field (exterior padding pattern): file far below raw.
    arr = np.zeros((64, 64, 64), dtype=np.float32)
    arr[16:32, 16:32, 16:32] = np.random.default_rng(1).standard_normal((16, 16, 16))
    p = tmp_path / "c.gmgf"
    gio.save_field(p, arr)
    raw = arr.nbytes
    assert p.stat().st_size < raw / 10
    np.testing.assert_array_equal(gio.load_field(p), arr)


def test_scene_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    fields = {
        "liquid_phi": rng.standard_normal((24, 24, 24)).astype(np.float32),
        "vel_x": rng.standard_normal((25, 24, 24)).astype(np.float32),
        "labels": rng.integers(0, 4, (24, 24, 24)).astype(np.int8),
    }
    gio.save_scene(tmp_path / "scene", **fields)
    out = gio.load_scene(tmp_path / "scene")
    assert set(out) == set(fields)
    for k in fields:
        np.testing.assert_array_equal(out[k], fields[k])


def test_errors(tmp_path):
    bad = tmp_path / "bad.gmgf"
    bad.write_bytes(b"NOPE" + b"\0" * 64)
    with pytest.raises(IOError, match="bad magic"):
        gio.load_field(bad)
    with pytest.raises(IOError, match="cannot open"):
        gio.load_field(tmp_path / "missing.gmgf")
    with pytest.raises(ValueError, match="3-D"):
        gio.save_field(tmp_path / "x.gmgf", np.zeros((4, 4)))
