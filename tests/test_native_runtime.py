"""Native runtime library tests: parser correctness, ring-buffer logging."""

import os
import tempfile

import numpy as np
import pytest

from mpcc_manipulator_tpu.runtime import native


def test_parse_floats_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((50, 21))
    f = tmp_path / "w.txt"
    np.savetxt(f, data)
    parsed = native.parse_floats(str(f))
    assert np.allclose(parsed, data.reshape(-1), atol=1e-12)


def test_parse_reference_weight_file():
    path = "/root/reference/cpp/NNmodel/self/parameter/weight_0.txt"
    if not os.path.exists(path):
        pytest.skip("reference weights unavailable")
    parsed = native.parse_floats(path)
    ref = np.loadtxt(path).reshape(-1)
    assert parsed.size == ref.size == 256 * 21
    assert np.allclose(parsed, ref)


def test_telemetry_ring_binary(tmp_path):
    f = tmp_path / "log.bin"
    rl = 5
    with native.TelemetryRing(str(f), rl, capacity=64) as ring:
        for i in range(20):
            ring.append(np.arange(rl, dtype=np.float64) + i)
        assert ring.dropped == 0
    data = np.fromfile(f, dtype=np.float64).reshape(-1, rl)
    assert data.shape == (20, rl)
    assert np.allclose(data[7], np.arange(rl) + 7)


def test_telemetry_ring_text(tmp_path):
    f = tmp_path / "debug.txt"
    with native.TelemetryRing(str(f), 3, capacity=16, text_mode=True) as ring:
        ring.append(np.array([1.5, -2.25, 3.0]))
        ring.append(np.array([4.0, 5.0, 6.0]))
    rows = np.loadtxt(f)
    assert rows.shape == (2, 3)
    assert np.allclose(rows[0], [1.5, -2.25, 3.0])


def test_native_available_or_fallback():
    # either path must work; just report which one is active
    assert native.parse_floats.__doc__ is not None
    print("native available:", native.native_available())
