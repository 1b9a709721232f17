"""Offline track generators (capability parity with `cpp/Params/track.py`).

Produces reference-format track JSON files: Lissajous figures with a constant
tool orientation (flipped-Z, tool pointing down).  The ``letter`` generator of
the reference (video tracing) is out of scope without cv2 input data; the
waypoint JSON schema is identical so externally generated paths load fine.
"""

from __future__ import annotations

import json

import numpy as np


def lissajous_track(radius: float = 0.1, amp=(2.2, 2.6, 0.0), n_points: int = 100,
                    freq=(1, 2, 1), phase: float = np.pi / 2) -> dict:
    """Lissajous curve in the EE task plane, constant downward orientation."""
    t = np.linspace(phase, 2 * np.pi + phase, n_points)
    x = amp[0] * radius * np.sin(freq[0] * t)
    y = amp[1] * radius * np.sin(freq[1] * t)
    z = amp[2] * radius * np.cos(freq[2] * t)
    # constant orientation: x forward, y/z flipped (tool pointing down);
    # as quaternion (x, y, z, w) this is a rotation of pi about x.
    quat = np.tile(np.array([1.0, 0.0, 0.0, 0.0]), (n_points, 1))
    return {
        "X": x.tolist(), "Y": y.tolist(), "Z": z.tolist(),
        "quat_X": quat[:, 0].tolist(), "quat_Y": quat[:, 1].tolist(),
        "quat_Z": quat[:, 2].tolist(), "quat_W": quat[:, 3].tolist(),
    }


def write_track(path: str, track: dict | None = None) -> None:
    with open(path, "w") as f:
        json.dump(track or lissajous_track(), f)


if __name__ == "__main__":
    import sys
    write_track(sys.argv[1] if len(sys.argv) > 1 else "track.json")
