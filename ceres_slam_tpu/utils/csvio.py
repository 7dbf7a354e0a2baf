"""CSV IO in the reference's exact formats.

Replacement for `/root/reference/include/ceres_slam/utils/csv_reader.hpp`
(line-buffered tokenizer) and the write_csv methods of the dataset layer.
Reading returns plain Python float lists per row (rows have heterogeneous
lengths across the header), parsed with a single pass; a native C++
fast-path loader can be slotted in here later for very large tracks.
"""

from __future__ import annotations

import numpy as np


def read_numeric_csv(path: str) -> list:
    """Parse a comma-separated numeric file into a list of per-row float
    sequences (numpy slices). Uses the native C++ loader
    (ceres_slam_tpu/native/csv_loader.cpp) when available — KITTI-scale
    tracks run to hundreds of thousands of rows — with a pure-Python
    fallback. Skips blank lines."""
    from ceres_slam_tpu import native

    out = native.load_numeric_csv_native(path)
    if out is not None:
        vals, offs = out
        return [vals[offs[i] : offs[i + 1]] for i in range(offs.size - 1)]
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rows.append([float(tok) for tok in line.split(",")])
    return rows


def write_poses_csv(path: str, poses: np.ndarray):
    """``_poses.csv``: header + one row-major 4x4 per pose
    (dataset_problem.cpp:140-151)."""
    with open(path, "w") as f:
        f.write(
            "T_00, T_01, T_02, T_03,T_10, T_11, T_12, T_13,"
            "T_20, T_21, T_22, T_23,T_30, T_31, T_32, T_33\n"
        )
        for T in poses:
            M = np.eye(4)
            M[:3, :3] = T[3:].reshape(3, 3)
            M[:3, 3] = T[:3]
            f.write(",".join(repr(float(x)) for x in M.reshape(16)) + "\n")


def read_poses_csv(path: str) -> np.ndarray:
    """Read an emitted ``_poses.csv`` back into flat ``[K, 12]`` poses."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("T_00"):
                continue
            M = np.asarray([float(t) for t in line.split(",")]).reshape(4, 4)
            out.append(np.concatenate([M[:3, 3], M[:3, :3].reshape(9)]))
    return np.stack(out)


def write_map_csv(path: str, points: np.ndarray, initialized: np.ndarray):
    """``_map.csv``: ``point_id, x, y, z`` for initialized points
    (dataset_problem.cpp:154-160)."""
    with open(path, "w") as f:
        f.write("point_id, x, y, z\n")
        for j in range(points.shape[0]):
            if initialized[j]:
                f.write(f"{j}," + ",".join(repr(float(x)) for x in points[j]) + "\n")
