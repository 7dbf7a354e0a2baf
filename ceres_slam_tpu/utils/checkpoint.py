"""Checkpoint / resume for the long-running pipelines.

The reference persists state only as CSV snapshots between phases
(SURVEY.md §5.4) and has no resume path. Here the sliding-window pipeline
checkpoints its full solver state (poses, landmark flags, covariance
chain, window index) to a single compressed npz after every few windows,
and `solve_sliding_window(checkpoint=...)` resumes from the last one —
the standard checkpoint-restart pattern for multi-hour traverses.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

FORMAT_VERSION = 1


def save(path: str, step: int, arrays: dict):
    """Atomically write a checkpoint (tmp file + rename)."""
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            # pass the handle: np.savez appends ".npz" to bare filenames
            np.savez_compressed(
                f, __version__=FORMAT_VERSION, __step__=step, **arrays
            )
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load(path: str):
    """Returns (step, arrays dict) or None if absent/corrupt."""
    if not os.path.exists(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            if int(z["__version__"]) != FORMAT_VERSION:
                return None
            step = int(z["__step__"])
            arrays = {
                k: z[k] for k in z.files if not k.startswith("__")
            }
        return step, arrays
    except Exception:
        return None
