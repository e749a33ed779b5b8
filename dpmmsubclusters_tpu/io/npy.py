"""Data loading (reference ``src/utils.jl:5-14``).

The reference stores datasets as ``.npy`` files laid out N x D and loads
them with a NaN -> 0 scrub and a transpose to its internal D x N layout.
The TPU framework's internal layout is [N, D] (rows = points), so
``load_data`` only scrubs -- no transpose.
"""
from __future__ import annotations

import numpy as np


def load_data(path: str, *, prefix: str = "", swapdims: bool = False
              ) -> np.ndarray:
    """Load ``{path}{prefix}.npy`` (or a full filename) as float32 [N, D].

    NaNs are replaced with 0 exactly like the reference loader; pass
    ``swapdims=True`` when the file is stored D x N.
    """
    fname = path if path.endswith(".npy") else f"{path}{prefix}.npy"
    arr = np.load(fname)
    arr = np.nan_to_num(np.asarray(arr, np.float32), nan=0.0)
    if swapdims:
        arr = arr.T
    return np.ascontiguousarray(arr)
