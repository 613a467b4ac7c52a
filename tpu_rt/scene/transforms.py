"""Chainable scalar transform builder, API-compatible with
mi.ScalarTransform4f as used by the reference scene dict
(/root/reference/USMain.py:53-57,69-71: .look_at / .translate / .rotate /
.scale composed with @)."""

from __future__ import annotations

import numpy as np

from tpu_rt.core import math as m


class ScalarTransform4f:
    def __init__(self, matrix=None):
        self.matrix = (
            np.eye(4, dtype=np.float32) if matrix is None else np.asarray(matrix, np.float32)
        )

    def __call__(self):  # tolerate mi.ScalarTransform4f() call-style chaining
        return self

    def translate(self, t):
        return ScalarTransform4f(self.matrix @ m.translate(t))

    def scale(self, s):
        return ScalarTransform4f(self.matrix @ m.scale(s))

    def rotate(self, axis, angle):
        return ScalarTransform4f(self.matrix @ m.rotate(axis, angle))

    def look_at(self, origin, target, up):
        return ScalarTransform4f(self.matrix @ m.look_at(origin, target, up))

    def __matmul__(self, other):
        if isinstance(other, ScalarTransform4f):
            return ScalarTransform4f(self.matrix @ other.matrix)
        return ScalarTransform4f(self.matrix @ np.asarray(other, np.float32))

    def numpy(self):
        return self.matrix


def as_matrix(t) -> np.ndarray:
    """Coerce ScalarTransform4f | array-like | None to a 4x4 float32 matrix."""
    if t is None:
        return np.eye(4, dtype=np.float32)
    if isinstance(t, ScalarTransform4f):
        return t.matrix
    arr = np.asarray(t, np.float32)
    if arr.shape == (4, 4):
        return arr
    raise ValueError(f"cannot interpret transform: {t!r}")
