"""Frozen golden-vector regression: the library must reproduce the pinned
vectors BIT-EXACTLY on every platform (CPU mesh in CI, real TPU under the
driver). Regenerate only after an intentional semantic change with
`python tests/make_golden.py`."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import make_golden

_PATH = os.path.join(os.path.dirname(__file__), "vectors", "golden.npz")


@pytest.mark.skipif(not os.path.exists(_PATH), reason="golden vectors not built")
def test_golden_vectors():
    want = dict(np.load(_PATH))
    got = make_golden.build()
    assert set(want) == set(got)
    for name in sorted(want):
        assert want[name].dtype == got[name].dtype, name
        assert np.array_equal(want[name], got[name]), f"golden mismatch: {name}"
