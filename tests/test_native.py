"""Native C++ selector parity with the NumPy implementation."""

import numpy as np
import pytest

from cvo_slam_tpu.frontend import native, pyramid, selector


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    gray = np.zeros((480, 640), np.float32)
    for _ in range(300):
        x, y = rng.integers(5, 630), rng.integers(5, 470)
        s = rng.integers(3, 15)
        gray[y:y + s, x:x + s] = rng.uniform(40, 255)
    return pyramid.make_pyramid(gray)


def test_native_builds():
    assert native.available(), "native selector failed to build"


def test_make_hists_parity(scene):
    _, dxs, dys, ags = scene
    ths_np = selector.make_hists(ags[0]).astype(np.float32)
    ths_c = native.make_hists(ags[0])
    np.testing.assert_allclose(ths_c, ths_np, rtol=1e-6)


@pytest.mark.parametrize("pot", [1, 2, 3, 5])
def test_select_parity(scene, pot):
    _, dxs, dys, ags = scene
    ths = selector.make_hists(ags[0]).astype(np.float32)
    s_np, c_np = selector.select(ags, dxs[0], dys[0], ths, pot)
    s_c, c_c = native.select(ags, ths, pot)
    assert c_np == c_c
    np.testing.assert_array_equal(s_np, s_c)


def test_make_maps_uses_native(scene):
    _, dxs, dys, ags = scene
    status, n = selector.make_maps(ags, dxs[0], dys[0], num_want=3000)
    assert n > 500
