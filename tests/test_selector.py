"""DSO pixel selector: glibc rand exactness, histogram quantiles, selection
properties."""

import numpy as np
import pytest

from cvo_slam_tpu.frontend import pyramid, selector


def test_glibc_rand_known_values():
    """srand(1) sequence from glibc (universally known first values)."""
    seq = selector.glibc_rand_sequence(1, 5)
    assert list(seq) == [1804289383, 846930886, 1681692777, 1714636915,
                         1957747793]


def test_random_pattern_deterministic():
    a = selector.random_pattern(64, 48)
    b = selector.random_pattern(64, 48)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.uint8 and len(a) == 64 * 48


def test_make_hists_matches_bruteforce():
    rng = np.random.default_rng(0)
    ag = (rng.uniform(0, 2500, (96, 128))).astype(np.float32)
    got = selector.make_hists(ag)
    # brute force per the reference makeHists (PixelSelector2.cpp:71-136)
    h, w = ag.shape
    w32, h32 = w // 32, h // 32
    ths = np.zeros((h32, w32))
    for by in range(h32):
        for bx in range(w32):
            hist = np.zeros(50, int)
            for j in range(32):
                for i in range(32):
                    it, jt = i + 32 * bx, j + 32 * by
                    if it > w - 2 or jt > h - 2 or it < 1 or jt < 1:
                        continue
                    g = min(int(np.sqrt(ag[jt, it])), 48)
                    hist[g + 1] += 1
                    hist[0] += 1
            th = int(hist[0] * 0.5 + 0.5)
            q = 90
            for i in range(90):
                th -= hist[i + 1] if i + 1 < 50 else 0
                if th < 0:
                    q = i
                    break
            ths[by, bx] = q + 7
    sm = np.zeros_like(ths)
    for by in range(h32):
        for bx in range(w32):
            vals = [ths[y, x] for y in range(by - 1, by + 2)
                    for x in range(bx - 1, bx + 2)
                    if 0 <= y < h32 and 0 <= x < w32]
            sm[by, bx] = (sum(vals) / len(vals)) ** 2
    np.testing.assert_allclose(got, sm, rtol=1e-6)


def test_selection_respects_thresholds():
    rng = np.random.default_rng(1)
    gray = rng.uniform(0, 255, (96, 128)).astype(np.float32)
    _, dxs, dys, ags = pyramid.make_pyramid(gray)
    status, n = selector.make_maps(ags, dxs[0], dys[0], num_want=200)
    ys, xs = np.nonzero(status)
    # border exclusion (PixelSelector2.cpp:364)
    assert xs.min() >= 4 and xs.max() < 128 - 5
    assert ys.min() >= 4 and ys.max() <= 96 - 4
    assert n == int((status != 0).sum())
    # level-0 picks must pass their block threshold
    ths = selector.make_hists(ags[0])
    lvl0 = status == 1
    yy, xx = np.nonzero(lvl0)
    th = ths[np.minimum(yy >> 5, ths.shape[0] - 1),
             np.minimum(xx >> 5, ths.shape[1] - 1)]
    assert np.all(ags[0][yy, xx] > th)


def test_subsample_targets_density():
    """On a very textured image the selector should land near num_want."""
    rng = np.random.default_rng(2)
    gray = rng.uniform(0, 255, (240, 320)).astype(np.float32)
    _, dxs, dys, ags = pyramid.make_pyramid(gray)
    status, n = selector.make_maps(ags, dxs[0], dys[0], num_want=500)
    assert 300 <= n <= 700, n
