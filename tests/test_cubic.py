import numpy as np
import pytest

from cvo_slam_tpu.ops import cubic

MIN_STEP, MAX_STEP = 0.2, 0.8


def ref_step(a, b, c, d):
    """Reference semantics (cvo.cpp:317-333): companion-matrix roots, keep
    real positive, smallest; fallback min_step; clamp 0.8."""
    if a == 0:
        return MIN_STEP
    roots = np.roots([a, b, c, d])
    best = np.inf
    for r in roots:
        if abs(r.imag) < 1e-7 and r.real > 0 and r.real < best:
            best = r.real
    step = MIN_STEP if not np.isfinite(best) else best
    return min(step, MAX_STEP)


@pytest.mark.parametrize("seed", range(40))
def test_random_cubics(seed):
    rng = np.random.default_rng(seed)
    a, b, c, d = rng.standard_normal(4) * rng.choice([0.01, 1.0, 100.0])
    got = float(cubic.min_positive_root_or(a, b, c, d, MIN_STEP, MAX_STEP))
    want = ref_step(a, b, c, d)
    # borderline-discriminant cases may legitimately differ in the
    # real-vs-complex call; require agreement away from that edge
    disc_margin = _disc_margin(a, b, c, d)
    if disc_margin > 1e-6:
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _disc_margin(a, b, c, d):
    p = b / a
    q = c / a
    r = d / a
    pt = q - p * p / 3
    qt = 2 * p ** 3 / 27 - p * q / 3 + r
    disc = (qt / 2) ** 2 + (pt / 3) ** 3
    scale = max(abs(pt) ** 3, abs(qt) ** 2, 1e-12)
    return abs(disc) / scale


def test_known_roots():
    # (x-0.5)(x-2)(x+1) = x^3 - 1.5x^2 - 1.5x + 1
    got = float(cubic.min_positive_root_or(1.0, -1.5, -1.5, 1.0,
                                           MIN_STEP, MAX_STEP))
    np.testing.assert_allclose(got, 0.5, rtol=1e-5)


def test_no_positive_root_falls_back():
    # (x+1)(x+2)(x+3): all roots negative
    got = float(cubic.min_positive_root_or(1.0, 6.0, 11.0, 6.0,
                                           MIN_STEP, MAX_STEP))
    assert got == pytest.approx(MIN_STEP)


def test_clamp():
    # single real root at 5 -> clamp to 0.8
    got = float(cubic.min_positive_root_or(1.0, -5.0, 0.0, 0.0,
                                           MIN_STEP, MAX_STEP))
    assert got == pytest.approx(MAX_STEP)


def test_degenerate_leading():
    got = float(cubic.min_positive_root_or(0.0, 1.0, -3.0, 2.0,
                                           MIN_STEP, MAX_STEP))
    assert got == pytest.approx(MIN_STEP)
