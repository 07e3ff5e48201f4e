"""Device (jnp) frontend vs host (numpy/native) frontend equality."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cvo_slam_tpu.config import CAMERA_PRESETS, FrontendParams
from cvo_slam_tpu.frontend import device as dev
from cvo_slam_tpu.frontend import pyramid as host_pyr
from cvo_slam_tpu.frontend import selector as host_sel
from cvo_slam_tpu.frontend.pointcloud import create_pointcloud


def _frame(seed=7, H=480, W=640):
    rng = np.random.default_rng(seed)
    tex = cv2.resize(rng.uniform(30, 220, (H // 8, W // 8, 3)).astype(np.float32),
                     (W, H), interpolation=cv2.INTER_CUBIC)
    bgr = np.clip(tex, 0, 255).astype(np.uint8)
    gray = cv2.cvtColor(bgr, cv2.COLOR_RGB2GRAY)
    zz = (2.0 + 0.3 * np.sin(np.linspace(0, 3, W))[None, :]
          + 0.2 * np.cos(np.linspace(0, 2, H))[:, None]).astype(np.float32)
    depth = (zz * 5000).astype(np.uint16)
    return bgr, gray, depth


def test_pyramid_matches_host():
    _, gray, _ = _frame()
    hi, hdx, hdy, hag = host_pyr.make_pyramid(gray.astype(np.float32), 3)
    di, ddx, ddy, dag = dev.make_pyramid(np.asarray(gray, np.float32), 3)
    for a, b in zip(hi, di):
        np.testing.assert_allclose(a, np.asarray(b), atol=1e-4)
    for a, b in zip(hag, dag):
        np.testing.assert_allclose(a, np.asarray(b), rtol=1e-5, atol=1e-3)


def test_hists_and_select_match_host():
    _, gray, _ = _frame()
    _, hdx, hdy, hag = host_pyr.make_pyramid(gray.astype(np.float32), 3)
    ths_h = host_sel.make_hists(hag[0])
    ths_d = np.asarray(dev.make_hists(np.asarray(hag[0])))
    np.testing.assert_allclose(ths_d, ths_h, atol=1e-4)

    for pot in (2, 3, 5):
        st_h, (a, b, c) = host_sel.select(hag, hdx[0], hdy[0], ths_h, pot)
        st_d, (da, db, dc) = dev.select(np.asarray(hag[0]), np.asarray(hag[1]),
                                        np.asarray(hag[2]), np.asarray(ths_h),
                                        pot)
        assert (int(da), int(db), int(dc)) == (a, b, c), pot
        np.testing.assert_array_equal(np.asarray(st_d), st_h)


def test_make_maps_matches_host():
    _, gray, _ = _frame()
    fp = FrontendParams()
    _, hdx, hdy, hag = host_pyr.make_pyramid(gray.astype(np.float32), 3)
    st_h, n_h = host_sel.make_maps(hag, hdx[0], hdy[0], fp.num_want,
                                   fp.initial_potential, fp.recursions,
                                   seed=fp.random_seed)
    st_d, n_d = dev.make_maps([np.asarray(a) for a in hag], fp.num_want,
                              fp.initial_potential, fp.recursions,
                              seed=fp.random_seed)
    assert n_d == n_h
    np.testing.assert_array_equal(np.asarray(st_d), st_h)


def test_full_cloud_matches_host():
    bgr, gray, depth = _frame()
    cam = CAMERA_PRESETS["TUM1"]
    fp = FrontendParams()
    host_pc = create_pointcloud(bgr, gray, depth, cam, fp)
    pos, feat, mask, count, pix = dev.create_pointcloud_device(
        bgr, gray, depth, cam, fp)
    assert int(count) == host_pc.count
    n = host_pc.count
    # same point set (order may differ only by Morton tie-breaks)
    hset = {tuple(r) for r in host_pc.selected_pixels[:n].tolist()}
    dset = {tuple(r) for r in np.asarray(pix)[:n].tolist()}
    assert hset == dset
    # positions agree under the host ordering
    hp = host_pc.positions[:n]
    dp = np.asarray(pos)[:n]
    hkey = {tuple(px): p for px, p in zip(host_pc.selected_pixels[:n].tolist(),
                                          hp.tolist())}
    for px, p in zip(np.asarray(pix)[:n].tolist(), dp.tolist()):
        np.testing.assert_allclose(p, hkey[tuple(px)], rtol=1e-5, atol=1e-6)
    # feature rows agree pointwise
    hfk = {tuple(px): f for px, f in zip(host_pc.selected_pixels[:n].tolist(),
                                         host_pc.features[:n].tolist())}
    df = np.asarray(feat)[:n]
    for px, f in zip(np.asarray(pix)[:n].tolist(), df.tolist()):
        np.testing.assert_allclose(f, hfk[tuple(px)], rtol=1e-4, atol=1e-3)


def test_cloud_feature_type0_hsv_matches_host():
    """feature_type=0 (HSV + normalized gradients, pcd_generator.cpp:570-592):
    host path uses cv2.cvtColor exactly; device path re-derives cv2's HSV in
    jnp. They must agree to 1 8-bit quantum on H/S and exactly elsewhere."""
    bgr, gray, depth = _frame()
    cam = CAMERA_PRESETS["TUM1"]
    fp = FrontendParams(feature_type=0)
    host_pc = create_pointcloud(bgr, gray, depth, cam, fp)
    pos, feat, mask, count, pix = dev.create_pointcloud_device(
        bgr, gray, depth, cam, fp)
    n = host_pc.count
    assert int(count) == n
    # all five feature channels normalized to ~[0,1] x gradient range
    assert np.all(host_pc.features[:n, :3] >= 0.0)
    assert np.all(host_pc.features[:n, :3] <= 1.0 + 1e-6)
    hfk = {tuple(px): f for px, f in zip(host_pc.selected_pixels[:n].tolist(),
                                         host_pc.features[:n].tolist())}
    df = np.asarray(feat)[:n]
    for px, f in zip(np.asarray(pix)[:n].tolist(), df.tolist()):
        hf = hfk[tuple(px)]
        # H quantum = 1/180, S/V quantum = 1/255
        assert abs(f[0] - hf[0]) <= 1.0 / 180.0 + 1e-6
        assert abs(f[1] - hf[1]) <= 1.0 / 255.0 + 1e-6
        np.testing.assert_allclose(f[2:], hf[2:], rtol=1e-4, atol=1e-4)
