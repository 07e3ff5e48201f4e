"""FramePrefetcher: ordered delivery, cloud equality with synchronous path."""

import os
import tempfile

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cvo_slam_tpu.config import CAMERA_PRESETS, FrontendParams
from cvo_slam_tpu.data import tum
from cvo_slam_tpu.data.prefetch import FramePrefetcher
from cvo_slam_tpu.frontend.pointcloud import create_pointcloud


def _make_seq(tmp, n=6):
    rng = np.random.default_rng(0)
    records = []
    os.makedirs(f"{tmp}/rgb")
    os.makedirs(f"{tmp}/depth")
    for i in range(n):
        tex = cv2.resize(
            rng.uniform(30, 220, (60, 80, 3)).astype(np.float32),
            (640, 480), interpolation=cv2.INTER_CUBIC)
        bgr = np.clip(tex, 0, 255).astype(np.uint8)
        depth = np.full((480, 640), 10000 + 100 * i, np.uint16)
        cv2.imwrite(f"{tmp}/rgb/{i}.png", bgr)
        cv2.imwrite(f"{tmp}/depth/{i}.png", depth)
        records.append(tum.FrameRecord(f"{i}.0", f"rgb/{i}.png",
                                       f"depth/{i}.png"))
    return records


def test_prefetcher_matches_synchronous():
    cam = CAMERA_PRESETS["TUM1"]
    fp = FrontendParams()
    with tempfile.TemporaryDirectory() as tmp:
        records = _make_seq(tmp)
        got = list(FramePrefetcher(tmp, records, cam, fp, depth=3, workers=3))
        assert [g.timestamp for g in got] == [r.timestamp for r in records]
        for g, r in zip(got, records):
            img = tum.load_image(tmp, r)
            ref = create_pointcloud(img.bgr, img.gray, img.depth, cam, fp)
            assert g.precomputed_cloud is not None
            np.testing.assert_array_equal(g.precomputed_cloud.positions,
                                          ref.positions)
            np.testing.assert_array_equal(g.precomputed_cloud.mask, ref.mask)
            assert g.precomputed_cloud.count == ref.count


def test_prefetcher_empty():
    cam = CAMERA_PRESETS["TUM1"]
    assert list(FramePrefetcher("/nonexistent", [], cam,
                                FrontendParams())) == []
