"""Async frontend/backend pipeline (working UseMultiThreading replacement)."""

import os
import time

import numpy as np
import pytest

from cvo_slam_tpu.config import SlamConfig
from cvo_slam_tpu.data import synthetic, tum
from cvo_slam_tpu.parallel.async_backend import AsyncKeyframeGraph
from tests.test_pipeline import CAM, SMALL_FRONTEND


def test_async_matches_sync(tmp_path):
    folder = str(tmp_path)
    synthetic.make_sequence(folder, CAM, n_frames=8)
    records = tum.load_association(os.path.join(folder, "associate.txt"))
    frames = [tum.load_image(folder, r) for r in records]
    from cvo_slam_tpu.app.run_slam import build_tracker

    results = {}
    for mode, mt in (("sync", False), ("async", True)):
        cfg = SlamConfig.default_shipped().replace(
            frontend=SMALL_FRONTEND, FinalOptimizationIterations=10,
            UseMultiThreading=mt)
        tracker = build_tracker(CAM, cfg)
        tracker.init()
        for i, f in enumerate(frames):
            if i == len(frames) - 1:
                tracker.force_keyframe()
            tracker.update(f)
        if mt:
            assert isinstance(tracker.graph, AsyncKeyframeGraph)
        kfs = tracker.graph.keyframes()     # flushes the queue in async mode
        results[mode] = [(kf.id, kf.timestamp, kf.pose.copy()) for kf in kfs]
        if mt:
            tracker.graph.close()

    assert len(results["sync"]) == len(results["async"])
    for (i1, t1, p1), (i2, t2, p2) in zip(results["sync"], results["async"]):
        assert (i1, t1) == (i2, t2)
        np.testing.assert_allclose(p1, p2, atol=1e-8)


def test_async_propagates_errors():
    class Boom:
        def add(self, m):
            raise ValueError("backend exploded")

    g = AsyncKeyframeGraph(Boom())
    g.add(object())
    time.sleep(0.2)
    with pytest.raises(RuntimeError):
        g.flush()
