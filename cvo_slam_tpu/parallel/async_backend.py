"""Asynchronous frontend/backend pipeline.

Replacement for the reference's UseMultiThreading path — a TBB consumer
thread over a bounded queue that the authors flagged as broken
("Please do not enable multithreading", keyframe_graph.cpp:2091-2095,
shipped config UseMultiThreading 0). This version is a small, correct
dispatcher: completed local maps are enqueued and consumed by one worker
thread that drives the global KeyframeGraph, so loop closure + windowed BA
overlap frame tracking. `flush()` joins the queue before the final trajectory
is written; exceptions propagate to the caller instead of dying silently.

The device work stays safe: the backend's jitted solves run on the same JAX
runtime from one worker thread only, and the tracker's own device calls are
dispatched from the main thread — JAX serializes execution per device, so the
pipeline overlaps host-side work (ORB/RANSAC/bookkeeping) with tracking
compute, exactly where the reference hoped to win.
"""

from __future__ import annotations

import queue
import threading
from typing import Optional


class AsyncKeyframeGraph:
    """Wraps a backend KeyframeGraph with a single consumer thread."""

    def __init__(self, graph, max_queue: int = 4):
        self._graph = graph
        self._queue: "queue.Queue" = queue.Queue(maxsize=max_queue)
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="keyframe-graph-backend")
        self._thread.start()

    # -- KeyframeGraph API surface used by the tracker ---------------------
    def add(self, local_map):
        self._raise_if_failed()
        self._queue.put(local_map)

    def keyframes(self):
        self.flush()
        return self._graph.keyframes()

    def loop_closure_rows(self):
        self.flush()
        return self._graph.loop_closure_rows()

    def __getattr__(self, name):
        # delegate everything else (map_points, edges, lc_num, ...) — callers
        # that inspect state should flush() first
        return getattr(self._graph, name)

    # -- pipeline control ---------------------------------------------------
    def flush(self):
        """Block until every enqueued map is processed; re-raise failures."""
        self._queue.join()
        self._raise_if_failed()

    def close(self):
        self.flush()
        self._queue.put(None)
        self._thread.join()

    def _raise_if_failed(self):
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("backend thread failed") from err

    def _run(self):
        while True:
            item = self._queue.get()
            if item is None:
                self._queue.task_done()
                return
            try:
                self._graph.add(item)
            except BaseException as e:   # noqa: BLE001 — surfaced on flush
                self._error = e
            finally:
                self._queue.task_done()
