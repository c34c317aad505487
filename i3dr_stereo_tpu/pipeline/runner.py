"""Streaming runner: source -> pairing -> batches -> fused pipeline -> sinks.

The live loop the reference spreads over roslaunch'd processes. Keeps
the device busy by dispatching batch N+1 while batch N's outputs are
fetched (async dispatch double-buffering), tracks FPS/latency via
utils.metrics, and hands results to sink callbacks (publish, save,
view).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, List, Optional, Tuple

import numpy as np

import jax

from i3dr_stereo_tpu.pipeline.pairing import FrameBatcher, Stamped
from i3dr_stereo_tpu.pipeline.stereo_pipeline import PipelineResult, StereoPipeline
from i3dr_stereo_tpu.utils.metrics import FPSMeter, Metrics


@dataclasses.dataclass
class StreamStats:
    frames_in: int = 0
    batches: int = 0
    frames_out: int = 0
    fps: float = 0.0


class StreamRunner:
    def __init__(self, pipeline: StereoPipeline, *, batch_size: int = 1,
                 metrics: Optional[Metrics] = None):
        self.pipeline = pipeline
        self.batcher = FrameBatcher(batch_size=batch_size)
        self.metrics = metrics or Metrics()
        self.stats = StreamStats()
        self._meter = FPSMeter()
        self._inflight: List[Tuple[np.ndarray, int, PipelineResult]] = []

    def run(self, pairs: Iterable[Tuple[Stamped, Stamped]],
            sink: Callable[[np.ndarray, int, PipelineResult], None],
            *, depth: int = 2) -> StreamStats:
        """Process a stream of paired frames.

        ``sink(stamps, count, result)`` is called once per batch with
        device results (fetch lazily — arrays are jax Arrays).
        ``depth`` = number of batches allowed in flight before draining.
        """
        for l, r in pairs:
            self.stats.frames_in += 1
            batch = self.batcher.push(l, r)
            if batch is not None:
                self._dispatch(batch)
            while len(self._inflight) > depth:
                self._drain_one(sink)
        tail = self.batcher.flush()
        if tail is not None:
            self._dispatch(tail)
        while self._inflight:
            self._drain_one(sink)
        return self.stats

    def _dispatch(self, batch) -> None:
        with self.metrics.time("dispatch"):
            res = self.pipeline.process(batch.left, batch.right)
        self._inflight.append((batch.stamps, batch.count, res))
        self.stats.batches += 1

    def _drain_one(self, sink) -> None:
        stamps, count, res = self._inflight.pop(0)
        with self.metrics.time("drain"):
            jax.block_until_ready(res.disparity)
            sink(stamps, count, res)
        self.stats.frames_out += count
        for _ in range(count):
            self.stats.fps = self._meter.tick()
