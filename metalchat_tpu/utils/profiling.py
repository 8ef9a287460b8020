"""Tracing, profiling, and metrics.

The reference's observability is limited to human-readable labels on Metal
command buffers/encoders so Xcode's GPU trace can attribute work
(src/kernel_thread.cc:30-31, 107-115) plus std::cout prints (SURVEY.md §5).
TPU-native equivalents:

  * `named_scope` / `trace` — `jax.named_scope` + `jax.profiler.TraceAnnotation`
    wrappers so ops/layers show up attributed in TensorBoard/Perfetto traces
    (`jax.profiler.start_trace(logdir)` around any serving loop).
  * `Meter` — tokens/s + TTFT accounting for serving loops (absent in the
    reference; the engine's per-request Completion metrics feed it).
  * `get_logger` — structured stdlib logging with a shared format.
"""

from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

import jax

_FORMAT = "%(asctime)s %(name)s %(levelname)s %(message)s"


def get_logger(name: str = "metalchat_tpu", level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
        logger.setLevel(level)
        logger.propagate = False
    return logger


@contextlib.contextmanager
def named_scope(name: str) -> Iterator[None]:
    """Name a traced region (shows up in XLA HLO + profiler timelines)."""
    with jax.named_scope(name):
        yield


@contextlib.contextmanager
def trace(name: str) -> Iterator[None]:
    """Host-side profiler annotation (TraceAnnotation) + wall-clock debug."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_to(logdir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class Meter:
    """Serving throughput meter: TTFT percentiles + aggregate tokens/s."""

    ttfts: List[float] = field(default_factory=list)
    service_ttfts: List[float] = field(default_factory=list)
    token_counts: List[int] = field(default_factory=list)
    _started: float = 0.0
    _elapsed: float = 0.0

    def start(self) -> None:
        self._started = time.perf_counter()

    def stop(self) -> None:
        self._elapsed += time.perf_counter() - self._started

    def record_request(self, ttft: Optional[float], tokens: int,
                       service_ttft: Optional[float] = None) -> None:
        if ttft is not None:
            self.ttfts.append(ttft)
        if service_ttft is not None:
            self.service_ttfts.append(service_ttft)
        self.token_counts.append(tokens)

    @staticmethod
    def _percentile(data: List[float], pct: float) -> Optional[float]:
        if not data:
            return None
        data = sorted(data)
        idx = min(len(data) - 1, int(pct / 100.0 * len(data)))
        return data[idx]

    def percentile_ttft(self, pct: float) -> Optional[float]:
        return self._percentile(self.ttfts, pct)

    def summary(self) -> Dict[str, float]:
        total = sum(self.token_counts)
        out: Dict[str, float] = {
            "requests": float(len(self.token_counts)),
            "total_tokens": float(total),
        }
        if self._elapsed > 0:
            out["tokens_per_sec"] = total / self._elapsed
        for name, data in (("ttft", self.ttfts),
                           ("service_ttft", self.service_ttfts)):
            p50 = self._percentile(data, 50)
            p99 = self._percentile(data, 99)
            if p50 is not None:
                out[f"{name}_p50"] = p50
            if p99 is not None:
                out[f"{name}_p99"] = p99
        return out
