"""Structured logging and device profiling.

The reference's only observability is ad-hoc prints (SURVEY.md §5;
ICRF_calibration_exposure.py:366-368, video_processing.py:260-262).  Here:
a namespaced stdlib logger, a jax.profiler trace context for capturing
device timelines (viewable in TensorBoard/XProf), and a lightweight
wall-clock scope that synchronizes device work so timings are honest on
asynchronous backends.
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator, Optional

import jax

__all__ = ["get_logger", "trace", "timed"]

_FORMAT = "%(asctime)s %(name)s %(levelname)s %(message)s"


def get_logger(name: str = "camera_linearity_tpu",
               level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
        logger.setLevel(level)
        logger.propagate = False
    return logger


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, logger: Optional[logging.Logger] = None,
          sync: bool = True) -> Iterator[dict]:
    """Wall-clock a block; blocks on outstanding device work first and
    after (asynchronous dispatch otherwise under-reports)."""
    logger = logger or get_logger()
    if sync:
        (jax.device_put(0.0) + 0).block_until_ready()
    info: dict = {}
    t0 = time.perf_counter()
    try:
        yield info
    finally:
        if sync:
            (jax.device_put(0.0) + 0).block_until_ready()
        info["seconds"] = time.perf_counter() - t0
        logger.info("%s: %.3f s", label, info["seconds"])
