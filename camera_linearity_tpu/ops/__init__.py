"""Numeric ops: uncertainty algebra, LUT linearization, statistics, filters,
fused HDR merge, linearity objective and streaming Welford kernels."""
from . import uncertainty, stats, linearize, filters  # noqa: F401
