"""End-to-end pipelines composing the framework's stages.

The reference leaves composition to user scripts (README.md:29-43); these
are the canonical flows, including BASELINE config 5's video -> HDR path:
per-exposure videos reduce to mean/std frames (streaming Welford), the
frames form an exposure series, and the series merges into an HDR radiance
map with uncertainty — everything after decode on device.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CameraConfig, DEFAULT_CONFIG
from ..measurand import Measurand
from ..ops import hdr as hdr_ops
from ..utils.observability import get_logger
from .exposure_series import ExposureSeries
from .image_set import ImageSet
from . import video as video_mod

Array = jnp.ndarray

__all__ = ["videos_to_exposure_series", "video_to_hdr", "batch_video_to_hdr"]


def _exposure_of(path: Path) -> float:
    from ..utils import io
    feats = io.features_from_file_name(path.with_suffix(".tif"))
    return feats["exposure"]


def videos_to_stacks(video_paths: Sequence[Path],
                     config: CameraConfig = DEFAULT_CONFIG,
                     batch_size: int = 32):
    """Reduce per-exposure videos to HOST (N, H, W, C) value/std stacks.

    The per-video statistics finalize DIRECTLY into slices of the
    preassembled stack (``HostMoments.finalize(out=...)``) in the
    canonical device float — no intermediate per-video frames, no
    conversion pass — so the whole scene then crosses the host->device
    link as ONE transfer per array.  Returns
    ``(val_stack, std_stack, exposures, sorted_paths)``, all NumPy.
    """
    import time as _time
    log = get_logger()
    ftype = jax.dtypes.canonicalize_dtype(np.float64)
    paths = sorted(video_paths, key=_exposure_of)
    val_stack = std_stack = None
    for i, path in enumerate(paths):
        _t0 = _time.time()
        if val_stack is None:
            h, w = video_mod.probe_geometry(path)
            shape = (len(paths), h, w, config.num_of_chs)
            val_stack = np.empty(shape, ftype)
            std_stack = np.empty(shape, ftype)
        video_mod.welford_algorithm(path, None, use_std=True,
                                    config=config, batch_size=batch_size,
                                    quantize=False, dtype=ftype,
                                    out=(val_stack[i], std_stack[i]))
        log.debug("videos_to_stacks %s: %.1fs", path.name,
                  _time.time() - _t0)
    exposures = np.asarray([_exposure_of(p) for p in paths])
    return val_stack, std_stack, exposures, paths


def videos_to_exposure_series(video_paths: Sequence[Path],
                              config: CameraConfig = DEFAULT_CONFIG,
                              batch_size: int = 32) -> ExposureSeries:
    """Reduce per-exposure videos to an ExposureSeries of mean/std frames.

    Each video's filename carries its exposure descriptor (the reference's
    grammar, e.g. ``scene 5ms.avi``); the Welford scan produces the value
    image (mean) and its uncertainty (std of the mean) per exposure.  The
    per-exposure Measurands are device-resident slices of one staged
    (N, H, W, C) transfer (see videos_to_stacks).
    """
    val_stack, std_stack, _, paths = videos_to_stacks(
        video_paths, config, batch_size)
    dval = jnp.asarray(val_stack)
    dstd = jnp.asarray(std_stack)
    sets: List[ImageSet] = []
    for i, path in enumerate(paths):
        m = Measurand(dval[i], dstd[i])
        sets.append(ImageSet(file_path=path.with_suffix(".tif"),
                             measurand=m, config=config))
    return ExposureSeries(input_image_sets=sets, config=config)


def video_to_hdr(video_paths: Sequence[Path], ICRF: Array,
                 ICRF_diff: Optional[Array] = None,
                 config: CameraConfig = DEFAULT_CONFIG,
                 batch_size: int = 32) -> ImageSet:
    """BASELINE config 5 for one scene: videos -> mean/std stack -> HDR."""
    log = get_logger()
    series = videos_to_exposure_series(video_paths, config, batch_size)
    log.info("video_to_hdr: %d exposures stacked",
             len(series.input_image_sets))
    return series.process_HDR_image(ICRF=jnp.asarray(ICRF),
                                    ICRF_diff=None if ICRF_diff is None
                                    else jnp.asarray(ICRF_diff),
                                    list_of_dark_fields=[],
                                    apply_flat_field=False)


def batch_video_to_hdr(scenes: Dict[str, Sequence[Path]], ICRF: Array,
                       ICRF_diff: Optional[Array] = None,
                       config: CameraConfig = DEFAULT_CONFIG,
                       mesh=None) -> Dict[str, ImageSet]:
    """Batch of scenes: stack every scene's series and merge them together.

    With a mesh, the merge runs sharded (scenes over ``data``, rows over
    ``pixel`` — parallel/sharded.py); otherwise one batched device call.
    """
    import time as _time
    from ..ops.linearize import icrf_derivative
    log = get_logger()
    cfg = config
    icrf_j = jnp.asarray(ICRF)
    icrf_diff_j = jnp.asarray(ICRF_diff) if ICRF_diff is not None else \
        icrf_derivative(icrf_j, cfg.bits)

    names = list(scenes.keys())
    _t0 = _time.time()
    # Host statistics for scene k+1 overlap the device upload of scene k:
    # decode+moments are CPU-bound while the upload is link-bound, and on
    # tunneled hosts the link sporadically degrades by >10x — hiding it
    # behind the next scene's decode makes those stalls free.
    from concurrent.futures import ThreadPoolExecutor

    def _to_device(v, s):
        dv, ds = jnp.asarray(v), jnp.asarray(s)
        jax.block_until_ready((dv, ds))
        return dv, ds

    futs = []
    with ThreadPoolExecutor(max_workers=1) as xfer:
        for k in names:
            val, std, exposures_np, paths = videos_to_stacks(scenes[k], cfg)
            futs.append((xfer.submit(_to_device, val, std), paths))
    scene_stacks = [f.result() for f, _ in futs]
    scene_paths = [p for _, p in futs]
    exposures = jnp.asarray(exposures_np)
    log.info("batch_video_to_hdr: %d scene stacks in %.1fs", len(names),
             _time.time() - _t0)
    _t0 = _time.time()
    batch_val = jnp.stack([v for v, _ in scene_stacks])
    batch_std = jnp.stack([s for _, s in scene_stacks])
    batch_val.block_until_ready()
    log.info("batch_video_to_hdr: batched in %.1fs", _time.time() - _t0)
    _t0 = _time.time()

    if mesh is not None:
        from ..parallel import sharded
        from ..parallel.mesh import shard_batch_of_scenes
        bv = shard_batch_of_scenes(batch_val, mesh)
        bs = shard_batch_of_scenes(batch_std, mesh)
        out_val, out_std = sharded.merge_batch_sharded(
            bv, bs, exposures, icrf_j, icrf_diff_j, mesh)
    else:
        out_val, out_std = hdr_ops.merge_batch(batch_val, batch_std,
                                               exposures, icrf_j,
                                               icrf_diff_j)
    out_val.block_until_ready()
    log.info("batch_video_to_hdr: merged in %.1fs", _time.time() - _t0)

    results = {}
    for i, name in enumerate(names):
        first_path = scene_paths[i][0].with_suffix(".tif")
        hdr_set = ImageSet(file_path=first_path,
                           measurand=Measurand(out_val[i], out_std[i]),
                           config=cfg)
        hdr_set.is_hdr = True
        results[name] = hdr_set
    return results
