"""Smoke tests: every plotting function renders and writes files."""
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from camera_linearity_tpu import CameraConfig, Measurand
from camera_linearity_tpu.models.image_set import ImageSet
from camera_linearity_tpu.utils import visualization as viz

CFG = CameraConfig()


def test_plot_icrf(tmp_path, rng):
    icrf = np.sort(rng.uniform(0, 1, (256, 3)), axis=0)
    viz.plot_ICRF(icrf, "icrf.png", tmp_path, CFG)
    assert (tmp_path / "icrf.png").stat().st_size > 0


def test_plot_noise_profiles(tmp_path, rng):
    data = rng.integers(0, 50, (256, 256, 3))
    viz.plot_noise_profiles_3d(data, "prof3d.png", tmp_path, CFG)
    viz.plot_noise_profiles_2d(data, 4, 10, 200, "prof2d.png", tmp_path, CFG)
    assert (tmp_path / "prof3d blue.png").exists()
    assert (tmp_path / "prof2d red.png").exists()


def test_plot_channels(tmp_path, rng):
    s = ImageSet(tmp_path / "5ms BF s 50x.tif",
                 value=jnp.asarray(rng.uniform(0, 1, (16, 16, 3))),
                 std=jnp.asarray(rng.uniform(0, 0.1, (16, 16, 3))))
    out = viz.plot_image_set_channels_separately(s)
    assert Path(out).exists()
    out2 = viz.plot_image_set_channels_separately(
        s, use_std=True, save_path=tmp_path / "std_panels.png")
    assert Path(out2).exists()


def test_create_linearity_plots(tmp_path, rng):
    n_pairs = 6
    stats = {"ratios": rng.uniform(0.1, 1.0, n_pairs),
             "means": rng.normal(0, 0.01, (n_pairs, 3)),
             "stds": rng.uniform(0.001, 0.01, (n_pairs, 3)),
             "errors": rng.uniform(0.001, 0.005, (n_pairs, 3))}
    viz.create_linearity_plots(stats, tmp_path / "lin.png", True,
                               "Relative diff", "R", CFG)
    assert (tmp_path / "lin.png").stat().st_size > 0
    stats["errors"] = None
    viz.create_linearity_plots(stats, tmp_path / "lin2.png", False,
                               "Relative diff", "R", CFG)
    assert (tmp_path / "lin2.png").exists()


def test_plot_histograms_and_kde(tmp_path, rng):
    m = Measurand(jnp.asarray(rng.uniform(0, 1, (32, 32, 3))))
    hists = m.compute_channel_histogram(16, (0.0, 1.0))
    viz.plot_histograms(hists, tmp_path, "hist", CFG)
    assert (tmp_path / "hist green.png").exists()
    kdes = m.compute_kernel_density_estimate(32, (0.0, 1.0), channels=[0])
    viz.plot_kde(kdes, tmp_path, "kde", CFG)
    assert (tmp_path / "kde blue.png").exists()
