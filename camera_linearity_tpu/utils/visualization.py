"""Visualization of pipeline outputs (reference: modules/data_visualization.py).

Host-side matplotlib rendering of noise profiles, ICRF curves, image-channel
panels, linearity statistics (with scipy ODR line fit), histograms and KDEs.
Figures save to files; the Agg backend is forced so this works headless.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Union

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from ..config import CameraConfig, DEFAULT_CONFIG  # noqa: E402

__all__ = [
    "plot_noise_profiles_3d", "plot_noise_profiles_2d", "plot_ICRF",
    "plot_image_set_channels_separately", "create_linearity_plots",
    "plot_histograms", "plot_kde",
]

# Channel-character -> matplotlib color for the reference's b/g/r names.
_COLOR = {"b": "tab:blue", "g": "tab:green", "r": "tab:red"}


def _color_for(config: CameraConfig, c: int) -> str:
    return _COLOR.get(config.ch_chars[c], f"C{c}")


def _normalize_rows_by_sum(arr: np.ndarray) -> np.ndarray:
    sums = arr.sum(axis=1, keepdims=True)
    sums[sums == 0] = 1
    return arr / sums


def plot_noise_profiles_3d(noise_data_array: np.ndarray,
                           file_name: Union[Path, str],
                           save_path: Union[Path, str],
                           config: CameraConfig = DEFAULT_CONFIG) -> None:
    """Per-channel 3-D surface of the noise profiles
    (data_visualization.py:14-58)."""
    save_path, file_name = Path(save_path), Path(file_name)
    noise_data_array = np.asarray(noise_data_array)
    for c in range(config.num_of_chs):
        channel = _normalize_rows_by_sum(
            noise_data_array[:, :, c].astype(float))
        x = np.linspace(0, 1, num=channel.shape[1])
        y = np.linspace(0, 1, num=channel.shape[0])
        X, Y = np.meshgrid(x, y)
        fig = plt.figure()
        ax = plt.axes(projection="3d")
        ax.plot_surface(X, Y, channel, rstride=4, cstride=4,
                        cmap="viridis", edgecolor="none")
        ax.view_init(45, -30)
        out = save_path.joinpath(
            f"{file_name.stem} {config.ch_names[c]}{file_name.suffix}")
        plt.savefig(out, dpi=150)
        plt.close(fig)


def plot_noise_profiles_2d(noise_data_array: np.ndarray,
                           number_of_profiles: int, lower_bound: int,
                           upper_bound: int, file_name: Union[Path, str],
                           save_path: Union[Path, str],
                           config: CameraConfig = DEFAULT_CONFIG) -> None:
    """Line plots of selected noise-profile rows
    (data_visualization.py:61-105)."""
    save_path, file_name = Path(save_path), Path(file_name)
    noise_data_array = np.asarray(noise_data_array)
    bound_diff = upper_bound - lower_bound
    row_step = 1 if number_of_profiles >= bound_diff else \
        int(bound_diff / number_of_profiles)
    sampled = noise_data_array[lower_bound:upper_bound:row_step, :, :]
    x_range = np.linspace(0, config.max_dn, sampled.shape[1])
    for c in range(config.num_of_chs):
        normalized = _normalize_rows_by_sum(sampled[:, :, c].astype(float))
        fig = plt.figure()
        for i in range(min(number_of_profiles, normalized.shape[0])):
            row = normalized[i, :]
            mode_index = int(np.argmax(row))
            plt.xlim(lower_bound, upper_bound)
            plt.plot(x_range, row)
            plt.vlines(x_range[mode_index], 0, row[mode_index])
        out = save_path.joinpath(
            f"{file_name.stem} {config.ch_names[c]}{file_name.suffix}")
        plt.savefig(out, dpi=150)
        plt.close(fig)


def plot_ICRF(icrf_array: np.ndarray, file_name: Union[Path, str],
              save_path: Union[Path, str],
              config: CameraConfig = DEFAULT_CONFIG) -> None:
    """All-channel ICRF plot (data_visualization.py:108-127)."""
    save_path = Path(save_path)
    icrf_array = np.asarray(icrf_array)
    fig = plt.figure()
    x_range = np.linspace(0, 1, icrf_array.shape[0])
    plt.ylabel("Normalized exposure X (arb. units)")
    plt.xlabel("Normalized brightness B (arb. units)")
    for c in range(config.num_of_chs):
        plt.plot(x_range, icrf_array[:, c], color=_color_for(config, c))
    plt.savefig(save_path.joinpath(str(file_name)), dpi=150)
    plt.close(fig)


def plot_image_set_channels_separately(image_set,
                                       title: str =
                                       "Pixel values (arb. units)",
                                       color_map: str = "inferno",
                                       use_std: bool = False,
                                       save_path: Optional[Path] = None,
                                       config: Optional[CameraConfig] = None
                                       ) -> Path:
    """Row of per-channel image panels with colorbars
    (data_visualization.py:142-171)."""
    cfg = config or image_set.config
    fig, axes = plt.subplots(1, cfg.num_of_chs, figsize=(20, 5))
    if cfg.num_of_chs == 1:
        axes = [axes]
    image = np.asarray(image_set.measurand.std if
                       (use_std and image_set.measurand.std is not None)
                       else image_set.measurand.val)
    for c, ax in enumerate(axes):
        panel = ax.imshow(image[:, :, c], cmap=color_map)
        fig.colorbar(panel, ax=ax)
        ax.set_axis_off()
        ax.set_title(f"{cfg.ch_names[c]} {title}", fontsize=14)
    fig.tight_layout(pad=1.2)
    if save_path is None:
        save_path = image_set.path.parent.joinpath(
            image_set.path.name.replace(".tif", ".png"))
    plt.savefig(save_path, dpi=150)
    plt.close(fig)
    return save_path


def _linear_function(beta, x):
    return beta[0] + beta[1] * x


def create_linearity_plots(stats: Dict, save_path: Path, fit_line: bool,
                           ylabel: str, symbol: str,
                           config: CameraConfig = DEFAULT_CONFIG) -> Dict:
    """Per-channel linearity scatter with uncertainty bars and an optional
    scipy-ODR line fit (data_visualization.py:178-232).

    Returns the per-channel ODR fits ``{ch_char: {"beta": (A, B),
    "sd_beta": (dA, dB)}}`` (empty when ``fit_line`` is off or there are
    fewer than 2 points) so the fitted coefficients are data, not just
    title text — tests/unit/test_visualization.py pins them against
    direct scipy.odr values and analytic lines.  Intentional divergences
    from the reference renderer: matplotlib color comes from a
    name->color map instead of passing the channel NAME as the color
    (reference crashes on 'blue'≠valid for non-RGB configs), a 1-channel
    config gets a 1-element axes list (reference indexes axes[1]
    unconditionally), and a missing 'errors' entry skips the error bars
    instead of raising."""
    from scipy.odr import ODR, Model, RealData

    x = np.asarray(stats["ratios"])
    fits: Dict = {}
    fig, axes = plt.subplots(1, config.num_of_chs, figsize=(20, 5))
    if config.num_of_chs == 1:
        axes = [axes]
    for c, ax in enumerate(axes):
        color = _color_for(config, c)
        cc = config.ch_chars[c]
        y = np.asarray(stats["means"])[:, c]
        y_std = np.asarray(stats["stds"])[:, c]
        y_err = None if stats.get("errors") is None else \
            np.asarray(stats["errors"])[:, c]

        if fit_line and len(x) >= 2:
            linear_model = Model(_linear_function)
            sy = np.where(y_std == 0, 1e-12, y_std)
            odr = ODR(RealData(x, y, sy=sy), linear_model, beta0=[0.0, 0.0])
            odr_output = odr.run()
            fits[cc] = {"beta": tuple(float(b) for b in odr_output.beta),
                        "sd_beta": tuple(float(b)
                                         for b in odr_output.sd_beta)}
            line = _linear_function(odr_output.beta, x)
            ax.plot(x, line, c="black")
            ax.set_title(
                f"{cc}: A={odr_output.beta[0]:.4f} "
                f"$\\pm$ {odr_output.sd_beta[0]:.4f}, "
                f"B={odr_output.beta[1]:.4f} "
                f"$\\pm$ {odr_output.sd_beta[1]:.4f}", fontsize=12)

        ax.errorbar(x, y, yerr=(y_std / 5), elinewidth=1, c=color,
                    marker=None, linestyle="none", markersize=3, alpha=0.5,
                    label=f"$\\sigma_{{{cc}, {symbol}}}$")
        if y_err is not None:
            ax.errorbar(x, y, yerr=y_err, elinewidth=1, c="0", marker="x",
                        linestyle="none", markersize=3, alpha=1,
                        label=f"$\\delta {symbol}_{cc}$")
        ax.legend(loc="best")
    axes[0].set(ylabel=ylabel)
    axes[min(1, len(axes) - 1)].set(
        xlabel=r"Exposure time ratio $t_s/t_l$")
    plt.savefig(save_path, dpi=150)
    plt.close(fig)
    return fits


def plot_histograms(histogram_dictionary: Dict, save_path: Path,
                    file_name: str,
                    config: CameraConfig = DEFAULT_CONFIG) -> None:
    """Bar plots of per-channel histograms (data_visualization.py:235-254).
    """
    for channel_key, (hist, bin_edges) in histogram_dictionary.items():
        hist = np.asarray(hist, float)
        bin_edges = np.asarray(bin_edges)
        total = hist.sum()
        if total:
            hist = hist / total
        width = float(abs(bin_edges[1] - bin_edges[0]))
        fig = plt.figure()
        plt.bar(bin_edges[:-1], hist, width=width,
                fc=_color_for(config, channel_key), ec=None)
        plt.savefig(Path(save_path).joinpath(
            f"{file_name} {config.ch_names[channel_key]}.png"), dpi=150)
        plt.close(fig)


def plot_kde(kde_dictionary: Dict, save_path: Path, file_name: str,
             config: CameraConfig = DEFAULT_CONFIG) -> None:
    """Line plots of per-channel KDEs (data_visualization.py:257-277)."""
    for channel_key, (kde, x_range) in kde_dictionary.items():
        kde = np.asarray(kde, float)
        total = kde.sum()
        if total:
            kde = kde / total
        fig = plt.figure()
        plt.plot(np.asarray(x_range), kde,
                 c=_color_for(config, channel_key), label="KDE", linewidth=3)
        plt.legend(loc="best")
        plt.savefig(Path(save_path).joinpath(
            f"{file_name} {config.ch_names[channel_key]}.png"), dpi=150)
        plt.close(fig)
