"""camera_linearity_tpu — a TPU-native (JAX/XLA/Pallas) framework for camera
linearity analysis, ICRF calibration, uncertainty-tracked linearization and
HDR exposure-stack merging.

Ground-up redesign of the capabilities of ``samivout/camera_linearity``
(mounted read-only at /root/reference; see SURVEY.md for the layer map):
the NumPy/CuPy dual-backend Measurand becomes a single JAX pytree, pipelines
compile under jit, the HDR merge and the calibration objective run as fused
TPU kernels, and multi-chip scaling goes through jax.sharding meshes.
"""
from .config import CameraConfig, DEFAULT_CONFIG  # noqa: F401
from .measurand import Measurand  # noqa: F401

__version__ = "0.3.0"
