"""conformer_tpu: a TPU-native Conformer ASR framework (JAX/XLA/Pallas).

A from-scratch reimplementation of the capabilities of Alan-404/Conformer
(PyTorch/CUDA) designed for TPU: SPMD over device meshes, static shapes,
MXU-friendly kernels, and XLA-compiled end-to-end pipelines.
"""

__version__ = "0.1.0"

from conformer_tpu.config import Config  # noqa: F401
