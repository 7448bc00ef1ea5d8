"""cadx_tpu — TPU-native explainable breast-cancer CADx framework.

A ground-up JAX/XLA/Pallas rebuild of the reference mammography CADx
pipeline (ClearanceC137/vision-xai-breast-cancer-cad): on-device classical-CV
preprocessing, U-Net feature extraction, CNN classification, Grad-CAM /
saliency explainability, mesh-data-parallel cross-validated training, and
a serving layer — designed for TPU from the start (SPMD over device
meshes, functional transforms, static shapes, Pallas kernels for hot ops).
"""

__version__ = "0.1.0"

from cadx_tpu.models.cnn import CNNConfig  # noqa: F401
