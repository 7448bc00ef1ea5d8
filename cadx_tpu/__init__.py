"""cadx_tpu — TPU-native explainable breast-cancer CADx framework.

A ground-up JAX/XLA/Pallas rebuild of the reference mammography CADx
pipeline (ClearanceC137/vision-xai-breast-cancer-cad): on-device classical-CV
preprocessing, U-Net feature extraction, CNN classification, Grad-CAM /
saliency explainability, mesh-data-parallel cross-validated training, and
a serving layer — designed for TPU from the start (SPMD over device
meshes, functional transforms, static shapes, Pallas kernels for hot ops).
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (remote TPU compiles here run
    20-300s; cached reloads take seconds). Opt out: CADX_NO_COMPILE_CACHE=1;
    relocate: CADX_COMPILE_CACHE=<dir>."""
    import os

    if os.environ.get("CADX_NO_COMPILE_CACHE") == "1":
        return
    # Only cache for TPU backends: XLA:CPU AOT caching is brittle across
    # host-feature detection differences (SIGILL warnings), and CPU
    # compiles are fast anyway.
    if "tpu" not in os.environ.get("JAX_PLATFORMS", "axon").lower() and \
            "axon" not in os.environ.get("JAX_PLATFORMS", "axon").lower():
        return
    cache = os.environ.get(
        "CADX_COMPILE_CACHE", os.path.expanduser("~/.cache/cadx_tpu/jax"))
    try:
        import jax

        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass


_enable_compilation_cache()

from cadx_tpu.models.cnn import CNNConfig  # noqa: F401
