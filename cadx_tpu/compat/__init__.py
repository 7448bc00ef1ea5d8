"""Reference-compatible API surfaces (`Classes/` module equivalents)."""

from cadx_tpu.compat.classes import (  # noqa: F401
    CNNModel,
    CrossValidator,
    ExplainableAI,
    ImageSegmentation,
    Model,
    ModelEvaluator,
    ModelPredictor,
    ModelTrainer,
    Preprocessing,
    TinyUNetModel,
    load_weights,
    tiny_unet,
)
