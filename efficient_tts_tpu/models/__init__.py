"""Model registry.

The reference resolves model classes from YAML strings via getattr on
the package namespace (`nntts/bin/train.py:173-176`); here the registry
maps names to (config_cls, init, forward) module triples.
"""

from efficient_tts_tpu.models import (  # noqa: F401
    duration_model,
    efficient_tts,
    efficient_tts_transformer,
)
from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig  # noqa: F401
from efficient_tts_tpu.models.efficient_tts_transformer import (  # noqa: F401
    EftsTransformerConfig,
)
from efficient_tts_tpu.models.duration_model import DurationModelConfig  # noqa: F401

MODEL_REGISTRY = {
    "EfficientTTSCNN": efficient_tts,
    "EfficientTTSTransformer": efficient_tts_transformer,
    "DurationModel": duration_model,
}


def model_module_for(cfg):
    """Model module (init/forward/infer_durations/infer_decode) for a
    config instance — the train steps, pipeline, and CLIs dispatch on
    this so every MODEL_REGISTRY family is trainable and servable, not
    just EFTS-CNN (the reference resolves classes by string the same
    way, `nntts/bin/train.py:173-176`)."""
    from efficient_tts_tpu.models.efficient_tts_transformer import (
        EftsTransformerConfig,
    )

    if isinstance(cfg, EftsTransformerConfig):
        return efficient_tts_transformer
    return efficient_tts
