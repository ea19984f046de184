from efficient_tts_tpu.nn import layers  # noqa: F401
from efficient_tts_tpu.nn.layers import (  # noqa: F401
    conv1d,
    conv1d_init,
    conv_transpose1d,
    conv_transpose1d_init,
    embedding_init,
    layer_norm,
    layer_norm_init,
    leaky_relu,
    linear,
    linear_init,
    weight_norm_init,
    weight_norm_kernel,
    fold_weight_norm,
)
from efficient_tts_tpu.nn.blocks import (  # noqa: F401
    res_conv_block,
    res_conv_block_init,
)
from efficient_tts_tpu.nn.duration_predictor import (  # noqa: F401
    duration_predictor,
    duration_predictor_infer,
    duration_predictor_init,
)
