from efficient_tts_tpu.ops.alignment import (  # noqa: F401
    scaled_dot_attention,
    index_vector,
    imv_from_alpha,
    aligned_positions,
    alignment_from_positions,
    masked_softmax,
)
