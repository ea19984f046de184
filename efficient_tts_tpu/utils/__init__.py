from efficient_tts_tpu.utils.masks import (  # noqa: F401
    sequence_mask,
    pad_mask,
    pad_to,
    pad_list,
    round_up,
    bucket_length,
)
