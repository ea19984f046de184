from efficient_tts_tpu.losses.fastspeech import fastspeech_loss  # noqa: F401
from efficient_tts_tpu.losses.duration import duration_mse_loss  # noqa: F401
