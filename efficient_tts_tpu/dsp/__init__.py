from efficient_tts_tpu.dsp.filters import mel_filterbank, hann_window  # noqa: F401
from efficient_tts_tpu.dsp.mel import (  # noqa: F401
    MelConfig,
    stft_magnitude,
    mel_spectrogram,
    mel_spectrogram_np,
    num_frames,
)
