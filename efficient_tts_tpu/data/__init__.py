from efficient_tts_tpu.data.dataset import TextMelDataset  # noqa: F401
from efficient_tts_tpu.data.collate import collate_text_mel  # noqa: F401
from efficient_tts_tpu.data.loader import data_loader  # noqa: F401
