"""efficient_tts_tpu: a TPU-native (JAX/XLA/Pallas) EfficientTTS framework.

A from-scratch reimplementation of the capabilities of the reference
PyTorch stack (liusongxiang/efficient_tts): EFTS-CNN non-autoregressive
text-to-mel with differentiable monotonic IMV alignment, a HiFi-GAN
vocoder, FastSpeech-style losses, a step-based trainer, and a
Kaldi-style recipe/CLI surface -- re-designed TPU-first:

  * pure-functional pytree parameters, explicit PRNG
  * jit-compiled XLA graphs with static shapes + bucketed inference
  * Pallas kernels for the hot alignment/conv paths
  * `jax.sharding.Mesh` + NamedSharding for data/model parallelism
    (instead of process-based DDP/NCCL)
  * orbax-style checkpointing of {params, opt_state, step}
"""

from efficient_tts_tpu.version import __version__  # noqa: F401
