"""`efts-serve`: HTTP TTS serving around a trained checkpoint.

TPU-native counterpart of running the reference's `nntts-inference` in a
loop: loads an EFTS checkpoint (+ optional HiFi-GAN vocoder checkpoint),
folds weight norm, warms up the bucket grid, and serves

    POST /synthesize {"text": "..."}  -> audio/wav (22050 Hz PCM_16)
    GET  /healthz, GET /stats

with dynamic micro-batching (concurrent requests share one TPU batch).

    efts-serve --checkpoint exp/ckpt-100000 --port 8080
    efts-serve --random_init --use_cpu --port 8080   # smoke/demo mode
"""

from __future__ import annotations

import argparse
import logging
import os


def get_parser():
    p = argparse.ArgumentParser(description="EfficientTTS-TPU HTTP server")
    p.add_argument("--checkpoint", default=None, help="EFTS checkpoint dir")
    p.add_argument("--vocoder_checkpoint", default=None,
                   help="HiFi-GAN generator checkpoint dir")
    p.add_argument("--random_init", action="store_true",
                   help="serve random weights (smoke tests / benches)")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--max_wait_ms", type=float, default=10.0)
    p.add_argument("--max_queue", type=int, default=256,
                   help="admission bound on pending requests; beyond it "
                   "submits get 503 + Retry-After (0 = unbounded)")
    p.add_argument("--deadline_ms", type=float, default=10000.0,
                   help="queue-wait deadline; admitted requests that age "
                   "past it are shed with 503 (0 = no deadline)")
    p.add_argument("--bf16", action="store_true",
                   help="serve conv stacks in bfloat16 (recommended on TPU)")
    p.add_argument("--use_cpu", action="store_true")
    p.add_argument("--no_warmup", action="store_true")
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard serving micro-batches over N chips "
                        "(0 = single chip; must divide --max_batch)")
    return p


def build_engine(args):
    import jax
    import jax.numpy as jnp

    from efficient_tts_tpu.models import efficient_tts as efts
    from efficient_tts_tpu.models import hifigan as hg
    from efficient_tts_tpu.models.efficient_tts import EftsCNNConfig
    from efficient_tts_tpu.models.hifigan import HiFiGANConfig
    from efficient_tts_tpu.nn.layers import fold_weight_norm
    from efficient_tts_tpu.serve import TTSEngine
    from efficient_tts_tpu.text import load_phone_vocab

    phone_vocab = None
    if args.random_init:
        cfg = EftsCNNConfig(num_symbols=148, dropout_rate=0.0, use_masking=True)
        voc_cfg = HiFiGANConfig()  # random-init mode keeps defaults
        efts_params = fold_weight_norm(efts.init(jax.random.PRNGKey(0), cfg))
        voc_params = fold_weight_norm(hg.init_generator(jax.random.PRNGKey(1), voc_cfg))
    else:
        if not args.checkpoint:
            raise SystemExit("--checkpoint required (or pass --random_init)")
        from efficient_tts_tpu.train import checkpoint as ckpt
        from efficient_tts_tpu.train.optim import adam_warmup
        from efficient_tts_tpu.train.state import create_state
        from efficient_tts_tpu.utils.config import load_config, model_config_from_dict

        ckpt_dir = os.path.dirname(os.path.abspath(args.checkpoint))
        config = load_config(os.path.join(ckpt_dir, "config.yml"))
        cfg = model_config_from_dict(config)
        from efficient_tts_tpu.models import model_module_for

        params = model_module_for(cfg).init(jax.random.PRNGKey(0), cfg)
        template = create_state(params, adam_warmup())
        state = ckpt.load_checkpoint(args.checkpoint, template, load_only_params=True)
        efts_params = fold_weight_norm(state["params"])

        from efficient_tts_tpu.utils.config import vocoder_config_near_checkpoint

        voc_cfg = vocoder_config_near_checkpoint(args.vocoder_checkpoint)
        if args.vocoder_checkpoint:
            from efficient_tts_tpu.bin.inference import _load_vocoder

            voc_params = _load_vocoder(args.vocoder_checkpoint, voc_cfg)
        else:
            logging.warning("no --vocoder_checkpoint: random vocoder weights")
            voc_params = fold_weight_norm(
                hg.init_generator(jax.random.PRNGKey(1), voc_cfg)
            )
        ds_params = dict(config.get("dataset_params", {}))
        if ds_params.get("use_phnseq"):
            phone_vocab = load_phone_vocab(ds_params["phnset_path"])

    mesh = None
    if args.data_parallel:
        from efficient_tts_tpu.parallel.mesh import make_mesh

        if args.max_batch % args.data_parallel:
            raise SystemExit(
                f"--max_batch {args.max_batch} not divisible by "
                f"--data_parallel {args.data_parallel}"
            )
        mesh = make_mesh(data=args.data_parallel, model=1,
                         devices=jax.devices()[: args.data_parallel])

    return TTSEngine(
        efts_params,
        voc_params,
        cfg,
        voc_cfg,
        max_batch=args.max_batch,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        phone_vocab=phone_vocab,
        mesh=mesh,
    )


def main(argv=None):
    args = get_parser().parse_args(argv)
    from efficient_tts_tpu.utils.jax_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    logging.basicConfig(level=logging.INFO)
    if args.use_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from efficient_tts_tpu.serve import make_http_server, serve_forever

    engine = build_engine(args)
    if not args.no_warmup:
        logging.info("warming up bucket grid...")
        engine.warmup()
    server = make_http_server(
        engine, args.host, args.port, max_wait_ms=args.max_wait_ms,
        max_queue=args.max_queue or None,
        deadline_ms=args.deadline_ms or None,
    )
    serve_forever(server)


if __name__ == "__main__":
    main()
