"""Training CLI.

Counterpart of `/root/reference/nntts/bin/train.py` with the same UX:

    python -m efficient_tts_tpu.bin.train \
        --config configs/lj_efts_cnn_phnseq.yaml \
        --train_fid_scp .../train.txt --dev_fid_scp .../dev.txt \
        --outdir exp/lj [--resume CKPT | --pretrain CKPT]

Differences by design: no per-rank process launcher -- one process
drives all local chips through a mesh; multi-host runs call
`jax.distributed.initialize` (see `parallel/distributed.py`).
"""

from __future__ import annotations

import argparse
import logging

import jax


def get_parser():
    p = argparse.ArgumentParser(description="Train EFTS-CNN (TPU-native)")
    p.add_argument("--config", required=True, help="YAML config file")
    p.add_argument("--train_fid_scp", required=True, help="train filelist")
    p.add_argument("--dev_fid_scp", default=None, help="dev filelist")
    p.add_argument("--outdir", required=True, help="output directory")
    p.add_argument("--resume", default=None, help="checkpoint to resume (full state)")
    p.add_argument("--pretrain", default=None, help="checkpoint to warm-start (params only)")
    p.add_argument("--verbose", type=int, default=1)
    p.add_argument("--mesh_model", type=int, default=None,
                   help="override model-parallel extent")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address host:port")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   dest="overrides",
                   help="override a top-level config key (YAML-parsed "
                   "value; repeatable) — the argv-merge analog of the "
                   "reference's train.py:94-96")
    return p


def apply_overrides(config: dict, overrides: list) -> dict:
    """KEY=VALUE overrides; KEY may be dotted (a.b.c) to set nested
    config keys, e.g. --set model_params.loss_normalize=utterance."""
    import yaml

    for item in overrides:
        key, _, value = item.partition("=")
        if "." in key:
            if not _ or not key.split(".", 1)[0]:
                raise SystemExit(f"--set expects KEY=VALUE, got {item!r}")
            parts = key.split(".")
            node = config
            for p in parts[:-1]:
                node = node.setdefault(p, {})
                if not isinstance(node, dict):
                    raise SystemExit(
                        f"--set {item!r}: {p!r} is not a mapping in the config"
                    )
            node[parts[-1]] = yaml.safe_load(value)
            continue
        if not _:
            raise SystemExit(f"--set expects KEY=VALUE, got {item!r}")
        config[key] = yaml.safe_load(value)
    return config


def main(argv=None):
    args = get_parser().parse_args(argv)
    from efficient_tts_tpu.utils.jax_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    logging.basicConfig(
        level=logging.DEBUG if args.verbose > 1 else logging.INFO,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )

    if args.coordinator:
        from efficient_tts_tpu.parallel.distributed import initialize_multihost

        initialize_multihost(args.coordinator, args.num_processes, args.process_id)

    from efficient_tts_tpu.data.collate import collate_text_mel
    from efficient_tts_tpu.data.dataset import TextMelDataset
    from efficient_tts_tpu.data.loader import (
        data_loader,
        device_prefetch,
        infinite_loader,
    )
    from efficient_tts_tpu.models import efficient_tts as efts
    from efficient_tts_tpu.parallel.mesh import fit_data_extent, make_mesh
    from efficient_tts_tpu.train import checkpoint as ckpt
    from efficient_tts_tpu.train.efts_trainer import EftsTrainer
    from efficient_tts_tpu.utils.config import (
        dump_config,
        load_config,
        model_config_from_dict,
        optimizer_from_dict,
    )

    config = apply_overrides(load_config(args.config), args.overrides)
    dump_config(config, args.outdir)

    cfg = model_config_from_dict(config)
    tx = optimizer_from_dict(config)

    ds_params = dict(config.get("dataset_params", {}))
    train_ds = TextMelDataset(args.train_fid_scp, **ds_params)
    batch_size = int(config.get("batch_size", 32))

    mesh_cfg = dict(config.get("mesh", {}) or {})
    if args.mesh_model is not None:
        mesh_cfg["model"] = args.mesh_model
    model_extent = int(mesh_cfg.get("model", 1) or 1)
    data_extent = mesh_cfg.get("data")
    if data_extent is None:
        per_host = max(batch_size // jax.process_count(), 1)
        data_extent = fit_data_extent(
            per_host, jax.local_device_count() // model_extent
        )
    mesh = make_mesh(data=int(data_extent), model=model_extent)
    text_bucket = int(config.get("text_bucket", 16))
    mel_bucket = int(config.get("mel_bucket", 64))

    def collate(batch):
        return collate_text_mel(batch, text_bucket, mel_bucket)

    shard_id = jax.process_index()
    num_shards = jax.process_count()
    per_host_batch = max(batch_size // num_shards, 1)
    from efficient_tts_tpu.data.loader import background_prefetch

    # background_prefetch collates the next batch on a worker thread
    # while the device runs the current step (cross-epoch, unlike the
    # per-epoch data_loader threads); device_prefetch then overlaps the
    # host->device transfer. Identity of repeated whole-corpus batches
    # is preserved through both.
    train_iter = device_prefetch(
        background_prefetch(infinite_loader(
            train_ds, per_host_batch, collate,
            shard_id=shard_id, num_shards=num_shards,
            length_fn=(
                train_ds.approx_length
                if config.get("length_bucketing", True)
                else None
            ),
        )),
        size=2,
        mesh=mesh,
    )

    eval_batches = []
    if args.dev_fid_scp:
        dev_ds = TextMelDataset(args.dev_fid_scp, **ds_params)
        # a dev set smaller than the train batch must still yield one
        # eval batch (drop_last would silently disable eval); keep the
        # batch a multiple of the mesh data extent for sharded eval
        de = mesh.shape["data"]
        eval_bs = min(per_host_batch, max(len(dev_ds), 1))
        eval_bs = max((eval_bs // de) * de, de)
        eval_batches = list(
            data_loader(dev_ds, eval_bs, collate, shuffle=False)
        )[:8]
        if not eval_batches:
            logging.warning(
                "dev set (%d utts) yields no eval batch at batch size %d",
                len(dev_ds), eval_bs,
            )

    writer = None
    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(args.outdir)
    except ImportError:
        pass

    trainer = EftsTrainer(
        cfg,
        tx,
        train_iter,
        eval_batches=eval_batches,
        outdir=args.outdir,
        mesh=mesh,
        train_max_steps=int(config.get("train_max_steps", 1_000_000)),
        save_interval_steps=int(config.get("save_interval_steps", 5000)),
        eval_interval_steps=int(config.get("eval_interval_steps", 1000)),
        log_interval_steps=int(config.get("log_interval_steps", 1000)),
        writer=writer,
        max_keep_checkpoints=config.get("max_keep_checkpoints"),
        accum_steps=int(config.get("accum_steps", 1)),
    )
    from efficient_tts_tpu.models import model_module_for

    params = model_module_for(cfg).init(
        jax.random.PRNGKey(int(config.get("seed", 0))), cfg
    )
    trainer.init_state(params)

    if args.resume:
        trainer.load(args.resume, load_only_params=False)
    elif args.pretrain:
        trainer.load(args.pretrain, load_only_params=True)
    else:
        latest = ckpt.latest_checkpoint(args.outdir)
        if latest:
            logging.info("auto-resuming from %s", latest)
            trainer.load(latest, load_only_params=False)

    trainer.run()
    # final save must be durable before main() returns (interval saves
    # during the run are async and overlap training)
    trainer.save(wait=True)


if __name__ == "__main__":
    main()
