"""Training launcher: stage-1 Q-former pretrain / stage-3 instruction tuning.

Replaces the reference's task scripts (infty-VideoChat2/tasks/train_qformer.py,
train_it.py, train_it_ds.py and the SLURM launchers under scripts/):

  python -m infinite_video_tpu.cli.train --config cfg.yaml \\
      --stage it --output-dir runs/stage3 model.alpha=0.75

Config files support `_base_` inheritance and dotlist overrides
(utils/config.py). On multi-host pods, run the same command on every host
(jax.distributed discovers peers).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--stage", choices=["qformer", "pt", "it", "hd"],
                   default="it")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--zero", action="store_true",
                   help="ZeRO-1/2: shard optimizer state over the dp axis "
                        "(DeepSpeed-equivalent, tasks/shared_utils_ds.py)")
    p.add_argument("--accum-steps", type=int, default=1,
                   help="gradient accumulation microsteps (accum_grad_iters, "
                        "InfVideoLLaMA/tasks/base_task.py:150-241)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random-weight model + toy tokenizer (integration)")
    p.add_argument("overrides", nargs="*", help="dotlist key=value overrides")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from infinite_video_tpu.parallel.distributed import init_distributed
    from infinite_video_tpu.parallel.mesh import make_mesh
    from infinite_video_tpu.parallel.sharding import shard_params
    from infinite_video_tpu.training.optim import (cosine_warmup_schedule,
                                                   make_optimizer)
    from infinite_video_tpu.training.runner import Runner, RunnerConfig
    from infinite_video_tpu.training.trainer import (init_train_state,
                                                     make_train_step)
    from infinite_video_tpu.utils.config import load_config
    from infinite_video_tpu.utils.logging import setup_logger

    rank, _ = init_distributed()
    setup_logger(rank=rank)
    cfg = load_config(args.config, args.overrides)
    mesh = make_mesh(tp=args.tp)

    if args.stage in ("it", "pt", "hd"):
        # pt = stage-2 vision-text pretraining (train_pt.py): caption corpora
        # with caption-only labels (collate_pt_batch); same sharded step.
        # hd = stage-4 dynamic-resolution tuning (config_7b_hd_stage4.py):
        # tiles-as-batch encode, padded tiles masked (hd_loss_parts).
        from infinite_video_tpu.models import videochat2 as vc2
        from infinite_video_tpu.models.decoder import Decoder

        family = cfg.model.get("llm_family", "mistral")
        if args.tiny:
            mcfg = vc2.tiny_config(chunk_len=cfg.model.get("num_frames", 2))
        else:
            kw = dict(
                chunk_len=cfg.model.get("num_frames", 16),
                num_basis=cfg.model.get("num_basis", 64),
                tau=cfg.model.get("tau", 0.75),
                alpha=cfg.model.get("alpha", 0.75),
                sticky=cfg.model.get("sticky", True),
                num_frames=cfg.model.get("num_frames", 16))
            # per-LLM wrappers (videochat_{mistra,vicuna,phi}/*): same encoder
            # stack, decoder swapped by family
            if family == "vicuna":
                mcfg = vc2.vicuna_config(**kw)
            elif family == "phi":
                mcfg, phi_cfg = vc2.phi_config(**kw)
            else:
                mcfg = vc2.default_config(**kw)
        encoder = vc2.VideoChat2Encoder(mcfg)
        if family == "phi" and not args.tiny:
            from infinite_video_tpu.models.phi import PhiDecoder

            decoder = PhiDecoder(phi_cfg)
        else:
            decoder = Decoder(mcfg.decoder)

        rng = jax.random.PRNGKey(cfg.get("seed", 42))
        t = mcfg.vit.num_frames
        enc_params = encoder.init(
            rng, jnp.zeros((1, t, 224, 224, 3)), encoder.init_states(1),
            instruction_ids=jnp.zeros((1, 4), jnp.int32))["params"]
        dec_params = decoder.init(
            jax.random.PRNGKey(1), input_ids=jnp.zeros((1, 4), jnp.int32)
        )["params"]
        if cfg.model.get("vit_blip_model_path") or cfg.model.get("videochat2_model_path"):
            from infinite_video_tpu.convert.checkpoints import assemble_videochat2_params

            paths = [p for p in (cfg.model.get("vit_blip_model_path"),
                                 cfg.model.get("videochat2_model_path")) if p]
            enc_params, maybe_dec = assemble_videochat2_params(
                enc_params, paths, decoder_path=cfg.model.get("llm_path"))
            if maybe_dec is not None:
                dec_params = maybe_dec
        with mesh:
            params = {"encoder": shard_params(enc_params, mesh, rules=()),
                      "decoder": shard_params(dec_params, mesh)}
            sched = cosine_warmup_schedule(
                cfg.optimizer.get("lr", 2e-5),
                cfg.scheduler.get("warmup_steps", 100),
                cfg.scheduler.get("total_steps", 10000))
            tx = make_optimizer(
                sched,
                weight_decay=cfg.optimizer.get("weight_decay", 0.02),
                max_grad_norm=cfg.optimizer.get("max_grad_norm", 1.0),
                trainable_pattern=cfg.optimizer.get(
                    "trainable_pattern", r"(qformer|query_tokens|_proj)"))
            state = init_train_state(params, tx, mesh=mesh, zero=args.zero)
            step = jax.jit(make_train_step(encoder, decoder, tx, mesh=mesh,
                                           zero=args.zero,
                                           accum_steps=args.accum_steps,
                                           hd=args.stage == "hd"))

            def make_loader(epoch, skip):
                from infinite_video_tpu.data.loader import MetaLoader

                loaders = _build_it_loaders(cfg, mcfg, epoch, tiny=args.tiny,
                                            stage=args.stage)
                return MetaLoader(loaders, seed=cfg.get("seed", 42) + epoch,
                                  skip_num=skip)

            runner = Runner(RunnerConfig(output_dir=args.output_dir,
                                         max_epochs=cfg.get("max_epochs", 1)),
                            step, make_loader)
            runner.fit(state)
    else:
        # stage-1: Q-former contrastive pretraining (tasks/train_qformer.py).
        from infinite_video_tpu.models import videochat2_qformer as s1
        from infinite_video_tpu.training.trainer import make_qformer_train_step

        if args.accum_steps != 1:
            raise SystemExit("stage-1 losses are contrastive over the whole "
                             "batch; gradient accumulation is not supported "
                             "(the reference trains stage-1 without it)")
        model_cfg = cfg.get("model", {})
        if args.tiny:
            mcfg = s1.tiny_pretrain_config()
        else:
            mcfg = s1.default_pretrain_config(
                num_frames=model_cfg.get("num_frames", 4))
        mcfg = _apply_loss_weights(mcfg, cfg)
        model = s1.VideoChat2QFormerPretrain(mcfg)

        rng = jax.random.PRNGKey(cfg.get("seed", 42))
        t = mcfg.vit.num_frames
        pixels0 = jnp.zeros((2, t, mcfg.vit.img_size, mcfg.vit.img_size, 3))
        ids0 = jnp.zeros((2, 4), jnp.int32)
        params = model.init(rng, pixels0, ids0, jnp.ones((2, 4)))["params"]
        if model_cfg.get("pretrained_path"):
            from infinite_video_tpu.convert.checkpoints import (
                assemble_videochat2_qformer_params)

            params = assemble_videochat2_qformer_params(
                params, model_cfg["pretrained_path"])
        with mesh:
            params = shard_params(params, mesh, rules=())
            sched = cosine_warmup_schedule(
                cfg.optimizer.get("lr", 1e-4),
                cfg.scheduler.get("warmup_steps", 100),
                cfg.scheduler.get("total_steps", 10000))
            mgn = cfg.optimizer.get("max_grad_norm", -1.0)  # -1 disables (ref)
            tx = make_optimizer(
                sched,
                weight_decay=cfg.optimizer.get("weight_decay", 0.02),
                max_grad_norm=None if mgn is None or mgn <= 0 else mgn,
                trainable_pattern=cfg.optimizer.get("trainable_pattern"))
            state = init_train_state(params, tx, mesh=mesh, zero=args.zero)
            step = jax.jit(make_qformer_train_step(model, tx, mesh=mesh,
                                                   zero=args.zero))

            def make_loader(epoch, skip):
                from infinite_video_tpu.data.loader import MetaLoader

                loaders = _build_qformer_loaders(cfg, mcfg, epoch,
                                                 tiny=args.tiny)
                return MetaLoader(loaders, seed=cfg.get("seed", 42) + epoch,
                                  skip_num=skip)

            runner = Runner(RunnerConfig(output_dir=args.output_dir,
                                         max_epochs=cfg.get("max_epochs", 1)),
                            step, make_loader)
            runner.fit(state)


def _apply_loss_weights(mcfg, cfg):
    """criterion.loss_weight overrides (config_7b_stage1.py criterion dict)."""
    import dataclasses

    weights = cfg.get("criterion", {}).get("loss_weight", {})
    if not weights:
        return mcfg
    fields = {"vtc": "loss_vtc", "vtm": "loss_vtm", "mlm": "loss_mlm",
              "cap": "loss_cap"}
    updates = {fields[k]: float(v) for k, v in weights.items() if k in fields}
    return dataclasses.replace(mcfg, **updates)


def _build_qformer_loaders(cfg, mcfg, epoch, tiny=False):
    """Stage-1 caption loaders: corpus names or explicit datasets entries →
    collate_qformer_batch dicts (pixels, BERT-tokenized captions, idx)."""
    from infinite_video_tpu.data.datasets import CaptionDataset
    from infinite_video_tpu.data.loader import StatefulShardSampler
    from infinite_video_tpu.data.processors import train_processor
    from infinite_video_tpu.training.collate import collate_qformer_batch

    if tiny:
        from infinite_video_tpu.utils.testing import ToyTokenizer

        tokenizer = ToyTokenizer(mcfg.qformer.vocab_size)
    else:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(
            cfg.get("model", {}).get("tokenizer", "bert-base-uncased"))
    max_txt_l = cfg.get("max_txt_l", 32)

    corpora_cfg = cfg.get("corpora")
    if corpora_cfg:
        from infinite_video_tpu.data.corpora import build_corpus_loaders

        return build_corpus_loaders(
            corpora_cfg.get("names", []),
            processor=train_processor(image_size=mcfg.vit.img_size),
            tokenizer=tokenizer, num_frames=mcfg.vit.num_frames,
            num_query_tokens=mcfg.num_query_token,
            batch_size=corpora_cfg.get("batch_size", 1),
            anno_root=corpora_cfg.get("anno_root", ""),
            data_root=corpora_cfg.get("data_root", ""),
            seed=epoch, stage="qformer", max_txt_len=max_txt_l)

    loaders = {}
    for name, dcfg in cfg.get("datasets", {}).items():
        proc = train_processor(image_size=mcfg.vit.img_size)
        ds = CaptionDataset(dcfg["ann_file"], dcfg["data_root"], proc,
                            num_frames=mcfg.vit.num_frames)
        bs = dcfg.get("batch_size", 1)
        sampler = StatefulShardSampler(len(ds), bs, seed=epoch)

        class _Loader:
            def __init__(self, ds, sampler, bs):
                self.ds, self.sampler, self.bs = ds, sampler, bs

            def __len__(self):
                return len(self.sampler) // self.bs

            def __iter__(self):
                batch = []
                for i in self.sampler:
                    frames, caption = self.ds[i][:2]
                    batch.append((frames, caption, i))
                    if len(batch) == self.bs:
                        yield collate_qformer_batch(batch, tokenizer,
                                                    max_txt_len=max_txt_l)
                        batch = []

        loaders[name] = _Loader(ds, sampler, bs)
    return loaders


def _build_it_loaders(cfg, mcfg, epoch, tiny=False, stage="it"):
    """Named batch loaders from cfg.datasets entries (ann/data_root/batch) or
    registry corpus names (cfg.corpora — configs/{data,instruction_data}.py
    equivalents); each yields collated train-step dicts (training/collate.py).
    stage="pt" reads caption annotations and collates caption-only labels."""
    from infinite_video_tpu.data.datasets import CaptionDataset, InstructionDataset
    from infinite_video_tpu.data.loader import StatefulShardSampler
    from infinite_video_tpu.data.processors import train_processor
    from infinite_video_tpu.training.collate import (collate_it_batch,
                                                     collate_pt_batch)

    if tiny:
        from infinite_video_tpu.utils.testing import ToyTokenizer

        tokenizer = ToyTokenizer(mcfg.decoder.vocab_size)
    else:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(cfg.model["llm_path"])

    corpora_cfg = cfg.get("corpora")
    if corpora_cfg:
        if stage == "hd":
            raise SystemExit("--stage hd trains from explicit `datasets:` "
                             "entries (HD corpora need original-aspect media "
                             "paths, not the registry's processed tables)")
        from infinite_video_tpu.data.corpora import build_corpus_loaders

        return build_corpus_loaders(
            corpora_cfg.get("names", []),
            processor=train_processor(image_size=mcfg.vit.img_size),
            tokenizer=tokenizer, num_frames=mcfg.vit.num_frames,
            num_query_tokens=mcfg.total_query_tokens,
            batch_size=corpora_cfg.get("batch_size", 1),
            anno_root=corpora_cfg.get("anno_root", ""),
            data_root=corpora_cfg.get("data_root", ""),
            dialect=corpora_cfg.get("dialect", "mistral"),
            seed=epoch)
    loaders = {}
    for name, dcfg in cfg.get("datasets", {}).items():
        proc = train_processor(image_size=mcfg.vit.img_size)
        if stage == "pt" and "shards" in dcfg:
            # laion / cc_sbu / cc3m-style tar shards (LAVIS webdataset
            # builders, laion_dataset.py:17-24) — data/webdataset.py
            from infinite_video_tpu.data.webdataset import WebDatasetShards

            bs = dcfg.get("batch_size", 1)
            epoch_size = dcfg.get("epoch_size", 1024)
            base_seed = cfg.get("seed", 42) + epoch

            def make_wds(round_, _d=dcfg, _p=proc, _s=base_seed,
                         _n=epoch_size):
                return WebDatasetShards(
                    _d["shards"], processor=_p,
                    shuffle_buffer=_d.get("shuffle_buffer", 1000),
                    seed=_s + 1013 * round_,
                    resample=_d.get("resample", False), epoch_size=_n)

            class _WdsLoader:
                """Yields exactly len(self) batches: shards are cycled with
                a bumped seed when they hold fewer samples than epoch_size
                (MetaLoader trusts declared lengths — an exhausted iterator
                mid-epoch would kill training)."""

                def __init__(self, make_wds, bs, n, shards,
                             _prompt=cfg.get("prompt", "<Video></Video> ")):
                    self.make_wds, self.bs, self.n = make_wds, bs, n
                    self.shards = shards
                    self.prompt = _prompt

                def __len__(self):
                    return self.n // self.bs

                def __iter__(self):
                    import numpy as _np

                    t = mcfg.vit.num_frames
                    target = len(self)
                    yielded, round_ = 0, 0
                    batch = []
                    while yielded < target:
                        got = 0
                        for frames, caption in self.make_wds(round_):
                            got += 1
                            if frames.shape[0] == 1 and t > 1:
                                # image corpora: tile to the model's frame
                                # count (a static video) so image and video
                                # batches share one train-step executable
                                frames = _np.repeat(frames, t, axis=0)
                            batch.append((frames, caption))
                            if len(batch) == self.bs:
                                yield collate_pt_batch(
                                    batch, tokenizer,
                                    num_query_tokens=mcfg.total_query_tokens,
                                    prompt=self.prompt)
                                batch = []
                                yielded += 1
                                if yielded >= target:
                                    return
                        round_ += 1
                        if got == 0:
                            raise RuntimeError(
                                f"webdataset shards yielded no samples "
                                f"({self.shards})")

            loaders[name] = _WdsLoader(make_wds, bs, epoch_size,
                                       dcfg["shards"])
            continue
        if stage == "pt":
            ds = CaptionDataset(dcfg["ann_file"], dcfg["data_root"], proc,
                                num_frames=mcfg.vit.num_frames)

            def collate(batch, _prompt=cfg.get("prompt", "<Video></Video> ")):
                return collate_pt_batch(batch, tokenizer,
                                        num_query_tokens=mcfg.total_query_tokens,
                                        prompt=_prompt)
        elif stage == "hd":
            from infinite_video_tpu.data.processors import hd_raw_processor
            from infinite_video_tpu.training.collate import collate_hd_batch

            ds = InstructionDataset(dcfg["ann_file"], dcfg["data_root"],
                                    hd_raw_processor(),
                                    num_frames=mcfg.vit.num_frames,
                                    dialect=dcfg.get("dialect", "mistral"))

            def collate(batch,
                        _hd=cfg.get("model", {}).get("hd_num", 6),
                        _size=mcfg.vit.img_size):
                return collate_hd_batch(
                    batch, tokenizer,
                    num_query_tokens=mcfg.total_query_tokens,
                    hd_num=_hd, image_size=_size)
        else:
            ds = InstructionDataset(dcfg["ann_file"], dcfg["data_root"], proc,
                                    num_frames=mcfg.vit.num_frames,
                                    dialect=dcfg.get("dialect", "mistral"))

            def collate(batch, _dialect=dcfg.get("dialect", "mistral")):
                return collate_it_batch(batch, tokenizer,
                                        num_query_tokens=mcfg.total_query_tokens,
                                        dialect=_dialect)
        sampler = StatefulShardSampler(len(ds), dcfg.get("batch_size", 1),
                                       seed=epoch)

        class _Loader:
            def __init__(self, ds, sampler, bs, collate):
                self.ds, self.sampler, self.bs = ds, sampler, bs
                self.collate = collate

            def __len__(self):
                return len(self.sampler) // self.bs

            def __iter__(self):
                batch = []
                for i in self.sampler:
                    batch.append(self.ds[i])
                    if len(batch) == self.bs:
                        yield self.collate(batch)
                        batch = []

        loaders[name] = _Loader(ds, sampler, dcfg.get("batch_size", 1), collate)
    return loaders


if __name__ == "__main__":
    main()
