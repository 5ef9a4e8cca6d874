#!/usr/bin/env python3
"""Train VELOCITY-ASR TPU (reference scripts/train.py).

Data source fallback chain matches the reference (scripts/train.py:216-288):
JSONL manifest -> LibriSpeech-on-disk -> dummy random dataset. A vocab-size
mismatch between data and model config re-creates the model
(reference scripts/train.py:243-252).
"""

import argparse
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from velocity_asr_tpu.utils.platform import apply_platform_env

apply_platform_env()

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s | %(levelname)s | %(message)s"
)
logger = logging.getLogger("train")


class DummyASRDataset:
    """Random-data smoke dataset (reference scripts/train.py:41-112)."""

    def __init__(self, num_samples=1000, vocab_size=1000, seed=0):
        self.num_samples = num_samples
        self.vocab_size = vocab_size
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        rng = np.random.default_rng(self.seed + idx)
        frames = int(rng.integers(100, 500))
        n_tokens = int(rng.integers(10, 50))
        return {
            "mel_spectrogram": rng.standard_normal((frames, 80)).astype(np.float32),
            "targets": rng.integers(3, self.vocab_size, size=(n_tokens,)).astype(np.int32),
            "input_lengths": np.int32(frames),
            "target_lengths": np.int32(n_tokens),
            "text": "",
        }


def build_data(data_cfg, model_cfg, batch_size, logger):
    """Returns (train_loader, eval_loader_or_None, vocab_dict_or_None)."""
    from velocity_asr_tpu.data import (
        ASRCollator,
        DataLoader,
        create_dataloader,
        create_librispeech_dataloaders,
    )

    device_mel = bool(data_cfg.get("device_mel", False))
    n_synth = int(data_cfg.get("synthetic", 0) or 0)
    if n_synth:
        # Deterministic synthetic speech corpus (velocity_asr_tpu.synth):
        # validates the full LibriSpeech recipe end-to-end in environments
        # without audio data. "train"/"dev" are disjoint sentence streams.
        from velocity_asr_tpu.synth import SyntheticSpeechDataset

        logger.info("Using synthetic speech corpus: %d train utterances", n_synth)
        seed = int(data_cfg.get("synthetic_seed", 1234))
        # Sentence length is configurable so a length-extension fine-tune
        # can cover long-form audio (default 2-8 words = 1-6 s clips).
        min_w = int(data_cfg.get("synthetic_min_words", 2))
        max_w = int(data_cfg.get("synthetic_max_words", 8))
        # synthetic_split selects the (disjoint) sentence stream — the
        # pretraining recipe draws its "unlabeled" pool from a different
        # split than the supervised data (scripts/pretrain.py).
        split = str(data_cfg.get("synthetic_split", "train"))
        # Multilingual corpus (language-ID training): >1 mixes the synth
        # languages and items carry per-utterance "language" labels that
        # feed training.lid_loss_weight.
        langs = int(data_cfg.get("synthetic_languages", 1))
        train_ds = SyntheticSpeechDataset(
            n_synth, split=split, seed=seed, min_words=min_w,
            max_words=max_w, device_mel=device_mel, languages=langs,
        )
        eval_ds = SyntheticSpeechDataset(
            max(64, n_synth // 100), split=f"{split}_dev" if split != "train" else "dev",
            seed=seed, min_words=min_w, max_words=max_w, device_mel=device_mel,
            languages=langs,
        )
        # frame_bucket 200 keeps the number of compiled train-step shapes
        # at ~3 for the 1-6 s synthetic utterances (first TPU compiles
        # through the tunnel cost minutes each); long-sentence configs
        # should raise it to bound the shape count.
        collator = ASRCollator(frame_bucket=int(data_cfg.get("frame_bucket", 200)))
        train_loader = DataLoader(
            train_ds, batch_size=batch_size, shuffle=True, num_workers=8,
            collate_fn=collator, drop_last=True, prefetch=4,
        )
        eval_loader = DataLoader(
            eval_ds, batch_size=batch_size, shuffle=False, num_workers=8,
            collate_fn=collator,
        )
        return train_loader, eval_loader, train_ds.vocab

    manifest = data_cfg.get("manifest")
    if manifest and os.path.exists(manifest):
        logger.info("Using manifest dataset: %s", manifest)
        train_loader, train_ds = create_dataloader(
            manifest,
            batch_size=batch_size,
            shuffle=True,
            max_duration=data_cfg.get("max_duration", 30.0),
            min_duration=data_cfg.get("min_duration", 0.5),
            device_mel=device_mel,
        )
        eval_loader = None
        eval_manifest = data_cfg.get("eval_manifest")
        if eval_manifest and os.path.exists(eval_manifest):
            # Same pipeline options as the train loader: a different
            # max_duration would silently filter the eval set, and a
            # host-mel eval against a device-mel train step would run a
            # different normalization path.
            eval_loader, eval_ds = create_dataloader(
                eval_manifest, batch_size=batch_size, shuffle=False,
                max_duration=data_cfg.get("max_duration", 30.0),
                min_duration=data_cfg.get("min_duration", 0.5),
                device_mel=device_mel,
            )
            # Targets must be encoded with the TRAIN vocabulary, not one
            # rebuilt from the eval corpus's own character set.
            eval_ds.vocab = train_ds.vocab
        return train_loader, eval_loader, train_ds.vocab

    root = data_cfg.get("librispeech_root")
    if root and os.path.isdir(os.path.join(root, "LibriSpeech")):
        logger.info("Using LibriSpeech at %s", root)
        train_loader, eval_loader, vocab = create_librispeech_dataloaders(
            root=root,
            train_splits=data_cfg.get("train_splits", ["train-clean-100"]),
            val_splits=data_cfg.get("val_splits", ["dev-clean"]),
            batch_size=batch_size,
            max_duration=data_cfg.get("max_duration", 30.0),
            device_mel=device_mel,
        )
        return train_loader, eval_loader, vocab

    logger.warning("No dataset configured; using dummy random data "
                   "(reference scripts/train.py:284-288)")
    ds = DummyASRDataset(vocab_size=model_cfg.vocab_size)
    loader = DataLoader(ds, batch_size=batch_size, shuffle=True,
                        collate_fn=ASRCollator(), drop_last=True)
    return loader, None, None


def vocab_to_list(vocab: dict) -> list:
    """id->token list from a {token: id} vocab dict."""
    out = [None] * (max(vocab.values()) + 1)
    for token, idx in vocab.items():
        out[idx] = token
    return [t if t is not None else "<unk>" for t in out]


def main():
    parser = argparse.ArgumentParser(description="Train VELOCITY-ASR TPU")
    parser.add_argument("--config", default="configs/train.yaml")
    parser.add_argument("--model-config", default="configs/model.yaml")
    parser.add_argument("--resume", default=None, help="checkpoint to resume from")
    parser.add_argument("--init-from", default=None,
                        help="pretrained directory (config.json + params.msgpack): "
                             "initialize model weights from it but start a fresh "
                             "run (step 0, fresh optimizer) — unlike --resume, "
                             "which restores full trainer state from an Orbax "
                             "checkpoint. Use for fine-tuning from a shipped "
                             "final_pretrained artifact.")
    parser.add_argument("--max-steps", type=int, default=None, help="override max_steps")
    parser.add_argument("--lr-total-steps", type=int, default=None,
                        help="cosine-decay horizon in optimizer updates "
                             "(default: max_steps, reference parity; see "
                             "TrainingConfig.lr_total_steps)")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--checkpoint-dir", default=None,
                        help="override checkpoint.dir (and keep metrics.jsonl "
                             "beside it) — lets one config drive A/B runs, "
                             "e.g. the pretrained-vs-scratch comparison in "
                             "configs/finetune.yaml")
    parser.add_argument("--profile-dir", default=None,
                        help="capture a jax.profiler trace of a few steps here")
    parser.add_argument("--synthetic", type=int, default=None,
                        help="train on N synthetic-speech utterances "
                             "(velocity_asr_tpu.synth) instead of configured data")
    args = parser.parse_args()

    import dataclasses

    import jax

    from velocity_asr_tpu.models.model import create_model, save_pretrained
    from velocity_asr_tpu.quantize import prepare_model_for_qat
    from velocity_asr_tpu.training import Trainer
    from velocity_asr_tpu.data import cycle
    from velocity_asr_tpu.utils.config import (
        load_yaml,
        model_config_from_yaml,
        training_config_from_yaml,
    )

    # A missing DEFAULT config path falls through to defaults + dummy data
    # (reference parity), but a user-supplied path that doesn't exist is a
    # typo that must not silently train 80k steps on random noise.
    for flag, path, default in (("--config", args.config, "configs/train.yaml"),
                                ("--model-config", args.model_config,
                                 "configs/model.yaml")):
        if path != default and not os.path.exists(path):
            parser.error(f"{flag} {path!r} does not exist")
    train_cfg_dict = load_yaml(args.config) if os.path.exists(args.config) else {}
    model_cfg_dict = load_yaml(args.model_config) if os.path.exists(args.model_config) else {}

    model_cfg = model_config_from_yaml(model_cfg_dict)
    train_cfg = training_config_from_yaml(train_cfg_dict)
    if args.max_steps is not None:
        train_cfg = dataclasses.replace(train_cfg, max_steps=args.max_steps)
    if args.lr_total_steps is not None:
        train_cfg = dataclasses.replace(train_cfg, lr_total_steps=args.lr_total_steps)
    if args.batch_size is not None:
        train_cfg = dataclasses.replace(train_cfg, batch_size=args.batch_size)
    if args.checkpoint_dir is not None:
        replacements = {"checkpoint_dir": args.checkpoint_dir}
        if train_cfg.metrics_path:
            replacements["metrics_path"] = os.path.join(
                args.checkpoint_dir, os.path.basename(train_cfg.metrics_path)
            )
        train_cfg = dataclasses.replace(train_cfg, **replacements)
    if args.profile_dir is not None:
        train_cfg = dataclasses.replace(train_cfg, profile_dir=args.profile_dir)

    logger.info("Devices: %s", jax.devices())

    # Optional QAT (reference scripts/train.py:184-192). The YAML section's
    # scheme fields flow into QuantizationConfig so bit-widths take effect
    # and unsupported scheme values hit prepare_model_for_qat's guard
    # instead of being silently dropped.
    quant_cfg_dict = dict(train_cfg_dict.get("quantization") or {})
    if quant_cfg_dict.pop("enabled", False):
        from velocity_asr_tpu.quantize import QuantizationConfig

        logger.info("Enabling quantization-aware training")
        quant_cfg_dict.pop("start_step", None)  # dead in the reference too
        known = {f.name for f in dataclasses.fields(QuantizationConfig)}
        unknown = set(quant_cfg_dict) - known
        if unknown:
            raise ValueError(f"unknown quantization config keys: {sorted(unknown)}")
        model_cfg = prepare_model_for_qat(
            model_cfg, QuantizationConfig(**quant_cfg_dict)
        )

    # use_amp=False forces fp32 compute regardless of model.yaml dtype.
    if not train_cfg.use_amp and model_cfg.dtype != "float32":
        logger.info("use_amp disabled: forcing float32 compute")
        model_cfg = dataclasses.replace(model_cfg, dtype="float32")

    data_cfg = dict(train_cfg_dict.get("data") or {})
    if args.synthetic is not None:
        data_cfg["synthetic"] = args.synthetic
    train_loader, eval_loader, data_vocab = build_data(
        data_cfg, model_cfg, train_cfg.batch_size, logger
    )

    # Vocab-size mismatch re-creates the model (reference scripts/train.py:243-252).
    if data_vocab is not None and len(data_vocab) != model_cfg.vocab_size:
        logger.info(
            "Dataset vocab size %d != model vocab %d; rebuilding model config",
            len(data_vocab), model_cfg.vocab_size,
        )
        model_cfg = dataclasses.replace(model_cfg, vocab_size=len(data_vocab))

    model = create_model(model_cfg)
    logger.info("Model config: %s", model_cfg)

    init_params_loaded = None
    if args.init_from:
        if args.resume:
            parser.error("--init-from and --resume are mutually exclusive")
        from velocity_asr_tpu.models.model import from_pretrained
        from velocity_asr_tpu.pretrain import (
            init_asr_from_backbone,
            is_pretrain_artifact,
        )

        if is_pretrain_artifact(args.init_from):
            # Stage-2 fine-tune from a masked-prediction backbone
            # (scripts/pretrain.py): pretrained encoder subtrees + fresh
            # CTC head. Handles the QAT param re-nesting itself.
            init_params_loaded = init_asr_from_backbone(
                model_cfg, args.init_from, jax.random.PRNGKey(0)
            )
            logger.info(
                "Initialized backbone from pretraining artifact %s "
                "(fresh CTC head, fresh optimizer/step)", args.init_from,
            )
        else:
            init_model, init_params_loaded = from_pretrained(args.init_from)
            if init_model.config.vocab_size != model_cfg.vocab_size:
                raise SystemExit(
                    f"--init-from vocab_size {init_model.config.vocab_size} != "
                    f"configured/dataset vocab_size {model_cfg.vocab_size}; "
                    "fine-tune with the same vocabulary the weights were trained on"
                )
            if model_cfg.qat and not init_model.config.qat:
                # fp32 pretrained -> QAT fine-tune (the reference's QAT recipe):
                # the only structural difference is the temporal-binding conv
                # living under QuantConv1d's conv/{kernel,bias} names (the
                # inverse of the final_pretrained export above).
                import flax

                p = flax.core.unfreeze(init_params_loaded)
                tb = dict(p["temporal_binding"])
                if "conv_kernel" in tb:
                    tb["conv"] = {"kernel": tb.pop("conv_kernel"),
                                  "bias": tb.pop("conv_bias")}
                    p["temporal_binding"] = tb
                init_params_loaded = p
            if model_cfg.moe_experts > 0 and "ffn_in" in (
                init_params_loaded.get("local_ssm", {}).get("layers_0", {})
            ):
                # Dense -> MoE fine-tune: sparse upcycling (replicate the
                # dense FFN into every expert, small-random router) so the
                # MoE model starts at the dense checkpoint's quality and
                # the router specializes from there (models/moe.py).
                from velocity_asr_tpu.models.moe import upcycle_dense_to_moe

                init_params_loaded = upcycle_dense_to_moe(
                    init_params_loaded, model_cfg.moe_experts,
                    jax.random.PRNGKey(0),
                )
                logger.info(
                    "Upcycled dense FFNs into %d experts per block "
                    "(sparse upcycling; router fresh)", model_cfg.moe_experts,
                )
            if (model_cfg.num_languages > 0
                    and "lid_head" not in init_params_loaded):
                # Multilingual fine-tune from a monolingual artifact: the
                # LID head is new — graft fresh-initialized head params
                # onto the loaded tree (everything else transfers).
                import flax

                from velocity_asr_tpu.models.model import init_params

                fresh = init_params(model, jax.random.PRNGKey(0),
                                    example_frames=64)
                p = flax.core.unfreeze(init_params_loaded)
                p["lid_head"] = fresh["lid_head"]
                p["lid_norm"] = fresh["lid_norm"]
                init_params_loaded = p
                logger.info("Grafted a fresh LID head (num_languages=%d) "
                            "onto the loaded weights", model_cfg.num_languages)
            logger.info("Initialized weights from %s (fresh optimizer/step)",
                        args.init_from)

    eval_batches = (lambda: iter(eval_loader)) if eval_loader is not None else None
    trainer = Trainer(model, train_cfg, cycle(train_loader), eval_batches,
                      params=init_params_loaded)
    from velocity_asr_tpu.models.model import count_parameters

    logger.info("Parameters: %s", f"{count_parameters(trainer.params):,}")

    if args.resume:
        trainer.load_checkpoint(args.resume)

    history = trainer.train()

    final = os.path.join(train_cfg.checkpoint_dir, "final_model")
    trainer.save_checkpoint(final)
    pretrained_dir = os.path.join(train_cfg.checkpoint_dir, "final_pretrained")
    pretrained_cfg = model_cfg
    pretrained_params = trainer.params
    if model_cfg.qat:
        # Fake-quant is a training-time construct: a qat=True artifact
        # would crash every consumer that doesn't thread quant_stats.
        # Ship the fp32 inference config (QAT params ARE the fp32
        # weights; the only structural difference is the temporal-binding
        # conv living under QuantConv1d's conv/{kernel,bias} names) and
        # keep the learned observer stats alongside for INT8 packaging
        # (scripts/export_model.py).
        import flax

        pretrained_cfg = dataclasses.replace(model_cfg, qat=False)
        p = flax.core.unfreeze(jax.device_get(trainer.params))
        tb = dict(p["temporal_binding"])
        conv = tb.pop("conv")
        tb["conv_kernel"] = conv["kernel"]
        tb["conv_bias"] = conv["bias"]
        p["temporal_binding"] = tb
        pretrained_params = p
        os.makedirs(pretrained_dir, exist_ok=True)
        with open(os.path.join(pretrained_dir, "quant_stats.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes(
                jax.device_get(trainer.quant_stats)))
        logger.info("QAT run: final_pretrained saved with qat=False "
                    "(fp32 inference); observer stats in quant_stats.msgpack")
    save_pretrained(pretrained_dir, pretrained_cfg, pretrained_params)
    if data_vocab is not None:
        # transcribe/evaluate read vocabulary.json from the checkpoint dir;
        # without it they would fall back to the default vocabulary with a
        # different id->char layout.
        import json

        with open(os.path.join(pretrained_dir, "vocabulary.json"), "w") as f:
            json.dump(vocab_to_list(data_vocab), f)
    logger.info("Training complete. Final checkpoint: %s", final)
    return history


if __name__ == "__main__":
    main()
