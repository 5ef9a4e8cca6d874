#!/usr/bin/env python3
"""Stage-1 self-supervised pretraining: masked-spectrogram prediction.

The reference's README describes this stage and lists
`scripts/train_pretrain.py` + `configs/pretrain.yaml` in its repo map
(reference README.md:189-212, 444-452) but ships no pretraining code.
This CLI implements it (velocity_asr_tpu/pretrain.py): span-masked mel
reconstruction on unlabeled audio, then Stage-2 supervised fine-tuning
via `scripts/train.py --init-from <pretrain_checkpoint>/final_backbone`
(which drops the pretrained encoder into a fresh ASR model).

Labels in the configured dataset, if any, are ignored — the objective
reads only audio/mel and input_lengths.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from velocity_asr_tpu.utils.platform import apply_platform_env

apply_platform_env()

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s | %(levelname)s | %(message)s"
)
logger = logging.getLogger("pretrain")


def main():
    parser = argparse.ArgumentParser(
        description="Pretrain the VELOCITY-ASR backbone (masked prediction)"
    )
    parser.add_argument("--config", default="configs/pretrain.yaml")
    parser.add_argument("--model-config", default="configs/model.yaml")
    parser.add_argument("--resume", default=None, help="checkpoint to resume from")
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--synthetic", type=int, default=None,
                        help="pretrain on N synthetic utterances (unlabeled "
                             "stream) instead of configured data")
    args = parser.parse_args()

    import dataclasses

    import jax

    from scripts.train import build_data
    from velocity_asr_tpu.data import cycle
    from velocity_asr_tpu.models.model import count_parameters
    from velocity_asr_tpu.pretrain import (
        MaskedPredictionConfig,
        MaskedPredictor,
        PretrainTrainer,
        save_pretrain_artifact,
    )
    from velocity_asr_tpu.utils.config import (
        load_yaml,
        model_config_from_yaml,
        training_config_from_yaml,
    )

    for flag, path, default in (("--config", args.config, "configs/pretrain.yaml"),
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
    if args.batch_size is not None:
        train_cfg = dataclasses.replace(train_cfg, batch_size=args.batch_size)

    mask_cfg_dict = dict(train_cfg_dict.get("masking") or {})
    # Accept the reference README's tuple-style frequency_band_width.
    band = mask_cfg_dict.pop("frequency_band_width", None)
    if band is not None:
        mask_cfg_dict["frequency_band_min"] = int(band[0])
        mask_cfg_dict["frequency_band_max"] = int(band[1])
    known = {f.name for f in dataclasses.fields(MaskedPredictionConfig)}
    unknown = set(mask_cfg_dict) - known
    if unknown:
        parser.error(f"unknown masking config keys: {sorted(unknown)}")
    mask_cfg = MaskedPredictionConfig(**mask_cfg_dict)

    if not train_cfg.use_amp and model_cfg.dtype != "float32":
        logger.info("use_amp disabled: forcing float32 compute")
        model_cfg = dataclasses.replace(model_cfg, dtype="float32")

    data_cfg = dict(train_cfg_dict.get("data") or {})
    if args.synthetic is not None:
        data_cfg["synthetic"] = args.synthetic
        data_cfg.setdefault("synthetic_split", "unlab")
    train_loader, eval_loader, _ = build_data(
        data_cfg, model_cfg, train_cfg.batch_size, logger
    )

    logger.info("Devices: %s", jax.devices())
    logger.info("Model config: %s", model_cfg)
    logger.info("Masking: %s", mask_cfg)

    model = MaskedPredictor(config=model_cfg)
    eval_batches = (lambda: iter(eval_loader)) if eval_loader is not None else None
    trainer = PretrainTrainer(
        model, train_cfg, cycle(train_loader), eval_batches,
        mask_config=mask_cfg,
    )
    logger.info("Parameters: %s", f"{count_parameters(trainer.params):,}")

    if args.resume:
        trainer.load_checkpoint(args.resume)

    history = trainer.train()

    final = os.path.join(train_cfg.checkpoint_dir, "final_model")
    trainer.save_checkpoint(final)
    backbone_dir = os.path.join(train_cfg.checkpoint_dir, "final_backbone")
    save_pretrain_artifact(backbone_dir, model_cfg, mask_cfg, trainer.params)
    logger.info(
        "Pretraining complete. Fine-tune with: scripts/train.py "
        "--init-from %s", backbone_dir,
    )
    return history


if __name__ == "__main__":
    main()
