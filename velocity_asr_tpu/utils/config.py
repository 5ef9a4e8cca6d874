"""YAML config loading (reference scripts/train.py:35-38, 144-174)."""

from __future__ import annotations

from typing import Any, Dict

from ..models.config import VelocityASRConfig
from ..training import TrainingConfig


def load_yaml(path: str) -> Dict[str, Any]:
    import yaml

    with open(path, "r") as f:
        return yaml.safe_load(f) or {}


def model_config_from_yaml(cfg: Dict[str, Any]) -> VelocityASRConfig:
    """Map a model.yaml dict onto VelocityASRConfig with the same explicit
    .get() defaults as the reference (scripts/train.py:158-174)."""
    model = cfg.get("model") or cfg
    ssm = cfg.get("ssm") or {}
    glob = cfg.get("global_context") or {}
    out = cfg.get("output") or {}
    perf = cfg.get("performance") or {}
    scan_mode = perf.get("scan_mode", model.get("scan_mode", "parallel"))
    if scan_mode == "mamba":  # reference mode name -> TPU kernel tier
        scan_mode = "pallas"
    return VelocityASRConfig(
        mel_bins=model.get("mel_bins", 80),
        d_model=model.get("d_model", 192),
        ssm_layers=ssm.get("num_layers", model.get("ssm_layers", 8)),
        ssm_state_dim=ssm.get("state_dim", model.get("ssm_state_dim", 64)),
        ssm_expand_ratio=ssm.get("expand_ratio", model.get("ssm_expand_ratio", 2)),
        ssm_kernel_size=ssm.get("kernel_size", model.get("ssm_kernel_size", 4)),
        global_ssm_layers=glob.get("ssm_layers", model.get("global_ssm_layers", 2)),
        global_ssm_state_dim=glob.get("ssm_state_dim", model.get("global_ssm_state_dim", 32)),
        attention_heads=glob.get("attention_heads", model.get("attention_heads", 4)),
        attention_dim=glob.get("attention_dim", model.get("attention_dim", 48)),
        vocab_size=out.get("vocab_size", model.get("vocab_size", 1000)),
        dropout=model.get("dropout", 0.1),
        gradient_checkpointing=perf.get(
            "gradient_checkpointing", model.get("gradient_checkpointing", False)
        ),
        scan_mode=scan_mode,
        dtype=perf.get("dtype", model.get("dtype", "float32")),
        # Multilingual: >0 grows the language-ID head (models/model.py).
        num_languages=int(out.get("num_languages",
                                  model.get("num_languages", 0))),
        # MoE FFN (models/moe.py): ssm.moe_experts / moe_top_k /
        # moe_capacity_factor (top-level model.* spellings accepted too).
        moe_experts=int(ssm.get("moe_experts", model.get("moe_experts", 0))),
        moe_top_k=int(ssm.get("moe_top_k", model.get("moe_top_k", 2))),
        moe_capacity_factor=float(
            ssm.get("moe_capacity_factor",
                    model.get("moe_capacity_factor", 1.25))
        ),
    )


def training_config_from_yaml(cfg: Dict[str, Any]) -> TrainingConfig:
    """Map a train.yaml dict onto TrainingConfig
    (reference scripts/train.py:195-209)."""
    # Accept both this repo's top-level `augmentation:` stanza and the
    # reference's nested `data.augmentation:` with its key names
    # (reference configs/train.yaml:27-34: spec_augment/time_mask_param/
    # time_mask_num/freq_mask_param/freq_mask_num), so a migrated
    # reference train.yaml keeps SpecAugment on instead of silently
    # training un-augmented.
    aug = cfg.get("augmentation") or (cfg.get("data") or {}).get("augmentation") or {}
    opt = cfg.get("optimizer") or {}
    trn = cfg.get("training") or {}
    log = cfg.get("logging") or {}
    ckpt = cfg.get("checkpoint") or {}
    dist = cfg.get("distributed") or {}
    return TrainingConfig(
        learning_rate=float(opt.get("learning_rate", 1e-4)),
        weight_decay=float(opt.get("weight_decay", 0.01)),
        warmup_steps=int(opt.get("warmup_steps", 10000)),
        lr_total_steps=(
            int(opt["lr_total_steps"]) if opt.get("lr_total_steps") else None
        ),
        lr_parity_horizon=bool(opt.get("lr_parity_horizon", False)),
        max_steps=int(trn.get("max_steps", 80000)),
        grad_clip_norm=float(opt.get("grad_clip_norm", 1.0)),
        batch_size=int(trn.get("batch_size", 32)),
        gradient_accumulation_steps=int(trn.get("gradient_accumulation_steps", 1)),
        use_amp=bool(trn.get("use_amp", True)),
        streaming_chunks=int(trn.get("streaming_chunks", 0)),
        streaming_aux_weight=float(trn.get("streaming_aux_weight", 0.5)),
        lid_loss_weight=float(trn.get("lid_loss_weight", 0.0)),
        moe_aux_weight=float(trn.get("moe_aux_weight", 0.01)),
        log_interval=int(log.get("log_interval", 100)),
        eval_interval=int(log.get("eval_interval", 1000)),
        save_interval=int(ckpt.get("save_interval", 5000)),
        checkpoint_dir=ckpt.get("dir", "./checkpoints"),
        keep_last=int(ckpt.get("keep_last", 5)),
        num_data_shards=dist.get("num_data_shards", None),
        num_model_shards=int(dist.get("num_model_shards", 1)),
        num_pipeline_stages=int(dist.get("num_pipeline_stages", 1)),
        pipeline_microbatches=(
            int(dist["pipeline_microbatches"])
            if dist.get("pipeline_microbatches") else None
        ),
        profile_dir=log.get("profile_dir", None),
        metrics_path=log.get("metrics_path", None),
        augment=_spec_augment_from_yaml(aug),
    )


def _spec_augment_from_yaml(aug):
    from ..augment import SpecAugmentConfig

    # enabled/spec_augment gates the masking; noise_injection and
    # speed_perturb are their own switches (`spec_augment: false,
    # noise_injection: true` trains with noise only instead of silently
    # dropping the key). None when nothing is on.
    masking = bool(aug.get("enabled", aug.get("spec_augment", False)))
    noise = bool(aug.get("noise_injection", False))
    # the reference declares a bare boolean (train.yaml:34); a 2-element
    # [min, max] list overrides the 0.9-1.1 default factor range
    sp = aug.get("speed_perturb", False)
    if isinstance(sp, (list, tuple)):
        if len(sp) != 2 or not sp[0] <= sp[1]:
            raise ValueError(
                f"augmentation.speed_perturb: expected true/false or "
                f"[min, max] with min <= max, got {sp!r}"
            )
        speed_min, speed_max = float(sp[0]), float(sp[1])
        speed = True
    else:
        speed, speed_min, speed_max = bool(sp), 0.9, 1.1
    if not masking and not noise and not speed:
        return None
    return SpecAugmentConfig(
        enabled=True,
        num_time_masks=(
            int(aug.get("num_time_masks", aug.get("time_mask_num", 2)))
            if masking else 0
        ),
        time_mask_frames=int(
            aug.get("time_mask_frames", aug.get("time_mask_param", 50))
        ),
        num_freq_masks=(
            int(aug.get("num_freq_masks", aug.get("freq_mask_num", 2)))
            if masking else 0
        ),
        freq_mask_bins=int(aug.get("freq_mask_bins", aug.get("freq_mask_param", 15))),
        noise_injection=noise,
        noise_min_snr_db=float(aug.get("noise_min_snr_db", 10.0)),
        noise_max_snr_db=float(aug.get("noise_max_snr_db", 40.0)),
        speed_perturb=speed,
        speed_min=speed_min,
        speed_max=speed_max,
    )
