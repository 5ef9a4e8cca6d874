"""Self-supervised masked-spectrogram pretraining (Stage 1 of the
reference's training methodology).

The reference DESCRIBES this stage — span-masked mel prediction on
unlabeled audio, with exact masking hyperparameters quoted in a
"Pre-training Configuration" block (reference README.md:189-212) — and
its repo map even lists `configs/pretrain.yaml` and
`scripts/train_pretrain.py` (README.md:444-452), but **no pretraining
code exists anywhere in the reference** (SURVEY.md §6 "aspirational").
Implemented here for real, TPU-native:

  - **Temporal span masking**: each valid frame is a mask start with
    probability `span_probability`; every start dilates to `span_length`
    consecutive frames (README: 15% starts x 10 frames = 100 ms spans).
    NB with those numbers expected coverage is 1-(1-0.15)^10 ~ 80% of
    frames, not the "approximately 50%" the README estimates (its
    arithmetic matches p~0.065, the wav2vec 2.0 value); the sampler
    implements the described procedure and the config controls p.
  - **Frequency band masking** as an auxiliary input augmentation
    (README: probability `frequency_mask_prob` per utterance, one band
    of `frequency_band_width` = 5-10 mel bins, zeroed).
  - Masked frames are replaced by a **learned mask embedding** (a
    mel-space vector); the model regresses the true normalized mel at
    masked positions only (MSE), predicting both input frames of each
    stride-2 output step through a linear reconstruction head.
  - The backbone submodules carry the exact VelocityASR names
    (`temporal_binding` / `local_ssm` / `global_context`), so pretrained
    subtrees drop directly into an ASR init for Stage-2 fine-tuning
    (`init_asr_from_backbone`, wired into `scripts/train.py --init-from`).

Everything — mask sampling included — runs inside the jitted,
mesh-sharded train step; `PretrainTrainer` reuses the full Trainer
runtime (DP/TP sharding, accumulation, Orbax checkpoints, metrics).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp

from .models.attention import HierarchicalGlobalContext
from .models.config import VelocityASRConfig
from .models.layers import TemporalBindingLayer
from .models.ssm import LocalSSMProcessor
from .training import Trainer, TrainingConfig

#: Param subtrees shared between MaskedPredictor and VelocityASR.
BACKBONE_KEYS = ("temporal_binding", "local_ssm", "global_context")


@dataclass
class MaskedPredictionConfig:
    """Masking hyperparameters (defaults = the reference's quoted
    pretraining config, README.md:197-210)."""

    span_probability: float = 0.15
    span_length: int = 10  # frames (100 ms at the 10 ms hop)
    frequency_mask_prob: float = 0.3
    frequency_band_min: int = 5
    frequency_band_max: int = 10

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


def sample_time_mask(
    rng: jax.Array,
    batch: int,
    t_len: int,
    input_lengths: jnp.ndarray,
    config: MaskedPredictionConfig,
) -> jnp.ndarray:
    """(batch, T) bool mask: Bernoulli(span_probability) starts on valid
    frames, each dilated to span_length consecutive frames. Runs in-jit
    (static shapes; the dilation is a windowed-OR via cumsum)."""
    valid = jnp.arange(t_len)[None, :] < input_lengths[:, None]
    starts = jax.random.bernoulli(
        rng, config.span_probability, (batch, t_len)
    ) & valid
    # mask[t] = any start in (t - span, t]: difference of padded cumsums.
    c = jnp.cumsum(starts.astype(jnp.int32), axis=1)
    lagged = jnp.pad(c, ((0, 0), (config.span_length, 0)))[:, :t_len]
    mask = (c - lagged) > 0
    # Spans may dilate past input_lengths into padding; clip so the loss
    # denominator counts only real frames.
    return mask & valid


def sample_freq_mask(
    rng: jax.Array,
    batch: int,
    n_mels: int,
    config: MaskedPredictionConfig,
) -> jnp.ndarray:
    """(batch, n_mels) bool mask: with probability frequency_mask_prob per
    utterance, one band of width U[band_min, band_max] mel bins."""
    k_apply, k_width, k_start = jax.random.split(rng, 3)
    apply = jax.random.bernoulli(
        k_apply, config.frequency_mask_prob, (batch, 1)
    )
    widths = jax.random.randint(
        k_width, (batch, 1), config.frequency_band_min,
        config.frequency_band_max + 1,
    )
    widths = jnp.minimum(widths, n_mels)
    max_start = jnp.maximum(n_mels - widths + 1, 1)
    starts = jax.random.randint(k_start, (batch, 1), 0, 2**30) % max_start
    pos = jnp.arange(n_mels)[None, :]
    band = (pos >= starts) & (pos < starts + widths)
    return band & apply


class MaskedPredictor(nn.Module):
    """Backbone + reconstruction head for masked-spectrogram prediction.

    The backbone is byte-for-byte the VelocityASR encoder (same modules,
    same names — see models/model.py) so its params transfer verbatim;
    only the CTC head is replaced by a `recon_head` Dense predicting the
    two input mel frames behind each stride-2 output step.
    """

    config: VelocityASRConfig

    @nn.compact
    def __call__(
        self,
        mel_spectrogram: jnp.ndarray,
        time_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        cfg = self.config
        dtype = cfg.compute_dtype
        mel = mel_spectrogram
        # Created unconditionally so Trainer's maskless init builds the
        # same param tree the masked train step consumes.
        mask_embedding = self.param(
            "mask_embedding",
            nn.initializers.normal(stddev=0.02),
            (cfg.mel_bins,),
            jnp.float32,
        )
        if time_mask is not None:
            mel = jnp.where(
                time_mask[:, :, None], mask_embedding.astype(mel.dtype), mel
            )

        x = TemporalBindingLayer(
            mel_bins=cfg.mel_bins, d_model=cfg.d_model, dtype=dtype,
            qat=cfg.qat,
            qat_bits=(cfg.qat_weight_bits, cfg.qat_activation_bits),
            name="temporal_binding",
        )(mel, train)
        local_features = LocalSSMProcessor(
            d_model=cfg.d_model,
            num_layers=cfg.ssm_layers,
            state_dim=cfg.ssm_state_dim,
            expand_ratio=cfg.ssm_expand_ratio,
            kernel_size=cfg.ssm_kernel_size,
            dropout=cfg.dropout,
            use_checkpoint=cfg.gradient_checkpointing,
            scan_mode=cfg.scan_mode,
            dtype=dtype,
            name="local_ssm",
        )(x, train)
        fused_features = HierarchicalGlobalContext(
            d_model=cfg.d_model,
            num_heads=cfg.attention_heads,
            attention_dim=cfg.attention_dim,
            global_ssm_layers=cfg.global_ssm_layers,
            global_ssm_state_dim=cfg.global_ssm_state_dim,
            dropout=cfg.dropout,
            scan_mode=cfg.scan_mode,
            dtype=dtype,
            qat=cfg.qat,
            qat_bits=(cfg.qat_weight_bits, cfg.qat_activation_bits),
            int8=cfg.int8_inference,
            int8_static=cfg.int8_static,
            name="global_context",
        )(local_features, train)

        pred = nn.Dense(2 * cfg.mel_bins, dtype=dtype, name="recon_head")(
            fused_features
        )
        b, t2, _ = pred.shape
        # Output step t covers input frames (2t, 2t+1): unfold the pair
        # axis back onto time.
        return pred.reshape(b, t2 * 2, cfg.mel_bins).astype(jnp.float32)


def masked_prediction_loss(
    pred: jnp.ndarray,
    target_mel: jnp.ndarray,
    time_mask: jnp.ndarray,
    input_lengths: jnp.ndarray,
    n_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """MSE over masked, valid frames only (mean over mel bins per frame).

    n_valid masks batch-padding rows added by Trainer.shard_batch.
    """
    b, t, _ = target_mel.shape
    pred = pred[:, :t, :]
    valid = jnp.arange(t)[None, :] < input_lengths[:, None]
    w = (time_mask & valid).astype(jnp.float32)
    if n_valid is not None:
        w = w * (jnp.arange(b) < n_valid)[:, None].astype(jnp.float32)
    err = jnp.mean(
        (pred - target_mel.astype(jnp.float32)) ** 2, axis=-1
    )
    return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1.0)


class PretrainTrainer(Trainer):
    """Trainer whose objective is masked-spectrogram prediction.

    Reuses the full Trainer runtime (sharded jitted step, accumulation,
    checkpoints, metrics); only the loss differs. Batches need no
    targets — any labeled loader works, labels are ignored.
    """

    def __init__(
        self,
        model: MaskedPredictor,
        config: TrainingConfig,
        train_iter,
        eval_batches=None,
        mask_config: Optional[MaskedPredictionConfig] = None,
        **kwargs,
    ):
        self.mask_config = mask_config or MaskedPredictionConfig()
        if getattr(model.config, "qat", False):
            raise ValueError(
                "QAT applies to the supervised fine-tune (Stage 2), not "
                "pretraining; run scripts/train.py with quantization.enabled"
            )
        if config.streaming_chunks:
            raise ValueError(
                "the streaming-aware objective is a fine-tune feature; "
                "pretraining does not support training.streaming_chunks"
            )
        aug = config.augment
        if aug is not None and aug.enabled and (
            aug.num_time_masks or aug.num_freq_masks
        ):
            raise ValueError(
                "SpecAugment conflicts with the masked-prediction objective "
                "(its zero-masks corrupt the reconstruction target); use the "
                "masking: stanza instead. noise_injection alone is supported."
            )
        super().__init__(model, config, train_iter, eval_batches, **kwargs)

    def _loss_fn(self, params, quant_stats, batch, dropout_rng, train, n_valid):
        mel, _, input_lengths, dropout_rng = self._batch_mel(
            batch, dropout_rng, train
        )
        # Eval gets no dropout key; masks must still be sampled (fixed key
        # -> deterministic eval loss across runs).
        rng = dropout_rng if dropout_rng is not None else jax.random.PRNGKey(0)
        mask_rng, freq_rng, dropout_rng = jax.random.split(rng, 3)

        b, t, n_mels = mel.shape
        time_mask = sample_time_mask(
            mask_rng, b, t, input_lengths, self.mask_config
        )
        freq_mask = sample_freq_mask(freq_rng, b, n_mels, self.mask_config)
        inputs = jnp.where(freq_mask[:, None, :], 0.0, mel)

        rngs = {"dropout": dropout_rng} if train else {}
        pred = self.model.apply(
            {"params": params}, inputs, time_mask=time_mask, train=train,
            rngs=rngs,
        )
        loss = masked_prediction_loss(
            pred, mel, time_mask, input_lengths, n_valid
        )
        return loss, quant_stats


# ----- artifacts / Stage-2 handoff ------------------------------------------


def save_pretrain_artifact(
    save_path: str,
    config: VelocityASRConfig,
    mask_config: MaskedPredictionConfig,
    params: Dict[str, Any],
) -> None:
    """Persist {config, masking, params} in the save_pretrained layout,
    tagged `objective: masked_prediction` so consumers (train.py
    --init-from) can tell a backbone artifact from a full ASR one."""
    from .models.model import save_pretrained

    save_pretrained(
        save_path, config, params,
        extra={
            "objective": "masked_prediction",
            "masking": mask_config.to_dict(),
        },
    )


def is_pretrain_artifact(path: str) -> bool:
    config_file = os.path.join(path, "config.json")
    if not os.path.exists(config_file):
        return False
    with open(config_file) as f:
        return json.load(f).get("objective") == "masked_prediction"


def load_pretrain_artifact(
    path: str,
) -> Tuple[VelocityASRConfig, MaskedPredictionConfig, Dict[str, Any]]:
    """Load a pretraining artifact (config.json + params.msgpack)."""
    from .models.model import CONFIG_FILE, PARAMS_FILE

    with open(os.path.join(path, CONFIG_FILE)) as f:
        payload = json.load(f)
    if payload.get("objective") != "masked_prediction":
        raise ValueError(
            f"{path} is not a masked-prediction pretraining artifact"
        )
    config = VelocityASRConfig.from_dict(payload.get("config", {}))
    mask_config = MaskedPredictionConfig(**payload.get("masking", {}))
    model = MaskedPredictor(config=config)
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, config.mel_bins), jnp.float32),
        time_mask=jnp.zeros((1, 8), bool),
        train=False,
    )["params"]
    with open(os.path.join(path, PARAMS_FILE), "rb") as f:
        params = flax.serialization.from_bytes(template, f.read())
    return config, mask_config, params


def init_asr_from_backbone(
    model_cfg: VelocityASRConfig,
    pretrain_dir: str,
    rng: Optional[jax.Array] = None,
) -> Dict[str, Any]:
    """Stage-2 init: fresh VelocityASR params with the pretrained backbone
    subtrees (temporal_binding / local_ssm / global_context) dropped in;
    the CTC head (and nothing else) starts fresh.

    Works for QAT fine-tunes too: the only structural param difference a
    QAT model config introduces is the temporal-binding conv living under
    QuantConv1d's conv/{kernel,bias} names (see scripts/train.py).
    """
    from .models.model import create_model, init_params

    pcfg, _, pparams = load_pretrain_artifact(pretrain_dir)
    mismatched = [
        f for f in (
            "mel_bins", "d_model", "ssm_layers", "ssm_state_dim",
            "ssm_expand_ratio", "ssm_kernel_size", "global_ssm_layers",
            "global_ssm_state_dim", "attention_heads", "attention_dim",
        )
        if getattr(pcfg, f) != getattr(model_cfg, f)
    ]
    if mismatched:
        raise ValueError(
            "pretrained backbone dims do not match the model config: "
            + ", ".join(
                f"{f} {getattr(pcfg, f)} != {getattr(model_cfg, f)}"
                for f in mismatched
            )
        )
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    model = create_model(model_cfg)
    params = flax.core.unfreeze(init_params(model, rng, example_frames=64))
    pparams = flax.core.unfreeze(pparams)
    for key in BACKBONE_KEYS:
        params[key] = pparams[key]
    if model_cfg.qat:
        # fp32 backbone -> QAT graph: re-nest the temporal-binding conv
        # under QuantConv1d's names (inverse of train.py's final export).
        tb = dict(params["temporal_binding"])
        if "conv_kernel" in tb:
            tb["conv"] = {"kernel": tb.pop("conv_kernel"),
                          "bias": tb.pop("conv_bias")}
            params["temporal_binding"] = tb
    return params
