"""Model configuration (reference model.py:23-68)."""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict

import jax.numpy as jnp


@dataclass
class VelocityASRConfig:
    """Configuration for the VELOCITY-ASR model.

    Field names and defaults mirror the reference VelocityASRConfig
    (model.py:23-68); TPU-specific fields are grouped at the bottom.
    """

    # Input dimensions
    mel_bins: int = 80

    # Model dimensions
    d_model: int = 192

    # SSM configuration
    ssm_layers: int = 8
    ssm_state_dim: int = 64
    ssm_expand_ratio: int = 2
    ssm_kernel_size: int = 4

    # Global context configuration
    global_ssm_layers: int = 2
    global_ssm_state_dim: int = 32
    attention_heads: int = 4
    attention_dim: int = 48

    # Output configuration (1000 = character-level default, reference model.py:48)
    vocab_size: int = 1000

    # Regularization
    dropout: float = 0.1

    # Memory optimization: jax.checkpoint (remat) each SSM block
    # (reference uses torch.utils.checkpoint, ssm.py:439-441).
    gradient_checkpointing: bool = False

    # Scan implementation ladder (reference ssm.py:29 maps
    # sequential/parallel/mamba -> lax.scan / lax.associative_scan / Pallas).
    # "sp" additionally shards the scan's TIME axis over a device mesh
    # (sequence parallelism; wrap calls in parallel.sequence_parallel(mesh)).
    scan_mode: str = "parallel"

    # Kept for checkpoint/API parity with the reference (model.py:62-63);
    # jit is inherent in this implementation.
    use_compile: bool = False

    # --- TPU-native additions -------------------------------------------
    # Compute dtype ("bfloat16" or "float32"); params are always fp32, and
    # the SSM recurrence always runs fp32 (the quantize module's
    # ssm_state_fp32 rule, reference quantize.py:29-31, generalized).
    dtype: str = "float32"
    # Quantization-aware training: route eligible projections through
    # fake-quant (reference prepare_model_for_qat, quantize.py:269-322).
    # Bit-widths come from QuantizationConfig via prepare_model_for_qat.
    qat: bool = False
    qat_weight_bits: int = 8
    qat_activation_bits: int = 8
    # On-device INT8 inference: eligible projections run int8 MXU matmuls
    # with dynamic activation quantization (the ORT quantize_dynamic
    # analog; SSM stack stays fp32 per the ssm_state_fp32 rule).
    int8_inference: bool = False
    # Static (calibrated) activation scales on the int8 path — the ORT
    # quantize_static analog (reference quantize.py:449-472). Requires a
    # calibrated quant_stats collection (quantize.calibrate_int8_model);
    # uncalibrated stats fall back to dynamic scales.
    int8_static: bool = False
    # Streaming global-context memory: each chunk contributes
    # stream_summary_tokens pooled tokens to a rolling memory of
    # stream_memory_chunks chunks, so streaming cross-attention covers
    # ~chunk_seconds * stream_memory_chunks of recent audio. The GlobalSSM
    # runs incrementally over the summary-token stream with carried state,
    # so its receptive field is the entire session, not just the window.
    #
    # 64 summary tokens matches the offline level-1 pooling density
    # (K1 = max(64, L//8), attention.py pool rules): held-out streaming WER
    # on the trained flagship is 10.5% at 4 tokens vs 6.3% at 64 (offline
    # 3.7%); 32 -> 6.5%, 128 -> 7.0% (BENCH_DETAILS_r02.md). The per-chunk
    # summary granularity — not memory span or causal normalization — was
    # the round-1 streaming accuracy gap.
    stream_summary_tokens: int = 64
    stream_memory_chunks: int = 16
    # Multi-lingual support (the reference's first "Planned Extension",
    # README.md:480 — "Extended pre-training on multi-lingual datasets
    # with language identification"; no code exists there). When > 0 the
    # model grows an utterance-level language-identification head (a
    # masked mean-pool over the fused features into a num_languages-way
    # classifier); the Trainer adds a CE term when batches carry a
    # "language" label (training.lid_loss_weight) and transcribe/serve
    # expose the prediction (--identify-language). 0 = no LID head
    # (checkpoint-compatible with every earlier artifact).
    num_languages: int = 0
    # Mixture-of-experts FFN in the local SSM blocks (models/moe.py; a
    # net-new capacity-scaling extension — the reference block is always
    # dense). >0 replaces each block's dense FFN with moe_experts expert
    # FFNs behind a top-k router, GShard-style capacity dispatch (all
    # dense einsums, MXU-friendly), Switch load-balance aux loss
    # (training.moe_aux_weight), and expert parallelism: expert weights
    # stack on a leading E axis and shard over the mesh's model axis
    # (distributed.num_model_shards). 0 = dense FFN (checkpoint-compatible
    # with every earlier artifact).
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def d_inner(self) -> int:
        return self.d_model * self.ssm_expand_ratio

    @classmethod
    def from_preset(cls, name: str, **overrides) -> "VelocityASRConfig":
        """Named model-family presets.

        - "tiny":        ~1.1M params, 4 SSM layers, d_model 128 — edge/smoke
        - "base":        the reference default (6.2M params, vocab 1000)
        - "large-vocab": base encoder with the 50k subword vocabulary the
          reference documents as the production variant (model.py:46-48 —
          the CTC head alone adds ~9.6M params)
        - "moe": base encoder with an 8-expert top-2 MoE FFN in every
          local SSM block (~8.1M extra expert params, 14.3M total;
          experts shard over the mesh's model axis via
          distributed.num_model_shards)
        """
        presets: Dict[str, Dict[str, Any]] = {
            "tiny": dict(d_model=128, ssm_layers=4, ssm_state_dim=32,
                         global_ssm_layers=1, global_ssm_state_dim=16,
                         attention_dim=32, vocab_size=1000),
            "base": {},
            "large-vocab": dict(vocab_size=50000),
            "moe": dict(moe_experts=8),
        }
        if name not in presets:
            raise ValueError(f"unknown preset {name!r}; options: {sorted(presets)}")
        kwargs = dict(presets[name])
        kwargs.update(overrides)
        return cls(**kwargs)

    @classmethod
    def from_dict(cls, config_dict: Dict[str, Any]) -> "VelocityASRConfig":
        """Create config from a dict, ignoring unknown keys (model.py:65-68).

        The reference's "mamba" scan mode maps to "pallas" here.
        """
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in config_dict.items() if k in fields}
        if kwargs.get("scan_mode") == "mamba":
            kwargs["scan_mode"] = "pallas"
        return cls(**kwargs)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)
