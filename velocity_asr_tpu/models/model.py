"""VELOCITY-ASR model assembly (reference model.py:242-471).

Functional JAX design: `VelocityASR` is a flax module; `init_params` /
`forward` give the pure init/apply surface; `from_pretrained` /
`save_pretrained` persist {config, params} (the reference's checkpoint
contract, model.py:446-465) as config.json + params.msgpack.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .attention import HierarchicalGlobalContext
from .config import VelocityASRConfig
from .layers import CTCOutputHead, TemporalBindingLayer
from .ssm import LocalSSMProcessor

PARAMS_FILE = "params.msgpack"
CONFIG_FILE = "config.json"

# Back-compat aliases for the config-lifted streaming-memory knobs;
# MUST track VelocityASRConfig's defaults (stream_summary_tokens /
# stream_memory_chunks) or external state-sizing code mis-sizes buffers.
STREAM_SUMMARY_TOKENS = 64
STREAM_MEMORY_CHUNKS = 16


class VelocityASR(nn.Module):
    """TemporalBinding -> LocalSSM -> HierarchicalGlobalContext -> CTCHead
    (reference model.py:333-368)."""

    config: VelocityASRConfig

    @nn.compact
    def __call__(
        self,
        mel_spectrogram: jnp.ndarray,
        train: bool = False,
        return_features: bool = False,
        stream_state: Optional[Dict[str, Any]] = None,
        time_offset: int = 0,
        return_state: bool = False,
        frozen_mem: bool = False,
        feature_lengths: Optional[jnp.ndarray] = None,
    ):
        """Full forward, or one streaming chunk step.

        Streaming (return_state=True): mel_spectrogram is one even-length
        chunk; stream_state carries the temporal-binding conv frame and each
        SSM block's (conv tail, recurrence state), making the conv+SSM path
        exact across chunks. The hierarchical global context is recomputed
        per chunk (an approximation — the full-sequence path pools over the
        whole utterance). time_offset is the absolute output-frame offset
        for the positional encoding.

        frozen_mem (streaming only): EMIT pass for the lookahead re-decode —
        the global context attends over stream_state["gc_mem"] exactly as
        given (which may already contain future chunks' summaries), and the
        gc_* leaves of the returned state echo the inputs. NB the LOCAL
        state (mel_carry, per-block conv/SSM) still advances through the
        chunk: callers re-decoding an old chunk must discard the returned
        state (streaming.py _emit does). Requires a warm stream_state from
        at least one advancing step. See streaming.py lookahead_chunks.

        feature_lengths (optional, offline only): per-utterance valid
        OUTPUT-frame counts ((input_lengths + 1) // 2) used to mask
        padding out of the language-ID head's mean pool. Without it the
        pool covers all frames (consistent with the rest of the model,
        which ignores padding for reference parity).
        """
        cfg = self.config
        dtype = cfg.compute_dtype
        streaming = return_state or stream_state is not None
        if frozen_mem and stream_state is None:
            # A cold emit pass would silently attend an all-zeros memory
            # (attention.py requires a warm memory from an advancing step).
            raise ValueError(
                "frozen_mem requires a stream_state produced by at least "
                "one advancing streaming step"
            )

        binding = TemporalBindingLayer(
            mel_bins=cfg.mel_bins, d_model=cfg.d_model, dtype=dtype, qat=cfg.qat,
            qat_bits=(cfg.qat_weight_bits, cfg.qat_activation_bits),
            name="temporal_binding",
        )
        if streaming:
            x, mel_carry = binding(
                mel_spectrogram, train,
                carry=None if stream_state is None else stream_state["mel_carry"],
                time_offset=time_offset,
                return_carry=True,
            )
        else:
            x = binding(mel_spectrogram, train)

        local = LocalSSMProcessor(
            d_model=cfg.d_model,
            num_layers=cfg.ssm_layers,
            state_dim=cfg.ssm_state_dim,
            expand_ratio=cfg.ssm_expand_ratio,
            kernel_size=cfg.ssm_kernel_size,
            dropout=cfg.dropout,
            use_checkpoint=cfg.gradient_checkpointing,
            scan_mode=cfg.scan_mode,
            dtype=dtype,
            moe_experts=cfg.moe_experts,
            moe_top_k=cfg.moe_top_k,
            moe_capacity_factor=cfg.moe_capacity_factor,
            name="local_ssm",
        )
        if streaming:
            local_features, block_states = local(
                x, train,
                states=None if stream_state is None else stream_state["blocks"],
                return_state=True,
            )

            # Streaming global context: pool this chunk's local features
            # into a few summary tokens; the global-context module runs its
            # SSM incrementally over the summary stream (carried state) and
            # attends over a rolling memory of SSM outputs — see
            # HierarchicalGlobalContext for the contract.
            from ..ops.pooling import adaptive_avg_pool1d

            summary = adaptive_avg_pool1d(
                local_features.astype(jnp.float32), cfg.stream_summary_tokens
            )
            mem_tokens = cfg.stream_summary_tokens * cfg.stream_memory_chunks
            if stream_state is None:
                gc_state = {
                    "mem": jnp.zeros(
                        (mel_spectrogram.shape[0], mem_tokens, cfg.d_model),
                        jnp.float32,
                    ),
                    "blocks": None,
                    "init": jnp.zeros((mel_spectrogram.shape[0],), jnp.bool_),
                }
            else:
                gc_state = {
                    "mem": stream_state["gc_mem"],
                    "blocks": stream_state["gc_blocks"],
                    "init": stream_state["gc_init"],
                }
        else:
            local_features = local(x, train)

        global_context = HierarchicalGlobalContext(
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
        )
        if streaming:
            fused_features, new_gc_state = global_context(
                local_features, train, summary=summary, gc_state=gc_state,
                frozen=frozen_mem,
            )
        else:
            fused_features = global_context(local_features, train)

        logits = CTCOutputHead(
            d_model=cfg.d_model,
            vocab_size=cfg.vocab_size,
            dropout=cfg.dropout,
            dtype=dtype,
            qat=cfg.qat,
            qat_bits=(cfg.qat_weight_bits, cfg.qat_activation_bits),
            int8=cfg.int8_inference,
            int8_static=cfg.int8_static,
            name="ctc_head",
        )(fused_features, train)
        logits = logits.astype(jnp.float32)

        lid_logits = None
        if cfg.num_languages > 0 and not streaming:
            # Language identification (reference README.md:480, planned
            # extension): utterance-level classifier over a (optionally
            # length-masked) mean pool of the fused features. fp32
            # throughout — it is a tiny head and feeds a CE loss.
            feats32 = fused_features.astype(jnp.float32)
            if feature_lengths is not None:
                mask = (
                    jnp.arange(feats32.shape[1])[None, :]
                    < feature_lengths[:, None]
                )
                denom = jnp.maximum(
                    jnp.sum(mask, axis=1, keepdims=True), 1
                ).astype(jnp.float32)
                pooled = jnp.sum(feats32 * mask[..., None], axis=1) / denom
            else:
                pooled = jnp.mean(feats32, axis=1)
            pooled = nn.LayerNorm(dtype=jnp.float32, name="lid_norm")(pooled)
            lid_logits = nn.Dense(
                cfg.num_languages, dtype=jnp.float32, name="lid_head"
            )(pooled)

        if return_state:
            return logits, {
                "mel_carry": mel_carry,
                "blocks": block_states,
                "gc_mem": new_gc_state["mem"],
                "gc_blocks": new_gc_state["blocks"],
                "gc_init": new_gc_state["init"],
            }
        if return_features:
            feats = {
                "temporal_binding": x,
                "local_features": local_features,
                "fused_features": fused_features,
            }
            if lid_logits is not None:
                feats["lid_logits"] = lid_logits
            return logits, feats
        return logits

    def get_output_length(self, input_length: int) -> int:
        """Stride-2 temporal binding halves frames (reference model.py:370-383)."""
        return (input_length + 1) // 2


def create_model(config: Optional[VelocityASRConfig] = None) -> VelocityASR:
    return VelocityASR(config=config or VelocityASRConfig())


def init_params(
    model: VelocityASR,
    rng: jax.Array,
    example_frames: int = 500,
    batch_size: int = 1,
) -> Dict[str, Any]:
    """Initialize parameter pytree (weight-init parity: model.py:305-318)."""
    mel = jnp.zeros((batch_size, example_frames, model.config.mel_bins), jnp.float32)
    variables = model.init({"params": rng}, mel, train=False)
    return variables["params"]


def forward(
    model: VelocityASR,
    params: Dict[str, Any],
    mel: jnp.ndarray,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    return_features: bool = False,
    quant_stats: Optional[Dict[str, Any]] = None,
    feature_lengths: Optional[jnp.ndarray] = None,
):
    """Pure apply wrapper."""
    variables = {"params": params}
    if quant_stats is not None:
        variables["quant_stats"] = quant_stats
    rngs = {"dropout": dropout_rng} if dropout_rng is not None else {}
    return model.apply(
        variables, mel, train=train, return_features=return_features, rngs=rngs,
        feature_lengths=feature_lengths,
    )


def count_parameters(params: Dict[str, Any]) -> int:
    """Total trainable parameter count (reference model.py:469-471)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def get_output_length(input_length: int) -> int:
    return (input_length + 1) // 2


def save_pretrained(
    save_path: str,
    config: VelocityASRConfig,
    params: Dict[str, Any],
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """Persist {config, params} (reference save_pretrained, model.py:435-467).

    `save_path` is a directory containing config.json + params.msgpack.
    """
    os.makedirs(save_path, exist_ok=True)
    payload = {"config": config.to_dict()}
    if extra:
        payload.update(extra)
    with open(os.path.join(save_path, CONFIG_FILE), "w") as f:
        json.dump(payload, f, indent=2)
    params = jax.device_get(params)
    with open(os.path.join(save_path, PARAMS_FILE), "wb") as f:
        f.write(flax.serialization.to_bytes(params))


def from_pretrained(
    model_name_or_path: str,
    **overrides,
) -> Tuple[VelocityASR, Dict[str, Any]]:
    """Load a pretrained model (reference from_pretrained, model.py:385-433).

    Only local paths are supported (hub download is NotImplemented in the
    reference too, model.py:409-413).
    """
    if not os.path.exists(model_name_or_path):
        raise NotImplementedError(
            "Model hub download not implemented; provide a local checkpoint "
            "directory (config.json + params.msgpack)."
        )
    with open(os.path.join(model_name_or_path, CONFIG_FILE)) as f:
        payload = json.load(f)
    cfg_dict = dict(payload.get("config", {}))
    cfg_dict.update(overrides)
    config = VelocityASRConfig.from_dict(cfg_dict)
    model = create_model(config)

    template = init_params(model, jax.random.PRNGKey(0), example_frames=8)
    with open(os.path.join(model_name_or_path, PARAMS_FILE), "rb") as f:
        params = flax.serialization.from_bytes(template, f.read())
    return model, params
