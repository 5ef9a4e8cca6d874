"""Hierarchical global context (reference attention.py).

AdaptivePool / MultiHeadAttention / GatedFusion / HierarchicalGlobalContext
rebuilt for static shapes: pool sizes are Python constants computed from
the (static, bucketed) sequence length at trace time, and adaptive pooling
is a precomputed averaging matmul (ops.pooling).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.pooling import adaptive_avg_pool1d, pool_size_level1, pool_size_level2
from .layers import quant_dense as _dense, quant_mode as _quant_mode, xavier_uniform
from .ssm import GlobalSSM


class AdaptivePool(nn.Module):
    """Adaptive pooling + learnable projection (reference attention.py:17-78).

    Level 1: K1 = max(64, L // 8); Level 2: K2 = min(64, max(16, K1 // 4));
    both clamped to the input length (attention.py:37-44, 67).
    """

    level: int = 1
    d_model: int = 192
    dtype: Any = jnp.float32
    qat: bool = False
    qat_bits: tuple = (8, 8)
    int8: bool = False
    int8_static: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        prev_pool_size: Optional[int] = None,
        train: bool = False,
        pre_pooled: bool = False,
    ):
        seq_len = x.shape[1]
        if pre_pooled:
            # Streaming path: x is already a pooled-token summary (the
            # sliding context memory); only the learned projection applies.
            pool_size = seq_len
            pooled = x
        else:
            if self.level == 1:
                pool_size = pool_size_level1(seq_len)
            else:
                k1 = (prev_pool_size if prev_pool_size is not None
                      else pool_size_level1(seq_len))
                pool_size = min(pool_size_level2(k1), seq_len)
            pooled = adaptive_avg_pool1d(x, pool_size)
        mode = _quant_mode(self.qat, self.int8)
        proj = _dense(mode, self.d_model, self.dtype, "pool_proj", static=self.int8_static, qat_bits=self.qat_bits)
        pooled = proj(pooled, train=train) if mode != "none" else proj(pooled)
        return pooled, pool_size


class MultiHeadAttention(nn.Module):
    """Cross-attention with reduced attention dim (reference attention.py:81-164).

    q/k/v/out projections to attention_dim (4 heads x 12 by default);
    softmax(q k^T / sqrt(head_dim)); queries are the full sequence, keys and
    values the <=64 pooled tokens — sub-quadratic in L.
    """

    d_model: int = 192
    num_heads: int = 4
    attention_dim: int = 48
    dropout: float = 0.1
    dtype: Any = jnp.float32
    qat: bool = False
    qat_bits: tuple = (8, 8)
    int8: bool = False
    int8_static: bool = False

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        batch, q_len, _ = query.shape
        kv_len = key.shape[1]
        assert self.attention_dim % self.num_heads == 0, (
            f"attention_dim {self.attention_dim} not divisible by "
            f"num_heads {self.num_heads}"
        )
        head_dim = self.attention_dim // self.num_heads

        mode = _quant_mode(self.qat, self.int8)

        def proj(name):
            return _dense(mode, self.attention_dim, self.dtype, name, static=self.int8_static, qat_bits=self.qat_bits)

        def run(layer, x):
            return layer(x, train=train) if mode != "none" else layer(x)

        q = run(proj("q_proj"), query)
        k = run(proj("k_proj"), key)
        v = run(proj("v_proj"), value)

        q = q.reshape(batch, q_len, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(batch, kv_len, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(batch, kv_len, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(head_dim)
        if mask is not None:
            scores = jnp.where(mask == 0, jnp.finfo(scores.dtype).min, scores)
        attn = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)

        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(batch, q_len, self.attention_dim)
        out_proj = _dense(mode, self.d_model, self.dtype, "out_proj", static=self.int8_static, qat_bits=self.qat_bits)
        return run(out_proj, out)


class GatedFusion(nn.Module):
    """Gated local/global fusion (reference attention.py:167-220)."""

    d_model: int = 192
    dtype: Any = jnp.float32
    qat: bool = False
    qat_bits: tuple = (8, 8)
    int8: bool = False
    int8_static: bool = False

    @nn.compact
    def __call__(
        self, local_features: jnp.ndarray, global_features: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        mode = _quant_mode(self.qat, self.int8)

        def run(layer, x):
            return layer(x, train=train) if mode != "none" else layer(x)

        concat = jnp.concatenate([local_features, global_features], axis=-1)
        gate = nn.sigmoid(run(_dense(mode, self.d_model, self.dtype, "gate_proj", static=self.int8_static, qat_bits=self.qat_bits), concat))
        local_t = run(_dense(mode, self.d_model, self.dtype, "local_proj", static=self.int8_static, qat_bits=self.qat_bits), local_features)
        global_t = run(_dense(mode, self.d_model, self.dtype, "global_proj", static=self.int8_static, qat_bits=self.qat_bits), global_features)
        fused = gate * local_t + (1 - gate) * global_t
        return run(_dense(mode, self.d_model, self.dtype, "out_proj", static=self.int8_static, qat_bits=self.qat_bits), fused)


class HierarchicalGlobalContext(nn.Module):
    """Pool -> GlobalSSM -> pool -> cross-attn -> gated fusion
    (reference attention.py:223-319)."""

    d_model: int = 192
    num_heads: int = 4
    attention_dim: int = 48
    global_ssm_layers: int = 2
    global_ssm_state_dim: int = 32
    dropout: float = 0.1
    scan_mode: str = "parallel"
    dtype: Any = jnp.float32
    qat: bool = False
    qat_bits: tuple = (8, 8)
    int8: bool = False
    int8_static: bool = False

    @nn.compact
    def __call__(
        self,
        local_features: jnp.ndarray,
        train: bool = False,
        summary: Optional[jnp.ndarray] = None,
        gc_state: Optional[dict] = None,
        frozen: bool = False,
    ):
        """Full-sequence global context, or one streaming step.

        Streaming (summary is not None): `summary` holds this chunk's
        pooled summary tokens (batch, S, d_model). They pass through the
        level-1 projection and the GlobalSSM *incrementally* — the SSM
        blocks carry (conv tail, recurrence) state in gc_state["blocks"],
        so the global SSM sees the whole session's summary stream. The SSM
        outputs roll into gc_state["mem"] (batch, M, d_model), and level-2
        pooling + cross-attention run over that rolling memory. Returns
        (fused, new_gc_state). On the first chunk (gc_state["init"] false)
        the memory warm-starts by tiling the chunk's own tokens so every
        slot holds valid statistics.

        frozen (streaming only): a pure EMIT pass — attend over
        gc_state["mem"] exactly as given, without pooling this chunk's
        summary in or advancing the GlobalSSM. Used by the lookahead
        re-decode path (streaming.py): the memory passed in was produced by
        normal (advancing) steps and may already include FUTURE chunks'
        summaries. Must only be called after at least one advancing step
        (so the memory is warm). Returns (fused, gc_state) unchanged.
        """
        streaming = summary is not None
        if streaming and gc_state is None:
            # Half-guarding None (the SSM-states branch below tolerates it
            # but the mem/init reads don't) would crash with an opaque
            # TypeError; the streaming contract requires a state from
            # streaming.init_stream_state.
            raise ValueError(
                "streaming HierarchicalGlobalContext requires gc_state "
                "(build one with streaming.init_stream_state)"
            )
        pool1 = AdaptivePool(
            level=1, d_model=self.d_model, dtype=self.dtype, qat=self.qat, qat_bits=self.qat_bits,
            int8=self.int8, int8_static=self.int8_static, name="pool1"
        )
        global_ssm = GlobalSSM(
            d_model=self.d_model,
            num_layers=self.global_ssm_layers,
            state_dim=self.global_ssm_state_dim,
            dropout=self.dropout,
            scan_mode=self.scan_mode,
            dtype=self.dtype,
            name="global_ssm",
        )

        if streaming and frozen:
            x_ssm = gc_state["mem"].astype(self.dtype)
            pool_size1 = x_ssm.shape[1]
            new_gc_state = gc_state
        elif streaming:
            x_new, _ = pool1(summary.astype(self.dtype), train=train, pre_pooled=True)
            ssm_new, new_blocks = global_ssm(
                x_new, train,
                states=None if gc_state is None else gc_state["blocks"],
                return_state=True,
            )
            mem_tokens = gc_state["mem"].shape[1]
            s = ssm_new.shape[1]
            tiled = jnp.tile(ssm_new, (1, mem_tokens // s, 1))
            rolled = jnp.concatenate([gc_state["mem"][:, s:], ssm_new], axis=1)
            # init is per-row ((B,) bool): micro-batched sessions join the
            # batch at different lifetimes (streaming.StreamSessionBatcher)
            init = gc_state["init"][:, None, None]
            x_ssm = jnp.where(init, rolled, tiled).astype(self.dtype)
            pool_size1 = mem_tokens
            new_gc_state = {
                "mem": x_ssm.astype(jnp.float32),
                "blocks": new_blocks,
                "init": jnp.ones_like(gc_state["init"]),
            }
        else:
            x_pool1, pool_size1 = pool1(local_features, train=train)
            x_ssm = global_ssm(x_pool1, train)

        x_pool2, _ = AdaptivePool(
            level=2, d_model=self.d_model, dtype=self.dtype, qat=self.qat, qat_bits=self.qat_bits,
            int8=self.int8, int8_static=self.int8_static, name="pool2"
        )(x_ssm, prev_pool_size=pool_size1, train=train)

        x_pool2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x_pool2).astype(self.dtype)
        query = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(local_features).astype(self.dtype)

        global_context = MultiHeadAttention(
            d_model=self.d_model,
            num_heads=self.num_heads,
            attention_dim=self.attention_dim,
            dropout=self.dropout,
            dtype=self.dtype,
            qat=self.qat, qat_bits=self.qat_bits,
            int8=self.int8, int8_static=self.int8_static,
            name="cross_attention",
        )(query, x_pool2, x_pool2, train=train)

        fused = GatedFusion(
            d_model=self.d_model, dtype=self.dtype, qat=self.qat,
            qat_bits=self.qat_bits, int8=self.int8,
            int8_static=self.int8_static, name="fusion"
        )(local_features, global_context, train=train)
        if streaming:
            return fused, new_gc_state
        return fused
