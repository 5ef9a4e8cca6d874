"""Selective-SSM model components (reference ssm.py).

Flax reimplementation of SelectiveSSM / SSMBlock / LocalSSMProcessor /
GlobalSSM with the scan itself delegated to ops.scan (lax.scan /
lax.associative_scan / Pallas kernel).

The SSM recurrence always runs in float32 regardless of the compute dtype
— the same stability rule the reference enforces for quantization
(quantize.py:29-31 ssm_state_fp32) and that bf16 TPU training needs.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.conv import causal_depthwise_conv1d
from ..ops.scan import selective_scan
from .layers import kaiming_conv_init, xavier_uniform


class SelectiveSSM(nn.Module):
    """Mamba-style selective SSM (reference ssm.py:32-132).

    in_proj -> (x, z); input-dependent B, C via x_proj; dt = softplus(dt_proj);
    A = -exp(A_log) with A_log = log(arange(1..N)) (ssm.py:83-84);
    scan; gate y * silu(z); out_proj.
    """

    d_model: int = 192
    state_dim: int = 64
    expand_ratio: int = 2
    scan_mode: str = "parallel"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        ssm_state: jnp.ndarray = None,
        return_state: bool = False,
    ):
        d_inner = self.d_model * self.expand_ratio

        xz = nn.Dense(
            d_inner * 2, use_bias=False, kernel_init=xavier_uniform(),
            dtype=self.dtype, name="in_proj",
        )(x)
        x_in, z = jnp.split(xz, 2, axis=-1)

        bc = nn.Dense(
            self.state_dim * 2, use_bias=False, kernel_init=xavier_uniform(),
            dtype=self.dtype, name="x_proj",
        )(x_in)
        B, C = jnp.split(bc, 2, axis=-1)

        dt = jax.nn.softplus(
            nn.Dense(
                d_inner, use_bias=True, kernel_init=xavier_uniform(),
                dtype=self.dtype, name="dt_proj",
            )(x_in)
        )

        A_log = self.param(
            "A_log",
            lambda key: jnp.log(jnp.arange(1, self.state_dim + 1, dtype=jnp.float32)),
        )
        A = -jnp.exp(A_log)
        D = self.param("D", nn.initializers.ones, (d_inner,), jnp.float32)

        # Recurrence in fp32 (see module docstring).
        # Param-shape init never needs the mesh: during flax init, "sp"
        # (sequence-parallel) falls back to the single-device tier so
        # from_pretrained/init_params work outside a sequence_parallel
        # context.
        mode = self.scan_mode
        if mode == "sp" and self.is_initializing():
            mode = "parallel"
        scan_out = selective_scan(
            x_in.astype(jnp.float32),
            dt.astype(jnp.float32),
            A,
            B.astype(jnp.float32),
            C.astype(jnp.float32),
            D,
            mode=mode,
            h0=ssm_state,
            return_state=return_state,
        )
        if return_state:
            y, h_final = scan_out
        else:
            y = scan_out

        y = y.astype(self.dtype) * nn.silu(z)
        out = nn.Dense(
            self.d_model, use_bias=False, kernel_init=xavier_uniform(),
            dtype=self.dtype, name="out_proj",
        )(y)
        if return_state:
            return out, h_final
        return out


class SSMBlock(nn.Module):
    """Pre-norm SSM block (reference ssm.py:340-441).

    norm1 -> causal depthwise conv (k=4) -> SelectiveSSM -> dropout ->
    +residual; norm2 -> FFN (d -> 2d GELU -> d, dropouts) -> +residual.
    """

    d_model: int = 192
    state_dim: int = 64
    expand_ratio: int = 2
    kernel_size: int = 4
    dropout: float = 0.1
    scan_mode: str = "parallel"
    dtype: Any = jnp.float32
    # Mixture-of-experts FFN (models/moe.py): >0 replaces the dense FFN
    # with moe_experts expert FFNs behind a top-k router. Net-new scaling
    # extension — the reference block is always dense (ssm.py:340-441).
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        state: dict = None,
        return_state: bool = False,
    ):
        residual = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)

        conv_kernel = self.param(
            "conv_kernel", kaiming_conv_init(), (self.kernel_size, 1, self.d_model)
        )
        conv_bias = self.param("conv_bias", nn.initializers.zeros, (self.d_model,))
        if return_state and state is None:
            state = self.init_stream_state(x.shape[0])
        if state is not None:
            # Streaming: splice the carried (k-1) normed frames in front so
            # the causal conv is exact across chunk boundaries.
            h_ext = jnp.concatenate([state["conv"].astype(h.dtype), h], axis=1)
            # NB: -(k-1) == -0 selects everything at kernel_size == 1; the
            # explicit start index keeps the carried tail empty there.
            new_conv_tail = h_ext[:, h_ext.shape[1] - (self.kernel_size - 1):]
            h = causal_depthwise_conv1d(h_ext, conv_kernel[:, 0, :], conv_bias)[
                :, self.kernel_size - 1 :
            ]
        else:
            h = causal_depthwise_conv1d(h, conv_kernel[:, 0, :], conv_bias)

        ssm = SelectiveSSM(
            d_model=self.d_model,
            state_dim=self.state_dim,
            expand_ratio=self.expand_ratio,
            scan_mode=self.scan_mode,
            dtype=self.dtype,
            name="ssm",
        )
        if return_state:
            h, ssm_final = ssm(
                h, ssm_state=None if state is None else state["ssm"], return_state=True
            )
        else:
            h = ssm(h, ssm_state=None if state is None else state["ssm"])
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = h + residual

        residual = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        if self.moe_experts > 0:
            from .moe import MoEFFN

            h = MoEFFN(
                d_model=self.d_model,
                hidden=self.d_model * self.expand_ratio,
                num_experts=self.moe_experts,
                top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                dropout=self.dropout,
                dtype=self.dtype,
                name="moe",
            )(h, train)
        else:
            h = nn.Dense(
                self.d_model * self.expand_ratio, kernel_init=xavier_uniform(),
                dtype=self.dtype, name="ffn_in",
            )(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = nn.Dense(
                self.d_model, kernel_init=xavier_uniform(), dtype=self.dtype, name="ffn_out"
            )(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        out = h + residual
        if return_state:
            # Carry in fp32 regardless of compute dtype: init_stream_state
            # and the "ssm" leaf are fp32, and a dtype-varying carry would
            # break lax.scan loops (or force every driver to re-cast).
            return out, {
                "conv": new_conv_tail.astype(jnp.float32),
                "ssm": ssm_final,
            }
        return out

    def init_stream_state(self, batch: int) -> dict:
        """Zero streaming state: (k-1) conv-tail frames + SSM state."""
        return {
            "conv": jnp.zeros((batch, self.kernel_size - 1, self.d_model), jnp.float32),
            "ssm": jnp.zeros(
                (batch, self.d_model * self.expand_ratio, self.state_dim), jnp.float32
            ),
        }


class LocalSSMProcessor(nn.Module):
    """Stack of SSM blocks + final LayerNorm (reference ssm.py:444-505)."""

    d_model: int = 192
    num_layers: int = 8
    state_dim: int = 64
    expand_ratio: int = 2
    kernel_size: int = 4
    dropout: float = 0.1
    use_checkpoint: bool = False
    scan_mode: str = "parallel"
    dtype: Any = jnp.float32
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        states: list = None,
        return_state: bool = False,
    ):
        # Pipeline-parallel path: under an ambient pipeline_parallel
        # context (parallel/pp.py), the homogeneous block stack runs as an
        # S-stage microbatch pipeline over the mesh instead of the Python
        # layer loop. Offline only — streaming/stateful calls (tiny chunks,
        # carried state) keep the sequential loop. Numerically exact vs the
        # loop (tests/test_pp.py); under train, dropout draws from a
        # differently-folded (still independent per layer x microbatch)
        # stream.
        if states is None and not return_state and not self.is_initializing():
            from ..parallel.pp import current_pipeline_parallel

            pp_ctx = current_pipeline_parallel()
            if pp_ctx is not None:
                return self._pipelined(x, train, pp_ctx)

        block_cls = SSMBlock
        if self.use_checkpoint and not return_state:
            # jax.checkpoint per block (reference's torch checkpoint,
            # ssm.py:439-441).
            block_cls = nn.remat(SSMBlock, static_argnums=(2,))
        new_states = []
        for i in range(self.num_layers):
            block = block_cls(
                d_model=self.d_model,
                state_dim=self.state_dim,
                expand_ratio=self.expand_ratio,
                kernel_size=self.kernel_size,
                dropout=self.dropout,
                scan_mode=self.scan_mode,
                dtype=self.dtype,
                moe_experts=self.moe_experts,
                moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
                name=f"layers_{i}",
            )
            if return_state:
                x, st = block(
                    x, train, state=None if states is None else states[i],
                    return_state=True,
                )
                new_states.append(st)
            else:
                # A passed state must still be spliced in even when the
                # caller doesn't want the updated one back (silently
                # running stateless would decode the chunk as if the
                # stream started fresh).
                x = block(x, train, state=None if states is None else states[i])
        out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        if return_state:
            return out, new_states
        return out

    def _pipelined(self, x: jnp.ndarray, train: bool, pp_ctx) -> jnp.ndarray:
        """Apply the block stack through parallel.pp.pipeline_blocks.

        The per-layer parameter subtrees already exist in this module's
        scope (init always runs the sequential loop); they are read as
        values and re-applied functionally by the pipeline, so the
        parameter tree, checkpoint format, and gradients are identical to
        the sequential path.
        """
        from ..parallel.pp import pipeline_blocks

        if self.scan_mode == "sp":
            raise ValueError(
                "pipeline_parallel cannot nest with scan_mode='sp' (both "
                "wrap the stack in shard_map); pick one axis per run"
            )
        if self.moe_experts > 0:
            raise ValueError(
                "pipeline_parallel with a MoE stack is not supported: EP "
                "and PP both consume the model mesh axis, and the pipelined "
                "block apply would drop the sown load-balance loss"
            )
        mesh, axis, microbatches = pp_ctx
        params_col = self.variables["params"]
        layer_params = [params_col[f"layers_{i}"] for i in range(self.num_layers)]

        block = SSMBlock(
            d_model=self.d_model,
            state_dim=self.state_dim,
            expand_ratio=self.expand_ratio,
            kernel_size=self.kernel_size,
            dropout=self.dropout,
            scan_mode=self.scan_mode,
            dtype=self.dtype,
            moe_experts=self.moe_experts,
            moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            parent=None,
        )
        rng = None
        if train and self.dropout > 0:
            rng = self.make_rng("dropout")

        def block_apply(p, h, r):
            rngs = {"dropout": r} if r is not None else {}
            return block.apply({"params": p}, h, train, rngs=rngs)

        if self.use_checkpoint:
            block_apply = jax.checkpoint(block_apply)

        x = pipeline_blocks(
            block_apply, layer_params, x,
            mesh=mesh, axis=axis, microbatches=microbatches, rng=rng,
        )
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(
            self.dtype
        )


class GlobalSSM(nn.Module):
    """Lightweight SSM over pooled tokens (reference ssm.py:508-556).

    expand_ratio=2 and kernel_size=4 are hardcoded as in the reference
    (ssm.py:529-538).
    """

    d_model: int = 192
    num_layers: int = 2
    state_dim: int = 32
    dropout: float = 0.1
    scan_mode: str = "parallel"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        states: list = None,
        return_state: bool = False,
    ):
        """Full-sequence apply, or incremental apply with carried per-block
        (conv tail, SSM recurrence) state — the same machinery as the local
        stack, so in streaming mode the global SSM's receptive field is the
        entire summary-token stream, not just the rolling window."""
        new_states = []
        for i in range(self.num_layers):
            block = SSMBlock(
                d_model=self.d_model,
                state_dim=self.state_dim,
                expand_ratio=2,
                kernel_size=4,
                dropout=self.dropout,
                scan_mode=self.scan_mode,
                dtype=self.dtype,
                name=f"layers_{i}",
            )
            if return_state:
                x, st = block(
                    x, train, state=None if states is None else states[i],
                    return_state=True,
                )
                new_states.append(st)
            else:
                # A passed state must still be spliced in even when the
                # caller doesn't want the updated one back (silently
                # running stateless would decode the chunk as if the
                # stream started fresh).
                x = block(x, train, state=None if states is None else states[i])
        out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        if return_state:
            return out, new_states
        return out
