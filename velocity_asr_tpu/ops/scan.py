"""Selective-scan implementations for the SSM core.

The semantic contract is the reference's sequential recurrence
(/root/reference/velocity_asr/ssm.py:134-171):

    h[t] = exp(dt[t] * A) * h[t-1] + (dt[t] * B[t]) * x[t]
    y[t] = C[t] . h[t] + D * x[t]

with h of shape (d_inner, state_dim) per batch element, A (state_dim,)
negative, and input-dependent dt/B/C.

Three tiers mirror the reference's scan-mode ladder (ssm.py:29):

  - "sequential": jax.lax.scan over time. The always-correct oracle
    (maps to reference _sequential_scan, ssm.py:134-171).
  - "parallel": jax.lax.associative_scan over the operator
    (a2, b2) o (a1, b1) = (a2*a1, a2*b1 + b2) — replaces the reference's
    hand-rolled Blelloch sweeps (ssm.py:173-295) with the XLA primitive.
  - "pallas": a chunked Pallas TPU kernel that streams x/dt/B/C from HBM
    once and keeps the (d_inner, state_dim) state in VMEM, avoiding the
    (B, L, D, N) materialization entirely (the TPU analog of the
    reference's "mamba" CUDA mode, ssm.py:297-337).

All tiers are equivalence-tested against each other in tests/test_scan.py.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp

ScanMode = str  # "sequential" | "parallel" | "pallas"


def selective_scan_sequential(
    x: jnp.ndarray,
    dt: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    D: jnp.ndarray,
    h0: jnp.ndarray = None,
    return_state: bool = False,
):
    """Oracle scan via lax.scan (reference ssm.py:134-171).

    Args:
        x: (batch, L, d_inner) gated input stream.
        dt: (batch, L, d_inner) softplus'd timestep.
        A: (state_dim,) negative continuous-time decay.
        B: (batch, L, state_dim) input matrix.
        C: (batch, L, state_dim) output matrix.
        D: (d_inner,) skip connection.
        h0: optional initial state (batch, d_inner, state_dim) — enables
            exact chunked/streaming evaluation (the recurrence is
            associative, so per-chunk scans with carried state compose).
        return_state: also return the final state.

    Returns:
        y: (batch, L, d_inner) [, h_final (batch, d_inner, state_dim)]
    """

    def step(h, inputs):
        x_t, dt_t, B_t, C_t = inputs  # (b, d), (b, d), (b, n), (b, n)
        dA = jnp.exp(dt_t[..., None] * A)  # (b, d, n)
        dBx = (dt_t * x_t)[..., None] * B_t[:, None, :]  # (b, d, n)
        h = dA * h + dBx
        y_t = jnp.einsum("bdn,bn->bd", h, C_t)
        return h, y_t

    batch, _, d_inner = x.shape
    if h0 is None:
        h0 = jnp.zeros((batch, d_inner, A.shape[0]), dtype=x.dtype)
    xs = (
        jnp.moveaxis(x, 1, 0),
        jnp.moveaxis(dt, 1, 0),
        jnp.moveaxis(B, 1, 0),
        jnp.moveaxis(C, 1, 0),
    )
    h_final, ys = jax.lax.scan(step, h0, xs)
    y = jnp.moveaxis(ys, 0, 1) + x * D
    if return_state:
        return y, h_final
    return y


def selective_scan_parallel(
    x: jnp.ndarray,
    dt: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    D: jnp.ndarray,
    h0: jnp.ndarray = None,
    return_state: bool = False,
):
    """Parallel scan via lax.associative_scan (replaces reference ssm.py:173-295)."""
    dA = jnp.exp(dt[..., None] * A)  # (b, L, d, n)
    dBx = (dt * x)[..., None] * B[:, :, None, :]  # (b, L, d, n)
    if h0 is not None:
        # Fold the carried state into the first step:
        # h[0] = dA[0] * h0 + dBx[0].
        dBx = dBx.at[:, 0].add(dA[:, 0] * h0)

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_r * a_l, a_r * b_l + b_r

    _, h = jax.lax.associative_scan(combine, (dA, dBx), axis=1)
    y = jnp.einsum("bldn,bln->bld", h, C) + x * D
    if return_state:
        return y, h[:, -1]
    return y


def selective_scan(
    x: jnp.ndarray,
    dt: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    D: jnp.ndarray,
    mode: ScanMode = "parallel",
    h0: jnp.ndarray = None,
    return_state: bool = False,
):
    """Dispatch to a scan implementation (reference mode ladder, ssm.py:119-126).

    The Pallas tier handles h0/return_state natively (the kernel seeds its
    VMEM carry and flushes the final state), so streaming chunks run the
    fast kernel too.
    """
    if mode == "sequential":
        return selective_scan_sequential(x, dt, A, B, C, D, h0, return_state)
    if mode == "parallel":
        return selective_scan_parallel(x, dt, A, B, C, D, h0, return_state)
    if mode == "pallas":
        from .scan_pallas import selective_scan_pallas

        return selective_scan_pallas(
            x, dt, A, B, C, D, h0=h0, return_state=return_state
        )
    if mode == "sp":
        # Sequence parallel: time axis sharded over the mesh set by
        # parallel.sequence_parallel (SURVEY.md §2.4). Streaming chunks
        # (h0/return_state) are short — they keep the single-device path.
        if h0 is not None or return_state:
            return selective_scan_parallel(x, dt, A, B, C, D, h0, return_state)
        from ..parallel.sp_scan import (
            current_sequence_parallel,
            selective_scan_sp_padded,
        )

        ctx = current_sequence_parallel()
        if ctx is None:
            raise ValueError(
                'scan_mode="sp" needs an active mesh: wrap the (first) '
                "forward call in velocity_asr_tpu.parallel.sequence_parallel"
                "(mesh, axis)"
            )
        mesh, axis = ctx
        return selective_scan_sp_padded(x, dt, A, B, C, D, mesh, axis)
    raise ValueError(f"Unknown scan mode: {mode!r}")
