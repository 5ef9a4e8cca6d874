"""Pallas TPU selective-scan kernel.

TPU-native replacement for the reference's optional mamba-ssm CUDA kernel
(/root/reference/velocity_asr/ssm.py:297-337). Implements the recurrence

    h[t] = exp(dt[t] * A) * h[t-1] + (dt[t] * B[t]) * x[t]
    y[t] = C[t] . h[t]            (the D*x skip is added outside)

as a chunked scan: the grid iterates (batch, time-chunk) sequentially on
the core, the (state_dim, d_inner) state lives in a VMEM scratch buffer
that persists across time-chunks, and x/dt/B/C stream from HBM exactly
once. This avoids the (B, L, d_inner, state_dim) HBM materialization that
both the reference's Blelloch scan (ssm.py:173-295) and the XLA
associative-scan path pay for — the kernel's HBM traffic is just the
inputs plus the output.

Layout notes (see /opt/skills/guides/pallas_guide.md):
  - state h is (N, D): N=state_dim on sublanes, D=d_inner on lanes.
  - every per-step access is a SUBLANE (row) slice — Mosaic requires lane
    offsets to be 128-aligned, so B[t]/C[t] are never sliced out of the
    lane axis. Instead the (N, D) outer product dt*x*B and the (1, D)
    contraction C.h are expressed as tiny MXU dot_generals on the (1, N)
    row slices, which need no transposes or lane gathers.
  - A is passed pre-shaped as an (N, 1) column (a compile-time constant
    layout, no per-step relayout).

Gradients: forward runs this kernel; the backward pass currently reuses
the VJP of the XLA associative-scan formulation (numerically identical
recurrence). A dedicated reverse-scan Pallas kernel is a planned
optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan import selective_scan_parallel

DEFAULT_CHUNK = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _scan_kernel(a_ref, x_ref, dt_ref, b_ref, c_ref, y_ref, h_ref):
    """One (batch, time-chunk) grid step.

    a_ref:  (N, 1)       A column (constant across grid)
    x_ref:  (1, T_c, D)  input chunk
    dt_ref: (1, T_c, D)  timestep chunk
    b_ref:  (1, T_c, N)  B chunk
    c_ref:  (1, T_c, N)  C chunk
    y_ref:  (1, T_c, D)  output chunk
    h_ref:  (N, D)       carried state (VMEM scratch)
    """
    chunk_idx = pl.program_id(1)

    @pl.when(chunk_idx == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    a_col = a_ref[:]  # (N, 1)
    t_c = x_ref.shape[1]

    def step(t, h):
        dt_t = dt_ref[0, pl.ds(t, 1), :]  # (1, D) row slice
        x_t = x_ref[0, pl.ds(t, 1), :]  # (1, D)
        b_t = b_ref[0, pl.ds(t, 1), :]  # (1, N)
        c_t = c_ref[0, pl.ds(t, 1), :]  # (1, N)

        decay = jnp.exp(a_col * dt_t)  # (N, 1)*(1, D) -> (N, D)
        # Outer product (N, D) = b_t^T @ (dt_t * x_t) via MXU, no transpose.
        dbx = jax.lax.dot_general(
            b_t, dt_t * x_t,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        h = decay * h + dbx
        # y_t (1, D) = c_t (1, N) @ h (N, D).
        y_t = jax.lax.dot_general(
            c_t, h,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y_ref[:, pl.ds(t, 1), :] = y_t[None]
        return h

    h_ref[:] = jax.lax.fori_loop(0, t_c, step, h_ref[:])


def _pallas_scan_core(
    x: jnp.ndarray,
    dt: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    chunk: int,
) -> jnp.ndarray:
    """Run the kernel over (batch, L) inputs; returns y = C.h (no D skip)."""
    batch, length, d_inner = x.shape
    state_dim = A.shape[0]

    # Pad L to a chunk multiple with identity steps (dt=0 => decay=1, dBx=0).
    pad = (-length) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        B = jnp.pad(B, ((0, 0), (0, pad), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad), (0, 0)))
    padded_len = length + pad
    num_chunks = padded_len // chunk

    a_col = A.reshape(state_dim, 1).astype(jnp.float32)

    grid = (batch, num_chunks)
    y = pl.pallas_call(
        _scan_kernel,
        out_shape=jax.ShapeDtypeStruct((batch, padded_len, d_inner), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((state_dim, 1), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, d_inner), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, d_inner), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, state_dim), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, state_dim), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, chunk, d_inner), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((state_dim, d_inner), jnp.float32)],
        interpret=_interpret(),
    )(
        a_col,
        x.astype(jnp.float32),
        dt.astype(jnp.float32),
        B.astype(jnp.float32),
        C.astype(jnp.float32),
    )

    return y[:, :length]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _selective_scan_pallas(x, dt, A, B, C, D, chunk):
    y = _pallas_scan_core(x, dt, A, B, C, chunk)
    return (y + x.astype(jnp.float32) * D).astype(x.dtype)


def _fwd(x, dt, A, B, C, D, chunk):
    return _selective_scan_pallas(x, dt, A, B, C, D, chunk), (x, dt, A, B, C, D)


def _bwd(chunk, residuals, g):
    # Backward via the XLA associative-scan VJP of the identical recurrence.
    x, dt, A, B, C, D = residuals
    _, vjp = jax.vjp(selective_scan_parallel, x, dt, A, B, C, D)
    return vjp(g)


_selective_scan_pallas.defvjp(_fwd, _bwd)


def selective_scan_pallas(
    x: jnp.ndarray,
    dt: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    D: jnp.ndarray,
    chunk: int = DEFAULT_CHUNK,
) -> jnp.ndarray:
    """Selective scan via the Pallas TPU kernel.

    Same contract as ops.scan.selective_scan_sequential (the reference
    recurrence, ssm.py:158-168).
    """
    return _selective_scan_pallas(x, dt, A, B, C, D, chunk)
