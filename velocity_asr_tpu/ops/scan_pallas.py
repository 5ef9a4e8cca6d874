"""Pallas TPU selective-scan kernels (forward + backward).

TPU-native replacement for the reference's optional mamba-ssm CUDA kernel
(/root/reference/velocity_asr/ssm.py:297-337). Implements the recurrence

    h[t] = exp(dt[t] * A) * h[t-1] + (dt[t] * B[t]) * x[t]
    y[t] = C[t] . h[t]            (the D*x skip is added outside)

as a chunked scan: the grid iterates (batch-group, time-chunk) sequentially
on the core, the (state_dim, d_inner) states live in VMEM scratch that
persists across time-chunks, and x/dt/B/C stream from HBM exactly once.
This avoids the (B, L, d_inner, state_dim) HBM materialization that both
the reference's Blelloch scan (ssm.py:173-295) and the XLA associative-scan
path pay for.

Throughput structure (measured on TPU v5e, tools/sweep_scan_block.py):
  - the forward is a BLOCK recurrence: decays and input outer products for
    a whole chunk are precomputed as batched VPU broadcasts, the serial
    chain is a statically-unrolled bare FMA per step, and the outputs are
    one batched multiply+reduce — 2.05 ms/layer at B=8, L=1504, D=384,
    N=64 (the XLA associative scan takes 52 ms). Probes put the wall at
    the exp pass itself (1.85 ms to just materialize the decays), so this
    is within ~10% of the algorithm's speed of light on this core.
  - CAUTION (Mosaic numerics): fp32 jax.lax.dot_general inside a TPU
    Pallas kernel evaluates on the MXU at reduced (bf16-grade) precision
    unless precision=HIGHEST is passed; compounded over a 1504-step
    recurrence this destroys the result (measured rel-err ~50 with the
    round-1 per-step dot kernels). The invariant here is therefore: NO
    dot_general anywhere in these kernels — forward and backward are all
    VPU broadcast-multiply + sums (verified exact against the lax.scan
    oracle on hardware, tools/verify_tpu_numerics.py). If you add an MXU
    dot, it MUST pass precision=HIGHEST and be re-verified on hardware.

Training uses a dedicated backward kernel (mamba-style): the forward saves
only the chunk-boundary states; the backward walks chunks in reverse,
recomputes the in-chunk states forward from the saved boundary into VMEM,
and runs the adjoint recurrence

    lam[t] = C[t] (x) g[t] + exp(dt[t+1] * A) * lam[t+1]

in the same pass, producing dx/ddt/dB/dC rows and accumulating dA. HBM
traffic is again just inputs + outputs.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Forward is a block recurrence: decay/U precompute + hseq live in VMEM as
# (chunk, N, D) scratch; chunk 32 won the T in {16,32,64,128} sweep
# (tools/sweep_scan_block.py) and keeps scratch ~6.3 MB at N=64, D=384.
DEFAULT_CHUNK = 32
# Training uses one chunk size for the forward's saved boundaries and the
# backward's in-VMEM recompute. The block backward holds four (chunk, N, D)
# fp32 buffers (dec/hbuf/lbuf + the U/P temporaries) per group member, so
# chunk 16 x group 1 keeps the kernel well under the 16 MB VMEM budget.
TRAIN_CHUNK = 16
FWD_GROUP = 1  # batch elements per program (g1 won the fwd sweep)
BWD_GROUP = 1


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_group(batch: int, want: int) -> int:
    return math.gcd(batch, want)


# --------------------------------------------------------------- forward


def _make_fwd_kernel(group: int, chunk: int, save_bounds: bool,
                     with_state: bool = False):
    """Block-recurrence forward kernel (no MXU dots — see module note on
    Mosaic fp32 dot precision).

    Per (batch-group, time-chunk) program:
      1. batched precompute (VPU broadcasts, no serial dependency):
         decay[t] = exp(A (x) dt[t]) and U[t] = B[t] (x) (dt*x)[t]
      2. serial chain, statically unrolled, one vector FMA per step:
         h[t] = decay[t] * h[t-1] + U[t], overwriting U with h in place
      3. batched output: y[t] = sum_n C[t,n] * h[t,n,:] as one
         broadcast-multiply + sublane reduction over the chunk

    with_state adds an h0 input (seeding the carry at chunk 0) and an
    h_final output (flushed on the last chunk) — the streaming contract
    (reference mamba-tier semantics, ssm.py:297-337). Chunk padding keeps
    the final state exact: padded steps have dt=0 so decay=1 and U=0.
    """

    def kernel(*refs):
        a_ref, x_ref, dt_ref, b_ref, c_ref = refs[:5]
        idx = 5
        h0_ref = None
        if with_state:
            h0_ref = refs[idx]
            idx += 1
        y_ref = refs[idx]
        idx += 1
        bound_ref = None
        if save_bounds:
            bound_ref = refs[idx]
            idx += 1
        hout_ref = None
        if with_state:
            hout_ref = refs[idx]
            idx += 1
        h_ref, dec_ref, w_ref = refs[idx:idx + 3]
        chunk_idx = pl.program_id(1)

        @pl.when(chunk_idx == 0)
        def _():
            if with_state:
                h_ref[:] = h0_ref[:]
            else:
                h_ref[:] = jnp.zeros_like(h_ref)

        if save_bounds:
            bound_ref[0, 0] = h_ref[:].reshape(bound_ref.shape[2:])

        n = a_ref.shape[0]
        a_row = a_ref[:].reshape(1, n, 1)
        for j in range(group):
            dt_j = dt_ref[j]  # (T, D)
            x_j = x_ref[j]
            dec_ref[j] = jnp.exp(a_row * dt_j[:, None, :])
            w_ref[j] = b_ref[j][:, :, None] * (dt_j * x_j)[:, None, :]
            h = h_ref[j]
            for t in range(chunk):  # static indices: no dynamic-slice cost
                h = dec_ref[j, t] * h + w_ref[j, t]
                w_ref[j, t] = h
            h_ref[j] = h
            y_ref[j] = jnp.sum(c_ref[j][:, :, None] * w_ref[j], axis=1)

        if with_state:
            @pl.when(chunk_idx == pl.num_programs(1) - 1)
            def _():
                hout_ref[:] = h_ref[:]

    return kernel


def _pad_chunk(arrs, length, chunk):
    pad = (-length) % chunk
    if pad:
        arrs = [jnp.pad(a, ((0, 0), (0, pad), (0, 0))) for a in arrs]
    return arrs, length + pad


def _pallas_scan_fwd(x, dt, A, B, C, chunk, save_bounds):
    """Returns y (and chunk-boundary states when save_bounds)."""
    batch, length, d_inner = x.shape
    state_dim = A.shape[0]
    (x, dt, B, C), padded_len = _pad_chunk(
        [x.astype(jnp.float32), dt.astype(jnp.float32),
         B.astype(jnp.float32), C.astype(jnp.float32)],
        length, chunk,
    )
    num_chunks = padded_len // chunk
    a_col = A.reshape(state_dim, 1).astype(jnp.float32)

    group = _pick_group(batch, FWD_GROUP)
    grid = (batch // group, num_chunks)

    a_spec = pl.BlockSpec((state_dim, 1), lambda b, c: (0, 0), memory_space=pltpu.VMEM)
    seq_d = pl.BlockSpec((group, chunk, d_inner), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM)
    seq_n = pl.BlockSpec((group, chunk, state_dim), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((group, state_dim, d_inner), jnp.float32),  # h carry
        pltpu.VMEM((group, chunk, state_dim, d_inner), jnp.float32),  # decay
        pltpu.VMEM((group, chunk, state_dim, d_inner), jnp.float32),  # U / hseq
    ]

    kernel = _make_fwd_kernel(group, chunk, save_bounds)
    if not save_bounds:
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((batch, padded_len, d_inner), jnp.float32),
            grid=grid,
            in_specs=[a_spec, seq_d, seq_d, seq_n, seq_n],
            out_specs=seq_d,
            scratch_shapes=scratch,
            interpret=_interpret(),
        )(a_col, x, dt, B, C)
        return y[:, :length]

    y, bounds = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((batch, padded_len, d_inner), jnp.float32),
            jax.ShapeDtypeStruct(
                (batch // group, num_chunks, group * state_dim, d_inner), jnp.float32
            ),
        ),
        grid=grid,
        in_specs=[a_spec, seq_d, seq_d, seq_n, seq_n],
        out_specs=(
            seq_d,
            pl.BlockSpec(
                (1, 1, group * state_dim, d_inner), lambda b, c: (b, c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(a_col, x, dt, B, C)
    # reshape boundaries to (batch, num_chunks, N, D)
    bounds = bounds.reshape(batch // group, num_chunks, group, state_dim, d_inner)
    bounds = jnp.moveaxis(bounds, 2, 1).reshape(batch, num_chunks, state_dim, d_inner)
    return y[:, :length], bounds


def _pallas_scan_fwd_state(x, dt, A, B, C, chunk, h0, save_bounds=False):
    """Streaming forward launch: seeds the carry from h0 and emits the final
    state. h0/h_final are in kernel layout (batch, state_dim, d_inner).
    save_bounds additionally emits the chunk-boundary states (the VJP
    residuals for the streaming-aware training graph)."""
    batch, length, d_inner = x.shape
    state_dim = A.shape[0]
    (x, dt, B, C), padded_len = _pad_chunk(
        [x.astype(jnp.float32), dt.astype(jnp.float32),
         B.astype(jnp.float32), C.astype(jnp.float32)],
        length, chunk,
    )
    num_chunks = padded_len // chunk
    a_col = A.reshape(state_dim, 1).astype(jnp.float32)

    group = _pick_group(batch, FWD_GROUP)
    grid = (batch // group, num_chunks)

    a_spec = pl.BlockSpec((state_dim, 1), lambda b, c: (0, 0), memory_space=pltpu.VMEM)
    seq_d = pl.BlockSpec((group, chunk, d_inner), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM)
    seq_n = pl.BlockSpec((group, chunk, state_dim), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec(
        (group, state_dim, d_inner), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM
    )
    scratch = [
        pltpu.VMEM((group, state_dim, d_inner), jnp.float32),  # h carry
        pltpu.VMEM((group, chunk, state_dim, d_inner), jnp.float32),  # decay
        pltpu.VMEM((group, chunk, state_dim, d_inner), jnp.float32),  # U / hseq
    ]

    out_shape = [
        jax.ShapeDtypeStruct((batch, padded_len, d_inner), jnp.float32),
    ]
    out_specs = [seq_d]
    if save_bounds:
        out_shape.append(jax.ShapeDtypeStruct(
            (batch // group, num_chunks, group * state_dim, d_inner), jnp.float32
        ))
        out_specs.append(pl.BlockSpec(
            (1, 1, group * state_dim, d_inner), lambda b, c: (b, c, 0, 0),
            memory_space=pltpu.VMEM,
        ))
    out_shape.append(
        jax.ShapeDtypeStruct((batch, state_dim, d_inner), jnp.float32)
    )
    out_specs.append(h_spec)

    outs = pl.pallas_call(
        _make_fwd_kernel(group, chunk, save_bounds=save_bounds, with_state=True),
        out_shape=tuple(out_shape),
        grid=grid,
        in_specs=[a_spec, seq_d, seq_d, seq_n, seq_n, h_spec],
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(a_col, x, dt, B, C, h0.astype(jnp.float32))
    if not save_bounds:
        y, h_final = outs
        return y[:, :length], h_final
    y, bounds, h_final = outs
    bounds = bounds.reshape(batch // group, num_chunks, group, state_dim, d_inner)
    bounds = jnp.moveaxis(bounds, 2, 1).reshape(batch, num_chunks, state_dim, d_inner)
    return y[:, :length], bounds, h_final


# -------------------------------------------------------------- backward


def _make_bwd_kernel(group: int, chunk: int, with_state: bool = False):
    """Block-recurrence backward kernel over (batch-group, reversed
    time-chunk) grid steps.

    Mirrors the forward's structure (see _make_fwd_kernel): every
    O(chunk*N*D) quantity is computed as one batched VPU op, the two serial
    dependencies (forward-state recompute and the adjoint recurrence) are
    statically-unrolled bare-FMA chains, and the gradient rows come from
    batched broadcast-multiply + reductions. The decays are exponentiated
    ONCE per chunk and reused by both chains — the round-1 per-step kernel
    paid the exp twice (recompute + adjoint) plus four HIGHEST-precision
    MXU dots per step, which measured 4x slower than this form
    (tools/sweep_scan_block.py; BENCH_DETAILS_r02.md).

    Per (batch-group, reverse-chunk) program:
      1. batched: dec[t] = exp(A (x) dt[t]); U[t] = B[t] (x) (dt*x)[t];
         P[t] = C[t] (x) g[t]
      2. forward chain from the saved boundary: hbuf[t+1] = dec[t]*hbuf[t]
         + U[t] (bare FMA per step)
      3. adjoint chain (reverse): lam[t] = lam_in + P[t], stored to lbuf;
         lam_in = dec[t]*lam[t] — the carry leaves the chunk already
         propagated across its first step, matching the chunk-boundary
         convention of the per-step formulation
      4. batched extraction:
         dC[t] = sum_d g[t,d]*h[t+1]      dB[t]  = sum_d (dt*x)[t,d]*lam[t]
         ds[t] = sum_n B[t,n]*lam[t]      dx[t]  = ds[t]*dt[t]
         ddecay[t] = lam[t]*h[t]*dec[t]
         ddt[t] = sum_n ddecay[t]*A + ds[t]*x[t]
         dA    += sum_{t,d} ddecay[t]*dt[t]
    """

    def kernel(*refs):
        a_ref, x_ref, dt_ref, b_ref, c_ref, g_ref, bound_ref = refs[:7]
        idx = 7
        gh_ref = None
        if with_state:
            gh_ref = refs[idx]
            idx += 1
        dx_ref, ddt_ref, db_ref, dc_ref, da_ref = refs[idx:idx + 5]
        idx += 5
        dh0_ref = None
        if with_state:
            dh0_ref = refs[idx]
            idx += 1
        lam_ref, dec_ref, hbuf_ref, lbuf_ref = refs[idx:idx + 4]
        rev_idx = pl.program_id(1)

        @pl.when(rev_idx == 0)
        def _():
            # With a carried state, the final state's cotangent seeds the
            # adjoint chain: lam enters the last step as dL/dh[L-1] = g_h
            # (padded steps are identity: dt=0 -> dec=1, P=0).
            if with_state:
                lam_ref[:] = gh_ref[:]
            else:
                lam_ref[:] = jnp.zeros_like(lam_ref)
            da_ref[:] = jnp.zeros_like(da_ref)

        n = a_ref.shape[0]
        a_row = a_ref[:].reshape(1, n, 1)
        for j in range(group):
            dt_j = dt_ref[j]  # (T, D)
            x_j = x_ref[j]
            g_j = g_ref[j]
            s_j = dt_j * x_j  # (T, D)

            # 1. batched precompute (one exp pass, reused by both chains)
            dec_ref[j] = jnp.exp(a_row * dt_j[:, None, :])
            u = b_ref[j][:, :, None] * s_j[:, None, :]  # (T, N, D)
            p = c_ref[j][:, :, None] * g_j[:, None, :]

            # 2. forward-state recompute chain
            h = bound_ref[j, 0]
            hbuf_ref[j, 0] = h
            for t in range(chunk):
                h = dec_ref[j, t] * h + u[t]
                hbuf_ref[j, t + 1] = h

            # 3. adjoint chain (reverse, FMA per step)
            lam = lam_ref[j]
            for t in range(chunk - 1, -1, -1):
                lam = lam + p[t]
                lbuf_ref[j, t] = lam
                lam = dec_ref[j, t] * lam
            lam_ref[j] = lam

            # 4. batched gradient extraction (all VPU, fp32)
            lam_v = lbuf_ref[j]  # (T, N, D): lam[t]
            h_post = hbuf_ref[j, 1:chunk + 1]
            h_pre = hbuf_ref[j, 0:chunk]
            dc_ref[j] = jnp.sum(h_post * g_j[:, None, :], axis=2)
            ds = jnp.sum(lam_v * b_ref[j][:, :, None], axis=1)  # (T, D)
            db_ref[j] = jnp.sum(lam_v * s_j[:, None, :], axis=2)
            ddecay = lam_v * h_pre * dec_ref[j]
            ddt_ref[j] = jnp.sum(ddecay * a_row, axis=1) + ds * x_j
            dx_ref[j] = ds * dt_j
            da_ref[j] = da_ref[j] + jnp.sum(
                ddecay * dt_j[:, None, :], axis=(0, 2)
            ).reshape(n, 1)

        if with_state:
            # After the chunk-0 program the carry is dec[0]*lam[0] =
            # dL/dh[-1], i.e. the gradient w.r.t. the seeded initial state.
            @pl.when(rev_idx == pl.num_programs(1) - 1)
            def _():
                dh0_ref[:] = lam_ref[:]

    return kernel


def _pallas_scan_bwd(x, dt, A, B, C, bounds, g, chunk, gh=None):
    """Backward kernel launch; returns (dx, ddt, dA, dB, dC) for the scan
    part (no D-skip terms). With gh (cotangent of the emitted final state,
    kernel layout (batch, N, D)) also returns dh0."""
    with_state = gh is not None
    batch, length, d_inner = x.shape
    state_dim = A.shape[0]
    (x, dt, B, C, g), padded_len = _pad_chunk(
        [x.astype(jnp.float32), dt.astype(jnp.float32), B.astype(jnp.float32),
         C.astype(jnp.float32), g.astype(jnp.float32)],
        length, chunk,
    )
    num_chunks = padded_len // chunk
    a_col = A.reshape(state_dim, 1).astype(jnp.float32)
    group = _pick_group(batch, BWD_GROUP)
    grid = (batch // group, num_chunks)
    nc = num_chunks

    seq_d = pl.BlockSpec(
        (group, chunk, d_inner), lambda b, c: (b, nc - 1 - c, 0), memory_space=pltpu.VMEM
    )
    seq_n = pl.BlockSpec(
        (group, chunk, state_dim), lambda b, c: (b, nc - 1 - c, 0), memory_space=pltpu.VMEM
    )
    a_spec = pl.BlockSpec((state_dim, 1), lambda b, c: (0, 0), memory_space=pltpu.VMEM)
    bound_spec = pl.BlockSpec(
        (group, 1, state_dim, d_inner), lambda b, c: (b, nc - 1 - c, 0, 0),
        memory_space=pltpu.VMEM,
    )
    da_spec = pl.BlockSpec(
        (group, state_dim, 1), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM
    )
    h_spec = pl.BlockSpec(
        (group, state_dim, d_inner), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM
    )

    in_specs = [a_spec, seq_d, seq_d, seq_n, seq_n, seq_d, bound_spec]
    operands = [a_col, x, dt, B, C, g, bounds]
    out_shape = [
        jax.ShapeDtypeStruct((batch, padded_len, d_inner), jnp.float32),
        jax.ShapeDtypeStruct((batch, padded_len, d_inner), jnp.float32),
        jax.ShapeDtypeStruct((batch, padded_len, state_dim), jnp.float32),
        jax.ShapeDtypeStruct((batch, padded_len, state_dim), jnp.float32),
        jax.ShapeDtypeStruct((batch, state_dim, 1), jnp.float32),
    ]
    out_specs = [seq_d, seq_d, seq_n, seq_n, da_spec]
    if with_state:
        in_specs.append(h_spec)
        operands.append(gh.astype(jnp.float32))
        out_shape.append(
            jax.ShapeDtypeStruct((batch, state_dim, d_inner), jnp.float32)
        )
        out_specs.append(h_spec)

    outs = pl.pallas_call(
        _make_bwd_kernel(group, chunk, with_state=with_state),
        out_shape=tuple(out_shape),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((group, state_dim, d_inner), jnp.float32),  # lam
            pltpu.VMEM((group, chunk, state_dim, d_inner), jnp.float32),  # dec
            pltpu.VMEM((group, chunk + 1, state_dim, d_inner), jnp.float32),  # hbuf
            pltpu.VMEM((group, chunk, state_dim, d_inner), jnp.float32),  # lbuf
        ],
        interpret=_interpret(),
    )(*operands)

    dx, ddt, dB_, dC_, dA_b = outs[:5]
    dA = jnp.sum(dA_b, axis=(0, 2))  # (N,)
    grads = (dx[:, :length], ddt[:, :length], dA, dB_[:, :length], dC_[:, :length])
    if with_state:
        return grads + (outs[5],)
    return grads


# --------------------------------------------------------------- public


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _selective_scan_pallas(x, dt, A, B, C, D, chunk):
    y = _pallas_scan_fwd(x, dt, A, B, C, chunk, save_bounds=False)
    return (y + x.astype(jnp.float32) * D).astype(x.dtype)


def _fwd(x, dt, A, B, C, D, chunk):
    y, bounds = _pallas_scan_fwd(x, dt, A, B, C, TRAIN_CHUNK, save_bounds=True)
    out = (y + x.astype(jnp.float32) * D).astype(x.dtype)
    return out, (x, dt, A, B, C, D, bounds)


def _bwd(chunk, residuals, g):
    x, dt, A, B, C, D, bounds = residuals
    gf = g.astype(jnp.float32)
    dx_scan, ddt, dA, dB_, dC_ = _pallas_scan_bwd(
        x, dt, A, B, C, bounds, gf, TRAIN_CHUNK
    )
    xf = x.astype(jnp.float32)
    dx = dx_scan + gf * D  # skip-connection term
    dD = jnp.sum(gf * xf, axis=(0, 1))
    return (
        dx.astype(x.dtype),
        ddt.astype(dt.dtype),
        dA.astype(A.dtype),
        dB_.astype(B.dtype),
        dC_.astype(C.dtype),
        dD.astype(D.dtype),
    )


_selective_scan_pallas.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _selective_scan_pallas_state(x, dt, A, B, C, D, chunk, h0_k):
    """Stateful variant: h0_k/h_final in kernel layout (batch, N, D)."""
    y, h_final = _pallas_scan_fwd_state(x, dt, A, B, C, chunk, h0_k)
    return (y + x.astype(jnp.float32) * D).astype(x.dtype), h_final


def _fwd_state(x, dt, A, B, C, D, chunk, h0_k):
    y, bounds, h_final = _pallas_scan_fwd_state(
        x, dt, A, B, C, TRAIN_CHUNK, h0_k, save_bounds=True
    )
    out = (y + x.astype(jnp.float32) * D).astype(x.dtype)
    return (out, h_final), (x, dt, A, B, C, D, bounds)


def _bwd_state(chunk, residuals, g):
    x, dt, A, B, C, D, bounds = residuals
    gy, gh = g
    gf = gy.astype(jnp.float32)
    dx_scan, ddt, dA, dB_, dC_, dh0 = _pallas_scan_bwd(
        x, dt, A, B, C, bounds, gf, TRAIN_CHUNK, gh=gh
    )
    xf = x.astype(jnp.float32)
    dx = dx_scan + gf * D
    dD = jnp.sum(gf * xf, axis=(0, 1))
    return (
        dx.astype(x.dtype),
        ddt.astype(dt.dtype),
        dA.astype(A.dtype),
        dB_.astype(B.dtype),
        dC_.astype(C.dtype),
        dD.astype(D.dtype),
        dh0,
    )


_selective_scan_pallas_state.defvjp(_fwd_state, _bwd_state)


def selective_scan_pallas(
    x: jnp.ndarray,
    dt: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    D: jnp.ndarray,
    chunk: int = DEFAULT_CHUNK,
    h0: jnp.ndarray = None,
    return_state: bool = False,
):
    """Selective scan via the Pallas TPU kernels.

    Same contract as ops.scan.selective_scan_sequential (the reference
    recurrence, ssm.py:158-168); differentiable via the dedicated
    reverse-scan backward kernel.

    `chunk` tunes the INFERENCE launch only: under jax.grad the custom
    VJP re-runs both passes at TRAIN_CHUNK (the saved-bounds layout is
    fixed at trace time), so sweeping `chunk` inside a differentiated
    graph measures TRAIN_CHUNK regardless of the argument.

    With h0/return_state (the streaming contract, reference mamba-tier
    semantics ssm.py:297-337) the kernel seeds its VMEM carry from h0 and
    flushes the final state. This path is differentiable too (the
    streaming-aware training objective scans it chunk-by-chunk): the
    backward kernel seeds its adjoint from the final state's cotangent and
    its reverse carry exits chunk 0 as exactly dL/dh0.
    """
    if h0 is None and not return_state:
        return _selective_scan_pallas(x, dt, A, B, C, D, chunk)
    batch, _, d_inner = x.shape
    state_dim = A.shape[0]
    if h0 is None:
        h0_k = jnp.zeros((batch, state_dim, d_inner), jnp.float32)
    else:
        # oracle layout (batch, d_inner, state_dim) -> kernel (batch, N, D)
        h0_k = jnp.swapaxes(h0, 1, 2).astype(jnp.float32)
    y, h_final = _selective_scan_pallas_state(x, dt, A, B, C, D, chunk, h0_k)
    if not return_state:
        return y
    # State stays fp32 like the sequential oracle's lax.scan carry (the
    # recurrence always runs fp32 — CLAUDE.md); truncating to a bf16
    # x.dtype would degrade the carry at every streaming chunk boundary.
    return y, jnp.swapaxes(h_final, 1, 2)
