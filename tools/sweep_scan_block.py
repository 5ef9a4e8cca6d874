"""Block-recurrence scan kernel sweep (dev tool).

Restructures the selective-scan chunk so the serial chain is a bare FMA:
  1. batched precompute: decay[t] = exp(A (x) dt[t]) and U[t] = B[t] (x) (dt*x)[t]
     for the whole chunk at once (VPU broadcasts, no serial dependency)
  2. chain: h[t] = decay[t] * h[t-1] + U[t], one vector FMA per step,
     overwriting U with h in place
  3. batched output: y = C . hseq as one batched dot over the chunk

Usage: python tools/sweep_scan_block.py T16g1 T32g1 T32g2 old4x4 ...
  TNgM  = block kernel, chunk N, group M
  TNgMe = same with exp2 instead of exp
  oldGxU = round-1 per-step kernel with group G unroll U
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
B, L, D, N = 8, 1504, 384, 64
x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
dt = jnp.asarray((np.abs(rng.standard_normal((B, L, D))) * 0.4).astype(np.float32))
A = -jnp.exp(jnp.log(jnp.arange(1, N + 1, dtype=jnp.float32)))
Bc = jnp.asarray(rng.standard_normal((B, L, N)).astype(np.float32))
Cc = jnp.asarray(rng.standard_normal((B, L, N)).astype(np.float32))
a_col = A.reshape(N, 1)
LOG2E = float(np.log2(np.e))


def make_block(chunk, group, exp2=False, y_mode="vpu"):
    def kernel(a_ref, x_ref, dt_ref, b_ref, c_ref, y_ref, h_ref, dec_ref, w_ref):
        ci = pl.program_id(1)

        @pl.when(ci == 0)
        def _():
            h_ref[:] = jnp.zeros_like(h_ref)

        a_row = a_ref[:].reshape(1, N, 1)  # (1, N, 1)
        for j in range(group):
            dt_j = dt_ref[j]  # (T, D)
            x_j = x_ref[j]
            b_j = b_ref[j]  # (T, N)
            if exp2:
                dec_ref[j] = jnp.exp2((a_row * LOG2E) * dt_j[:, None, :])
            else:
                dec_ref[j] = jnp.exp(a_row * dt_j[:, None, :])
            w_ref[j] = b_j[:, :, None] * (dt_j * x_j)[:, None, :]

            def body(t, h):
                h = dec_ref[j, t] * h + w_ref[j, t]
                w_ref[j, t] = h
                return h

            h_ref[j] = jax.lax.fori_loop(0, chunk, body, h_ref[j])
            if y_mode == "vpu":
                # y[t,d] = sum_n c[t,n] * h[t,n,d] as broadcast-multiply+reduce
                y_ref[j] = jnp.sum(c_ref[j][:, :, None] * w_ref[j], axis=1)
            else:
                # independent per-step dots (outside the serial chain)
                def ydot(t, _):
                    y_ref[j, pl.ds(t, 1), :] = jax.lax.dot_general(
                        c_ref[j, pl.ds(t, 1), :], w_ref[j, t],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    return 0

                jax.lax.fori_loop(0, chunk, ydot, 0)

    def run(x, dt, Bc, Cc):
        grid = (B // group, L // chunk)
        seq_d = pl.BlockSpec((group, chunk, D), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM)
        seq_n = pl.BlockSpec((group, chunk, N), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, L, D), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((N, 1), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
                seq_d, seq_d, seq_n, seq_n,
            ],
            out_specs=seq_d,
            scratch_shapes=[
                pltpu.VMEM((group, N, D), jnp.float32),
                pltpu.VMEM((group, chunk, N, D), jnp.float32),
                pltpu.VMEM((group, chunk, N, D), jnp.float32),
            ],
        )(a_col, x, dt, Bc, Cc)

    return run


def make_old(group, unroll, chunk=128, noexp=False):
    def kernel(a_ref, x_ref, dt_ref, b_ref, c_ref, y_ref, h_ref):
        ci = pl.program_id(1)

        @pl.when(ci == 0)
        def _():
            h_ref[:] = jnp.zeros_like(h_ref)

        a = a_ref[:]
        tc = x_ref.shape[1]

        def step(k, hs):
            for u in range(unroll):
                t = k * unroll + u
                new = []
                for j in range(group):
                    h = hs[j]
                    dt_t = dt_ref[j, pl.ds(t, 1), :]
                    x_t = x_ref[j, pl.ds(t, 1), :]
                    b_t = b_ref[j, pl.ds(t, 1), :]
                    c_t = c_ref[j, pl.ds(t, 1), :]
                    decay = (1.0 + a * dt_t) if noexp else jnp.exp(a * dt_t)
                    dbx = jax.lax.dot_general(
                        b_t, dt_t * x_t, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    h = decay * h + dbx
                    y_t = jax.lax.dot_general(
                        c_t, h, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    y_ref[j, pl.ds(t, 1), :] = y_t
                    new.append(h)
                hs = tuple(new)
            return hs

        hs = tuple(h_ref[j] for j in range(group))
        hs = jax.lax.fori_loop(0, tc // unroll, step, hs)
        for j in range(group):
            h_ref[j] = hs[j]

    def run(x, dt, Bc, Cc):
        grid = (B // group, L // chunk)
        seq_d = pl.BlockSpec((group, chunk, D), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM)
        seq_n = pl.BlockSpec((group, chunk, N), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, L, D), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((N, 1), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
                seq_d, seq_d, seq_n, seq_n,
            ],
            out_specs=seq_d,
            scratch_shapes=[pltpu.VMEM((group, N, D), jnp.float32)],
        )(a_col, x, dt, Bc, Cc)

    return run


def oracle(x, dt, Bc, Cc):
    def step(h, inp):
        x_t, dt_t, b_t, c_t = inp
        decay = jnp.exp(A[:, None] * dt_t[None, :])
        h = decay * h + b_t[:, None] * (dt_t * x_t)[None, :]
        return h, jnp.einsum("n,nd->d", c_t, h)

    def per_b(xb, dtb, bb, cb):
        h0 = jnp.zeros((N, D), jnp.float32)
        _, y = jax.lax.scan(step, h0, (xb, dtb, bb, cb))
        return y

    return jax.vmap(per_b)(x, dt, Bc, Cc)


REP = 16


def time_run(run):
    def f(x, dt, Bc, Cc):
        def body(carry, _):
            return run(carry, dt, Bc, Cc) * 1e-3, None

        out, _ = jax.lax.scan(body, x, None, length=REP)
        return jnp.sum(out)

    g = jax.jit(f)
    np.asarray(g(x, dt, Bc, Cc))  # compile + sync
    t0 = time.perf_counter()
    outs = [g(x, dt, Bc, Cc) for _ in range(5)]
    for o in outs:
        np.asarray(o)
    dtime = (time.perf_counter() - t0) / (5 * REP)
    return dtime


def main():
    names = sys.argv[1:] or ["old4x4", "T16g1", "T32g1", "T32g2", "T32g1e", "T64g1"]
    y_ref = np.asarray(oracle(x, dt, Bc, Cc))
    for name in names:
        try:
            if name.startswith("in"):
                # inT{t}g{g}[e][s][d]: inline chain; e=exp2, s=stacked y
                # writes, d=materialize decay only
                body = name[2:]
                exp2, y_stack, keep_dec = "exp", False, False
                while body[-1] in "espd":
                    if body[-1] == "e":
                        exp2 = "exp2"
                    elif body[-1] == "p":
                        exp2 = "poly"
                    elif body[-1] == "s":
                        y_stack = True
                    else:
                        keep_dec = True
                    body = body[:-1]
                t, g = body[1:].split("g")
                run = make_inline(int(t), int(g), exp2=exp2, y_stack=y_stack,
                                  keep_dec=keep_dec)
            elif name.startswith("xc"):
                body = name[2:]
                mode = "exp"
                if body.endswith("e"):
                    mode, body = "exp2", body[:-1]
                elif body.endswith("p"):
                    mode, body = "poly", body[:-1]
                run = make_exp_chain_probe(int(body), mode=mode)
            elif "_" in name and not name.startswith("old"):
                body, variant = name.split("_")
                t, g = body[1:].split("g")
                if variant in ("suy", "sud"):
                    run = make_block_fused(int(t), int(g), variant)
                elif variant.startswith("su"):
                    sub = int(variant[2:]) if variant[2:] else None
                    run = make_block_su(int(t), int(g), sub=sub)
                else:
                    run = make_probe(int(t), int(g), variant)
            elif name.startswith("old"):
                spec = name[3:]
                noexp = spec.endswith("n")
                if noexp:
                    spec = spec[:-1]
                ch = 128
                if "c" in spec:
                    spec, chs = spec.split("c")
                    ch = int(chs)
                g, u = spec.split("x")
                run = make_old(int(g), int(u), chunk=ch, noexp=noexp)
            else:
                body = name[1:]
                y_mode = "vpu"
                if body.endswith("d"):
                    y_mode = "dot"
                    body = body[:-1]
                exp2 = body.endswith("e")
                if exp2:
                    body = body[:-1]
                t, g = body.split("g")
                run = make_block(int(t), int(g), exp2=exp2, y_mode=y_mode)
            y = np.asarray(run(x, dt, Bc, Cc))
            err = np.max(np.abs(y - y_ref) / (np.abs(y_ref) + 1e-3))
            ms = time_run(run) * 1e3
            print(f"{name:>10}: {ms:7.3f} ms/layer  maxrelerr={err:.2e}")
        except Exception as e:
            print(f"{name:>10}: FAILED {type(e).__name__}: {str(e)[:200]}")




def make_probe(chunk, group, variant):
    """Component probes / fused variants.

    expo  : exp precompute only (lower bound for the transcendental pass)
    fma   : chain FMA + hseq writes only, no exp (precomputed ones), no y
    v1    : decay precompute (batched) + chain with fused outer + per-step MXU y-dot
    v2    : decay precompute + chain fused outer + hseq + batched VPU y
    """

    def kernel(a_ref, x_ref, dt_ref, b_ref, c_ref, y_ref, h_ref, dec_ref, w_ref):
        ci = pl.program_id(1)

        @pl.when(ci == 0)
        def _():
            h_ref[:] = jnp.zeros_like(h_ref)

        a_row = a_ref[:].reshape(1, N, 1)
        for j in range(group):
            dt_j = dt_ref[j]
            x_j = x_ref[j]
            if variant == "expo":
                dec_ref[j] = jnp.exp(a_row * dt_j[:, None, :])
                y_ref[j] = jnp.sum(dec_ref[j], axis=1)
                continue
            if variant == "fma":
                def body(t, h):
                    h = w_ref[j, t] * h + w_ref[j, t]
                    w_ref[j, t] = h
                    return h
                h_ref[j] = jax.lax.fori_loop(0, chunk, body, h_ref[j])
                y_ref[j] = x_j
                continue
            if variant == "expw":
                dec_ref[j] = jnp.exp(a_row * dt_j[:, None, :])
                y_ref[j] = x_j
                continue
            dec_ref[j] = jnp.exp(a_row * dt_j[:, None, :])
            if variant == "v1":
                def body(t, h):
                    b_t = b_ref[j, pl.ds(t, 1), :]  # (1, N)
                    v_t = dt_ref[j, pl.ds(t, 1), :] * x_ref[j, pl.ds(t, 1), :]
                    h = dec_ref[j, t] * h + jax.lax.dot_general(
                        b_t, v_t, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    y_ref[j, pl.ds(t, 1), :] = jax.lax.dot_general(
                        c_ref[j, pl.ds(t, 1), :], h, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    return h
                h_ref[j] = jax.lax.fori_loop(0, chunk, body, h_ref[j])
            else:  # v2
                def body(t, h):
                    b_t = b_ref[j, pl.ds(t, 1), :]
                    v_t = dt_ref[j, pl.ds(t, 1), :] * x_ref[j, pl.ds(t, 1), :]
                    h = dec_ref[j, t] * h + jax.lax.dot_general(
                        b_t, v_t, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    w_ref[j, t] = h
                    return h
                h_ref[j] = jax.lax.fori_loop(0, chunk, body, h_ref[j])
                y_ref[j] = jnp.sum(c_ref[j][:, :, None] * w_ref[j], axis=1)

    def run(x, dt, Bc, Cc):
        grid = (B // group, L // chunk)
        seq_d = pl.BlockSpec((group, chunk, D), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM)
        seq_n = pl.BlockSpec((group, chunk, N), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, L, D), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((N, 1), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
                seq_d, seq_d, seq_n, seq_n,
            ],
            out_specs=seq_d,
            scratch_shapes=[
                pltpu.VMEM((group, N, D), jnp.float32),
                pltpu.VMEM((group, chunk, N, D), jnp.float32),
                pltpu.VMEM((group, chunk, N, D), jnp.float32),
            ],
        )(a_col, x, dt, Bc, Cc)

    return run




def make_block_su(chunk, group, sub=None, y_mode="vpu"):
    """Block kernel with a STATICALLY unrolled chain: all scratch indices
    are compile-time constants (no dynamic-slice address computation in the
    serial chain). sub = static sub-unroll factor with an outer fori_loop
    (None = fully static)."""

    def kernel(a_ref, x_ref, dt_ref, b_ref, c_ref, y_ref, h_ref, dec_ref, w_ref):
        ci = pl.program_id(1)

        @pl.when(ci == 0)
        def _():
            h_ref[:] = jnp.zeros_like(h_ref)

        a_row = a_ref[:].reshape(1, N, 1)
        for j in range(group):
            dt_j = dt_ref[j]
            x_j = x_ref[j]
            b_j = b_ref[j]
            dec_ref[j] = jnp.exp(a_row * dt_j[:, None, :])
            w_ref[j] = b_j[:, :, None] * (dt_j * x_j)[:, None, :]

            if sub is None:
                h = h_ref[j]
                for t in range(chunk):  # static indices
                    h = dec_ref[j, t] * h + w_ref[j, t]
                    w_ref[j, t] = h
                h_ref[j] = h
            else:
                def body(k, h):
                    for u in range(sub):
                        t = k * sub + u
                        h = dec_ref[j, pl.ds(t, 1)][0] * h + w_ref[j, pl.ds(t, 1)][0]
                        w_ref[j, pl.ds(t, 1)] = h[None]
                    return h

                h_ref[j] = jax.lax.fori_loop(0, chunk // sub, body, h_ref[j])

            y_ref[j] = jnp.sum(c_ref[j][:, :, None] * w_ref[j], axis=1)

    def run(x, dt, Bc, Cc):
        grid = (B // group, L // chunk)
        seq_d = pl.BlockSpec((group, chunk, D), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM)
        seq_n = pl.BlockSpec((group, chunk, N), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, L, D), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((N, 1), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
                seq_d, seq_d, seq_n, seq_n,
            ],
            out_specs=seq_d,
            scratch_shapes=[
                pltpu.VMEM((group, N, D), jnp.float32),
                pltpu.VMEM((group, chunk, N, D), jnp.float32),
                pltpu.VMEM((group, chunk, N, D), jnp.float32),
            ],
        )(a_col, x, dt, Bc, Cc)

    return run




def make_inline(chunk, group, exp2="exp", y_stack=False, keep_dec=False):
    """Fully-inline VPU chain — NO (T, N, D) scratch arrays at all.

    Hypothesis: the block kernel's 1.85 ms "exp wall" is mostly the VMEM
    write+read of the materialized (T, N, D) decay/U arrays (2 x 1.18 GB
    per layer at B=8), not the transcendental itself. Here each step
    computes decay = exp(A (x) dt[t]) inline (24 vregs), forms the rank-1
    U = B[t] (x) (dt*x)[t] by broadcast, FMAs into the register-resident
    h, and reduces y[t] = sum_n C[t,n] h[n,:] immediately — the only VMEM
    traffic is the input rows and y rows.

    keep_dec=True instead materializes ONLY the decay (batched exp pass)
    and keeps U/y inline: half the scratch traffic of the block kernel.
    """

    def kernel(a_ref, x_ref, dt_ref, b_ref, c_ref, y_ref, h_ref, dec_ref):
        ci = pl.program_id(1)

        @pl.when(ci == 0)
        def _():
            h_ref[:] = jnp.zeros_like(h_ref)

        a_col2 = a_ref[:].reshape(N, 1) * (1.0 if exp2 == "exp" else LOG2E)
        e = {"exp": jnp.exp, "exp2": jnp.exp2, "poly": fast_exp_poly}[exp2]
        for j in range(group):
            if keep_dec:
                dec_ref[j] = e(a_col2.reshape(1, N, 1) * dt_ref[j][:, None, :])
            h = h_ref[j]
            rows = []
            for t in range(chunk):  # static indices throughout
                dt_t = dt_ref[j, t].reshape(1, D)
                if keep_dec:
                    decay = dec_ref[j, t]
                else:
                    decay = e(a_col2 * dt_t)  # (N, D) inline
                u = b_ref[j, t].reshape(N, 1) * (dt_t * x_ref[j, t].reshape(1, D))
                h = decay * h + u
                row = jnp.sum(c_ref[j, t].reshape(N, 1) * h, axis=0)
                if y_stack:
                    rows.append(row)
                else:
                    y_ref[j, t] = row
            if y_stack:
                y_ref[j] = jnp.stack(rows)
            h_ref[j] = h

    def run(x, dt, Bc, Cc):
        grid = (B // group, L // chunk)
        seq_d = pl.BlockSpec((group, chunk, D), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM)
        seq_n = pl.BlockSpec((group, chunk, N), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, L, D), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((N, 1), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
                seq_d, seq_d, seq_n, seq_n,
            ],
            out_specs=seq_d,
            scratch_shapes=[
                pltpu.VMEM((group, N, D), jnp.float32),
                pltpu.VMEM((group, chunk if keep_dec else 1, N, D), jnp.float32),
            ],
        )(a_col, x, dt, Bc, Cc)

    return run


def fast_exp_poly(w):
    """exp(z) given w = z*log2(e): round-to-nearest split w = k + f,
    f in [-0.5, 0.5]; 2^f by degree-7 Taylor (max rel err ~7e-9); scale by
    2^k via exponent-bit add. Clamps at the fp32 normal range."""
    w = jnp.maximum(w, -126.0)
    kf = jnp.floor(w + 0.5)
    f = (w - kf) * 0.6931471805599453  # f*ln2: 2^f = e^(f ln2)
    p = 1.0 + f * (1.0 + f * (0.5 + f * (
        1 / 6 + f * (1 / 24 + f * (1 / 120 + f * (1 / 720 + f * (1 / 5040)))))))
    bits = jax.lax.bitcast_convert_type(p, jnp.int32)
    bits = bits + (kf.astype(jnp.int32) << 23)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def make_exp_chain_probe(chunk, group=1, mode="exp"):
    """Pure in-chain exp throughput: per-step exp (N, D) accumulated into a
    register value; no scratch writes. Lower-bounds the inline variant.
    mode: exp | exp2 (pre-scaled A) | poly (fast_exp_poly)."""

    def kernel(a_ref, x_ref, dt_ref, b_ref, c_ref, y_ref, h_ref):
        scale = LOG2E if mode in ("exp2", "poly") else 1.0
        a_col_ = a_ref[:].reshape(N, 1) * scale
        for j in range(group):
            acc = h_ref[j]
            for t in range(chunk):
                w = a_col_ * dt_ref[j, t].reshape(1, D)
                if mode == "exp":
                    acc = acc + jnp.exp(w)
                elif mode == "exp2":
                    acc = acc + jnp.exp2(w)
                else:
                    acc = acc + fast_exp_poly(w)
            h_ref[j] = acc
            y_ref[j] = x_ref[j]

    def run(x, dt, Bc, Cc):
        grid = (B // group, L // chunk)
        seq_d = pl.BlockSpec((group, chunk, D), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM)
        seq_n = pl.BlockSpec((group, chunk, N), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, L, D), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((N, 1), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
                seq_d, seq_d, seq_n, seq_n,
            ],
            out_specs=seq_d,
            scratch_shapes=[pltpu.VMEM((group, N, D), jnp.float32)],
        )(a_col, x, dt, Bc, Cc)

    return run


def make_block_fused(chunk, group, mode):
    """Static-unroll block kernels with fewer VMEM passes.

    suy: batched dec+U precompute; chain keeps h in registers and emits y
         rows via per-step MXU dots (no hseq writes, no y reduce pass).
    sud: batched dec precompute only; dbx outer + y emitted per step as MXU
         dots (the round-1 kernel with exp hoisted out of the chain).
    """

    def kernel(a_ref, x_ref, dt_ref, b_ref, c_ref, y_ref, h_ref, dec_ref, w_ref):
        ci = pl.program_id(1)

        @pl.when(ci == 0)
        def _():
            h_ref[:] = jnp.zeros_like(h_ref)

        a_row = a_ref[:].reshape(1, N, 1)
        for j in range(group):
            dt_j = dt_ref[j]
            x_j = x_ref[j]
            dec_ref[j] = jnp.exp(a_row * dt_j[:, None, :])
            if mode == "suy":
                w_ref[j] = b_ref[j][:, :, None] * (dt_j * x_j)[:, None, :]
                h = h_ref[j]
                for t in range(chunk):
                    h = dec_ref[j, t] * h + w_ref[j, t]
                    y_ref[j, pl.ds(t, 1), :] = jax.lax.dot_general(
                        c_ref[j, pl.ds(t, 1), :], h, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                h_ref[j] = h
            else:  # sud
                h = h_ref[j]
                for t in range(chunk):
                    v_t = dt_ref[j, pl.ds(t, 1), :] * x_ref[j, pl.ds(t, 1), :]
                    dbx = jax.lax.dot_general(
                        b_ref[j, pl.ds(t, 1), :], v_t, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    h = dec_ref[j, t] * h + dbx
                    y_ref[j, pl.ds(t, 1), :] = jax.lax.dot_general(
                        c_ref[j, pl.ds(t, 1), :], h, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                h_ref[j] = h

    def run(x, dt, Bc, Cc):
        grid = (B // group, L // chunk)
        seq_d = pl.BlockSpec((group, chunk, D), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM)
        seq_n = pl.BlockSpec((group, chunk, N), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, L, D), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((N, 1), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
                seq_d, seq_d, seq_n, seq_n,
            ],
            out_specs=seq_d,
            scratch_shapes=[
                pltpu.VMEM((group, N, D), jnp.float32),
                pltpu.VMEM((group, chunk, N, D), jnp.float32),
                pltpu.VMEM((group, chunk, N, D), jnp.float32),
            ],
        )(a_col, x, dt, Bc, Cc)

    return run


if __name__ == "__main__":
    main()
