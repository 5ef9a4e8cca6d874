"""Decompose the scan kernel's per-step cost: full vs no-exp vs no-dots
vs recurrence-only (dev tool; run on TPU)."""
import time, sys, numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
B, L, D, N = 8, 1504, 384, 64
CH = 128
GROUP, UNROLL = 4, 4
x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
dt = jnp.asarray((np.abs(rng.standard_normal((B, L, D)))*0.4).astype(np.float32))
A = -jnp.exp(jnp.log(jnp.arange(1, N+1, dtype=jnp.float32)))
Bc = jnp.asarray(rng.standard_normal((B, L, N)).astype(np.float32))
Cc = jnp.asarray(rng.standard_normal((B, L, N)).astype(np.float32))
a_col = A.reshape(N,1)

def make(variant):
    def kernel(a_ref, x_ref, dt_ref, b_ref, c_ref, y_ref, h_ref):
        ci = pl.program_id(1)
        @pl.when(ci == 0)
        def _(): h_ref[:] = jnp.zeros_like(h_ref)
        a = a_ref[:]
        tc = x_ref.shape[1]
        def step(k, hs):
            for u in range(UNROLL):
                t = k*UNROLL + u
                new = []
                for j in range(GROUP):
                    h = hs[j]
                    dt_t = dt_ref[j, pl.ds(t,1), :]
                    x_t = x_ref[j, pl.ds(t,1), :]
                    b_t = b_ref[j, pl.ds(t,1), :]
                    c_t = c_ref[j, pl.ds(t,1), :]
                    if variant == "noexp":
                        decay = a * dt_t
                    else:
                        decay = jnp.exp(a * dt_t)
                    if variant == "nodots":
                        h = decay*h + dt_t*x_t  # broadcast add instead of outer
                        y_t = jnp.sum(h, axis=0, keepdims=True)
                    else:
                        dbx = jax.lax.dot_general(b_t, dt_t*x_t, (((0,),(0,)),((),())), preferred_element_type=jnp.float32)
                        h = decay*h + dbx
                        y_t = jax.lax.dot_general(c_t, h, (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
                    if variant == "nowrite":
                        pass
                    else:
                        y_ref[j, pl.ds(t,1), :] = y_t
                    new.append(h)
                hs = tuple(new)
            return hs
        hs = tuple(h_ref[j] for j in range(GROUP))
        hs = jax.lax.fori_loop(0, tc//UNROLL, step, hs)
        for j in range(GROUP):
            y_ref[j, 0:1, :] = hs[j][0:1]  # keep live
            h_ref[j] = hs[j]
    def run(x, dt, Bc, Cc):
        grid = (B//GROUP, L//CH)
        return pl.pallas_call(kernel,
            out_shape=jax.ShapeDtypeStruct((B, L, D), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((N,1), lambda b,c:(0,0), memory_space=pltpu.VMEM),
                pl.BlockSpec((GROUP,CH,D), lambda b,c:(b,c,0), memory_space=pltpu.VMEM),
                pl.BlockSpec((GROUP,CH,D), lambda b,c:(b,c,0), memory_space=pltpu.VMEM),
                pl.BlockSpec((GROUP,CH,N), lambda b,c:(b,c,0), memory_space=pltpu.VMEM),
                pl.BlockSpec((GROUP,CH,N), lambda b,c:(b,c,0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((GROUP,CH,D), lambda b,c:(b,c,0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((GROUP,N,D), jnp.float32)],
        )(a_col, x, dt, Bc, Cc)
    return run

REP=16
for variant in sys.argv[1:] or ["full", "noexp", "nodots", "nowrite"]:
    run = make(variant)
    def f(x, dt, Bc, Cc):
        def body(carry, _):
            return run(carry, dt, Bc, Cc)*1e-3, None
        out,_ = jax.lax.scan(body, x, None, length=REP)
        return jnp.sum(out)
    g = jax.jit(f)
    np.asarray(g(x,dt,Bc,Cc))
    t0=time.perf_counter()
    outs=[g(x,dt,Bc,Cc) for _ in range(5)]
    for o in outs: np.asarray(o)
    print(f"{variant}: {(time.perf_counter()-t0)/5/REP*1000:.2f} ms/layer", flush=True)
