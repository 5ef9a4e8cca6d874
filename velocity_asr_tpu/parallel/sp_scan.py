"""Sequence-parallel selective scan over a device mesh.

Shards the TIME axis across devices (sequence/context parallelism — absent
in the reference, whose only length-scaling device was the algorithmic
linear-time scan; SURVEY.md §2.4). The recurrence is associative, so:

  1. each device runs a local associative scan over its time shard,
     keeping both the cumulative decay A_cum and the carry-free state;
  2. the per-shard summaries (A_cum[-1], h[-1]) are exchanged with one
     all_gather (tiny: (d_inner, state_dim) per device) and combined into
     each shard's incoming state by an exclusive scan over devices;
  3. each device corrects its local states: h[t] += A_cum[t] * h_in.

Collectives are XLA-emitted over ICI (shard_map + all_gather); there is no
user-level communication code.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

# Ambient sequence-parallel context consulted by ops.scan.selective_scan
# when scan_mode == "sp". Set at trace time (a Python-level static), so it
# must wrap the first call of any jitted function that should shard its
# scans over time. Thread-local: a concurrent thread (e.g. a serve worker)
# tracing outside the with-block sees no context — and raises — rather
# than silently inheriting another thread's mesh. A retrace triggered
# after the context exits (e.g. a new shape bucket) raises the same
# ValueError: enter sequence_parallel around every call that may compile.
_SP_TLS = threading.local()


@contextlib.contextmanager
def sequence_parallel(mesh: Mesh, axis: str = "data"):
    """Route all `scan_mode="sp"` selective scans through the time-sharded
    mesh implementation while active.

    This is the user-reachable sequence-parallel switch (SURVEY.md §2.4):
    build a model with ``scan_mode="sp"`` and wrap forward/jit calls in
    ``with sequence_parallel(mesh):``. The context is read when the
    function is TRACED — wrap the first (compiling) call; already-compiled
    executables keep whatever mode they were traced with. The context is
    per-thread (see _SP_TLS).
    """
    prev = getattr(_SP_TLS, "ctx", None)
    _SP_TLS.ctx = (mesh, axis)
    try:
        yield
    finally:
        _SP_TLS.ctx = prev


def current_sequence_parallel() -> Optional[Tuple[Mesh, str]]:
    """The active (mesh, axis) set by `sequence_parallel`, or None."""
    return getattr(_SP_TLS, "ctx", None)


def _local_scan_with_cum(x, dt, A, B):
    """Local associative scan returning (A_cum[t], h_nocarry[t])."""
    dA = jnp.exp(dt[..., None] * A)  # (b, l, d, n)
    dBx = (dt * x)[..., None] * B[:, :, None, :]

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_r * a_l, a_r * b_l + b_r

    return jax.lax.associative_scan(combine, (dA, dBx), axis=1)


def selective_scan_sequence_parallel(
    x: jnp.ndarray,
    dt: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    D: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
) -> jnp.ndarray:
    """Selective scan with the time axis sharded over `axis`.

    Args match ops.scan.selective_scan_sequential; L must divide evenly by
    the mesh axis size. Exact (not an approximation): per-shard scans plus
    a carry exchange reproduce the full-sequence recurrence.
    """

    def shard_fn(x_s, dt_s, A_, B_s, C_s, D_):
        idx = jax.lax.axis_index(axis)
        n_dev = jax.lax.axis_size(axis)

        a_cum, h_local = _local_scan_with_cum(x_s, dt_s, A_, B_s)

        # Exchange per-shard summaries: (batch, d, n) each.
        a_last = a_cum[:, -1]
        h_last = h_local[:, -1]
        # One collective for the (a, h) pair — all_gather takes a pytree.
        a_all, h_all = jax.lax.all_gather((a_last, h_last), axis)  # (n_dev, b, d, n)

        # Exclusive combine over devices 0..idx-1 -> incoming state h_in.
        # Only the state component is needed: the decay product is already
        # folded into h_in by the repeated a_i multiplication.
        def step(h_in, inputs):
            a_i, h_i, i = inputs
            take = i < idx
            # state_in = a_i * state_in + h_i for i < idx
            return jnp.where(take, a_i * h_in + h_i, h_in), None

        b, d, n = h_last.shape
        init = jnp.zeros((b, d, n), h_last.dtype)
        # the combined carry varies per device (depends on axis_index)
        init = jax.lax.pcast(init, (axis,), to="varying")
        h_in, _ = jax.lax.scan(step, init, (a_all, h_all, jnp.arange(n_dev)))

        h = h_local + a_cum * h_in[:, None]
        y = jnp.einsum("bldn,bln->bld", h, C_s) + x_s * D_
        return y

    spec_t = P(None, axis, None)
    spec_rep = P()
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec_t, spec_t, spec_rep, spec_t, spec_t, spec_rep),
        out_specs=spec_t,
    )
    return fn(x, dt, A, B, C, D)


def selective_scan_sp_padded(x, dt, A, B, C, D, mesh: Mesh, axis: str = "data"):
    """`selective_scan_sequence_parallel` for arbitrary L.

    Pads the time axis to a multiple of the mesh axis size with identity
    recurrence steps (dt=0 -> dA=exp(0)=1, dBx=0: the state passes through
    unchanged) and slices the padding back off — so model code can shard
    any sequence length without divisibility bookkeeping.
    """
    n_dev = mesh.shape[axis]
    L = x.shape[1]
    pad = (-L) % n_dev
    if pad:
        pad_t = lambda a: jnp.pad(a, ((0, 0), (0, pad), (0, 0)))
        x, dt, B, C = pad_t(x), pad_t(dt), pad_t(B), pad_t(C)
    y = selective_scan_sequence_parallel(x, dt, A, B, C, D, mesh, axis)
    return y[:, :L] if pad else y
