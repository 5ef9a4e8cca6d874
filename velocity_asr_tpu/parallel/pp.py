"""Pipeline parallelism over the local SSM stack.

GPipe-style microbatch pipeline, TPU-native: the LocalSSMProcessor's L
homogeneous SSMBlocks are split into S contiguous stages (S = the mesh
axis size); each device holds its stage's stacked block parameters and
microbatch activations flow stage-to-stage over ICI via
``lax.ppermute`` inside one ``shard_map``. There is no user-level
communication code and no scheduler thread — the whole pipeline
(ramp-up, steady state, drain) is one traced loop XLA compiles into a
static schedule.

The reference has no pipeline (or any) parallelism — its `distributed:`
config stanza is dead code (/root/reference/configs/train.yaml:87-91).
This is the net-new §2.4 axis alongside data/tensor/sequence
parallelism.

Semantics
---------
- Exact: the pipelined forward equals the sequential layer loop
  (stages slice the same parameter values; ppermute/psum move but never
  transform activations). Enforced by tests/test_pp.py.
- Differentiable: ppermute's transpose is the reverse permute, so one
  ``jax.grad`` through ``pipeline_blocks`` yields exactly the
  sequential gradients — the backward pipeline runs in the same traced
  loop, reversed.
- Bubble fraction is (S-1)/(M+S-1) for M microbatches; M defaults to S
  (and is clamped to a divisor of the batch). At this model's 6M-param
  scale the win is validation of the axis, not HBM relief — params stay
  replicated and each stage slices its share inside the step (one cheap
  device-local gather), which keeps the checkpoint format and optimizer
  untouched.

Usage
-----
    with pipeline_parallel(mesh, microbatches=4):
        logits = jax.jit(forward)(params, mel)   # traced under the ctx

Like `sequence_parallel` (sp_scan.py), the context is consulted at
TRACE time and is thread-local: wrap every call that may (re)compile.
The Trainer does this automatically when
``TrainingConfig.num_pipeline_stages > 1``.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import MODEL_AXIS

_PP_TLS = threading.local()


@contextlib.contextmanager
def pipeline_parallel(
    mesh: Mesh, axis: str = MODEL_AXIS, microbatches: Optional[int] = None
):
    """Route LocalSSMProcessor's block stack through the stage pipeline
    while active (offline paths only; streaming/stateful calls keep the
    sequential loop — their chunks are too small to pipeline).

    Read at trace time, per-thread (see module docstring); enter it
    around every call that may compile.
    """
    prev = getattr(_PP_TLS, "ctx", None)
    _PP_TLS.ctx = (mesh, axis, microbatches)
    try:
        yield
    finally:
        _PP_TLS.ctx = prev


def current_pipeline_parallel() -> Optional[Tuple[Mesh, str, Optional[int]]]:
    """The active (mesh, axis, microbatches) set by `pipeline_parallel`."""
    return getattr(_PP_TLS, "ctx", None)


def _resolve_microbatches(batch: int, stages: int, requested: Optional[int]) -> int:
    """Largest feasible microbatch count <= requested (default: stages).

    Clamped to the batch size and reduced to a divisor of it so every
    microbatch has a static, equal shape (XLA needs one stage graph).
    """
    m = min(requested or stages, batch)
    while batch % m:
        m -= 1
    return m


def pipeline_blocks(
    block_apply: Callable,
    layer_params: List,
    x: jnp.ndarray,
    *,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
    microbatches: Optional[int] = None,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Run a stack of homogeneous blocks as an S-stage microbatch pipeline.

    Args:
      block_apply: ``(one_layer_params, h, rng_or_None) -> h`` applying a
        single block functionally. Must be shape-preserving and identical
        for every layer (the stage body is one lax.scan over its layers).
      layer_params: per-layer parameter pytrees, in application order.
      x: (batch, time, d_model) activations, replicated over `axis`.
      mesh/axis: pipeline mesh axis; its size S must divide len(layer_params).
      microbatches: microbatch count M (default S), clamped to a divisor
        of batch. M >= S hides the pipeline bubble.
      rng: optional dropout key; folded per (tick, global layer) so every
        layer x microbatch application draws an independent stream.

    Returns activations after all layers, replicated over `axis`.
    """
    num_layers = len(layer_params)
    stages = mesh.shape[axis]
    if num_layers % stages:
        raise ValueError(
            f"pipeline axis '{axis}' has {stages} stages which must divide "
            f"the {num_layers}-layer stack"
        )
    per_stage = num_layers // stages
    batch, t_len, d_model = x.shape
    m_count = _resolve_microbatches(batch, stages, microbatches)
    mb = batch // m_count

    # (S, per_stage, ...) parameter stack; shard_map splits dim 0 across
    # stages. Stacking happens inside the surrounding jit, so gradients
    # flow back to the per-layer tree (unstack = slice transpose).
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves).reshape(
            (stages, per_stage) + leaves[0].shape
        ),
        *layer_params,
    )
    x_mb = x.reshape(m_count, mb, t_len, d_model)
    key = rng if rng is not None else jax.random.PRNGKey(0)
    use_rng = rng is not None

    def stage_fn(stage_params, mb_stream, k):
        # stage_params leaves arrive (1, per_stage, ...): local shard of
        # the stage dim. mb_stream/k are replicated.
        stage_params = jax.tree_util.tree_map(lambda a: a[0], stage_params)
        sid = jax.lax.axis_index(axis)
        vary = lambda v: jax.lax.pcast(v, (axis,), to="varying")  # noqa: E731
        k = vary(k)

        def run_stage(h, tick):
            def layer_step(h, xs):
                i, p = xs
                r = (
                    jax.random.fold_in(k, tick * 100003 + sid * per_stage + i)
                    if use_rng
                    else None
                )
                return block_apply(p, h, r), None

            h, _ = jax.lax.scan(
                layer_step, h, (jnp.arange(per_stage), stage_params)
            )
            return h

        buf = vary(jnp.zeros((mb, t_len, d_model), x.dtype))
        out = vary(jnp.zeros((m_count, mb, t_len, d_model), x.dtype))
        perm = [(i, (i + 1) % stages) for i in range(stages)]
        for tick in range(m_count + stages - 1):
            # Stage 0 feeds microbatch `tick` (last one re-fed during the
            # drain; its output is never collected). Later stages consume
            # the ppermuted upstream activation.
            feed = vary(mb_stream[min(tick, m_count - 1)])
            h = jnp.where(sid == 0, feed, buf)
            h = run_stage(h, tick)
            j = tick - (stages - 1)
            if 0 <= j < m_count:
                out = out.at[j].set(h)
            if tick < m_count + stages - 2:
                buf = jax.lax.ppermute(h, axis, perm)
        # Only the last stage's collection is the pipeline output; the
        # masked psum is also what proves replication to shard_map.
        out = jax.lax.psum(
            jnp.where(sid == stages - 1, out, jnp.zeros_like(out)), axis
        )
        return out.reshape(batch, t_len, d_model)

    fn = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(),
    )
    return fn(stacked, x_mb, key)
