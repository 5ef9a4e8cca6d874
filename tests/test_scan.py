"""Selective-scan equivalence tests (SURVEY.md §4: kernel-level tier tests).

The sequential lax.scan tier is the semantic oracle (reference
ssm.py:158-168); parallel (associative_scan) and Pallas tiers must match
it, and all must match the reference torch implementation when available.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from velocity_asr_tpu.ops.scan import (
    selective_scan_parallel,
    selective_scan_sequential,
)
from velocity_asr_tpu.ops.scan_pallas import selective_scan_pallas


def make_inputs(batch=2, length=37, d_inner=16, state_dim=8, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((batch, length, d_inner), dtype=np.float32)
    dt = np.abs(rng.standard_normal((batch, length, d_inner), dtype=np.float32)) * 0.5
    A = -np.exp(np.log(np.arange(1, state_dim + 1, dtype=np.float32)))
    B = rng.standard_normal((batch, length, state_dim), dtype=np.float32)
    C = rng.standard_normal((batch, length, state_dim), dtype=np.float32)
    D = rng.standard_normal((d_inner,), dtype=np.float32)
    return tuple(jnp.asarray(v) for v in (x, dt, A, B, C, D))


def test_parallel_matches_sequential():
    args = make_inputs()
    y_seq = selective_scan_sequential(*args)
    y_par = selective_scan_parallel(*args)
    np.testing.assert_allclose(y_seq, y_par, rtol=1e-5, atol=1e-5)


def test_pallas_matches_sequential():
    args = make_inputs(length=300, d_inner=32, state_dim=8)
    y_seq = selective_scan_sequential(*args)
    y_pal = selective_scan_pallas(*args, chunk=128)
    np.testing.assert_allclose(y_seq, y_pal, rtol=1e-5, atol=1e-5)


def test_pallas_chunk_boundary_carry():
    # Length an exact multiple of chunk, and not.
    for length in (128, 256, 130):
        args = make_inputs(length=length, d_inner=16, state_dim=4, seed=length)
        y_seq = selective_scan_sequential(*args)
        y_pal = selective_scan_pallas(*args, chunk=128)
        np.testing.assert_allclose(y_seq, y_pal, rtol=1e-5, atol=1e-5)


def test_pallas_gradient_matches_parallel():
    args = make_inputs(length=64, d_inner=8, state_dim=4)

    def loss_pal(x, dt, A, B, C, D):
        return jnp.sum(selective_scan_pallas(x, dt, A, B, C, D, chunk=32) ** 2)

    def loss_par(x, dt, A, B, C, D):
        return jnp.sum(selective_scan_parallel(x, dt, A, B, C, D) ** 2)

    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_par = jax.grad(loss_par, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for a, b in zip(g_pal, g_par):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_pallas_gradient_multichunk():
    # length spans multiple TRAIN_CHUNK backward chunks, with padding
    args = make_inputs(batch=2, length=150, d_inner=16, state_dim=8, seed=9)

    def loss_pal(*a):
        return jnp.sum(jnp.sin(selective_scan_pallas(*a)))

    def loss_par(*a):
        from velocity_asr_tpu.ops.scan import selective_scan_parallel

        return jnp.sum(jnp.sin(selective_scan_parallel(*a)))

    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_par = jax.grad(loss_par, argnums=(0, 1, 2, 3, 4, 5))(*args)
    names = ["dx", "ddt", "dA", "dB", "dC", "dD"]
    for name, a, b in zip(names, g_pal, g_par):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4, err_msg=name)


def test_matches_torch_reference(torch_reference):
    import torch

    args = make_inputs(batch=2, length=50, d_inner=24, state_dim=6)
    x, dt, A, B, C, D = (np.asarray(a) for a in args)

    ssm = torch_reference.SelectiveSSM(d_model=12, state_dim=6, expand_ratio=2)
    with torch.no_grad():
        y_ref = ssm._sequential_scan(
            torch.from_numpy(x),
            torch.from_numpy(dt),
            torch.from_numpy(A),
            torch.from_numpy(B),
            torch.from_numpy(C),
        )
        # reference adds x * self.D with its own D; replicate with ours
        y_ref = y_ref - torch.from_numpy(x) * ssm.D + torch.from_numpy(x * D)

    y = selective_scan_sequential(*(jnp.asarray(v) for v in (x, dt, A, B, C, D)))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), rtol=1e-4, atol=1e-4)


def test_pallas_state_carry_matches_sequential():
    """Pallas tier h0/return_state (streaming contract): chunked evaluation
    with carried state must equal the full-length oracle exactly."""
    x, dt, A, B, C, D = make_inputs(length=100, d_inner=32, state_dim=8)
    y_full, h_full = selective_scan_sequential(
        x, dt, A, B, C, D, return_state=True
    )
    s = 37  # non-multiple of the kernel chunk: exercises padding exactness
    y1, h1 = selective_scan_pallas(
        x[:, :s], dt[:, :s], A, B[:, :s], C[:, :s], D,
        chunk=16, return_state=True,
    )
    y2, h2 = selective_scan_pallas(
        x[:, s:], dt[:, s:], A, B[:, s:], C[:, s:], D,
        chunk=16, h0=h1, return_state=True,
    )
    y_cat = jnp.concatenate([y1, y2], axis=1)
    np.testing.assert_allclose(y_cat, y_full, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(h2, h_full, rtol=1e-5, atol=1e-5)


def test_pallas_h0_only_and_state_only():
    """h0 without return_state and return_state without h0 both work."""
    x, dt, A, B, C, D = make_inputs(length=48, d_inner=16, state_dim=8, seed=3)
    _, h = selective_scan_sequential(x, dt, A, B, C, D, return_state=True)
    y_ref = selective_scan_sequential(x, dt, A, B, C, D, h0=h)
    y_pal = selective_scan_pallas(x, dt, A, B, C, D, chunk=16, h0=h)
    np.testing.assert_allclose(y_pal, y_ref, rtol=1e-5, atol=1e-5)

    y_ref2, h_ref2 = selective_scan_sequential(x, dt, A, B, C, D, return_state=True)
    y_pal2, h_pal2 = selective_scan_pallas(
        x, dt, A, B, C, D, chunk=16, return_state=True
    )
    np.testing.assert_allclose(y_pal2, y_ref2, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(h_pal2, h_ref2, rtol=1e-5, atol=1e-5)


def test_pallas_stateful_gradient_matches_sequential():
    """Gradients through the stateful kernel path (h0 in, h_final out) —
    the streaming-aware training graph differentiates a chain of these.
    Checks dx/ddt/dA/dB/dC/dD AND dh0, with a loss that uses both outputs
    (so the h_final cotangent seeds the adjoint chain)."""
    x, dt, A, B, C, D = make_inputs(length=50, d_inner=16, state_dim=8, seed=5)
    rng = np.random.default_rng(6)
    h0 = jnp.asarray(rng.standard_normal((2, 16, 8)), jnp.float32)

    def loss(fn):
        def f(x, dt, A, B, C, D, h0):
            y, h = fn(x, dt, A, B, C, D, h0=h0, return_state=True)
            return jnp.sum(jnp.sin(y)) + jnp.sum(h ** 2)
        return f

    def pal(x, dt, A, B, C, D, h0, return_state):
        return selective_scan_pallas(
            x, dt, A, B, C, D, chunk=16, h0=h0, return_state=return_state
        )

    args = (x, dt, A, B, C, D, h0)
    g_pal = jax.grad(loss(pal), argnums=tuple(range(7)))(*args)
    g_seq = jax.grad(loss(selective_scan_sequential), argnums=tuple(range(7)))(*args)
    names = ["dx", "ddt", "dA", "dB", "dC", "dD", "dh0"]
    for name, a, b in zip(names, g_pal, g_seq):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4, err_msg=name)


def test_pallas_chained_stateful_gradient():
    """Two chained stateful calls (chunked streaming training) back-prop the
    same as one full-length differentiable scan."""
    x, dt, A, B, C, D = make_inputs(length=64, d_inner=8, state_dim=4, seed=7)
    s = 32

    def loss_chunked(x, dt, A, B, C, D):
        y1, h1 = selective_scan_pallas(
            x[:, :s], dt[:, :s], A, B[:, :s], C[:, :s], D,
            chunk=16, return_state=True,
        )
        y2 = selective_scan_pallas(
            x[:, s:], dt[:, s:], A, B[:, s:], C[:, s:], D, chunk=16, h0=h1
        )
        return jnp.sum(jnp.sin(jnp.concatenate([y1, y2], axis=1)))

    def loss_full(x, dt, A, B, C, D):
        return jnp.sum(jnp.sin(selective_scan_parallel(x, dt, A, B, C, D)))

    g_c = jax.grad(loss_chunked, argnums=(0, 1, 2, 3, 4, 5))(x, dt, A, B, C, D)
    g_f = jax.grad(loss_full, argnums=(0, 1, 2, 3, 4, 5))(x, dt, A, B, C, D)
    for name, a, b in zip(["dx", "ddt", "dA", "dB", "dC", "dD"], g_c, g_f):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4, err_msg=name)
