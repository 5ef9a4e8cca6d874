"""Hardware numerics verification for every Pallas kernel.

The CPU test suite runs Pallas in interpret mode, which does NOT catch
Mosaic lowering issues — e.g. fp32 dot_general evaluating at bf16-grade
MXU precision unless precision=HIGHEST is passed (this silently broke the
round-1 scan kernels on hardware while all 108 CPU tests stayed green).

This tool runs each kernel ON THE REAL BACKEND against its jax-level
oracle and fails loudly on divergence. bench.py calls verify_all() before
timing anything, so benchmark numbers are only ever reported for kernels
that are numerically correct on the hardware they ran on.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _check(name, got, want, atol, rtol):
    got, want = np.asarray(got), np.asarray(want)
    err = np.abs(got - want)
    tol = atol + rtol * np.abs(want)
    worst = float((err / np.maximum(tol, 1e-30)).max())
    ok = bool((err <= tol).all())
    print(f"  {name:32s} max_abs={err.max():.3e}  worst_tol_ratio={worst:.2f}  "
          f"{'OK' if ok else 'FAIL'}", file=sys.stderr)
    return ok


def verify_scan(batch=4, length=512, d_inner=384, state_dim=64, seed=0):
    """Pallas selective scan fwd + grads vs the lax.scan oracle."""
    from velocity_asr_tpu.ops.scan import selective_scan_sequential
    from velocity_asr_tpu.ops.scan_pallas import selective_scan_pallas

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((batch, length, d_inner)).astype(np.float32))
    dt = jnp.asarray((np.abs(rng.standard_normal((batch, length, d_inner))) * 0.4
                      ).astype(np.float32))
    A = -jnp.exp(jnp.asarray(np.log(np.arange(1, state_dim + 1)).astype(np.float32)))
    B = jnp.asarray(rng.standard_normal((batch, length, state_dim)).astype(np.float32))
    C = jnp.asarray(rng.standard_normal((batch, length, state_dim)).astype(np.float32))
    D = jnp.asarray(rng.standard_normal((d_inner,)).astype(np.float32))

    ok = _check(
        "scan forward",
        selective_scan_pallas(x, dt, A, B, C, D),
        selective_scan_sequential(x, dt, A, B, C, D),
        atol=1e-4, rtol=1e-4,
    )

    def loss_pal(*args):
        return jnp.sum(selective_scan_pallas(*args) ** 2)

    def loss_seq(*args):
        return jnp.sum(selective_scan_sequential(*args) ** 2)

    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4, 5))(x, dt, A, B, C, D)
    g_seq = jax.grad(loss_seq, argnums=(0, 1, 2, 3, 4, 5))(x, dt, A, B, C, D)
    for name, gp, gs in zip(["dx", "ddt", "dA", "dB", "dC", "dD"], g_pal, g_seq):
        # gradient magnitudes scale with L; tolerate rtol-dominated error
        ok &= _check(f"scan grad {name}", gp, gs, atol=5e-3, rtol=5e-4)
    return ok


def verify_mel(seed=0):
    """Fused Pallas mel kernel vs the host numpy oracle."""
    from velocity_asr_tpu.audio import compute_mel_spectrogram, compute_mel_spectrogram_np

    rng = np.random.default_rng(seed)
    audio = rng.standard_normal(16000 * 3).astype(np.float32) * 0.2
    got = compute_mel_spectrogram(jnp.asarray(audio), backend="pallas")
    want = compute_mel_spectrogram_np(audio)
    return _check("mel spectrogram", got, want, atol=5e-3, rtol=5e-3)


def verify_all() -> bool:
    print(f"Pallas hardware numerics check (backend={jax.default_backend()}):",
          file=sys.stderr)
    ok = verify_scan()
    ok &= verify_mel()
    print("numerics:", "ALL OK" if ok else "FAILURES DETECTED", file=sys.stderr)
    return ok


if __name__ == "__main__":
    sys.exit(0 if verify_all() else 1)
