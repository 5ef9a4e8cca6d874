#!/usr/bin/env python3
"""Smoke test (reference test_vel.py:1-55): import, build the default
model, check parameter count, run a forward pass, greedy-decode."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from velocity_asr_tpu.utils.platform import apply_platform_env

# Honor an explicit JAX_PLATFORMS override (e.g. JAX_PLATFORMS=cpu for a
# quick check while the TPU is busy), like every CLI in scripts/ does.
apply_platform_env()


def main() -> int:
    print("=" * 60)
    print("VELOCITY-ASR TPU smoke test")
    print("=" * 60)

    try:
        import jax
        import jax.numpy as jnp

        import velocity_asr_tpu as va

        print(f"[ok] imports (velocity_asr_tpu {va.__version__}, jax {jax.__version__})")
        print(f"     devices: {jax.devices()}")
    except Exception as e:
        print(f"[FAIL] imports: {e}")
        return 1

    try:
        # pallas scan + bf16 on TPU keeps first-compile time low; the
        # parameter count is identical to the reference default config.
        scan = "pallas" if jax.default_backend() == "tpu" else "parallel"
        dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
        model = va.create_model(va.VelocityASRConfig(scan_mode=scan, dtype=dtype))
        params = va.init_params(model, jax.random.PRNGKey(0), example_frames=64)
        n = va.count_parameters(params)
        print(f"[ok] model built: {n:,} parameters")
        assert n == 6_172_696, n  # measured on the reference default config
    except Exception as e:
        print(f"[FAIL] model build: {e}")
        return 1

    try:
        mel = jax.random.normal(jax.random.PRNGKey(1), (2, 500, 80))
        logits = va.forward(model, params, mel)
        assert logits.shape == (2, 250, 1000), logits.shape
        print(f"[ok] forward: (2, 500, 80) -> {logits.shape}")
    except Exception as e:
        print(f"[FAIL] forward: {e}")
        return 1

    try:
        decoder = va.CTCDecoder(va.create_default_vocabulary(1000))
        texts = decoder.decode_greedy(logits)
        print(f"[ok] greedy decode: {len(texts)} transcripts")
    except Exception as e:
        print(f"[FAIL] decode: {e}")
        return 1

    print("=" * 60)
    print("All smoke tests passed.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
