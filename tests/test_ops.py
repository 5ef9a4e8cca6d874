"""Conv and pooling op parity tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from velocity_asr_tpu.ops.conv import causal_depthwise_conv1d, strided_conv1d
from velocity_asr_tpu.ops.pooling import (
    adaptive_avg_pool1d,
    pool_size_level1,
    pool_size_level2,
)


def test_pool_size_rules():
    # Reference attention.py:37-44.
    assert pool_size_level1(500) == 64
    assert pool_size_level1(1000) == 125
    assert pool_size_level1(40) == 40  # clamped to L
    assert pool_size_level2(64) == 16
    assert pool_size_level2(125) == 31
    assert pool_size_level2(600) == 64


def test_adaptive_pool_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    for L, K in [(250, 64), (125, 31), (100, 17), (64, 64)]:
        x = rng.standard_normal((2, L, 8), dtype=np.float32)
        ours = np.asarray(adaptive_avg_pool1d(jnp.asarray(x), K))
        ref = (
            F.adaptive_avg_pool1d(torch.from_numpy(x).transpose(1, 2), K)
            .transpose(1, 2)
            .numpy()
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_causal_depthwise_conv_matches_torch():
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(1)
    d, k, L = 6, 4, 20
    x = rng.standard_normal((2, L, d), dtype=np.float32)
    w = rng.standard_normal((d, 1, k), dtype=np.float32)
    b = rng.standard_normal((d,), dtype=np.float32)

    conv = torch.nn.Conv1d(d, d, k, padding=k - 1, groups=d)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.copy_(torch.from_numpy(b))
        # Reference SSMBlock conv: pad k-1 both sides, truncate right
        # (ssm.py:377-383, 411-413).
        ref = conv(torch.from_numpy(x).transpose(1, 2))[:, :, :L].transpose(1, 2).numpy()

    kernel = jnp.asarray(w.transpose(2, 1, 0)[:, 0, :])  # (k, d)
    ours = np.asarray(causal_depthwise_conv1d(jnp.asarray(x), kernel, jnp.asarray(b)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_strided_conv_matches_torch():
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(2)
    cin, cout, k, L = 5, 7, 3, 21
    x = rng.standard_normal((2, L, cin), dtype=np.float32)
    w = rng.standard_normal((cout, cin, k), dtype=np.float32)
    b = rng.standard_normal((cout,), dtype=np.float32)

    conv = torch.nn.Conv1d(cin, cout, k, stride=2, padding=1)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.copy_(torch.from_numpy(b))
        ref = conv(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()

    kernel = jnp.asarray(w.transpose(2, 1, 0))  # (k, cin, cout)
    ours = np.asarray(
        strided_conv1d(jnp.asarray(x), kernel, jnp.asarray(b), stride=2, padding=1)
    )
    assert ours.shape == ((2, (L + 1) // 2, cout))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_adaptive_pool_matrix_is_immutable():
    """lru_cache shares one ndarray across callers: in-place writes must
    raise instead of silently corrupting every future pool of that shape."""
    import numpy as np
    import pytest

    from velocity_asr_tpu.ops.pooling import adaptive_pool_matrix

    mat = adaptive_pool_matrix(100, 10)
    with pytest.raises(ValueError):
        mat[0, 0] = 42.0
    np.testing.assert_allclose(adaptive_pool_matrix(100, 10).sum(axis=1),
                               np.ones(10), rtol=1e-6)
