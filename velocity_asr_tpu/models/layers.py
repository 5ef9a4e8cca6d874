"""Front-end and output layers (reference model.py:71-239)."""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import strided_conv1d


def xavier_uniform():
    """Matches torch nn.init.xavier_uniform_ (reference model.py:309)."""
    return nn.initializers.xavier_uniform()


def quant_mode(qat: bool, int8: bool) -> str:
    """The three-way projection mode: "qat" | "int8" | "none"."""
    return "qat" if qat else ("int8" if int8 else "none")


def quant_dense(mode: str, features: int, dtype, name: str, use_bias: bool = True,
                static: bool = False, qat_bits=(8, 8)):
    """Projection factory: fp32 Dense, QAT fake-quant Dense, or INT8 Dense
    (mode in {"none", "qat", "int8"}; static selects calibrated activation
    scales on the int8 path — the ORT quantize_static analog). The single
    dispatch point for every quantizable projection (attention, fusion,
    pooling, CTC head) so quantization plumbing can't drift per call site.
    """
    if mode == "qat":
        from ..quantize import QuantDense

        return QuantDense(
            features, use_bias=use_bias, kernel_init=xavier_uniform(), dtype=dtype,
            weight_bits=qat_bits[0], activation_bits=qat_bits[1], name=name
        )
    if mode == "int8":
        from ..quantize import DynamicInt8Dense

        return DynamicInt8Dense(
            features, use_bias=use_bias, kernel_init=xavier_uniform(), dtype=dtype,
            static=static, name=name
        )
    return nn.Dense(
        features, use_bias=use_bias, kernel_init=xavier_uniform(), dtype=dtype, name=name
    )


def kaiming_conv_init():
    """kaiming_normal_(mode='fan_out', nonlinearity='relu') for conv kernels
    (reference model.py:312-313). For a kernel of shape (k, in, out),
    fan_out = out * k, std = sqrt(2 / fan_out)."""

    def init(key, shape, dtype=jnp.float32):
        receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
        fan_out = shape[-1] * receptive
        std = math.sqrt(2.0 / fan_out)
        return jax.random.normal(key, shape, dtype) * std

    return init


def sinusoidal_time_encoding(max_len: int, dim: int) -> np.ndarray:
    """Fixed sinusoidal table (reference model.py:93-101), shape (max_len, dim)."""
    pe = np.zeros((max_len, dim), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, dim, 2, dtype=np.float32) * (-math.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class PositionalEncoding2D(nn.Module):
    """2D positional encoding (reference model.py:71-127).

    First d_model/2 dims: fixed sinusoid over time; last d_model/2: a single
    learnable frequency vector broadcast over time (model.py:94-104).
    """

    d_model: int = 192
    max_len: int = 5000  # kept for config parity; encoding is computed, not tabled
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, time_offset=0) -> jnp.ndarray:
        seq_len = x.shape[1]
        half = self.d_model // 2
        # The reference registers a (max_len, d/2) sinusoid buffer and
        # indexes it (model.py:93-104), capping sessions at max_len output
        # frames (~100 min of audio). Here the same values are computed
        # directly from absolute positions (time_offset may be a traced
        # scalar in streaming mode), so long streaming sessions see a
        # well-defined encoding with no table cap. Positions are fp32, so
        # the hard bound is 2^24 output frames (~93 hours of audio at 50
        # frames/s) before adjacent positions alias; sinusoid phase error
        # grows ~linearly with offset well before that but stays below
        # ~0.1 rad for day-long sessions.
        div_term = np.exp(
            np.arange(0, half, 2, dtype=np.float32) * (-math.log(10000.0) / half)
        )
        # time_offset: scalar (offline / single-session streaming) or a
        # (batch,) vector — independent live sessions micro-batched
        # through one compiled step sit at different absolute positions
        # (streaming.StreamSessionBatcher).
        offs = jnp.asarray(time_offset, jnp.float32)
        positions = offs[..., None] + jnp.arange(seq_len, dtype=jnp.float32)
        ang = positions[..., :, None] * jnp.asarray(div_term)
        n_even = (half + 1) // 2  # columns 0,2,4,... of the (L, half) encoding
        pe_time = jnp.zeros(positions.shape + (half,), jnp.float32)
        pe_time = pe_time.at[..., 0::2].set(jnp.sin(ang[..., :n_even]))
        pe_time = pe_time.at[..., 1::2].set(jnp.cos(ang[..., : half - n_even]))
        pe_freq = self.param(
            "pe_freq", nn.initializers.normal(stddev=0.02), (1, 1, half)
        )
        if pe_time.ndim == 2:  # scalar offset: shared across the batch
            pe_time = pe_time[None, :, :]
        freq_enc = jnp.broadcast_to(pe_freq, pe_time.shape)
        pos = jnp.concatenate([pe_time, freq_enc], axis=-1).astype(x.dtype)
        return x + pos


class TemporalBindingLayer(nn.Module):
    """Mel -> embedding front-end (reference model.py:130-202).

    Conv1d(mel_bins -> d_model, k=3, stride=2, pad=1) + GELU + 2D pos-enc +
    LayerNorm. Output length = (L + 1) // 2 (reference model.py:370-383).
    """

    mel_bins: int = 80
    d_model: int = 192
    kernel_size: int = 3
    stride: int = 2
    dtype: Any = jnp.float32
    qat: bool = False
    qat_bits: tuple = (8, 8)

    @nn.compact
    def __call__(
        self,
        mel: jnp.ndarray,
        train: bool = False,
        carry: jnp.ndarray = None,
        time_offset: int = 0,
        return_carry: bool = False,
    ):
        """Standard call, or streaming call with a carried mel frame.

        Streaming contract: chunks must have an even number of mel frames;
        with pad=1 the first chunk left-pads one zero frame, later chunks
        splice the carried final frame of the previous chunk, making the
        strided conv exact across boundaries. time_offset is the absolute
        output-frame offset for the positional encoding.
        """
        if return_carry:
            assert not self.qat, "streaming QAT front-end not supported"
            assert mel.shape[1] % self.stride == 0, "stream chunks must be even"
            # The carry-one-frame scheme reproduces the offline strided conv
            # only while no output needs future frames beyond the chunk,
            # i.e. kernel_size // 2 <= stride - 1 (k=3/stride=2, the
            # reference geometry, model.py:156-162). Larger kernels would
            # need output-delay buffering; fail loudly instead of silently
            # dropping one output frame per chunk.
            if self.kernel_size // 2 > self.stride - 1:
                raise NotImplementedError(
                    f"streaming temporal binding requires kernel_size // 2 "
                    f"<= stride - 1 (got kernel_size={self.kernel_size}, "
                    f"stride={self.stride}); offline mode supports any size"
                )
            kernel = self.param(
                "conv_kernel",
                kaiming_conv_init(),
                (self.kernel_size, self.mel_bins, self.d_model),
            )
            bias = self.param("conv_bias", nn.initializers.zeros, (self.d_model,))
            pad = self.kernel_size // 2
            if carry is None:
                carry = jnp.zeros((mel.shape[0], pad, self.mel_bins), jnp.float32)
            mel_ext = jnp.concatenate([carry.astype(mel.dtype), mel], axis=1)
            # explicit start index: -pad == -0 would select everything at
            # kernel_size == 1 (empty carry)
            new_carry = mel_ext[:, mel_ext.shape[1] - pad:]
            # valid conv over [carry | chunk]: outputs cover the chunk exactly
            x = strided_conv1d(
                mel_ext.astype(self.dtype), kernel, bias,
                stride=self.stride, padding=0,
            )
            x = nn.gelu(x, approximate=False)
            x = PositionalEncoding2D(
                d_model=self.d_model, dtype=self.dtype, name="pos_encoding"
            )(x, time_offset=time_offset)
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
            return x, new_carry

        if self.qat:
            # The temporal-binding conv is outside the SSM stacks, so the
            # reference's QAT rewrite quantizes it (quantize.py:288-313).
            from ..quantize import QuantConv1d

            x = QuantConv1d(
                self.d_model,
                kernel_size=self.kernel_size,
                stride=self.stride,
                padding=self.kernel_size // 2,
                kernel_init=kaiming_conv_init(),
                dtype=self.dtype,
                weight_bits=self.qat_bits[0],
                activation_bits=self.qat_bits[1],
                name="conv",
            )(mel.astype(self.dtype), train=train)
        else:
            kernel = self.param(
                "conv_kernel",
                kaiming_conv_init(),
                (self.kernel_size, self.mel_bins, self.d_model),
            )
            bias = self.param("conv_bias", nn.initializers.zeros, (self.d_model,))
            x = strided_conv1d(
                mel.astype(self.dtype),
                kernel,
                bias,
                stride=self.stride,
                padding=self.kernel_size // 2,
            )
        x = nn.gelu(x, approximate=False)  # torch nn.GELU default is exact erf
        x = PositionalEncoding2D(d_model=self.d_model, dtype=self.dtype, name="pos_encoding")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        return x


class CTCOutputHead(nn.Module):
    """LayerNorm -> Dropout -> Linear(vocab) (reference model.py:205-239)."""

    d_model: int = 192
    vocab_size: int = 1000
    dropout: float = 0.1
    dtype: Any = jnp.float32
    qat: bool = False
    qat_bits: tuple = (8, 8)
    int8: bool = False
    int8_static: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        mode = quant_mode(self.qat, self.int8)
        dense = quant_dense(mode, self.vocab_size, self.dtype, "proj",
                            static=self.int8_static, qat_bits=self.qat_bits)
        return dense(x, train=train) if mode != "none" else dense(x)
