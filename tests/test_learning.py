"""End-to-end learning test: the full training stack (mel front-end ->
model -> CTC loss -> AdamW -> decode) learns a synthetic tone language to
near-zero error.

Each character maps to a pure tone of a distinct frequency; utterances are
random character strings rendered to audio. A tiny model trained for a few
hundred steps must transcribe held-out utterances almost perfectly — this
exercises the entire pipeline the way LibriSpeech training would, without
needing data on disk.
"""

import numpy as np
import pytest

import velocity_asr_tpu as va
from velocity_asr_tpu.audio import SAMPLE_RATE, compute_mel_spectrogram_np
from velocity_asr_tpu.data import ASRCollator
from velocity_asr_tpu.decode import CTCDecoder
from velocity_asr_tpu.training import Trainer, TrainingConfig, compute_cer

CHARS = "abcdef"
TONE_SECONDS = 0.12
FREQS = {c: 400.0 + 250.0 * i for i, c in enumerate(CHARS)}
VOCAB = ["<blank>", "<unk>", "<pad>"] + list(CHARS)


def render(text: str, rng) -> np.ndarray:
    n = int(TONE_SECONDS * SAMPLE_RATE)
    t = np.arange(n) / SAMPLE_RATE
    parts = [np.sin(2 * np.pi * FREQS[c] * t) * 0.4 for c in text]
    audio = np.concatenate(parts).astype(np.float32)
    return audio + rng.standard_normal(len(audio)).astype(np.float32) * 0.01


def make_item(text: str, rng):
    mel = compute_mel_spectrogram_np(render(text, rng))
    tokens = np.asarray([3 + CHARS.index(c) for c in text], np.int32)
    return {
        "mel_spectrogram": mel,
        "targets": tokens,
        "input_lengths": np.int32(mel.shape[0]),
        "target_lengths": np.int32(len(tokens)),
        "text": text,
    }


@pytest.mark.slow
def test_training_learns_tone_language():
    rng = np.random.default_rng(0)
    collator = ASRCollator(frame_bucket=50, target_bucket=8)

    def sample_text():
        n = int(rng.integers(3, 7))
        return "".join(CHARS[i] for i in rng.integers(0, len(CHARS), n))

    def batches():
        while True:
            yield collator([make_item(sample_text(), rng) for _ in range(8)])

    cfg = va.VelocityASRConfig(
        d_model=32, ssm_layers=2, ssm_state_dim=8, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=len(VOCAB), dropout=0.0,
    )
    model = va.create_model(cfg)
    tconf = TrainingConfig(
        learning_rate=3e-3, warmup_steps=20, max_steps=400,
        log_interval=10**9, eval_interval=10**9, save_interval=10**9,
    )
    trainer = Trainer(model, tconf, batches())
    history = trainer.train()

    # Held-out evaluation: greedy decode previously unseen utterances.
    import jax
    import jax.numpy as jnp

    from velocity_asr_tpu.models.model import forward

    eval_rng = np.random.default_rng(12345)
    texts = []
    items = []
    for _ in range(16):
        n = int(eval_rng.integers(3, 7))
        text = "".join(CHARS[i] for i in eval_rng.integers(0, len(CHARS), n))
        texts.append(text)
        items.append(make_item(text, eval_rng))
    batch = collator(items)

    infer = jax.jit(lambda p, m: forward(model, p, m, train=False))
    logits = np.asarray(infer(trainer.params, jnp.asarray(batch["mel_spectrogram"])))
    out_lens = (batch["input_lengths"] + 1) // 2

    decoder = CTCDecoder(VOCAB)
    preds = []
    for b in range(len(texts)):
        preds.append(decoder.decode_greedy(logits[b : b + 1, : out_lens[b]])[0])

    cer = compute_cer(preds, texts)
    assert cer < 0.1, (cer, list(zip(preds, texts))[:4])
