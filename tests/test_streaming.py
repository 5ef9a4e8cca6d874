"""Streaming tests: exact chunked conv+SSM path, incremental mel, and the
end-to-end StreamingTranscriber."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import velocity_asr_tpu as va
from velocity_asr_tpu.audio import compute_mel_spectrogram_np
from velocity_asr_tpu.decode import CTCDecoder, create_default_vocabulary
from velocity_asr_tpu.models.ssm import SSMBlock
from velocity_asr_tpu.models.layers import TemporalBindingLayer
from velocity_asr_tpu.ops.scan import selective_scan_parallel, selective_scan_sequential
from velocity_asr_tpu.streaming import StreamingMel, StreamingTranscriber


def test_scan_state_carry_exact():
    rng = np.random.default_rng(0)
    B, L, D, N = 2, 64, 8, 4
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    dt = jnp.asarray(np.abs(rng.standard_normal((B, L, D))) * 0.4, jnp.float32)
    A = -jnp.exp(jnp.log(jnp.arange(1, N + 1, dtype=jnp.float32)))
    Bc = jnp.asarray(rng.standard_normal((B, L, N)), jnp.float32)
    Cc = jnp.asarray(rng.standard_normal((B, L, N)), jnp.float32)
    D_ = jnp.asarray(rng.standard_normal((D,)), jnp.float32)

    full = selective_scan_parallel(x, dt, A, Bc, Cc, D_)
    # two chunks with carried state
    s = L // 2
    y1, h = selective_scan_parallel(
        x[:, :s], dt[:, :s], A, Bc[:, :s], Cc[:, :s], D_, return_state=True
    )
    y2 = selective_scan_parallel(
        x[:, s:], dt[:, s:], A, Bc[:, s:], Cc[:, s:], D_, h0=h
    )
    chunked = jnp.concatenate([y1, y2], axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), rtol=1e-5, atol=1e-5)

    # sequential tier agrees too
    y1s, hs = selective_scan_sequential(
        x[:, :s], dt[:, :s], A, Bc[:, :s], Cc[:, :s], D_, return_state=True
    )
    np.testing.assert_allclose(np.asarray(h), np.asarray(hs), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_ssm_block_streaming_exact():
    block = SSMBlock(d_model=8, state_dim=4, dropout=0.0)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 40, 8)), jnp.float32
    )
    params = block.init(jax.random.PRNGKey(0), x)["params"]

    full = block.apply({"params": params}, x)

    state = None
    outs = []
    for i in range(0, 40, 10):
        out, state = block.apply(
            {"params": params}, x[:, i : i + 10], False, state, True
        )
        outs.append(out)
    chunked = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), rtol=1e-4, atol=1e-5)


def test_temporal_binding_streaming_exact():
    tb = TemporalBindingLayer(mel_bins=8, d_model=16)
    mel = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 48, 8)), jnp.float32
    )
    params = tb.init(jax.random.PRNGKey(0), mel)["params"]

    full = tb.apply({"params": params}, mel)

    carry, offset, outs = None, 0, []
    for i in range(0, 48, 16):
        out, carry = tb.apply(
            {"params": params}, mel[:, i : i + 16], False, carry, offset, True
        )
        outs.append(out)
        offset += out.shape[1]
    chunked = jnp.concatenate(outs, axis=1)
    assert chunked.shape == full.shape
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), rtol=1e-4, atol=1e-5)


def test_streaming_mel_unnormalized_exact():
    rng = np.random.default_rng(3)
    audio = rng.standard_normal(16000).astype(np.float32) * 0.2
    offline = compute_mel_spectrogram_np(audio, normalize=False)

    sm = StreamingMel(normalize=False)
    frames = []
    for i in range(0, len(audio), 1600):
        frames.append(sm.feed(audio[i : i + 1600]))
    frames.append(sm.finish())
    streamed = np.concatenate(frames)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-4)


def test_streaming_mel_normalized_tracks_offline():
    rng = np.random.default_rng(4)
    audio = rng.standard_normal(32000).astype(np.float32) * 0.2
    offline = compute_mel_spectrogram_np(audio, normalize=True)
    sm = StreamingMel(normalize=True)
    streamed = np.concatenate([sm.feed(audio), sm.finish()])
    assert streamed.shape == offline.shape
    # causal stats converge to full-utterance stats; tail frames agree closely
    np.testing.assert_allclose(streamed[-50:], offline[-50:], atol=0.3)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = va.VelocityASRConfig(
        d_model=16, ssm_layers=2, ssm_state_dim=4, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=30, dropout=0.0,
    )
    model = va.create_model(cfg)
    params = va.init_params(model, jax.random.PRNGKey(0), example_frames=64)
    return model, params


def test_model_stream_step_shapes(tiny_model):
    model, params = tiny_model
    mel = jnp.zeros((1, 40, 80))
    logits, state = model.apply(
        {"params": params}, mel, train=False, return_state=True
    )
    assert logits.shape == (1, 20, 30)
    assert state["mel_carry"].shape == (1, 1, 80)
    assert len(state["blocks"]) == 2
    # second step consumes the state
    logits2, state2 = model.apply(
        {"params": params}, mel, train=False,
        stream_state=state, time_offset=20, return_state=True,
    )
    assert logits2.shape == (1, 20, 30)


def test_streaming_transcriber_end_to_end(tiny_model):
    model, params = tiny_model
    decoder = CTCDecoder(create_default_vocabulary(30))
    st = StreamingTranscriber(model, params, decoder, chunk_frames=100)

    rng = np.random.default_rng(5)
    audio = (rng.standard_normal(3 * 16000) * 0.1).astype(np.float32)
    text = ""
    for i in range(0, len(audio), 8000):
        text += st.feed(audio[i : i + 8000])
    text += st.finish()
    assert text == st.text
    assert isinstance(text, str)
    # ~301 mel frames -> ~151 output frames were decoded
    assert st._time_offset == (1 + len(audio) // 160 + 1) // 2


def test_streaming_transcriber_reset_reproduces(tiny_model):
    """reset() starts a fresh session on the same compiled step: feeding the
    same audio twice must produce identical output and state."""
    model, params = tiny_model
    decoder = CTCDecoder(create_default_vocabulary(30))
    st = StreamingTranscriber(model, params, decoder, chunk_frames=100)

    rng = np.random.default_rng(7)
    audio = (rng.standard_normal(2 * 16000) * 0.1).astype(np.float32)

    def run_once():
        text = st.feed(audio)
        text += st.finish()
        return text, st._time_offset

    text1, off1 = run_once()
    st.reset()
    assert st.text == "" and st._time_offset == 0
    text2, off2 = run_once()
    assert text1 == text2 and off1 == off2


def test_streaming_mel_short_audio_matches_offline():
    # audio shorter than the reflect pad (n_fft//2 = 200 samples)
    for n in (150, 250, 450):
        rng = np.random.default_rng(n)
        audio = rng.standard_normal(n).astype(np.float32) * 0.2
        offline = compute_mel_spectrogram_np(audio, normalize=False)
        sm = StreamingMel(normalize=False)
        streamed = np.concatenate([sm.feed(audio), sm.finish()])
        assert streamed.shape == offline.shape, n
        np.testing.assert_allclose(streamed, offline, atol=1e-3, err_msg=str(n))


def test_streaming_context_memory_rolls(tiny_model):
    from velocity_asr_tpu.ops.pooling import adaptive_avg_pool1d

    model, params = tiny_model
    STREAM_MEMORY_CHUNKS = model.config.stream_memory_chunks
    STREAM_SUMMARY_TOKENS = model.config.stream_summary_tokens
    rng = np.random.default_rng(11)
    chunk1 = jnp.asarray(rng.standard_normal((1, 40, 80)), jnp.float32)
    chunk2 = jnp.asarray(rng.standard_normal((1, 40, 80)), jnp.float32)

    _, state1 = model.apply({"params": params}, chunk1, train=False, return_state=True)
    mem1 = np.asarray(state1["gc_mem"])
    M = STREAM_MEMORY_CHUNKS * STREAM_SUMMARY_TOKENS
    assert mem1.shape == (1, M, 16)
    # first chunk: warm-started by tiling its own summary
    s = STREAM_SUMMARY_TOKENS
    np.testing.assert_allclose(mem1[:, :s], mem1[:, s : 2 * s], atol=1e-6)

    _, state2 = model.apply(
        {"params": params}, chunk2, train=False,
        stream_state=state1, time_offset=20, return_state=True,
    )
    mem2 = np.asarray(state2["gc_mem"])
    # rolled: the first M-s tokens are mem1 shifted left by s
    np.testing.assert_allclose(mem2[:, : M - s], mem1[:, s:], atol=1e-6)
    # last s tokens are chunk2's own local-feature summary (changed)
    assert not np.allclose(mem2[:, M - s :], mem1[:, M - s :])


def test_streaming_context_memory_changes_logits(tiny_model):
    """A chunk's transcription now depends on earlier chunks' content via
    the context memory (previously each chunk's global context was blind
    to the past)."""
    model, params = tiny_model
    rng = np.random.default_rng(13)
    past_a = jnp.asarray(rng.standard_normal((1, 40, 80)), jnp.float32)
    past_b = jnp.asarray(rng.standard_normal((1, 40, 80)) * 3.0, jnp.float32)
    current = jnp.asarray(rng.standard_normal((1, 40, 80)), jnp.float32)

    def run(past):
        _, st = model.apply({"params": params}, past, train=False, return_state=True)
        logits, _ = model.apply(
            {"params": params}, current, train=False,
            stream_state=st, time_offset=20, return_state=True,
        )
        return np.asarray(logits)

    la, lb = run(past_a), run(past_b)
    # identical current-chunk audio, different history -> different logits
    assert not np.allclose(la, lb)


@pytest.mark.slow
def test_ssm_block_streaming_exact_pallas():
    """Streaming state carry through the Pallas tier (h0 in / h_final out of
    the kernel itself — VERDICT r2 item 3: no silent fallback)."""
    block = SSMBlock(d_model=8, state_dim=4, dropout=0.0, scan_mode="pallas")
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((1, 40, 8)), jnp.float32
    )
    params = block.init(jax.random.PRNGKey(0), x)["params"]

    full = block.apply({"params": params}, x)

    state = None
    outs = []
    for i in range(0, 40, 10):
        out, state = block.apply(
            {"params": params}, x[:, i : i + 10], False, state, True
        )
        outs.append(out)
    chunked = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), rtol=1e-4, atol=1e-5)


def test_batched_streaming_matches_per_utterance():
    """BatchedStreamingTranscriber reproduces the per-utterance
    StreamingTranscriber exactly, including length masking of padded
    chunks (VERDICT r2 item 9: batched streaming eval)."""
    import velocity_asr_tpu as va
    from velocity_asr_tpu.streaming import (
        BatchedStreamingTranscriber,
        StreamingTranscriber,
    )

    cfg = va.VelocityASRConfig(
        d_model=32, ssm_layers=1, ssm_state_dim=8, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=32, dropout=0.0,
    )
    model = va.create_model(cfg)
    params = va.init_params(model, jax.random.PRNGKey(0), example_frames=8)
    dec = va.CTCDecoder(va.create_default_vocabulary(32))

    rng = np.random.default_rng(5)
    audios = [
        (rng.standard_normal(n) * 0.1).astype(np.float32)
        for n in (9000, 16000, 12345)
    ]
    chunk_frames, block = 50, 50 * 160

    singles = []
    st = StreamingTranscriber(model, params, dec, chunk_frames=chunk_frames)
    for a in audios:
        st.reset()
        text = "".join(st.feed(a[s:s + block]) for s in range(0, len(a), block))
        singles.append(text + st.finish())

    bt = BatchedStreamingTranscriber(
        model, params, dec, chunk_frames=chunk_frames, batch_size=3
    )
    batched = bt.transcribe_batch(audios)
    assert batched == singles


# ---------------------------------------------------------------------------
# Lookahead emission (VERDICT r3: close the streaming-vs-offline WER residue)
# ---------------------------------------------------------------------------


def test_frozen_emit_matches_advance_on_final_chunk(tiny_model):
    """The frozen_mem emit pass is defined so that re-decoding chunk c with
    (entry conv/SSM state of c) + (memory after chunk c) reproduces the
    normal advancing step's logits for chunk c exactly: the advancing step
    attends over the memory it just rolled (which includes chunk c), and
    the local path is state-exact."""
    from velocity_asr_tpu.streaming import init_stream_state

    model, params = tiny_model
    rng = np.random.default_rng(11)
    mel = jnp.asarray(rng.standard_normal((1, 80, 80)), jnp.float32)

    state = init_stream_state(model.config, 1)
    entry_states = []
    adv_logits = []
    for c in range(2):
        entry_states.append((state["mel_carry"], state["blocks"]))
        logits, state = model.apply(
            {"params": params}, mel[:, c * 40 : (c + 1) * 40], train=False,
            stream_state=state, time_offset=c * 20, return_state=True,
        )
        adv_logits.append(np.asarray(logits))

    # emit chunk 1 with its entry state + post-chunk-1 memory (src == c)
    mel_carry, blocks = entry_states[1]
    emit_state = {
        "mel_carry": mel_carry, "blocks": blocks,
        "gc_mem": state["gc_mem"], "gc_blocks": state["gc_blocks"],
        "gc_init": state["gc_init"],
    }
    emit_logits, echoed = model.apply(
        {"params": params}, mel[:, 40:80], train=False,
        stream_state=emit_state, time_offset=20, return_state=True,
        frozen_mem=True,
    )
    np.testing.assert_allclose(
        np.asarray(emit_logits), adv_logits[1], rtol=1e-4, atol=1e-4
    )
    # the emit pass must not advance the global-context state
    np.testing.assert_array_equal(
        np.asarray(echoed["gc_mem"]), np.asarray(state["gc_mem"])
    )


def test_frozen_emit_sees_future_memory(tiny_model):
    """Emitting chunk 0 with memory from after chunk 1 must differ from the
    plain chunk-0 logits — the future context actually reaches the
    cross-attention."""
    from velocity_asr_tpu.streaming import init_stream_state

    model, params = tiny_model
    rng = np.random.default_rng(12)
    mel = jnp.asarray(rng.standard_normal((1, 80, 80)), jnp.float32)

    state = init_stream_state(model.config, 1)
    entry0 = (state["mel_carry"], state["blocks"])
    logits0, state1 = model.apply(
        {"params": params}, mel[:, :40], train=False,
        stream_state=state, time_offset=0, return_state=True,
    )
    _, state2 = model.apply(
        {"params": params}, mel[:, 40:], train=False,
        stream_state=state1, time_offset=20, return_state=True,
    )
    emit_logits, _ = model.apply(
        {"params": params}, mel[:, :40], train=False,
        stream_state={"mel_carry": entry0[0], "blocks": entry0[1],
                      "gc_mem": state2["gc_mem"],
                      "gc_blocks": state2["gc_blocks"],
                      "gc_init": state2["gc_init"]},
        time_offset=0, return_state=True, frozen_mem=True,
    )
    assert np.abs(np.asarray(emit_logits) - np.asarray(logits0)).max() > 1e-6


def test_streaming_transcriber_lookahead_end_to_end(tiny_model):
    model, params = tiny_model
    decoder = CTCDecoder(create_default_vocabulary(30))
    st = StreamingTranscriber(
        model, params, decoder, chunk_frames=100, lookahead_chunks=1
    )

    rng = np.random.default_rng(13)
    audio = (rng.standard_normal(3 * 16000) * 0.1).astype(np.float32)

    def run_once():
        text = ""
        for i in range(0, len(audio), 8000):
            text += st.feed(audio[i : i + 8000])
        return text + st.finish()

    text1 = run_once()
    assert isinstance(text1, str)
    assert st._time_offset == (1 + len(audio) // 160 + 1) // 2
    assert not st._pending  # all chunks emitted at finish
    st.reset()
    assert run_once() == text1  # deterministic across reset


def test_batched_streaming_lookahead_runs():
    import velocity_asr_tpu as va
    from velocity_asr_tpu.streaming import BatchedStreamingTranscriber

    cfg = va.VelocityASRConfig(
        d_model=32, ssm_layers=1, ssm_state_dim=8, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=32, dropout=0.0,
    )
    model = va.create_model(cfg)
    params = va.init_params(model, jax.random.PRNGKey(0), example_frames=8)
    dec = va.CTCDecoder(va.create_default_vocabulary(32))

    rng = np.random.default_rng(14)
    audios = [
        (rng.standard_normal(n) * 0.1).astype(np.float32)
        for n in (9000, 16000, 12345)
    ]
    bt = BatchedStreamingTranscriber(
        model, params, dec, chunk_frames=50, batch_size=3, lookahead_chunks=1
    )
    texts = bt.transcribe_batch(audios)
    assert len(texts) == 3 and all(isinstance(t, str) for t in texts)
    # lookahead 0 path unchanged
    bt0 = BatchedStreamingTranscriber(
        model, params, dec, chunk_frames=50, batch_size=3
    )
    texts0 = bt0.transcribe_batch(audios)
    assert len(texts0) == 3


# ---------------------------------------------------------------------------
# Streaming-aware training graph (streaming_forward + causal_normalize_mel)
# ---------------------------------------------------------------------------


def test_streaming_forward_matches_python_loop(tiny_model):
    """The lax.scan training graph reproduces the python-loop streaming
    step stream exactly (same state carry, same logits)."""
    from velocity_asr_tpu.streaming import init_stream_state, streaming_forward

    model, params = tiny_model
    rng = np.random.default_rng(21)
    mel = jnp.asarray(rng.standard_normal((2, 120, 80)), jnp.float32)

    scanned = np.asarray(streaming_forward(model, params, mel, 40))

    state = init_stream_state(model.config, 2)
    outs = []
    for c in range(3):
        logits, state = model.apply(
            {"params": params}, mel[:, c * 40 : (c + 1) * 40], train=False,
            stream_state=state, time_offset=c * 20, return_state=True,
        )
        outs.append(np.asarray(logits))
    looped = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(scanned, looped, rtol=1e-5, atol=1e-5)


def test_causal_normalize_mel_matches_numpy():
    from velocity_asr_tpu.audio import causal_normalize_mel

    rng = np.random.default_rng(22)
    mel = rng.standard_normal((2, 90, 5)).astype(np.float32) * 3 + 1
    n_valid = np.asarray([90, 55], np.int32)
    F = 40
    got = np.asarray(causal_normalize_mel(jnp.asarray(mel), n_valid, F))

    for b in range(2):
        for t in range(90):
            if t >= n_valid[b]:
                np.testing.assert_array_equal(got[b, t], 0.0)
                continue
            k = min(((t // F) + 1) * F, int(n_valid[b]))
            x = mel[b, :k]
            mean = x.mean(axis=0)
            std = x.std(axis=0, ddof=1) if k > 1 else np.zeros_like(mean)
            want = (mel[b, t] - mean) / (std + 1e-10)
            np.testing.assert_allclose(got[b, t], want, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_streaming_aware_training_step():
    """Mixed offline+streaming objective: step runs on device-mel batches,
    loss finite, and gradients actually flow through the streaming graph
    (loss changes when streaming weight flips)."""
    import velocity_asr_tpu as va
    from velocity_asr_tpu.data import ASRCollator
    from velocity_asr_tpu.synth import SyntheticSpeechDataset
    from velocity_asr_tpu.training import Trainer, TrainingConfig

    cfg = va.VelocityASRConfig(
        d_model=16, ssm_layers=1, ssm_state_dim=4, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=31, dropout=0.0,
    )
    model = va.create_model(cfg)
    ds = SyntheticSpeechDataset(8, split="dev", seed=9, device_mel=True)
    batch = ASRCollator(frame_bucket=200)([ds[i] for i in range(8)])

    def batches():
        while True:
            yield batch

    tconf = TrainingConfig(
        learning_rate=1e-3, warmup_steps=1, max_steps=4,
        streaming_chunks=100, streaming_aux_weight=0.5,
        log_interval=1000, eval_interval=10**9, save_interval=10**9,
    )
    trainer = Trainer(model, tconf, batches())
    losses = [float(trainer._train_step_device(batch)) for _ in range(3)]
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0]  # it optimizes


def test_streaming_mel_one_sample_matches_offline():
    """Repeated-reflection edge: a 1-sample utterance must produce the
    same (constant) mel frame as the offline np.pad reflect path, not a
    zero-padded one."""
    audio = np.array([0.7], np.float32)
    offline = compute_mel_spectrogram_np(audio, normalize=False)
    sm = StreamingMel(normalize=False)
    streamed = np.concatenate([sm.feed(audio), sm.finish()])
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=1e-3)


def test_streaming_mel_memory_bounded():
    """A long-running session must not retain full audio/mel history:
    the padded window stays O(n_fft + feed block) and trimmed raw mel
    stays O(lookahead window)."""
    rng = np.random.default_rng(0)
    sm = StreamingMel(normalize=True)
    block = 1600
    for i in range(200):  # 20 s of audio in 0.1 s blocks
        sm.feed(rng.standard_normal(block).astype(np.float32) * 0.1)
        sm.trim_raw_mel(max(sm._next_frame - 300, 0))
    assert len(sm._padded) <= sm.n_fft + block
    assert len(sm._head) <= sm.pad + 1
    assert len(sm._tail) <= sm.pad + 1
    assert sm._raw_mel.shape[0] <= 300 + block // sm.hop + 1
    # trimmed history is refused, recent frames still served
    with pytest.raises(AssertionError):
        sm.raw_frames(0, 10)
    assert sm.raw_frames(sm._next_frame - 10, 10).shape[0] == 10


def test_streaming_mel_trim_preserves_output():
    """Trimming raw-mel history must not change emitted frames."""
    rng = np.random.default_rng(3)
    audio = rng.standard_normal(16000).astype(np.float32) * 0.2

    def run(trim):
        sm = StreamingMel(normalize=True)
        outs = []
        for s in range(0, len(audio), 1111):
            outs.append(sm.feed(audio[s:s + 1111]))
            if trim:
                sm.trim_raw_mel(sm._next_frame)
        outs.append(sm.finish())
        return np.concatenate(outs)

    np.testing.assert_allclose(run(trim=True), run(trim=False), atol=1e-6)


def test_streaming_output_is_arrival_invariant(tiny_model):
    """The text a stream produces depends only on the audio and the chunk
    cadence — never on how the samples were fragmented in transit
    (chunk-quantized causal normalization; serve's /stream endpoint
    receives arbitrary TCP fragmentation)."""
    model, params = tiny_model
    decoder = CTCDecoder(create_default_vocabulary(30))
    st = StreamingTranscriber(model, params, decoder, chunk_frames=100)

    rng = np.random.default_rng(11)
    audio = (rng.standard_normal(int(2.7 * 16000)) * 0.1).astype(np.float32)

    texts = []
    for blocks in ([len(audio)],                       # one shot
                   [1600] * (len(audio) // 1600) + [len(audio) % 1600],
                   [7, 33, 40000, 1, 2048] * 100):     # adversarial splits
        st.reset()
        text, s = "", 0
        for b in blocks:
            text += st.feed(audio[s:s + b])
            s += b
            if s >= len(audio):
                break
        text += st.finish()
        texts.append(text)
    assert texts[0] == texts[1] == texts[2]


def test_streaming_timestamps_match_offline_rule(tiny_model):
    """Cross-chunk token spans are frame-exact with
    decode.timestamps_from_predictions applied to the concatenated
    per-frame predictions: a run crossing a chunk boundary extends its
    open span instead of re-emitting."""
    from velocity_asr_tpu.decode import timestamps_from_predictions

    model, params = tiny_model
    decoder = CTCDecoder(create_default_vocabulary(30))
    st = StreamingTranscriber(model, params, decoder, chunk_frames=8)

    # synthetic per-frame predictions with runs crossing the 4-frame
    # output-chunk boundary, blanks, and repeats
    preds = np.array([0, 3, 3, 3, 3, 0, 4, 4, 5, 0, 0, 5, 5, 6, 7, 7],
                     np.int64)
    vocab = 30
    base = 0
    for s in range(0, len(preds), 4):  # out_valid = 8//2 = 4 per chunk
        chunk = preds[s:s + 4]
        logits = np.full((1, len(chunk), vocab), -10.0, np.float32)
        logits[0, np.arange(len(chunk)), chunk] = 10.0
        st._decode_logits(jnp.asarray(logits), len(chunk), base)
        base += len(chunk)

    ref_tokens, ref_stamps = timestamps_from_predictions(preds[None])[0]
    stamps = [(s, e if e >= 0 else st._decoded_frames)
              for s, e in st._stamps]
    assert st._tokens == ref_tokens
    assert stamps == ref_stamps


def test_streaming_words_end_to_end(tiny_model):
    """words() assembles the full transcript with monotonic spans, and
    take_new_words() increments concatenate to it exactly."""
    model, params = tiny_model
    decoder = CTCDecoder(create_default_vocabulary(30))
    st = StreamingTranscriber(model, params, decoder, chunk_frames=100)

    rng = np.random.default_rng(13)
    audio = (rng.standard_normal(3 * 16000) * 0.1).astype(np.float32)
    incremental = []
    for i in range(0, len(audio), 16000):
        st.feed(audio[i:i + 16000])
        incremental.extend(st.take_new_words())
    st.finish()
    incremental.extend(st.take_new_words(flush=True))

    words = st.words()
    assert incremental == words
    # words reassemble the text (text joins words with the space tokens)
    assert " ".join(w["word"] for w in words) == " ".join(st.text.split())
    t_prev = 0.0
    for w in words:
        assert 0.0 <= w["start"] <= w["end"]
        assert w["start"] >= t_prev - 1e-9  # monotonic word starts
        t_prev = w["start"]
    assert words[-1]["end"] <= st._decoded_frames * 2 * 160 / 16000 + 1e-9


def test_streaming_word_confidence(tiny_model):
    """Streaming words carry confidences: exp of the mean per-frame log
    posterior over the word's token spans — verified against crafted
    near-one-hot logits with a known softmax value."""
    import math

    model, params = tiny_model
    decoder = CTCDecoder(create_default_vocabulary(30))
    st = StreamingTranscriber(model, params, decoder, chunk_frames=8)

    vocab = 30
    mag = 5.0
    p_tok = math.exp(mag) / (math.exp(mag) + (vocab - 1))
    preds = np.array([0, 4, 4, 0, 5, 5, 5, 0], np.int64)
    logits = np.zeros((1, len(preds), vocab), np.float32)
    logits[0, np.arange(len(preds)), preds] = mag
    st._decode_logits(jnp.asarray(logits[:, :4]), 4, 0)
    st._decode_logits(jnp.asarray(logits[:, 4:]), 4, 4)

    words = st.words()
    assert len(words) == 1  # "ab" (tokens 4, 5 are chars, no space)
    assert abs(words[0]["confidence"] - p_tok) < 1e-5

    # end-to-end: every word of a real stream has a confidence in (0, 1]
    st.reset()
    rng = np.random.default_rng(17)
    st.feed((rng.standard_normal(2 * 16000) * 0.1).astype(np.float32))
    st.finish()
    ws = st.words()
    assert ws and all(0.0 < w["confidence"] <= 1.0 for w in ws)


def test_batched_sessions_match_dedicated_transcribers(tiny_model):
    """Independent live sessions micro-batched through one compiled step
    (StreamSessionBatcher) produce EXACTLY the text and words a dedicated
    StreamingTranscriber produces — with interleaved feeds, different
    lengths (different per-row time offsets), and slot reuse."""
    from velocity_asr_tpu.streaming import StreamSessionBatcher

    model, params = tiny_model
    decoder = CTCDecoder(create_default_vocabulary(30))
    batcher = StreamSessionBatcher(
        model, params, decoder, chunk_frames=50, max_slots=3, window_ms=20.0,
    )

    rng = np.random.default_rng(23)
    audios = [
        (rng.standard_normal(n) * 0.1).astype(np.float32)
        for n in (30000, 17000, 41000)
    ]

    # reference: dedicated per-session transcribers
    ref = StreamingTranscriber(model, params, decoder, chunk_frames=50)
    expected = []
    for a in audios:
        ref.reset()
        ref.feed(a)
        ref.finish()
        expected.append((ref.text, ref.words()))

    # batched: three concurrent sessions, interleaved feeds from threads
    sessions = [batcher.open() for _ in audios]
    errs = []

    def run(sess, audio):
        try:
            for i in range(0, len(audio), 4000):
                sess.feed(audio[i:i + 4000])
            sess.finish()
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=run, args=(s, a))
               for s, a in zip(sessions, audios)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    def words_match(got, want):
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert (g["word"], g["start"], g["end"]) == \
                (w["word"], w["start"], w["end"])
            # batched log-softmax rounds differently at ~1e-8; tokens,
            # spans, and text are exactly equal
            assert g["confidence"] == pytest.approx(w["confidence"], abs=1e-6)

    for sess, (text, words) in zip(sessions, expected):
        assert sess.text == text
        words_match(sess.words(), words)

    # slot exhaustion is a clear error; close frees, reset recycles
    with pytest.raises(RuntimeError, match="slots"):
        batcher.open()
    sessions[0].close()
    s_new = batcher.open()
    s_new.feed(audios[1])
    s_new.finish()
    assert s_new.text == expected[1][0]
    # recycle in place: same session, fresh stream
    s_new.reset()
    s_new.feed(audios[2])
    s_new.finish()
    assert s_new.text == expected[2][0]
    for s in (s_new, *sessions[1:]):
        s.close()


def test_batched_sessions_lookahead_match_dedicated(tiny_model):
    """Lookahead sessions through the shared batcher (entry states in the
    device-side ring, frozen-memory re-decodes as a second batched call)
    reproduce a dedicated lookahead StreamingTranscriber exactly —
    concurrent sessions, different lengths, plus slot reuse via reset()
    (VERDICT r3 item 9: lookahead /stream used to re-serialize on pooled
    per-session transcribers)."""
    from velocity_asr_tpu.streaming import StreamSessionBatcher

    model, params = tiny_model
    decoder = CTCDecoder(create_default_vocabulary(30))
    batcher = StreamSessionBatcher(
        model, params, decoder, chunk_frames=50, max_slots=2,
        window_ms=20.0, lookahead=1,
    )

    rng = np.random.default_rng(31)
    audios = [
        (rng.standard_normal(n) * 0.1).astype(np.float32)
        for n in (22000, 13000)
    ]

    ref = StreamingTranscriber(model, params, decoder, chunk_frames=50,
                               lookahead_chunks=1)
    expected = []
    for a in audios:
        ref.reset()
        ref.feed(a)
        ref.finish()
        expected.append(ref.text)

    sessions = [batcher.open() for _ in audios]
    errs = []

    def run(sess, audio):
        try:
            for i in range(0, len(audio), 4000):
                sess.feed(audio[i:i + 4000])
            sess.finish()
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=run, args=(s, a))
               for s, a in zip(sessions, audios)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    for sess, text in zip(sessions, expected):
        assert sess.text == text

    # slot reuse: reset() recycles the ring bookkeeping too
    sessions[0].reset()
    sessions[0].feed(audios[1])
    sessions[0].finish()
    assert sessions[0].text == expected[1]
    for s in sessions:
        s.close()


class _FavorToken:
    """Toy scorer: +1 per occurrence of a favored token (exercises the
    finalize-time n-best rescoring path end to end)."""

    def __init__(self, tok):
        self.tok = tok

    def score(self, tokens):
        return float(sum(1.0 for t in tokens if t == self.tok))


@pytest.mark.parametrize("lookahead", [0, 1])
def test_batched_beam_sessions_match_dedicated(tiny_model, lookahead):
    """Beam sessions through the shared batcher (beam state stacked as a
    (slots, k, ...) device pytree, resume + commit fused into the batched
    chunk call) reproduce a dedicated beam StreamingTranscriber exactly —
    concurrent sessions, different lengths, n-best rescoring, and slot
    reuse (VERDICT r4 item 4: serve's ?beam sessions used to serialize
    via pooled per-session transcribers)."""
    from velocity_asr_tpu.streaming import StreamSessionBatcher

    model, params = tiny_model
    decoder = CTCDecoder(create_default_vocabulary(30))
    scorers = [(_FavorToken(5), 0.7)]
    batcher = StreamSessionBatcher(
        model, params, decoder, chunk_frames=50, max_slots=2,
        window_ms=20.0, lookahead=lookahead, beam_width=4,
        beam_scorers=scorers,
    )

    rng = np.random.default_rng(47)
    audios = [
        (rng.standard_normal(n) * 0.1).astype(np.float32)
        for n in (22000, 13000)
    ]

    ref = StreamingTranscriber(
        model, params, decoder, chunk_frames=50, lookahead_chunks=lookahead,
        beam_width=4, beam_scorers=scorers,
    )
    expected = []
    for a in audios:
        ref.reset()
        ref.feed(a)
        ref.finish()
        expected.append((ref.text, ref.words()))

    sessions = [batcher.open() for _ in audios]
    errs = []

    def run(sess, audio):
        try:
            for i in range(0, len(audio), 4000):
                sess.feed(audio[i:i + 4000])
            sess.finish()
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=run, args=(s, a))
               for s, a in zip(sessions, audios)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    for sess, (text, words) in zip(sessions, expected):
        assert sess.text == text
        # beam word timestamps flow through the batched commit path too
        got = sess.words()
        assert len(got) == len(words)
        for g, w in zip(got, words):
            assert (g["word"], g["start"], g["end"]) == \
                (w["word"], w["start"], w["end"])
            assert g["confidence"] == pytest.approx(w["confidence"],
                                                    abs=1e-6)

    # slot reuse: reset() recycles the shared beam row too
    sessions[0].reset()
    sessions[0].feed(audios[1])
    sessions[0].finish()
    assert sessions[0].text == expected[1][0]
    for s in sessions:
        s.close()
