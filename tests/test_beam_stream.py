"""Chunk-carried (streaming) beam search.

The carried-state beam (beam.ctc_beam_resume) must reproduce the one-shot
batched beam (beam.ctc_beam_search_jax — itself equivalence-tested against
the reference prefix beam, reference decode.py:128-217) when fed the same
frames chunkwise, with commits (beam_commit) emitting exactly the tokens
every live beam agrees on. VERDICT r3 item 3: beam+LM on the streaming path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import velocity_asr_tpu as va
from velocity_asr_tpu.beam import (
    StreamingBeam,
    beam_commit,
    beam_finalize,
    beam_state_init,
    beams_to_token_lists,
    ctc_beam_resume,
    ctc_beam_search_jax,
)


def _one_shot(logits_1xt, k):
    tok, lens, sc = ctc_beam_search_jax(jnp.asarray(logits_1xt), beam_width=k)
    toks = beams_to_token_lists(np.asarray(tok), np.asarray(lens))[0]
    scores = np.asarray(sc)[0]
    return [(t, float(s)) for t, s in zip(toks, scores) if s > -1e29]


def test_resume_matches_one_shot():
    """N chunks through ctc_beam_resume == one ctc_beam_search_jax call
    over the concatenated valid frames, per batch row."""
    rng = np.random.default_rng(0)
    B, T, V, K = 3, 40, 12, 6
    logits = (rng.normal(size=(B, T, V)) * 2).astype(np.float32)
    valid_total = np.array([40, 33, 25])

    state = beam_state_init(B, K, cap=T)
    pos = 0
    for chunk in (13, 14, 13):
        v = np.clip(valid_total - pos, 0, chunk).astype(np.int32)
        state = ctc_beam_resume(
            state, jnp.asarray(logits[:, pos : pos + chunk]), jnp.asarray(v)
        )
        pos += chunk
    beams, overflow = beam_finalize(state)
    assert not np.asarray(overflow).any()

    for b in range(B):
        want = _one_shot(logits[b : b + 1, : valid_total[b]], K)
        got = sorted(beams[b], key=lambda p: -p[1])
        assert len(got) == len(want)
        for (gt, gs), (wt, ws) in zip(got, want):
            assert gt == wt
            assert abs(gs - ws) < 1e-4


def test_commit_emits_final_prefix():
    """committed tokens + best live suffix == the one-shot best beam, and
    commits are monotone (never retracted)."""
    rng = np.random.default_rng(1)
    B, T, V, K = 2, 40, 10, 5
    logits = (rng.normal(size=(B, T, V)) * 2).astype(np.float32)

    # cap smaller than T: commits must shift finalized tokens out for the
    # suffixes to keep fitting (random logits leave beams disagreeing on a
    # long tail, so the cap still needs ~T/2 headroom)
    state = beam_state_init(B, K, cap=32)
    committed = [[] for _ in range(B)]
    for c in range(4):
        state = ctc_beam_resume(
            state, jnp.asarray(logits[:, c * 10 : (c + 1) * 10]),
            jnp.full((B,), 10, jnp.int32),
        )
        state, nc, info = beam_commit(state)
        nc, toks = np.asarray(nc), np.asarray(info["tokens"])
        for b in range(B):
            committed[b].extend(toks[b, : nc[b]].tolist())
    beams, overflow = beam_finalize(state)
    assert not np.asarray(overflow).any()
    for b in range(B):
        best = max(beams[b], key=lambda p: p[1])
        want = _one_shot(logits[b : b + 1], K)[0][0]
        assert committed[b] + best[0] == want
        # every committed token is a prefix of the final best sequence
        assert want[: len(committed[b])] == committed[b]


def test_overflow_flag_on_tiny_cap():
    """Tokens written past the prefix capacity set the overflow flag
    instead of being silently lost."""
    rng = np.random.default_rng(2)
    # Strongly favor alternating non-blank tokens so prefixes grow fast.
    logits = np.full((1, 30, 4), -5.0, np.float32)
    logits[0, ::2, 1] = 5.0
    logits[0, 1::2, 2] = 5.0
    state = beam_state_init(1, 3, cap=4)
    state = ctc_beam_resume(
        state, jnp.asarray(logits), jnp.full((1,), 30, jnp.int32)
    )
    _, overflow = beam_finalize(state)
    assert bool(np.asarray(overflow)[0])


def test_overflow_degrades_to_clean_truncation():
    """Post-overflow output is a clean truncation: lengths are clamped at
    cap, so finalize/commit never emit the buffer's -1 padding slots
    (advisor r4: unclamped lengths rendered '<unk>' garbage)."""
    logits = np.full((1, 60, 4), -5.0, np.float32)
    logits[0, ::2, 1] = 5.0
    logits[0, 1::2, 2] = 5.0
    cap = 4
    state = beam_state_init(1, 3, cap=cap)
    committed = []
    for c in range(6):
        state = ctc_beam_resume(
            state, jnp.asarray(logits[:, c * 10 : (c + 1) * 10]),
            jnp.full((1,), 10, jnp.int32),
        )
        assert int(np.asarray(state["lengths"]).max()) <= cap
        state, nc, info = beam_commit(state)
        nc, toks = np.asarray(nc), np.asarray(info["tokens"])
        new = toks[0, : nc[0]].tolist()
        assert all(t >= 0 for t in new)
        committed.extend(new)
    beams, overflow = beam_finalize(state)
    assert bool(np.asarray(overflow)[0])
    for suffix, _ in beams[0]:
        assert all(t >= 0 for t in suffix)


def test_streaming_beam_rescoring_picks_lm_favorite():
    """finalize() ranks the n-best by acoustic + weight * scorer score."""

    class FavorToken:
        def __init__(self, tok):
            self.tok = tok

        def score(self, tokens):
            return float(sum(1.0 for t in tokens if t == self.tok))

    rng = np.random.default_rng(3)
    V, K = 8, 6
    logits = (rng.normal(size=(1, 20, V)) * 1.5).astype(np.float32)

    plain = StreamingBeam(1, K, cap=32)
    plain.update(jnp.asarray(logits), 20)
    base = plain.finalize()[0]

    # A scorer with a big weight drags the ranking toward hypotheses rich
    # in some token the acoustic best lacks somewhere in the n-best.
    beams, _ = beam_finalize(plain._state)
    alts = [t for t, _ in beams[0] if t != base]
    assert alts, "need at least one alternative hypothesis"
    # find a token more frequent in some alternative than in the best
    target = None
    for alt in alts:
        for tok in set(alt):
            if alt.count(tok) > base.count(tok):
                target = tok
                break
        if target is not None:
            chosen_alt = alt
            break
    assert target is not None

    fused = StreamingBeam(1, K, cap=32,
                          scorers=[(FavorToken(target), 1000.0)])
    fused.update(jnp.asarray(logits), 20)
    best = fused.finalize()[0]
    assert best.count(target) >= chosen_alt.count(target)
    assert best != base or base.count(target) == max(
        t.count(target) for t, _ in beams[0]
    )


@pytest.fixture(scope="module")
def tiny_model():
    cfg = va.VelocityASRConfig(
        d_model=16, ssm_layers=2, ssm_state_dim=4, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=30, dropout=0.0,
    )
    model = va.create_model(cfg)
    params = va.init_params(model, jax.random.PRNGKey(0), example_frames=64)
    decoder = va.CTCDecoder(va.create_default_vocabulary(30))
    return model, params, decoder


def test_live_beam_matches_batched_beam(tiny_model):
    """StreamingTranscriber(beam_width=K) == BatchedStreamingTranscriber
    beam mode on the same audio (the live path commits per chunk; the
    batched path finalizes once — same beams either way)."""
    from velocity_asr_tpu.streaming import (
        BatchedStreamingTranscriber,
        StreamingTranscriber,
    )

    model, params, decoder = tiny_model
    rng = np.random.default_rng(7)
    audios = [
        (rng.standard_normal(n) * 0.1).astype(np.float32)
        for n in (9000, 14000)
    ]

    singles = []
    st = StreamingTranscriber(model, params, decoder, chunk_frames=50,
                              beam_width=4)
    for a in audios:
        st.reset()
        text = "".join(st.feed(a[s : s + 8000]) for s in range(0, len(a), 8000))
        singles.append(text + st.finish())

    bt = BatchedStreamingTranscriber(
        model, params, decoder, chunk_frames=50, batch_size=2, beam_width=4
    )
    assert bt.transcribe_batch(audios) == singles


def test_live_beam_width1_equals_greedy_text(tiny_model):
    """A width-2 beam on near-deterministic logits should agree with the
    greedy streaming text (same argmax path dominates); mainly exercises
    the full feed/commit/finalize loop end to end."""
    from velocity_asr_tpu.streaming import StreamingTranscriber

    model, params, decoder = tiny_model
    rng = np.random.default_rng(11)
    audio = (rng.standard_normal(12000) * 0.1).astype(np.float32)

    greedy = StreamingTranscriber(model, params, decoder, chunk_frames=50)
    g = greedy.feed(audio) + greedy.finish()

    beam = StreamingTranscriber(model, params, decoder, chunk_frames=50,
                                beam_width=8)
    b = beam.feed(audio) + beam.finish()
    # beam >= greedy in acoustic score; texts usually match on tiny random
    # models — allow difference but require a sane non-degenerate result
    assert isinstance(b, str)
    assert abs(len(b) - len(g)) <= max(4, len(g))


def test_beam_lookahead_streaming_runs(tiny_model):
    """Beam decoding composes with lookahead emission (the emit-path
    logits feed the carried beam)."""
    from velocity_asr_tpu.streaming import BatchedStreamingTranscriber

    model, params, decoder = tiny_model
    rng = np.random.default_rng(13)
    audios = [(rng.standard_normal(9000) * 0.1).astype(np.float32)]
    bt = BatchedStreamingTranscriber(
        model, params, decoder, chunk_frames=50, batch_size=1,
        lookahead_chunks=1, beam_width=4,
    )
    out = bt.transcribe_batch(audios)
    assert len(out) == 1 and isinstance(out[0], str)


def test_beam_words_match_greedy_on_agreeing_transcripts(tiny_model):
    """VERDICT r4 item 7: word timestamps compose with the streaming beam.
    The in-beam span tracker records emission frame + run length along
    the winning hypothesis, so wherever the beam's transcript agrees with
    greedy, its word timings (and confidences) must match the greedy
    frame-aligned path exactly."""
    from velocity_asr_tpu.streaming import StreamingTranscriber

    model, params, decoder = tiny_model
    rng = np.random.default_rng(61)
    audio = (rng.standard_normal(25000) * 0.1).astype(np.float32)

    greedy = StreamingTranscriber(model, params, decoder, chunk_frames=50)
    greedy.feed(audio)
    greedy.finish()

    beam = StreamingTranscriber(model, params, decoder, chunk_frames=50,
                                beam_width=4)
    beam.feed(audio)
    beam.finish()

    # acoustic-only beam == greedy on peaked-enough paths; this seed's
    # transcripts agree (the premise of the comparison)
    assert beam.text == greedy.text
    gw, bw = greedy.words(), beam.words()
    assert len(bw) == len(gw) and len(gw) > 0
    for g, b in zip(gw, bw):
        assert (b["word"], b["start"], b["end"]) == \
            (g["word"], g["start"], g["end"])
        assert b["confidence"] == pytest.approx(g["confidence"], abs=1e-5)

    # take_new_words parity: incremental emission drains to the same list
    # (mel running stats accumulate in feed order, so confidences wiggle
    # at ~1e-8 like the batched greedy tests document)
    beam.reset()
    inc = []
    for i in range(0, len(audio), 4000):
        beam.feed(audio[i:i + 4000])
        inc.extend(beam.take_new_words())
    beam.finish()
    inc.extend(beam.take_new_words(flush=True))
    assert len(inc) == len(bw)
    for g, b in zip(bw, inc):
        assert (b["word"], b["start"], b["end"]) == \
            (g["word"], g["start"], g["end"])
        assert b["confidence"] == pytest.approx(g["confidence"], abs=1e-6)


def test_transcribe_streaming_beam_factory(tiny_model):
    """scripts/transcribe.make_streaming_transcriber wires beam_width and
    scorers into the StreamingTranscriber (the CLI's --streaming
    --beam-width --lm path)."""
    import sys

    sys.path.insert(0, ".")
    from scripts.transcribe import make_streaming_transcriber

    model, params, decoder = tiny_model

    class Zero:
        def score(self, toks):
            return 0.0

    st = make_streaming_transcriber(model, params, decoder,
                                    chunk_seconds=0.5, beam_width=4,
                                    beam_scorers=[(Zero(), 0.5)])
    assert st._sbeam is not None and st._sbeam.beam_width == 4
    assert st.chunk_frames == 50
    audio = np.zeros(12000, np.float32)
    text = st.feed(audio) + st.finish()
    assert isinstance(text, str)
