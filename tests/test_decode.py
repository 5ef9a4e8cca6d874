"""CTC decoding tests: vectorized greedy vs. naive loop, timestamps, beam
search parity with the reference algorithm."""

import numpy as np
import pytest

from velocity_asr_tpu.decode import (
    CTCDecoder,
    create_default_vocabulary,
    ctc_beam_search,
    ctc_greedy_decode,
    ctc_greedy_decode_with_timestamps,
)


def naive_greedy(preds, blank=0):
    """Direct transcription of reference decode.py:51-69."""
    out = []
    for row in preds:
        tokens, prev = [], None
        for token in row:
            if token == blank:
                prev = None
                continue
            if token == prev:
                continue
            tokens.append(int(token))
            prev = token
        out.append(tokens)
    return out


def logits_for(preds, vocab=8):
    preds = np.asarray(preds)
    logits = np.full(preds.shape + (vocab,), -5.0, np.float32)
    for b in range(preds.shape[0]):
        for t in range(preds.shape[1]):
            logits[b, t, preds[b, t]] = 5.0
    return logits


def test_greedy_matches_naive_loop():
    rng = np.random.default_rng(0)
    preds = rng.integers(0, 5, size=(6, 40))
    got = ctc_greedy_decode(logits_for(preds))
    assert got == naive_greedy(preds)


def test_greedy_repeat_after_blank_kept():
    preds = np.array([[1, 1, 0, 1, 2, 2, 0, 0, 2]])
    assert ctc_greedy_decode(logits_for(preds)) == [[1, 1, 2, 2]]


def test_greedy_no_collapse():
    preds = np.array([[1, 1, 0, 2]])
    assert ctc_greedy_decode(logits_for(preds), collapse_repeated=False) == [[1, 1, 2]]


def test_timestamps():
    preds = np.array([[0, 1, 1, 0, 2, 3, 0]])
    results = ctc_greedy_decode_with_timestamps(logits_for(preds))
    tokens, stamps = results[0]
    assert tokens == [1, 2, 3]
    assert stamps == [(1, 3), (4, 5), (5, 6)]


def test_timestamps_match_torch_reference(torch_reference):
    import torch

    rng = np.random.default_rng(3)
    preds = rng.integers(0, 4, size=(3, 30))
    logits = logits_for(preds)
    ref = torch_reference.decode.ctc_greedy_decode_with_timestamps(
        torch.from_numpy(logits)
    )
    ours = ctc_greedy_decode_with_timestamps(logits)
    for (rt, rs), (ot, os_) in zip(ref, ours):
        assert rt == ot
        assert rs == os_


def test_beam_search_matches_reference(torch_reference):
    import torch

    rng = np.random.default_rng(1)
    logits = rng.standard_normal((2, 12, 6)).astype(np.float32)

    ref = torch_reference.ctc_beam_search(torch.from_numpy(logits), beam_width=4)
    ours = ctc_beam_search(logits, beam_width=4)

    for ref_beams, our_beams in zip(ref, ours):
        assert [r.tokens for r in ref_beams] == [o.tokens for o in our_beams]
        np.testing.assert_allclose(
            [r.score for r in ref_beams], [o.score for o in our_beams], rtol=1e-4
        )


def test_beam_search_best_matches_greedy_on_peaked_logits():
    preds = np.array([[0, 1, 0, 2, 2, 0, 3]])
    logits = logits_for(preds)
    beams = ctc_beam_search(logits, beam_width=4)
    assert beams[0][0].tokens == [1, 2, 3]


def test_decoder_text_roundtrip():
    vocab = create_default_vocabulary(100)
    dec = CTCDecoder(vocab)
    tokens = dec.text_to_tokens("hello world")
    text = dec._tokens_to_text(tokens)
    assert text == "hello world"


def test_default_vocabulary():
    vocab = create_default_vocabulary(1000)
    assert len(vocab) == 1000
    assert vocab[:4] == ["<blank>", "<unk>", "<pad>", " "]
    assert vocab[4] == "a"
    assert vocab[999] == "<token_999>"


def test_jax_beam_matches_host_beam():
    from velocity_asr_tpu.beam import beams_to_token_lists, ctc_beam_search_jax

    rng = np.random.default_rng(7)
    logits = rng.standard_normal((3, 15, 8)).astype(np.float32)

    host = ctc_beam_search(logits, beam_width=5)
    import numpy as _np

    tokens, lengths, scores = ctc_beam_search_jax(logits, beam_width=5)
    jax_lists = beams_to_token_lists(_np.asarray(tokens), _np.asarray(lengths))

    for b in range(3):
        host_tokens = [r.tokens for r in host[b]]
        host_scores = [r.score for r in host[b]]
        assert jax_lists[b][: len(host_tokens)] == host_tokens
        _np.testing.assert_allclose(
            _np.asarray(scores)[b, : len(host_scores)], host_scores, rtol=1e-4
        )


def test_jax_beam_larger_vocab():
    from velocity_asr_tpu.beam import beams_to_token_lists, ctc_beam_search_jax

    rng = np.random.default_rng(8)
    logits = rng.standard_normal((1, 30, 100)).astype(np.float32)
    host = ctc_beam_search(logits, beam_width=8)
    tokens, lengths, scores = ctc_beam_search_jax(logits, beam_width=8)
    jax_lists = beams_to_token_lists(np.asarray(tokens), np.asarray(lengths))
    assert jax_lists[0][0] == host[0][0].tokens
    np.testing.assert_allclose(float(scores[0, 0]), host[0][0].score, rtol=1e-4)


def test_decoder_jax_beam_text():
    vocab = create_default_vocabulary(12)
    dec = CTCDecoder(vocab)
    preds = np.array([[0, 4, 0, 5, 5, 0, 6]])
    logits = logits_for(preds, vocab=12)
    assert dec.decode_beam_search(logits, beam_width=4, backend="jax") == \
        dec.decode_beam_search(logits, beam_width=4, backend="host")


class ToyLM:
    """Prefers token 3 sequences: score = +1 per '3', -0.5 per other."""

    def score(self, tokens):
        return sum(1.0 if t == 3 else -0.5 for t in tokens)


def test_lm_hook_jax_rescoring_is_exact_over_nbest():
    """The jax beam's LM hook must (a) equal the host beam at lm_weight=0,
    and (b) implement exact n-best rescoring: top-1 = argmax over the
    acoustic beams of acoustic + w * lm.score(tokens). (In-search LM
    scoring — the host path, reference decode.py:188-190 — can leave the
    acoustic beam entirely when the LM dominates, so cross-backend parity
    is only required at w=0.)"""
    rng = np.random.default_rng(3)
    vocab = 6
    logits = rng.standard_normal((2, 8, vocab)).astype(np.float32) * 4.0
    decoder = CTCDecoder([f"t{i}" if i else "<blank>" for i in range(vocab)])
    lm = ToyLM()

    # (a) w=0 parity with the host reference semantics
    jax0 = decoder.decode_beam_search(
        logits, beam_width=16, return_all_beams=True, backend="jax",
        lm_scorer=lm, lm_weight=0.0,
    )
    host0 = decoder.decode_beam_search(
        logits, beam_width=16, return_all_beams=True, backend="host",
        lm_scorer=lm, lm_weight=0.0,
    )
    for jb, hb in zip(jax0, host0):
        assert jb[0].tokens == hb[0].tokens
        np.testing.assert_allclose(jb[0].score, hb[0].score, rtol=1e-5, atol=1e-4)

    # (b) exact rescoring over the acoustic n-best
    w = 0.7
    rescored = decoder.decode_beam_search(
        logits, beam_width=16, return_all_beams=True, backend="jax",
        lm_scorer=lm, lm_weight=w,
    )
    for acoustic, got in zip(jax0, rescored):
        want = max(
            acoustic, key=lambda r: r.score + w * lm.score(r.tokens)
        )
        assert got[0].tokens == want.tokens
        np.testing.assert_allclose(
            got[0].score, want.score + w * lm.score(want.tokens), rtol=1e-5
        )


def test_lm_hook_changes_ranking():
    """With a strong LM the selected hypothesis must differ from the pure
    acoustic choice on ambiguous logits."""
    rng = np.random.default_rng(5)
    vocab = 6
    logits = rng.standard_normal((4, 10, vocab)).astype(np.float32) * 0.3
    decoder = CTCDecoder([f"t{i}" if i else "<blank>" for i in range(vocab)])
    lm = ToyLM()
    plain = decoder.decode_beam_search(logits, beam_width=8, return_all_beams=True)
    with_lm = decoder.decode_beam_search(
        logits, beam_width=8, return_all_beams=True, lm_scorer=lm, lm_weight=5.0
    )
    changed = any(p[0].tokens != w[0].tokens for p, w in zip(plain, with_lm))
    assert changed


def test_words_with_timestamps_subword_boundaries():
    """A multi-char '▁'-prefixed token starts a NEW word (same rule as
    CTCDecoder._tokens_to_text, which maps '▁' to a space) — regression
    for adjacent words being merged in --timestamps output."""
    from scripts.transcribe import words_with_timestamps

    vocab = ["<blank>", "▁hel", "lo", "▁world", " ", "a", "▁"]
    tokens = [1, 2, 3]  # ▁hel + lo, then ▁world
    stamps = [(0, 1), (2, 3), (5, 7)]
    words = words_with_timestamps(tokens, stamps, vocab, 160, 16000)
    assert [w["word"] for w in words] == ["hello", "world"]
    assert words[0]["start"] == 0.0
    assert words[1]["start"] == 5 * 2 * 160 / 16000

    # chars + explicit spaces still work
    tokens = [5, 4, 5, 5]
    stamps = [(0, 0), (1, 1), (2, 2), (3, 3)]
    words = words_with_timestamps(tokens, stamps, vocab, 160, 16000)
    assert [w["word"] for w in words] == ["a", "aa"]

    # bare '▁' token is a pure separator
    tokens = [5, 6, 5]
    stamps = [(0, 0), (1, 1), (2, 2)]
    words = words_with_timestamps(tokens, stamps, vocab, 160, 16000)
    assert [w["word"] for w in words] == ["a", "a"]


def test_words_with_timestamps_confidence():
    """token_logprobs attach per-word confidence = exp of the
    span-length-weighted mean log posterior of the word's content tokens
    (boundary space tokens excluded)."""
    import math

    from velocity_asr_tpu.decode import words_with_timestamps

    vocab = ["<blank>", " ", "a", "b"]
    tokens = [2, 3, 1, 2]  # "ab a"
    stamps = [(0, 2), (2, 3), (3, 5), (5, 6)]
    lps = [math.log(0.9), math.log(0.5), math.log(0.1), math.log(0.8)]
    words = words_with_timestamps(tokens, stamps, vocab, 160, 16000,
                                  token_logprobs=lps)
    assert [w["word"] for w in words] == ["ab", "a"]
    # "ab": spans 2 and 1 frames -> weighted mean of log(.9), log(.5)
    exp0 = math.exp((2 * lps[0] + 1 * lps[1]) / 3)
    assert abs(words[0]["confidence"] - exp0) < 1e-9
    # the space's log(0.1) must NOT leak into either word
    assert abs(words[1]["confidence"] - 0.8) < 1e-9
    # without logprobs the field is absent (backwards compatible)
    plain = words_with_timestamps(tokens, stamps, vocab, 160, 16000)
    assert all("confidence" not in w for w in plain)


def test_token_logprobs_from_frames():
    import math

    import numpy as np

    from velocity_asr_tpu.decode import token_logprobs_from_frames

    frame_lp = np.log(np.array([0.9, 0.3, 0.3, 0.6], np.float32))
    lps = token_logprobs_from_frames(frame_lp, [(0, 1), (1, 3), (3, 3)])
    assert abs(lps[0] - math.log(0.9)) < 1e-6
    assert abs(lps[1] - math.log(0.3)) < 1e-6
    assert abs(lps[2] - math.log(0.6)) < 1e-6  # empty span clamps to 1 frame


def test_align_tokens_to_frames_matches_greedy_on_peaked_logits():
    """CTC Viterbi forced alignment (the offline beam+timestamps path,
    VERDICT r4 item 7) reproduces the greedy collapse spans and token
    posteriors exactly when the aligned sequence is the argmax path —
    including a duplicate token separated by a blank."""
    from velocity_asr_tpu.decode import (
        _log_softmax_np,
        align_tokens_to_frames,
        timestamps_from_predictions,
        token_logprobs_from_frames,
    )

    preds = np.array([0, 4, 4, 0, 5, 5, 3, 0, 3, 3, 0, 0], np.int64)
    V = 8
    logits = np.full((len(preds), V), -6.0, np.float32)
    logits[np.arange(len(preds)), preds] = 6.0
    lsm = _log_softmax_np(logits)

    tokens, stamps = timestamps_from_predictions(preds[None])[0]
    assert tokens == [4, 5, 3, 3]
    a_stamps, a_lp = align_tokens_to_frames(lsm, tokens)
    assert a_stamps == [tuple(s) for s in stamps]
    want_lp = token_logprobs_from_frames(lsm.max(-1), stamps)
    np.testing.assert_allclose(a_lp, want_lp, atol=1e-5)

    # unalignable sequences fail loudly, not silently
    with pytest.raises(ValueError):
        align_tokens_to_frames(lsm[:3], [1, 1, 1, 1])
