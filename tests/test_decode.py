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
