"""Hot-word boosting tests (velocity_asr_tpu/hotwords.py).

The reference lists hot-word boosting as planned future work
(README.md "Planned Extensions") with no code; these tests pin the
implemented shallow-fusion semantics: trie credits, retraction of
non-matching words, score/total_score consistency, and end-to-end beam
integration on both decoder backends.
"""

import numpy as np
import pytest

from velocity_asr_tpu.decode import CTCDecoder, create_default_vocabulary
from velocity_asr_tpu.hotwords import HotwordBooster, load_hotwords_arg

VOCAB = create_default_vocabulary(30)  # specials + " " + a-z exactly
T2I = {t: i for i, t in enumerate(VOCAB)}
SP = T2I[" "]


def _ids(text):
    return [T2I[c] for c in text]


def test_trie_and_oov_filtering():
    b = HotwordBooster(["cat", "Dog ", "", "naïve"], T2I)
    assert tuple(_ids("cat")) in b.words
    assert tuple(_ids("dog")) in b.words  # lowercased, stripped
    assert len(b.words) == 2  # "naïve" has an OOV char -> skipped
    assert tuple(_ids("ca")) in b.prefixes
    with pytest.raises(ValueError, match="no usable hotwords"):
        HotwordBooster(["ñ"], T2I)


def test_phrases_decompose_into_words():
    b = HotwordBooster(["deep learning"], T2I)
    assert tuple(_ids("deep")) in b.words
    assert tuple(_ids("learning")) in b.words


def test_incremental_scores():
    b = HotwordBooster(["cat"], T2I, bonus_per_char=1.0, completion_bonus=5.0)
    # Characters along the hotword earn +1 each.
    assert b.score(_ids("c")) == 1.0
    assert b.score(_ids("ca")) == 1.0
    assert b.score(_ids("cat")) == 1.0
    # Boundary after a complete hotword: completion bonus.
    assert b.score(_ids("cat ")) == 5.0
    # Falling off the trie retracts the accumulated credit.
    assert b.score(_ids("cab")) == -2.0
    # Boundary after a non-hotword prefix retracts it too.
    assert b.score(_ids("ca ")) == -2.0
    # Unrelated words never score.
    assert b.score(_ids("x")) == 0.0
    assert b.score(_ids("x ")) == 0.0


def test_score_total_score_consistency():
    """Sum of per-extension deltas over every prefix == total_score, so
    the host (in-search) and jax (n-best rescore) backends agree on any
    final hypothesis."""
    rng = np.random.default_rng(0)
    b = HotwordBooster(
        ["cat", "cab", "dog", "a"], T2I, bonus_per_char=0.7,
        completion_bonus=1.3,
    )
    alphabet = _ids("catdogb x")  # includes boundary + off-trie chars
    for _ in range(200):
        seq = [int(rng.choice(alphabet)) for _ in range(int(rng.integers(0, 15)))]
        total = sum(b.score(seq[: i + 1]) for i in range(len(seq)))
        assert total == pytest.approx(b.total_score(seq), abs=1e-9)


def test_total_score_values():
    b = HotwordBooster(["cat"], T2I, bonus_per_char=1.0, completion_bonus=5.0)
    assert b.total_score(_ids("cat ")) == 8.0  # 3 chars + completion
    assert b.total_score(_ids("cat")) == 3.0  # dangling partial keeps credit
    assert b.total_score(_ids("cab ")) == 0.0
    assert b.total_score(_ids("x cat y")) == 8.0
    assert b.total_score([]) == 0.0


def test_load_hotwords_arg(tmp_path):
    f = tmp_path / "words.txt"
    f.write_text("cat\n# comment\ndog  # inline\n\n")
    b = HotwordBooster.from_file(str(f), T2I)
    assert len(b.words) == 2
    assert load_hotwords_arg(None, T2I) is None
    b2 = load_hotwords_arg("cat,dog", T2I)
    assert len(b2.words) == 2
    b3 = load_hotwords_arg(str(f), T2I)
    assert b3.words == b.words


def _biased_logits(right="cat", wrong="cab"):
    """(1, T, V) logits whose argmax path spells `wrong` but where `right`
    is a close runner-up at the one differing frame."""
    t_steps = 2 * len(wrong)
    v = len(VOCAB)
    logits = np.full((1, t_steps, v), -8.0, np.float32)
    for i, (cw, cr) in enumerate(zip(wrong, right)):
        logits[0, 2 * i, T2I[cw]] = 2.0
        if cr != cw:
            logits[0, 2 * i, T2I[cr]] = 1.2  # acoustically second
        logits[0, 2 * i + 1, 0] = 2.0  # blank separator
    return logits


def test_beam_boosting_both_backends():
    logits = _biased_logits()
    decoder = CTCDecoder(VOCAB)
    booster = HotwordBooster(["cat"], T2I)

    for backend in ("host", "jax"):
        plain = decoder.decode_beam_search(
            logits, beam_width=8, backend=backend
        )
        assert plain == ["cab"], (backend, plain)
        boosted = decoder.decode_beam_search(
            logits, beam_width=8, backend=backend,
            lm_scorer=booster, lm_weight=2.0,
        )
        assert boosted == ["cat"], (backend, boosted)


def test_boosting_does_not_hallucinate():
    """A clearly-better acoustic path must survive a modest boost toward
    a different word."""
    logits = _biased_logits()
    # Make the acoustic gap large at the differing frame.
    logits[0, 4, T2I["b"]] = 6.0
    decoder = CTCDecoder(VOCAB)
    booster = HotwordBooster(["cat"], T2I)
    for backend in ("host", "jax"):
        out = decoder.decode_beam_search(
            logits, beam_width=8, backend=backend,
            lm_scorer=booster, lm_weight=1.0,
        )
        assert out == ["cab"], (backend, out)
