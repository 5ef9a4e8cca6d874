"""Character n-gram LM: KN estimation, scorer contract, fusion.

The reference's beam search exposes the lm_scorer/lm_weight hook
(reference decode.py:188-190) but ships no LM; velocity_asr_tpu.lm
implements one behind that contract.
"""

import math

import numpy as np
import pytest

from velocity_asr_tpu.lm import BOS, CharNGramLM, CombinedScorer
from velocity_asr_tpu.synth import SyntheticSpeechDataset


@pytest.fixture(scope="module")
def corpus():
    ds = SyntheticSpeechDataset(800, split="train")
    texts = [ds.text_for(i) for i in range(800)]
    return ds, texts


@pytest.fixture(scope="module")
def lm(corpus):
    ds, texts = corpus
    return CharNGramLM.train(texts[100:], dict(ds.vocab), order=4)


class TestCharNGramLM:
    def test_distribution_normalized(self, lm, corpus):
        ds, texts = corpus
        ids = [ds.vocab[c] for c in texts[0]]
        for ctx in ([], ids[:1], ids[:3], ids[:10]):
            mass = sum(
                math.exp(lm.log_prob(ctx, w)) for w in range(lm.vocab_size)
            )
            assert mass == pytest.approx(1.0, abs=2e-3), ctx

    def test_incremental_equals_total(self, lm, corpus):
        ds, texts = corpus
        ids = [ds.vocab[c] for c in texts[1]]
        inc = sum(lm.score(ids[: i + 1]) for i in range(len(ids)))
        assert inc == pytest.approx(lm.total_score(ids), abs=1e-9)

    def test_empty_prefix(self, lm):
        assert lm.score([]) == 0.0
        assert lm.total_score([]) == 0.0

    def test_heldout_beats_uniform_and_junk(self, lm, corpus):
        ds, texts = corpus
        ppl_holdout = lm.perplexity(texts[:100])
        assert ppl_holdout < 8.0  # uniform would be vocab_size = 30
        ppl_junk = lm.perplexity(["zzqx jxq wvv kkk"])
        assert ppl_junk > 3 * ppl_holdout

    def test_in_lexicon_word_beats_scrambled(self, lm, corpus):
        ds, texts = corpus
        word = texts[0].split()[0]
        scrambled = word[::-1]
        if word == scrambled:
            word = texts[1].split()[0]
            scrambled = word[::-1]
        ids = [ds.vocab[c] for c in word]
        ids_s = [ds.vocab[c] for c in scrambled]
        assert lm.total_score(ids) > lm.total_score(ids_s)

    def test_unseen_token_finite(self, lm):
        # every id in the vocab range scores finitely even if unseen
        for w in range(lm.vocab_size):
            assert np.isfinite(lm.log_prob([], w))

    def test_save_load_roundtrip(self, lm, corpus, tmp_path):
        ds, texts = corpus
        path = str(tmp_path / "lm.json.gz")
        lm.save(path)
        lm2 = CharNGramLM.load(path)
        ids = [ds.vocab[c] for c in texts[2]]
        assert lm2.total_score(ids) == pytest.approx(
            lm.total_score(ids), abs=1e-12
        )
        assert lm2.order == lm.order
        assert lm2.token_to_idx == lm.token_to_idx

    def test_rejects_empty_corpus(self, corpus):
        ds, _ = corpus
        with pytest.raises(ValueError):
            CharNGramLM.train([], dict(ds.vocab))

    def test_bos_sentinel_not_a_token(self):
        assert BOS == -1


class TestCombinedScorer:
    def test_weighted_sum(self, lm, corpus):
        ds, texts = corpus
        ids = [ds.vocab[c] for c in texts[3]]

        class Flat:
            def score(self, toks):
                return 1.0

            def total_score(self, toks):
                return float(len(toks))

        comb = CombinedScorer([(lm, 0.5), (Flat(), 2.0)])
        assert comb.score(ids) == pytest.approx(0.5 * lm.score(ids) + 2.0)
        assert comb.total_score(ids) == pytest.approx(
            0.5 * lm.total_score(ids) + 2.0 * len(ids)
        )

    def test_rejects_empty(self):
        with pytest.raises(ValueError):
            CombinedScorer([])


class TestBeamFusion:
    def test_lm_steers_beam_on_tie(self, lm, corpus):
        """On an acoustically ambiguous logit sequence, shallow fusion must
        pick the LM-preferred (in-lexicon) continuation."""
        from velocity_asr_tpu.decode import ctc_beam_search

        ds, texts = corpus
        word = next(w for t in texts for w in t.split() if len(w) >= 4)
        ids = [ds.vocab[c] for c in word]
        scrambled = ids[:2] + ids[:1] + ids[2:]  # an off-lexicon variant

        v = lm.vocab_size
        t_len = 2 * len(ids)
        logits = np.full((t_len, v), -10.0, np.float32)
        # every char frame is a coin flip between the word's char and a
        # random other char; the LM must break the ties toward the word
        rng = np.random.default_rng(0)
        for i, tok in enumerate(ids):
            other = int(rng.integers(3, v))
            logits[2 * i, tok] = 5.0
            logits[2 * i, other] = 5.0 + 1e-3  # acoustics slightly prefer junk
            logits[2 * i + 1, 0] = 5.0  # blank separators
        res_no = ctc_beam_search(logits[None], beam_width=8)
        res_lm = ctc_beam_search(
            logits[None], beam_width=8, lm_scorer=lm, lm_weight=1.5
        )
        del scrambled
        assert list(res_lm[0][0].tokens) == ids
        assert list(res_no[0][0].tokens) != ids
