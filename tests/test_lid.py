"""Language identification (multilingual) tests.

The reference's first "Planned Extension" (README.md:480: "Extended
pre-training on multi-lingual datasets with language identification") has
no code there; this covers the TPU implementation end-to-end: synthetic
multilingual corpus -> collator labels -> LID head -> Trainer CE term ->
Transcriber prediction.
"""

import numpy as np
import pytest

import velocity_asr_tpu as va
from velocity_asr_tpu.data import ASRCollator
from velocity_asr_tpu.synth import (
    NUM_SYNTH_LANGUAGES,
    SyntheticSpeechDataset,
    make_language_lexicon,
    make_lexicon,
)
from velocity_asr_tpu.training import Trainer, TrainingConfig


# ----- synthetic multilingual corpus -----------------------------------------


def test_language_zero_is_base_lexicon():
    # corpus continuity: language 0 IS the monolingual corpus, so every
    # earlier checkpoint/eval artifact is "language 0" unchanged
    assert make_language_lexicon(0, 200, seed=7) == make_lexicon(200, seed=7)


def test_language_lexicons_deterministic_and_distinct():
    for lang in range(NUM_SYNTH_LANGUAGES):
        a = make_language_lexicon(lang, 100, seed=3)
        b = make_language_lexicon(lang, 100, seed=3)
        assert a == b
        assert len(set(a)) == 100
    # phonologies are distinct: cross-language word overlap is ~zero
    lex = [set(make_language_lexicon(l, 300)) for l in range(NUM_SYNTH_LANGUAGES)]
    for i in range(1, NUM_SYNTH_LANGUAGES):
        for j in range(i + 1, NUM_SYNTH_LANGUAGES):
            assert len(lex[i] & lex[j]) <= 3


def test_language_lexicon_validates_range():
    with pytest.raises(ValueError):
        make_language_lexicon(NUM_SYNTH_LANGUAGES, 10)
    with pytest.raises(ValueError):
        SyntheticSpeechDataset(4, languages=0)
    with pytest.raises(ValueError):
        SyntheticSpeechDataset(4, languages=NUM_SYNTH_LANGUAGES + 1)


def test_monolingual_dataset_unchanged():
    ds = SyntheticSpeechDataset(8, split="dev")
    item = ds[0]
    assert "language" not in item  # no labels -> LID term stays off
    # languages=1 is byte-identical to the default corpus
    ds1 = SyntheticSpeechDataset(8, split="dev", languages=1)
    assert ds1.text_for(3) == ds.text_for(3)
    assert "language" not in ds1[0]


def test_multilingual_dataset_labels():
    ds = SyntheticSpeechDataset(64, split="dev", languages=4)
    langs = [int(ds[i]["language"]) for i in range(32)]
    # deterministic
    assert langs == [int(ds[i]["language"]) for i in range(32)]
    # all languages represented in a reasonable draw
    assert set(langs) == {0, 1, 2, 3}
    # text matches the labeled language's lexicon
    for i in range(8):
        item = ds[i]
        lexicon = set(ds.lexicons[int(item["language"])])
        assert all(w in lexicon for w in item["text"].split())


def test_collator_passes_language_through():
    ds = SyntheticSpeechDataset(8, split="dev", languages=2)
    batch = ASRCollator()( [ds[i] for i in range(4)] )
    assert batch["language"].dtype == np.int32
    assert batch["language"].shape == (4,)
    assert [int(x) for x in batch["language"]] == [
        ds.language_for(i) for i in range(4)
    ]
    # device-mel collation path carries it too
    ds_dev = SyntheticSpeechDataset(8, split="dev", languages=2, device_mel=True)
    batch_dev = ASRCollator()([ds_dev[i] for i in range(4)])
    assert "audio" in batch_dev
    assert [int(x) for x in batch_dev["language"]] == [
        int(x) for x in batch["language"]
    ]
    # monolingual batches have no key
    ds1 = SyntheticSpeechDataset(8, split="dev")
    assert "language" not in ASRCollator()([ds1[0], ds1[1]])


def test_collator_rejects_mixed_labels():
    """A half-labeled batch is a data bug (e.g. a manifest with some rows
    missing the 'language' field): error, don't silently drop the term."""
    ds = SyntheticSpeechDataset(8, split="dev", languages=2)
    ds1 = SyntheticSpeechDataset(8, split="dev")
    import pytest

    with pytest.raises(ValueError, match="labeled and unlabeled"):
        ASRCollator()([ds[0], ds1[0]])
    with pytest.raises(ValueError, match="labeled and unlabeled"):
        ASRCollator()([ds1[0], ds[0]])  # unlabeled-first order too


# ----- model head -------------------------------------------------------------


def _tiny_cfg(num_languages=0):
    return va.VelocityASRConfig(
        d_model=16, ssm_layers=1, ssm_state_dim=4, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=12, dropout=0.0, num_languages=num_languages,
    )


def test_lid_head_params_and_logits():
    import jax

    from velocity_asr_tpu.models.model import forward, init_params

    model = va.create_model(_tiny_cfg(num_languages=3))
    params = init_params(model, jax.random.PRNGKey(0), example_frames=32)
    assert "lid_head" in params and "lid_norm" in params

    mel = np.random.default_rng(0).standard_normal((2, 32, 80)).astype(np.float32)
    logits, feats = forward(
        model, params, mel, train=False, return_features=True,
        feature_lengths=np.array([16, 10], np.int32),
    )
    assert feats["lid_logits"].shape == (2, 3)
    assert np.all(np.isfinite(np.asarray(feats["lid_logits"])))
    # CTC logits unaffected by the head's presence
    assert logits.shape[-1] == 12


def test_no_head_without_num_languages():
    import jax

    from velocity_asr_tpu.models.model import forward, init_params

    model = va.create_model(_tiny_cfg(num_languages=0))
    params = init_params(model, jax.random.PRNGKey(0), example_frames=32)
    # checkpoint compatibility: no new params when the feature is off
    assert "lid_head" not in params and "lid_norm" not in params
    mel = np.zeros((1, 32, 80), np.float32)
    _, feats = forward(model, params, mel, train=False, return_features=True)
    assert "lid_logits" not in feats


# ----- trainer term -----------------------------------------------------------


def _lid_batch(rng, n=8, langs=3):
    return {
        "mel_spectrogram": rng.standard_normal((n, 50, 80)).astype(np.float32),
        "targets": rng.integers(3, 12, size=(n, 8)).astype(np.int32),
        "input_lengths": np.full((n,), 50, np.int32),
        "target_lengths": np.full((n,), 8, np.int32),
        "language": rng.integers(0, langs, size=(n,)).astype(np.int32),
    }


def test_lid_loss_weight_requires_head():
    model = va.create_model(_tiny_cfg(num_languages=0))
    with pytest.raises(ValueError, match="num_languages"):
        Trainer(
            model,
            TrainingConfig(lid_loss_weight=0.3, warmup_steps=1, max_steps=4),
            iter([]),
        )


@pytest.mark.slow
def test_lid_loss_trains():
    model = va.create_model(_tiny_cfg(num_languages=3))
    rng = np.random.default_rng(0)
    batch = _lid_batch(rng)

    def batches():
        while True:
            yield batch

    tconf = TrainingConfig(
        learning_rate=3e-3, warmup_steps=2, max_steps=8,
        log_interval=10**9, eval_interval=10**9, save_interval=10**9,
        lid_loss_weight=0.5,
    )
    trainer = Trainer(model, tconf, batches())
    losses = [trainer.train_step(batch)["loss"] for _ in range(6)]
    assert all(np.isfinite(l) for l in losses)
    # the combined loss moves (the LID term is live, not a constant)
    assert losses[-1] < losses[0]

    # weight 0 on the same labeled batch trains pure CTC without error
    trainer0 = Trainer(
        model,
        TrainingConfig(learning_rate=3e-3, warmup_steps=2, max_steps=4,
                       log_interval=10**9, eval_interval=10**9,
                       save_interval=10**9),
        batches(),
    )
    assert np.isfinite(trainer0.train_step(batch)["loss"])


# ----- config plumbing --------------------------------------------------------


def test_config_mapping_lid_keys():
    from velocity_asr_tpu.utils.config import (
        model_config_from_yaml,
        training_config_from_yaml,
    )

    mc = model_config_from_yaml({"output": {"vocab_size": 40, "num_languages": 5}})
    assert mc.num_languages == 5
    assert model_config_from_yaml({}).num_languages == 0
    tc = training_config_from_yaml({"training": {"lid_loss_weight": 0.25}})
    assert tc.lid_loss_weight == 0.25
    assert training_config_from_yaml({}).lid_loss_weight == 0.0


def test_config_roundtrip_num_languages():
    cfg = _tiny_cfg(num_languages=4)
    assert va.VelocityASRConfig.from_dict(cfg.to_dict()).num_languages == 4
