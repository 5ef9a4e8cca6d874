"""Pipeline parallelism (parallel/pp.py): GPipe-style microbatch stages
over the mesh's model axis must be numerically exact vs the sequential
layer loop — forward, gradients, full model, and one Trainer step.

The reference has no parallelism at all (its `distributed:` stanza is
dead, /root/reference/configs/train.yaml:87-91); this is the net-new
SURVEY §2.4 pipeline axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from velocity_asr_tpu.models.config import VelocityASRConfig
from velocity_asr_tpu.models.model import create_model, forward, init_params
from velocity_asr_tpu.models.ssm import LocalSSMProcessor
from velocity_asr_tpu.parallel import pipeline_parallel
from velocity_asr_tpu.parallel.mesh import create_mesh
from velocity_asr_tpu.parallel.pp import _resolve_microbatches


def _stack(num_layers=4, **kw):
    return LocalSSMProcessor(
        d_model=16, num_layers=num_layers, state_dim=8, dropout=0.0, **kw
    )


def _init(mod, batch=4, t=24):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, t, mod.d_model)),
        jnp.float32,
    )
    return mod.init(jax.random.PRNGKey(0), x), x


@pytest.mark.parametrize("stages,microbatches", [(2, 2), (2, 4), (4, 2), (4, None)])
def test_pipeline_forward_matches_sequential(stages, microbatches):
    mod = _stack()
    variables, x = _init(mod)
    ref = mod.apply(variables, x)
    mesh = create_mesh(n_data=8 // stages, n_model=stages)
    with pipeline_parallel(mesh, microbatches=microbatches):
        out = jax.jit(lambda p, x: mod.apply({"params": p}, x))(
            variables["params"], x
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pipeline_gradients_match_sequential():
    mod = _stack()
    variables, x = _init(mod)
    loss = lambda p: jnp.sum(mod.apply({"params": p}, x) ** 2)  # noqa: E731
    g_ref = jax.grad(loss)(variables["params"])
    mesh = create_mesh(n_data=4, n_model=2)
    with pipeline_parallel(mesh, microbatches=4):
        g_pp = jax.jit(jax.grad(loss))(variables["params"])
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pp)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_pipeline_with_remat_matches():
    """use_checkpoint routes each pipelined layer through jax.checkpoint;
    values and gradients are unchanged."""
    mod = _stack(use_checkpoint=True)
    variables, x = _init(mod)
    ref = mod.apply(variables, x)
    loss = lambda p: jnp.sum(mod.apply({"params": p}, x) ** 2)  # noqa: E731
    g_ref = jax.grad(loss)(variables["params"])
    mesh = create_mesh(n_data=4, n_model=2)
    with pipeline_parallel(mesh):
        out = jax.jit(lambda p, x: mod.apply({"params": p}, x))(
            variables["params"], x
        )
        g_pp = jax.jit(jax.grad(loss))(variables["params"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pp)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def _tiny_cfg(**kw):
    kw.setdefault("dropout", 0.0)
    return VelocityASRConfig(
        d_model=32, ssm_layers=4, ssm_state_dim=8, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        vocab_size=64, **kw,
    )


def test_full_model_forward_under_pipeline():
    """The whole flagship graph traced under pipeline_parallel equals the
    plain forward (only the local stack pipelines; the global context,
    head, and streaming paths are untouched)."""
    model = create_model(_tiny_cfg())
    params = init_params(model, jax.random.PRNGKey(0), example_frames=16)
    mel = jnp.asarray(
        np.random.default_rng(1).standard_normal((4, 64, 80)), jnp.float32
    )
    ref = forward(model, params, mel)
    mesh = create_mesh(n_data=4, n_model=2)
    with pipeline_parallel(mesh):
        out = jax.jit(lambda p, m: forward(model, p, m))(params, mel)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def _batch(rng, batch=4, t=32, vocab=64):
    return {
        "mel_spectrogram": rng.standard_normal((batch, t, 80)).astype(np.float32),
        "targets": rng.integers(3, vocab, size=(batch, 6)).astype(np.int32),
        "input_lengths": np.full((batch,), t, np.int32),
        "target_lengths": np.full((batch,), 6, np.int32),
    }


def test_trainer_pipeline_step_matches_plain():
    """One dp+pp Trainer step updates parameters identically to the plain
    dp step (dropout off; same batch, same init)."""
    from velocity_asr_tpu.training import Trainer, TrainingConfig

    model = create_model(_tiny_cfg())
    rng = np.random.default_rng(2)
    batch = _batch(rng)

    def batches():
        while True:
            yield batch

    base = dict(max_steps=2, warmup_steps=1, log_interval=10**9,
                eval_interval=10**9, save_interval=10**9)
    t_plain = Trainer(
        model, TrainingConfig(**base), batches(),
        params=init_params(model, jax.random.PRNGKey(0), example_frames=16),
        mesh=create_mesh(n_data=4, n_model=2),
    )
    t_pp = Trainer(
        model,
        TrainingConfig(num_pipeline_stages=2, pipeline_microbatches=2, **base),
        batches(),
        params=init_params(model, jax.random.PRNGKey(0), example_frames=16),
        mesh=create_mesh(n_data=4, n_model=2),
    )
    m_plain = t_plain.train_step(batch)
    m_pp = t_pp.train_step(batch)
    assert np.isfinite(m_plain["loss"]) and np.isfinite(m_pp["loss"])
    # Step-1 loss: identical inputs through both graphs.
    np.testing.assert_allclose(m_pp["loss"], m_plain["loss"], rtol=1e-5, atol=1e-6)
    # Step-2 loss reflects step-1's update. Exact param equality after an
    # Adam step is NOT asserted: near-zero-gradient leaves (fresh zero
    # biases) get +-lr * m/sqrt(v) where fp32 reassociation across the
    # pipeline's psum flips the sign of ~1e-12 gradients — Adam amplifies
    # that roundoff to the full step size. Gradient equivalence itself is
    # pinned at module level (test_pipeline_gradients_match_sequential);
    # here the second-step loss shows the update landed equivalently.
    m_plain2 = t_plain.train_step(batch)
    m_pp2 = t_pp.train_step(batch)
    np.testing.assert_allclose(m_pp2["loss"], m_plain2["loss"], rtol=1e-3)


def test_trainer_pipeline_with_dropout_runs():
    """Under train-time dropout the pipelined step draws a differently-
    folded (but valid, per layer x microbatch) stream — losses must stay
    finite and decrease-able, not equal."""
    from velocity_asr_tpu.training import Trainer, TrainingConfig

    model = create_model(_tiny_cfg(dropout=0.1))
    rng = np.random.default_rng(3)
    batch = _batch(rng)

    def batches():
        while True:
            yield batch

    trainer = Trainer(
        model,
        TrainingConfig(num_pipeline_stages=2, max_steps=1, warmup_steps=1,
                       log_interval=10**9, eval_interval=10**9,
                       save_interval=10**9),
        batches(),
        mesh=create_mesh(n_data=4, n_model=2),
    )
    assert np.isfinite(trainer.train_step(batch)["loss"])


def test_pipeline_errors():
    from velocity_asr_tpu.training import Trainer, TrainingConfig

    # stage count must divide the layer stack
    mod = _stack(num_layers=3)
    variables, x = _init(mod)
    mesh = create_mesh(n_data=4, n_model=2)
    with pipeline_parallel(mesh):
        with pytest.raises(ValueError, match="divide"):
            mod.apply(variables, x)

    # sp scan mode cannot nest inside the pipeline
    mod_sp = _stack(scan_mode="sp")
    v2, x2 = _init(_stack())  # init with the parallel tier
    with pipeline_parallel(mesh):
        with pytest.raises(ValueError, match="sp"):
            mod_sp.apply(v2, x2)

    # TP/PP axis-size conflict is a config error
    model = create_model(_tiny_cfg())
    with pytest.raises(ValueError, match="model axis|equal"):
        Trainer(
            model,
            TrainingConfig(num_model_shards=4, num_pipeline_stages=2,
                           max_steps=1, warmup_steps=1),
            iter(()),
        )


def test_streaming_ignores_pipeline_context():
    """Stateful (streaming) calls keep the sequential loop even under an
    active pipeline context — carried state must stay exact."""
    mod = _stack()
    variables, x = _init(mod, batch=2)
    ref, ref_states = mod.apply(variables, x, False, None, True)
    mesh = create_mesh(n_data=4, n_model=2)
    with pipeline_parallel(mesh):
        out, states = mod.apply(variables, x, False, None, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_states), jax.tree_util.tree_leaves(states)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_resolve_microbatches():
    assert _resolve_microbatches(batch=8, stages=2, requested=None) == 2
    assert _resolve_microbatches(batch=8, stages=2, requested=8) == 8
    assert _resolve_microbatches(batch=6, stages=4, requested=None) == 3
    assert _resolve_microbatches(batch=1, stages=4, requested=None) == 1
    assert _resolve_microbatches(batch=7, stages=4, requested=None) == 1
