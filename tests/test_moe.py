"""Mixture-of-experts FFN + expert parallelism (models/moe.py,
parallel/tp.py EP rules).

Net-new capacity-scaling extension — the reference SSM block is always
dense (/root/reference/velocity_asr/ssm.py:340-441). Correctness
anchors: at top_k = num_experts with no capacity pressure the routed
output must equal the full softmax mixture of experts (computed
naively); EP-sharded forward must equal replicated; the Trainer must
consume the sown Switch aux loss.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from velocity_asr_tpu.models.config import VelocityASRConfig
from velocity_asr_tpu.models.moe import MoEFFN
from velocity_asr_tpu.models.model import (
    create_model, forward, from_pretrained, init_params, save_pretrained,
)
from velocity_asr_tpu.parallel.mesh import create_mesh
from velocity_asr_tpu.parallel.tp import shard_params_tp
from velocity_asr_tpu.training import Trainer, TrainingConfig


def _x(b=2, t=12, d=8, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal((b, t, d)), jnp.float32
    )


def test_topk_all_experts_equals_dense_mixture():
    """top_k=E with capacity >= T is exact soft routing: out must equal
    sum_e gate_e * FFN_e(x) with no dispatch/combine artifacts."""
    d, h, E = 8, 16, 4
    x = _x(d=d)
    m = MoEFFN(d_model=d, hidden=h, num_experts=E, top_k=E,
               capacity_factor=float(E), dropout=0.0)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply({"params": v["params"]}, x)
    p = v["params"]
    gates = jax.nn.softmax(x @ p["router"]["kernel"])
    ref = jnp.zeros_like(x)
    for e in range(E):
        he = jax.nn.gelu(x @ p["w_in"][e] + p["b_in"][e], approximate=False)
        ref = ref + gates[..., e : e + 1] * (he @ p["w_out"][e] + p["b_out"][e])
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_grouped_dispatch_matches_dense_mixture_with_padding():
    """Small dispatch groups (T not divisible by S, so the last group is
    padded) must not change the result when capacity never binds — the
    router is per-token and padded slots are masked out of routing."""
    d, h, E = 8, 16, 4
    x = _x(t=19, d=d, seed=7)  # 19 % 8 != 0 -> padded final group
    m = MoEFFN(d_model=d, hidden=h, num_experts=E, top_k=E,
               capacity_factor=float(E), dropout=0.0, group_size=8)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply({"params": v["params"]}, x)
    p = v["params"]
    gates = jax.nn.softmax(x @ p["router"]["kernel"])
    ref = jnp.zeros_like(x)
    for e in range(E):
        he = jax.nn.gelu(x @ p["w_in"][e] + p["b_in"][e], approximate=False)
        ref = ref + gates[..., e : e + 1] * (he @ p["w_out"][e] + p["b_out"][e])
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-6)
    # aux loss from the padded apply is still the valid-token statistic
    _, mut = m.apply({"params": v["params"]}, x, mutable=["losses"])
    aux = jax.tree_util.tree_leaves(mut["losses"])
    assert len(aux) == 1 and np.isfinite(float(aux[0]))


def test_top1_routes_each_token_to_argmax_expert():
    d, h, E = 8, 16, 4
    x = _x(d=d, seed=3)
    m = MoEFFN(d_model=d, hidden=h, num_experts=E, top_k=1,
               capacity_factor=float(E), dropout=0.0)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply({"params": v["params"]}, x)
    p = v["params"]
    gates = jax.nn.softmax(x @ p["router"]["kernel"])
    idx = np.asarray(jnp.argmax(gates, -1))
    for b in range(x.shape[0]):
        for t in range(x.shape[1]):
            e = idx[b, t]
            he = jax.nn.gelu(
                x[b, t] @ p["w_in"][e] + p["b_in"][e], approximate=False
            )
            # top-1 normalization: the single kept gate normalizes to 1.
            ref = he @ p["w_out"][e] + p["b_out"][e]
            np.testing.assert_allclose(
                np.asarray(y[b, t]), np.asarray(ref), rtol=1e-5, atol=1e-6
            )


def test_capacity_drop_passthrough_is_zero():
    """With capacity 1, overflowing tokens must contribute exactly zero
    (the block's residual carries them); kept tokens keep real outputs."""
    d, h, E = 8, 16, 2
    x = _x(t=10, d=d, seed=4)
    # capacity_factor tiny -> C=1 per expert
    m = MoEFFN(d_model=d, hidden=h, num_experts=E, top_k=1,
               capacity_factor=0.05, dropout=0.0)
    v = m.init(jax.random.PRNGKey(0), x)
    y = np.asarray(m.apply({"params": v["params"]}, x))
    gates = jax.nn.softmax(x @ v["params"]["router"]["kernel"])
    idx = np.asarray(jnp.argmax(gates, -1))
    # Per batch row, only the FIRST token routed to each expert is kept.
    for b in range(x.shape[0]):
        seen = set()
        for t in range(x.shape[1]):
            e = int(idx[b, t])
            if e in seen:
                assert np.all(y[b, t] == 0.0), (b, t)
            else:
                assert np.any(y[b, t] != 0.0), (b, t)
                seen.add(e)


def test_aux_loss_sown_once_per_layer_and_uniform_floor():
    d, h, E = 8, 16, 4
    x = _x(d=d)
    m = MoEFFN(d_model=d, hidden=h, num_experts=E, top_k=2, dropout=0.0)
    v = m.init(jax.random.PRNGKey(0), x)
    _, mut = m.apply({"params": v["params"]}, x, mutable=["losses"])
    aux = jax.tree_util.tree_leaves(mut["losses"])
    assert len(aux) == 1
    # E * sum f_e P_e >= 1 with equality at a perfectly uniform router.
    assert float(aux[0]) >= 0.99
    # plain apply (immutable collection): sow is a no-op, not an error
    y = m.apply({"params": v["params"]}, x)
    assert bool(jnp.isfinite(y).all())


def _tiny_moe_cfg(**kw):
    kw.setdefault("dropout", 0.0)
    kw.setdefault("vocab_size", 32)
    return VelocityASRConfig(
        d_model=16, ssm_layers=2, ssm_state_dim=8, global_ssm_layers=1,
        global_ssm_state_dim=4, attention_heads=2, attention_dim=8,
        moe_experts=4, moe_top_k=2, **kw,
    )


def test_model_with_moe_forward_and_checkpoint_roundtrip(tmp_path):
    cfg = _tiny_moe_cfg()
    model = create_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0), example_frames=16)
    assert "moe" in params["local_ssm"]["layers_0"]
    assert "ffn_in" not in params["local_ssm"]["layers_0"]
    mel = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 32, 80)), jnp.float32
    )
    ref = forward(model, params, mel)
    assert ref.shape == (2, 16, 32) and bool(jnp.isfinite(ref).all())

    save_pretrained(str(tmp_path / "ck"), cfg, params)
    m2, p2 = from_pretrained(str(tmp_path / "ck"))
    assert m2.config.moe_experts == 4
    out2 = forward(m2, p2, mel)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref))


def test_expert_parallel_forward_matches_replicated():
    """EP: expert weights sharded over the model axis on a (4,2) mesh;
    forward must equal the replicated one (XLA inserts the dispatch
    collectives from the shardings alone)."""
    cfg = _tiny_moe_cfg()
    model = create_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0), example_frames=16)
    mel = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 32, 80)), jnp.float32
    )
    ref = forward(model, params, mel)
    mesh = create_mesh(n_data=4, n_model=2)
    sharded = shard_params_tp(params, mesh)
    w = sharded["local_ssm"]["layers_0"]["moe"]["w_in"]
    assert w.addressable_shards[0].data.shape[0] == cfg.moe_experts // 2
    out = jax.jit(lambda p, m: forward(model, p, m))(sharded, mel)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def _batch(rng, batch=4, t=32, vocab=32):
    return {
        "mel_spectrogram": rng.standard_normal((batch, t, 80)).astype(np.float32),
        "targets": rng.integers(3, vocab, size=(batch, 6)).astype(np.int32),
        "input_lengths": np.full((batch,), t, np.int32),
        "target_lengths": np.full((batch,), 6, np.int32),
    }


def test_trainer_moe_ep_step_and_aux_loss():
    """dp+ep training: expert params and their Adam moments shard over the
    model axis; the aux term is consumed (loss with weight > loss with
    weight 0 on the same init/batch, since aux > 0)."""
    model = create_model(_tiny_moe_cfg())
    rng = np.random.default_rng(1)
    batch = _batch(rng)

    def batches():
        while True:
            yield batch

    base = dict(max_steps=1, warmup_steps=1, log_interval=10**9,
                eval_interval=10**9, save_interval=10**9,
                num_model_shards=2, num_data_shards=4)
    params = init_params(model, jax.random.PRNGKey(0), example_frames=16)
    t1 = Trainer(model, TrainingConfig(**base), batches(), params=params)
    t0 = Trainer(model, TrainingConfig(moe_aux_weight=0.0, **base), batches(),
                 params=init_params(model, jax.random.PRNGKey(0),
                                    example_frames=16))
    m1 = t1.train_step(batch)
    m0 = t0.train_step(batch)
    assert np.isfinite(m1["loss"]) and np.isfinite(m0["loss"])
    assert m1["loss"] > m0["loss"]  # aux >= 1, weight 0.01
    k = t1.params["local_ssm"]["layers_0"]["moe"]["w_in"]
    assert k.addressable_shards[0].data.shape[0] == 2
    assert np.isfinite(t1.eval_step(batch)["eval_loss"])


def test_moe_streaming_matches_offline():
    """MoE routing is per-token, so chunked streaming equals the offline
    forward when capacity never binds (generous factor)."""
    from velocity_asr_tpu.models.ssm import SSMBlock

    blk = SSMBlock(d_model=16, state_dim=8, dropout=0.0, moe_experts=4,
                   moe_top_k=2, moe_capacity_factor=8.0)
    x = _x(b=2, t=16, d=16, seed=5)
    v = blk.init(jax.random.PRNGKey(0), x)
    full = blk.apply({"params": v["params"]}, x)
    state = None
    outs = []
    for c in range(4):
        chunk = x[:, c * 4 : (c + 1) * 4]
        out, state = blk.apply(
            {"params": v["params"]}, chunk, False, state, True
        )
        outs.append(out)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(outs, axis=1)), np.asarray(full),
        rtol=1e-5, atol=1e-5,
    )


def test_moe_unsupported_combinations_raise():
    model = create_model(_tiny_moe_cfg())
    with pytest.raises(ValueError, match="pipeline"):
        Trainer(model, TrainingConfig(num_pipeline_stages=2, max_steps=1,
                                      warmup_steps=1), iter(()))
    qat_model = create_model(dataclasses.replace(_tiny_moe_cfg(), qat=True))
    with pytest.raises(ValueError, match="QAT"):
        Trainer(qat_model, TrainingConfig(max_steps=1, warmup_steps=1),
                iter(()))


def test_upcycle_dense_to_moe_preserves_forward():
    """Sparse upcycling: a dense checkpoint replicated into identical
    experts (+ near-zero router) must reproduce the dense forward — the
    normalized top-k mixture of identical experts is the dense FFN."""
    from velocity_asr_tpu.models.moe import upcycle_dense_to_moe

    dense_cfg = dataclasses.replace(_tiny_moe_cfg(), moe_experts=0)
    dense = create_model(dense_cfg)
    dparams = init_params(dense, jax.random.PRNGKey(0), example_frames=16)
    mel = jnp.asarray(
        np.random.default_rng(6).standard_normal((2, 32, 80)), jnp.float32
    )
    ref = forward(dense, dparams, mel)

    # generous capacity so the equivalence is exact (no drops)
    moe_cfg = dataclasses.replace(_tiny_moe_cfg(), moe_capacity_factor=8.0)
    moe_model = create_model(moe_cfg)
    up = upcycle_dense_to_moe(dparams, moe_cfg.moe_experts)
    assert "moe" in up["local_ssm"]["layers_0"]
    assert "ffn_in" not in up["local_ssm"]["layers_0"]
    out = forward(moe_model, up, mel)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_moe_config_yaml_mapping():
    from velocity_asr_tpu.utils.config import (
        model_config_from_yaml, training_config_from_yaml,
    )

    cfg = model_config_from_yaml(
        {"ssm": {"num_layers": 2, "moe_experts": 8, "moe_top_k": 1,
                 "moe_capacity_factor": 2.0}}
    )
    assert (cfg.moe_experts, cfg.moe_top_k, cfg.moe_capacity_factor) == (8, 1, 2.0)
    tcfg = training_config_from_yaml({"training": {"moe_aux_weight": 0.1}})
    assert tcfg.moe_aux_weight == 0.1
    # preset
    assert VelocityASRConfig.from_preset("moe").moe_experts == 8


def test_streaming_forward_collect_losses_matches_plain():
    """streaming_forward(collect_losses=True) returns the same logits as
    the plain call plus a positive Switch aux (mean over chunks of the
    mean over MoE layers) — the hook that lets the streaming-aware
    objective compose with MoE (VERDICT r4 item 3a)."""
    from velocity_asr_tpu.streaming import streaming_forward

    cfg = _tiny_moe_cfg()
    model = create_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0), example_frames=16)
    mel = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 64, 80)), jnp.float32
    )
    plain = streaming_forward(model, params, mel, 32)
    logits, aux = streaming_forward(model, params, mel, 32,
                                    collect_losses=True)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(logits))
    # Switch aux is E * sum(f_e * p_e) >= 1 at any routing
    assert float(aux) >= 1.0 - 1e-5


@pytest.mark.slow
def test_trainer_moe_streaming_objective_step():
    """The streaming-aware objective composes with MoE (the r4 guard is
    gone): the mixed loss consumes the streaming term's own sown aux and
    the step optimizes."""
    from velocity_asr_tpu.data import ASRCollator
    from velocity_asr_tpu.synth import SyntheticSpeechDataset

    cfg = _tiny_moe_cfg(vocab_size=31)
    model = create_model(cfg)
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


def test_moe_int8_inference_matches_fp32():
    """int8 x MoE correctness (VERDICT r4 item 3b): the int8 path
    quantizes the attention/head stack and never the expert einsums, so
    an int8 MoE forward must stay close to fp32 with matching argmax on
    most frames. The r4 TPU-tunnel compile wedge was a compile-time
    pathology; this pins the numerics somewhere that always runs (CPU)."""
    cfg = _tiny_moe_cfg()
    model = create_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0), example_frames=16)
    mel = jnp.asarray(
        np.random.default_rng(11).standard_normal((2, 64, 80)), jnp.float32
    )
    ref = np.asarray(forward(model, params, mel))

    int8_model = create_model(
        dataclasses.replace(_tiny_moe_cfg(), int8_inference=True)
    )
    got = np.asarray(forward(int8_model, params, mel))
    assert np.isfinite(got).all()
    # int8 quantization error bound: logits stay close...
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert err < 0.15, err
    # ...and the decode-relevant argmax agrees on nearly every frame
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.9, agree
