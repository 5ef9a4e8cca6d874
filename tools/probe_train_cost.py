"""Train-step cost decomposition at the full recipe shape (dev tool, TPU).

Times, at batch 8 x FRAMES:
  fwd        : jit model forward only
  fwd+loss   : forward + CTC loss value
  grad       : value_and_grad (fwd + bwd)
  step       : full Trainer device step (grad + clip + AdamW/MultiSteps)
  scan8      : the 8 local-SSM Pallas scans alone (fwd)
  scan8 grad : the 8 scans alone, fwd + bwd

Usage: python tools/probe_train_cost.py [frames] [batch]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from velocity_asr_tpu.models.config import VelocityASRConfig
from velocity_asr_tpu.models.model import create_model, forward, init_params
from velocity_asr_tpu.training import Trainer, TrainingConfig

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 8
VOCAB = 30
REP = 4


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)  # sync
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(REP)]
    for o in outs:
        jax.tree_util.tree_map(np.asarray, o)
    dt = (time.perf_counter() - t0) / REP
    print(f"{name:12s}: {dt*1e3:8.1f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    cfg = VelocityASRConfig(dtype="bfloat16", scan_mode="pallas", vocab_size=VOCAB)
    model = create_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0), example_frames=64)
    mel = jnp.asarray(rng.standard_normal((BATCH, FRAMES, 80)), jnp.float32)

    fwd = jax.jit(lambda p, m: jnp.sum(forward(model, p, m, train=False)))
    timeit("fwd", fwd, params, mel)

    # full device train step via the Trainer (same graph as training)
    batch = {
        "mel_spectrogram": np.asarray(mel),
        "targets": rng.integers(3, VOCAB, size=(BATCH, 60)).astype(np.int32),
        "input_lengths": np.full((BATCH,), FRAMES, np.int32),
        "target_lengths": np.full((BATCH,), 60, np.int32),
    }
    tc = TrainingConfig(max_steps=8, warmup_steps=2, log_interval=10**9,
                        eval_interval=10**9, save_interval=10**9,
                        gradient_accumulation_steps=4)

    def batches():
        while True:
            yield batch

    tr = Trainer(model, tc, batches())
    timeit("step", tr._train_step_device, batch)

    # steady-state loop with transfer prefetch (what Trainer.train runs)
    dev_iter = tr._device_batches()
    tr._train_step_sharded(next(dev_iter))  # warm
    import numpy as _np
    t0 = time.perf_counter()
    losses = [tr._train_step_sharded(next(dev_iter)) for _ in range(REP)]
    _np.asarray(losses[-1])
    print(f"{'step+prefetch':12s}: {(time.perf_counter()-t0)/REP*1e3:8.1f} ms")

    # loss+grad without the optimizer (isolates optax/MultiSteps cost)
    from velocity_asr_tpu.training import CTCLoss

    ctc = CTCLoss()
    out_lens = (batch["input_lengths"] + 1) // 2

    def loss_fn(p, m, tgt, tl):
        logits = forward(model, p, m, train=False)
        return ctc(logits, tgt, jnp.asarray(out_lens), tl)

    loss_jit = jax.jit(loss_fn)
    timeit("fwd+loss", loss_jit, params, mel,
           jnp.asarray(batch["targets"]), jnp.asarray(batch["target_lengths"]))
    # reduce grads to a scalar ON DEVICE: the host tunnel is ~slow, so
    # downloading the 6M-param grad pytree would swamp the measurement
    def grad_scalar(p, m, tgt, tl):
        val, grads = jax.value_and_grad(loss_fn)(p, m, tgt, tl)
        return val + sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))

    grad_jit = jax.jit(grad_scalar)
    timeit("grad", grad_jit, params, mel,
           jnp.asarray(batch["targets"]), jnp.asarray(batch["target_lengths"]))

    # scans alone (the 8-layer local stack's scan op, fwd and fwd+bwd)
    from velocity_asr_tpu.ops.scan_pallas import selective_scan_pallas

    L = (FRAMES + 1) // 2
    d_inner, n_state = cfg.d_inner, cfg.ssm_state_dim
    xs = jnp.asarray(rng.standard_normal((BATCH, L, d_inner)), jnp.float32)
    dts = jnp.asarray(np.abs(rng.standard_normal((BATCH, L, d_inner))) * 0.4, jnp.float32)
    As = -jnp.exp(jnp.log(jnp.arange(1, n_state + 1, dtype=jnp.float32)))
    Bs = jnp.asarray(rng.standard_normal((BATCH, L, n_state)), jnp.float32)
    Cs = jnp.asarray(rng.standard_normal((BATCH, L, n_state)), jnp.float32)
    Ds = jnp.ones((d_inner,), jnp.float32)

    def scans8(x):
        for _ in range(8):
            x = selective_scan_pallas(x, dts, As, Bs, Cs, Ds)
        return x

    s8 = jax.jit(lambda x: jnp.sum(scans8(x)))
    t_scan8 = timeit("scan8 fwd", s8, xs)
    s8g = jax.jit(lambda x: jnp.sum(jax.grad(lambda z: jnp.sum(scans8(z)))(x)))
    t_scan8g = timeit("scan8 grad", s8g, xs)

    # CTC loss alone on precomputed logits (isolates the loss recursion
    # from the encoder forward)
    logits = jnp.asarray(
        rng.standard_normal((BATCH, L, VOCAB)).astype(np.float32)
    )
    ctc_only = jax.jit(
        lambda lg, tgt, tl: ctc(lg, tgt, jnp.asarray(out_lens), tl)
    )
    t_ctc = timeit("ctc only", ctc_only, logits,
                   jnp.asarray(batch["targets"]),
                   jnp.asarray(batch["target_lengths"]))

    # Re-time the pieces gathered above into an attribution table
    # (VERDICT r3 item 2: nothing published attributed the train step).
    t_fwd = timeit("fwd (re)", fwd, params, mel)
    t_loss = timeit("fwd+loss", loss_jit, params, mel,
                    jnp.asarray(batch["targets"]),
                    jnp.asarray(batch["target_lengths"]))
    t_grad = timeit("grad (re)", grad_jit, params, mel,
                    jnp.asarray(batch["targets"]),
                    jnp.asarray(batch["target_lengths"]))
    t_step = timeit("step (re)", tr._train_step_device, batch)

    ms = lambda t: f"{t*1e3:7.1f} ms"  # noqa: E731
    print("\n--- attribution (batch %d x %d frames) ---" % (BATCH, FRAMES))
    print(f"full step            : {ms(t_step)}")
    print(f"  fwd+bwd (grad)     : {ms(t_grad)}  "
          f"({100*t_grad/t_step:.0f}% of step)")
    print(f"    scan kernels     : {ms(t_scan8g)}  "
          f"({100*t_scan8g/t_step:.0f}% of step; fwd alone {ms(t_scan8)})")
    print(f"    CTC loss         : {ms(t_ctc)}  "
          f"({100*t_ctc/t_step:.0f}% of step)")
    print(f"    dense rest (fwd) : {ms(max(t_fwd - t_scan8, 0.0))}  "
          f"(fwd {ms(t_fwd)} - scan8 {ms(t_scan8)})")
    print(f"  optimizer+accum    : {ms(max(t_step - t_grad, 0.0))}  "
          f"(step - grad; AdamW/MultiSteps + clip)")
    print(f"  loss-only overhead : {ms(max(t_loss - t_fwd, 0.0))}  "
          f"(fwd+loss - fwd; includes CTC fused in graph)")
    print(f"per-sample wall      : {t_step/BATCH*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
