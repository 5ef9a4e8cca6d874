#!/bin/bash
# Round-4 TPU job queue: runs the round's measurement and training legs
# back-to-back on the one real chip so it never sits idle. Each job logs
# to /tmp/r4_<job>.log and a failure does not stop the queue.
cd "$(dirname "$0")/.."
SYN=checkpoints/synth_run/final_pretrained
LM=checkpoints/synth_run/lm.json.gz
TEST=data/synth_test/test_manifest.jsonl

j() {  # j <name> <cmd...>
  local name=$1; shift
  echo "=== [$(date +%H:%M:%S)] $name ==="
  ( "$@" ) > "/tmp/r4_${name}.log" 2>&1 \
    && echo "--- $name OK" || echo "--- $name FAILED (see /tmp/r4_${name}.log)"
}

ev() {  # ev <out_name> <ckpt> <extra args...>
  local name=$1 ckpt=$2; shift 2
  j "eval_${name}" python scripts/evaluate.py --checkpoint "$ckpt" \
    --test-set "$TEST" --output "checkpoints/synth_run/eval_${name}.json" "$@"
}

# A. flagship NEW streaming-beam legs (VERDICT r3 item 3 headline
#    numbers). The offline beam8_lm row stands from r3 (the committed LM
#    is the same fit); chip time goes to the new capability instead.
ev streaming_beam8 "$SYN" --streaming --beam-width 8
ev streaming_beam8_lm "$SYN" --streaming --beam-width 8 --lm "$LM"

# B. train-step attribution at the recipe shape + batch-scaling probe
#    (VERDICT r3 item 2)
j probe_b8  python tools/probe_train_cost.py 1600 8
j probe_b16 python tools/probe_train_cost.py 1600 16

# C. MoE multilingual fine-tune + evals (VERDICT r3 item 1: make MoE earn
#    its place against the dense multilingual's 4.63% mono regression)
j moe_ml_train python scripts/train.py \
    --config configs/train_synth_multilang_moe.yaml \
    --model-config configs/model_synth_multilang_moe.yaml \
    --init-from "$SYN"
j moe_ml_eval python scripts/evaluate.py \
    --checkpoint checkpoints/multilang_moe_run/final_pretrained \
    --test-set data/synth_test_ml/test_manifest.jsonl --identify-language \
    --output checkpoints/multilang_moe_run/eval_multilang.json
j moe_ml_mono python scripts/evaluate.py \
    --checkpoint checkpoints/multilang_moe_run/final_pretrained \
    --test-set "$TEST" \
    --output checkpoints/multilang_moe_run/eval_mono_regression.json

# D. speaker encoder v2: mixed utterance lengths + 2.5x the voices
#    (VERDICT r3 item 4), then re-tune clustering on dev and report test
j spk_v2_train python scripts/diarize.py train \
    --checkpoint-dir checkpoints/speaker_v2 --num-speakers 160 \
    --utts-per-speaker 150 --steps 4000 --max-words 24 --bf16
j spk_v2_tune python tools/tune_clustering.py \
    --speaker-model checkpoints/speaker_v2/final_speaker --split dev \
    --cache /tmp/spk_v2_dev.npz
j spk_v2_known python scripts/diarize.py eval \
    --speaker-model checkpoints/speaker_v2/final_speaker --known-speakers \
    --out checkpoints/speaker_v2/der_known_k.json
j spk_v2_unknown python scripts/diarize.py eval \
    --speaker-model checkpoints/speaker_v2/final_speaker \
    --out checkpoints/speaker_v2/der_unknown_k.json

# E. pretraining v2: 10x pool, 3.3x steps (VERDICT r3 item 5)
j pretrain_v2 python scripts/pretrain.py --config configs/pretrain_v2.yaml \
    --model-config configs/model_synth.yaml

# F. label-efficiency grid: {2%, 10%, 100%} x {scratch, pretrained}
BB=checkpoints/pretrain_v2/final_backbone
j ft2_scratch    python scripts/train.py --config configs/finetune.yaml \
    --model-config configs/model_synth.yaml --checkpoint-dir checkpoints/ft2_scratch
j ft2_pretrained python scripts/train.py --config configs/finetune.yaml \
    --model-config configs/model_synth.yaml --init-from "$BB" \
    --checkpoint-dir checkpoints/ft2_pretrained
j ft10_scratch    python scripts/train.py --config configs/finetune_10pct.yaml \
    --model-config configs/model_synth.yaml --checkpoint-dir checkpoints/ft10_scratch
j ft10_pretrained python scripts/train.py --config configs/finetune_10pct.yaml \
    --model-config configs/model_synth.yaml --init-from "$BB" \
    --checkpoint-dir checkpoints/ft10_pretrained
for leg in ft2_scratch ft2_pretrained ft10_scratch ft10_pretrained; do
  j "eval_${leg}" python scripts/evaluate.py \
    --checkpoint "checkpoints/${leg}/final_pretrained" --test-set "$TEST" \
    --output "checkpoints/${leg}/eval_fp32.json"
done

# G. 100%-label legs (equal shortened budget) — only if the clock allows;
#    the 100% point is otherwise anchored by the flagship's own
#    from-scratch full recipe (18k steps -> 3.62%).
if [ -z "$SKIP_FT100" ]; then
  j ft100_pretrained python scripts/train.py --config configs/finetune_100pct.yaml \
      --model-config configs/model_synth.yaml --init-from "$BB" \
      --checkpoint-dir checkpoints/ft100_pretrained
  j ft100_scratch    python scripts/train.py --config configs/finetune_100pct.yaml \
      --model-config configs/model_synth.yaml --checkpoint-dir checkpoints/ft100_scratch
  for leg in ft100_scratch ft100_pretrained; do
    j "eval_${leg}" python scripts/evaluate.py \
      --checkpoint "checkpoints/${leg}/final_pretrained" --test-set "$TEST" \
      --output "checkpoints/${leg}/eval_fp32.json"
  done
fi

echo "=== [$(date +%H:%M:%S)] QUEUE DONE ==="
