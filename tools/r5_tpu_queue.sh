#!/bin/bash
# Round-5 TPU job queue (run AFTER the speaker-v2p retrain finishes):
# the round's measurement and training legs back-to-back on the one real
# chip. Each job logs to /tmp/r5_<job>.log; a failure does not stop the
# queue; every job is timeout-bounded (tunnel wedge discipline,
# CLAUDE.md). Ordered by VERDICT r4 priority.
cd "$(dirname "$0")/.."
SYN=checkpoints/synth_run/final_pretrained
LM=checkpoints/synth_run/lm.json.gz
TEST=data/synth_test/test_manifest.jsonl
TESTML=data/synth_test_ml/test_manifest.jsonl

j() {  # j <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] $name ==="
  ( timeout "$t" "$@" ) > "/tmp/r5_${name}.log" 2>&1 \
    && echo "--- $name OK" || echo "--- $name FAILED/TIMEOUT (see /tmp/r5_${name}.log)"
}

# 0. quick bench sanity (new spread fields) — also warms the chip
j bench 1800 python bench.py

# 1. speaker v2p: clustering tune on dev, then the DER battery
#    (VERDICT item 1). Default thresholds here; the dev-best variant is
#    re-run by hand from the tune log.
SPK=checkpoints/speaker_v2p/final_speaker
j spk_tune 2400 python tools/tune_clustering.py --speaker-model "$SPK" \
    --split dev --cache /tmp/r5_spk_dev.npz
j spk_known 2400 python scripts/diarize.py eval --speaker-model "$SPK" \
    --known-speakers --out checkpoints/speaker_v2p/der_known_k.json
j spk_unknown 2400 python scripts/diarize.py eval --speaker-model "$SPK" \
    --out checkpoints/speaker_v2p/der_unknown_k.json

# 2. the flagship live-path composition rows (VERDICT item 2):
#    lookahead x beam x LM
j eval_la1_beam8_lm 2400 python scripts/evaluate.py --checkpoint "$SYN" \
    --test-set "$TEST" --streaming --lookahead 1 --beam-width 8 --lm "$LM" \
    --output checkpoints/synth_run/eval_streaming_la1_beam8_lm.json
j eval_la2_beam8_lm 2400 python scripts/evaluate.py --checkpoint "$SYN" \
    --test-set "$TEST" --streaming --lookahead 2 --beam-width 8 --lm "$LM" \
    --output checkpoints/synth_run/eval_streaming_la2_beam8_lm.json

# 3. MoE battery completion (VERDICT item 3)
# 3a. streaming-aware fine-tune of the MoE artifact (the leg the dense
#     flagship got and MoE lacked)
j moe_streamft 7200 python scripts/train.py \
    --config configs/train_synth_moe_stream.yaml \
    --model-config configs/model_synth_moe.yaml \
    --init-from checkpoints/moe_run/final_pretrained
MOEFT=checkpoints/moe_stream_ft/final_pretrained
j eval_moeft_fp32 2400 python scripts/evaluate.py --checkpoint "$MOEFT" \
    --test-set "$TEST" \
    --output checkpoints/moe_stream_ft/eval_fp32.json
j eval_moeft_streaming 2400 python scripts/evaluate.py --checkpoint "$MOEFT" \
    --test-set "$TEST" --streaming \
    --output checkpoints/moe_stream_ft/eval_streaming.json
j eval_moeft_streaming_beam_lm 2400 python scripts/evaluate.py --checkpoint "$MOEFT" \
    --test-set "$TEST" --streaming --beam-width 8 --lm "$LM" \
    --output checkpoints/moe_stream_ft/eval_streaming_beam8_lm.json
# 3b. int8 x MoE retry (wedged twice in r4; CPU-interpret correctness now
#     pinned in tests/test_moe.py) — one bounded retry on a fresh client
j eval_moe_int8 2400 python scripts/evaluate.py \
    --checkpoint checkpoints/moe_run/final_pretrained \
    --test-set "$TEST" --int8 \
    --output checkpoints/moe_run/eval_int8_dynamic.json

# 4. full-horizon pretraining comparison (VERDICT item 5): extend BOTH
#    ft100 arms 6k -> 18k micro-steps in 6k segments (host-leak
#    discipline: fresh process per segment), then eval the endpoints.
for arm in scratch pretrained; do
  for seg in 12000 18000; do
    j ft100_${arm}_to${seg} 7200 python scripts/train.py \
        --config configs/finetune_100pct.yaml \
        --model-config configs/model_synth.yaml \
        --checkpoint-dir checkpoints/ft100_${arm} \
        --resume "$(ls -d checkpoints/ft100_${arm}/checkpoint_step_* | sort -t_ -k3 -n | tail -1)" \
        --max-steps ${seg} --lr-total-steps 4500
  done
  j eval_ft100_${arm}_18k 2400 python scripts/evaluate.py \
      --checkpoint checkpoints/ft100_${arm}/final_pretrained \
      --test-set "$TEST" \
      --output checkpoints/ft100_${arm}/eval_fp32_18k.json
done

# 5. multilingual-MoE router sweep (VERDICT item 6): 3 configs on the
#    exact r4 recipe + the decisive English-regression eval + router
#    utilization evidence.
sweep() {  # sweep <variant> <model_cfg>
  local v=$1 mc=$2
  j ml_moe_${v}_train 9000 python scripts/train.py \
      --config configs/train_synth_multilang_moe_${v}.yaml \
      --model-config "configs/${mc}" \
      --init-from "$SYN"
  j ml_moe_${v}_mono 2400 python scripts/evaluate.py \
      --checkpoint checkpoints/multilang_moe_${v}/final_pretrained \
      --test-set "$TEST" \
      --output checkpoints/multilang_moe_${v}/eval_mono_regression.json
  j ml_moe_${v}_ml 2400 python scripts/evaluate.py \
      --checkpoint checkpoints/multilang_moe_${v}/final_pretrained \
      --test-set "$TESTML" --identify-language \
      --output checkpoints/multilang_moe_${v}/eval_multilang.json
  j ml_moe_${v}_router 2400 python tools/router_stats.py \
      --checkpoint checkpoints/multilang_moe_${v}/final_pretrained \
      --test-set "$TESTML" \
      --output checkpoints/multilang_moe_${v}/router_stats.json
}
sweep top1 model_synth_multilang_moe_top1.yaml
sweep aux10 model_synth_multilang_moe.yaml
sweep cap2 model_synth_multilang_moe_cap2.yaml
# router stats for the r4 baseline artifact too (comparison row)
j ml_moe_base_router 2400 python tools/router_stats.py \
    --checkpoint checkpoints/multilang_moe_run/final_pretrained \
    --test-set "$TESTML" \
    --output checkpoints/multilang_moe_run/router_stats.json

echo "=== [$(date +%H:%M:%S)] R5 QUEUE DONE ==="
