#!/bin/bash
# Held-out eval suite over the synthetic test set (1000 unseen
# utterances): FP32, INT8-dynamic, INT8-static (calibrated), beam search
# (plain / +LM fusion), and the streaming path (greedy, lookahead, and
# chunk-carried beam +/- LM) — the accuracy deltas the reference reports
# (README.md:255, 274-275) reproduced on the in-container corpus.
#
# Usage: tools/run_synth_evals.sh <checkpoint_dir> [outdir] [lm_path]
set -e
CKPT=${1:?usage: run_synth_evals.sh <checkpoint_dir> [outdir] [lm_path]}
OUT=${2:-checkpoints/synth_run}
LM=${3:-checkpoints/synth_run/lm.json.gz}
TEST=data/synth_test/test_manifest.jsonl
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name ==="
  python scripts/evaluate.py --checkpoint "$CKPT" --test-set "$TEST" \
    --output "$OUT/eval_${name}.json" "$@" 2>&1 | tail -3
}

run fp32_final
run int8_dynamic --int8
run int8_static --int8-static --calib-batches 8
run beam8 --beam-width 8
run beam8_lm --beam-width 8 --lm "$LM"
run streaming --streaming
run streaming_la1 --streaming --lookahead 1
run streaming_la2 --streaming --lookahead 2
run streaming_beam8 --streaming --beam-width 8
run streaming_beam8_lm --streaming --beam-width 8 --lm "$LM"
run streaming_la1_beam8_lm --streaming --lookahead 1 --beam-width 8 --lm "$LM"
run streaming_la2_beam8_lm --streaming --lookahead 2 --beam-width 8 --lm "$LM"

# Optional legs:
#   TFLITE=1  — export + evaluate the edge artifacts on the full set
#               (CPU-bound; tools/eval_tflite.py)
#   The MoE artifact runs the SAME battery:
#     tools/run_synth_evals.sh checkpoints/moe_run/final_pretrained \
#         checkpoints/moe_run
if [ -n "$TFLITE" ]; then
  for variant in dynamic float16; do
    tag=$([ "$variant" = dynamic ] && echo int8 || echo fp16)
    echo "=== tflite_${tag} ==="
    python scripts/export_model.py --checkpoint "$CKPT" \
      --output-dir "export_tfl_${tag}" --frames 704 --tflite "$variant" \
      2>&1 | tail -2
    python tools/eval_tflite.py --tflite "export_tfl_${tag}/velocity_asr.tflite" \
      --checkpoint "$CKPT" --max-utts 0 \
      --output "$OUT/eval_tflite_${tag}_full.json" 2>&1 | tail -2
  done
fi
echo "=== summary ==="
OUT="$OUT" python - <<'EOF'
import glob, json, os
for f in sorted(glob.glob(os.path.join(os.environ["OUT"], "eval_*.json"))):
    d = json.load(open(f))
    rtf = d.get("rtf", d.get("rtf_cpu"))
    print(f"{f.split('/')[-1]:28s} WER {d['wer']*100:6.2f}%  CER {d['cer']*100:5.2f}%  RTF {rtf:.5f}")
EOF
