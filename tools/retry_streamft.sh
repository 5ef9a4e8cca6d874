#!/bin/bash
# Relaunch the streaming-aware fine-tune once the TPU tunnel is back.
# Probes jax.devices() with a bounded timeout; on success, runs the
# documented command from configs/train_synth_stream.yaml's header.
# Trainer Orbax checkpoints are scratch (gitignored), so the fine-tune
# initializes from the shipped msgpack artifact via --init-from.
cd /root/repo
LOG=checkpoints/stream_ft/train_streamft.log
mkdir -p checkpoints/stream_ft
for i in $(seq 1 60); do
  if timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "TPU up after probe $i; launching fine-tune" | tee -a "$LOG"
    exec python scripts/train.py \
      --config configs/train_synth_stream.yaml \
      --model-config configs/model_synth.yaml \
      --init-from checkpoints/synth_run/final_pretrained >> "$LOG" 2>&1
  fi
  echo "probe $i failed; sleeping 120s" >> "$LOG"
  sleep 120
done
echo "TPU never came back after 60 probes" >> "$LOG"
exit 1
