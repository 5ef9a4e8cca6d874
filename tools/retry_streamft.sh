#!/bin/bash
# Relaunch the streaming-aware fine-tune (48k -> 52k) once the TPU tunnel
# is back. Probes jax.devices() with a bounded timeout; on success, runs
# the documented command from configs/train_synth_stream.yaml's header.
cd /root/repo
LOG=checkpoints/synth_run/train_streamft3.log
for i in $(seq 1 60); do
  if timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "TPU up after probe $i; launching fine-tune" | tee -a "$LOG"
    exec python scripts/train.py \
      --config configs/train_synth_stream.yaml \
      --model-config configs/model_synth.yaml \
      --resume checkpoints/synth_run/final_model \
      --max-steps 52000 >> "$LOG" 2>&1
  fi
  echo "probe $i failed; sleeping 120s" >> "$LOG"
  sleep 120
done
echo "TPU never came back after 60 probes" >> "$LOG"
exit 1
