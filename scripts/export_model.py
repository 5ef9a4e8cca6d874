#!/usr/bin/env python3
"""Export VELOCITY-ASR TPU models (reference scripts/export_onnx.py).

Loads a checkpoint, writes a StableHLO artifact (+ optional INT8 weight
package), reports sizes, and optionally verifies the exported module by
running it and comparing against the live model
(reference scripts/export_onnx.py:36-74).
"""

import argparse
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from velocity_asr_tpu.utils.platform import apply_platform_env

apply_platform_env()

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s | %(levelname)s | %(message)s"
)
logger = logging.getLogger("export")


def main():
    parser = argparse.ArgumentParser(description="Export VELOCITY-ASR TPU model")
    parser.add_argument("--checkpoint", required=True, help="pretrained checkpoint dir")
    parser.add_argument("--output-dir", default="./export")
    parser.add_argument("--frames", type=int, default=500, help="export frame count")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--quantize", action="store_true", help="also write INT8 weights")
    parser.add_argument("--calibrate", default=None,
                        help="calibrate static INT8 activation scales over a "
                             "JSONL manifest, or 'synthetic' for the built-in "
                             "synthetic corpus (implies --quantize)")
    parser.add_argument("--calibrate-batches", type=int, default=16)
    parser.add_argument("--calibrate-batch-size", type=int, default=4)
    parser.add_argument("--verify", action="store_true", help="reload + compare outputs")
    parser.add_argument("--tflite", nargs="?", const="fp32", default=None,
                        choices=["fp32", "dynamic", "float16"],
                        help="also write a .tflite edge artifact (runs outside "
                             "JAX); optional arg picks the weight precision")
    args = parser.parse_args()

    import jax.numpy as jnp

    from velocity_asr_tpu.export import (
        export_stablehlo,
        export_tflite,
        load_exported,
        run_tflite,
        save_int8_checkpoint,
    )
    from velocity_asr_tpu.models.model import forward, from_pretrained
    from velocity_asr_tpu.quantize import get_model_size_mb

    model, params = from_pretrained(args.checkpoint)
    cfg = model.config
    os.makedirs(args.output_dir, exist_ok=True)

    shape = (args.batch, args.frames, cfg.mel_bins)
    hlo_path = os.path.join(args.output_dir, "velocity_asr.stablehlo")
    export_stablehlo(model, params, hlo_path, input_shape=shape)
    logger.info(
        "StableHLO: %s (%.2f MB); fp32 weights %.2f MB",
        hlo_path, os.path.getsize(hlo_path) / 1e6, get_model_size_mb(params),
    )

    if args.quantize or args.calibrate:
        quant_stats = None
        if args.calibrate:
            # ORT quantize_static analog: run calibration data through the
            # static-int8 inference graph to fix activation scales
            # (reference quantize.py:449-472).
            import dataclasses

            from velocity_asr_tpu.data import ASRCollator
            from velocity_asr_tpu.models.model import create_model
            from velocity_asr_tpu.quantize import calibrate_int8_model

            if args.calibrate == "synthetic":
                from velocity_asr_tpu.synth import SyntheticSpeechDataset

                ds = SyntheticSpeechDataset(
                    args.calibrate_batches * args.calibrate_batch_size,
                    split="calib", seed=1234,
                )
            else:
                from velocity_asr_tpu.data import ASRDataset

                ds = ASRDataset(args.calibrate, max_duration=None, min_duration=0.0)
            from velocity_asr_tpu.data import calibration_batches

            collator = ASRCollator(frame_bucket=200, target_bucket=1)
            batches = calibration_batches(
                ds, collator, args.calibrate_batch_size, args.calibrate_batches
            )
            s_model = create_model(
                dataclasses.replace(cfg, int8_inference=True, int8_static=True)
            )
            quant_stats = calibrate_int8_model(
                s_model, params, batches, num_batches=args.calibrate_batches
            )
            logger.info("Calibrated static INT8 activation scales over %d batches",
                        args.calibrate_batches)
        int8_dir = os.path.join(args.output_dir, "int8")
        info = save_int8_checkpoint(int8_dir, cfg, params, quant_stats=quant_stats)
        logger.info(
            "INT8 package: %s (%d tensors, %.2f MB -> %.2f MB%s)",
            int8_dir, info["quantized_tensors"], info["fp32_mb"], info["int8_mb"],
            ", calibrated" if info.get("calibrated") else "",
        )

    tflite_path = None
    if args.tflite:
        quant = None if args.tflite == "fp32" else args.tflite
        tflite_path = os.path.join(args.output_dir, "velocity_asr.tflite")
        export_tflite(model, params, tflite_path, input_shape=shape, quantize=quant)
        logger.info("TFLite (%s): %s (%.2f MB)", args.tflite, tflite_path,
                    os.path.getsize(tflite_path) / 1e6)

    if args.verify:
        mel = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
        live = np.asarray(forward(model, params, jnp.asarray(mel)))
        fn = load_exported(hlo_path)
        reloaded = np.asarray(fn(params, jnp.asarray(mel)))
        diff = np.abs(live - reloaded).max()
        hlo_match = float((live.argmax(-1) == reloaded.argmax(-1)).mean())
        logger.info("Verification max |live - exported| = %.2e, "
                    "argmax agreement %.4f", diff, hlo_match)
        # bf16-compute models: the exported module may fuse differently
        # from the live jit, so logits carry bf16 rounding noise; fp32
        # models reproduce to 1e-3.
        bf16 = getattr(model.config, "dtype", "float32") == "bfloat16"
        if diff > (0.3 if bf16 else 1e-3) or hlo_match < 0.99:
            raise SystemExit("verification failed")
        if tflite_path:
            tfl = run_tflite(tflite_path, mel)
            tdiff = np.abs(live - tfl).max()
            match = float((live.argmax(-1) == tfl.argmax(-1)).mean())
            logger.info("TFLite verification max |live - tflite| = %.2e, "
                        "argmax agreement %.4f", tdiff, match)
            # The live model may run bf16 (TPU policy) while the TFLite
            # artifact is fp32/int8, so logits differ at bf16/int8 rounding
            # scale; the decode-relevant check is argmax agreement (the
            # measured end-task WER of the artifact is in
            # BENCH_DETAILS_r03).
            bound = 0.3 if args.tflite == "fp32" else 2.5
            if tdiff > bound or match < 0.95:
                raise SystemExit("tflite verification failed")
        logger.info("Verification OK")


if __name__ == "__main__":
    main()
