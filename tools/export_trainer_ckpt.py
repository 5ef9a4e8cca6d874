#!/usr/bin/env python3
"""Convert an Orbax trainer checkpoint (checkpoint_step_N/) into a
from_pretrained-loadable inference artifact (config.json + params.msgpack).

The Trainer saves {params, opt_state} through Orbax plus trainer_meta.json
(training.py save_checkpoint); transcribe/evaluate consume the
save_pretrained layout. This bridges the two so any mid-run checkpoint
can be evaluated:

  python tools/export_trainer_ckpt.py \
      checkpoints/run/checkpoint_step_1500 out_dir [--vocab ckpt_dir]
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from velocity_asr_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint", help="trainer checkpoint dir "
                                           "(contains state/ + trainer_meta.json)")
    parser.add_argument("out", help="output artifact dir")
    parser.add_argument("--vocab", default=None,
                        help="checkpoint dir whose vocabulary.json to copy "
                             "(transcribe/evaluate read it next to the params)")
    args = parser.parse_args()

    import orbax.checkpoint as ocp

    from velocity_asr_tpu.models.config import VelocityASRConfig
    from velocity_asr_tpu.models.model import save_pretrained

    meta_path = os.path.join(args.checkpoint, "trainer_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    config = VelocityASRConfig.from_dict(meta["model_config"])

    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(os.path.abspath(os.path.join(args.checkpoint, "state")))
    save_pretrained(args.out, config, payload["params"])

    if args.vocab:
        src = os.path.join(args.vocab, "vocabulary.json")
        if not os.path.exists(src):
            raise SystemExit(f"{src} not found")
        shutil.copy(src, os.path.join(args.out, "vocabulary.json"))
    print(f"wrote {args.out} (step {meta['global_step']})")


if __name__ == "__main__":
    main()
