#!/usr/bin/env python
"""Stage-2 offline tool (pure-Python): pack AWQ tensors into the engine's
flat `.bin`. CLI-compatible with the reference's native packer
(weight_packer.cpp:235) and with `native/weight_packer.cpp`, which is the
fast C++ implementation of this same contract; this script is the
importable oracle and the fallback when no C++ toolchain is available.

Usage:
  pack_weights.py <config.json> <dump_dir> <out.bin> <old_format 0|1>
  pack_weights.py --model-dir <hf_awq_dir> <out.bin>   (direct safetensors)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    from llama_cu_awq_tpu.io.awq import (
        checkpoint_from_dump_dir,
        load_awq_model_dir,
    )
    from llama_cu_awq_tpu.io.checkpoint import save_checkpoint

    args = sys.argv[1:]
    if len(args) == 3 and args[0] == "--model-dir":
        ckpt, out = load_awq_model_dir(args[1]), args[2]
    elif len(args) == 4:
        config_json, dump_dir, out, old = args
        ckpt = checkpoint_from_dump_dir(dump_dir, config_json,
                                        old_format=bool(int(old)))
    else:
        print(__doc__.strip(), file=sys.stderr)
        return 1
    save_checkpoint(out, ckpt)
    cfg = ckpt.config
    print(f"packed {cfg.n_layers}-layer model (dim {cfg.dim}, vocab "
          f"{cfg.vocab_size}) -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
