#!/usr/bin/env python
"""Stage-1 offline tool: explode an AWQ checkpoint into per-tensor raw
.bin dumps — CLI-compatible with the reference converter
(convert_awq_to_bin.py:17-31) and extended to safetensors input.

Usage: convert_awq_to_bin.py <ckpt.pt | ckpt.safetensors | model_dir> <out_dir>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_tensors(src: str):
    from llama_cu_awq_tpu.io.awq import read_safetensors, read_safetensors_dir

    if os.path.isdir(src):
        return read_safetensors_dir(src)
    if src.endswith(".safetensors"):
        return read_safetensors(src)
    import torch  # .pt checkpoints only; safetensors path is torch-free

    data = torch.load(src, map_location="cpu", weights_only=True)
    if not isinstance(data, dict):
        raise TypeError(f"expected a state dict in {src}, got {type(data)}")
    return {k: v.numpy() for k, v in data.items()
            if hasattr(v, "numpy")}


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__.strip(), file=sys.stderr)
        return 1
    src, out_dir = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    for name, value in load_tensors(src).items():
        print(name, value.dtype, tuple(value.shape))
        with open(os.path.join(out_dir, name + ".bin"), "wb") as f:
            f.write(value.tobytes())
    return 0


if __name__ == "__main__":
    sys.exit(main())
