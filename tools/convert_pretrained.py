#!/usr/bin/env python
"""Convert torchvision-format ResNet checkpoints to this framework's layout.

Reference equivalent: the family's pretrained-backbone load
(``load_checkpoint`` + name matching; SURVEY.md §5.4) — MXNet ``.params``
zoo files there, torchvision ``resnet50/101`` state dicts here (the modern
distribution format for the same v1b weights).

    python tools/convert_pretrained.py resnet50.pth backbone_r50.npz

Output: an .npz whose keys are flattened paths into the flax variables tree
(``params/...`` and ``batch_stats/...``); ``mxdetection_tpu.utils.pretrained.
load_backbone`` merges it into a model's variables.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


#: torchvision keys that have no counterpart in the detection backbone
_SKIP_PREFIXES = ("fc.",)
_SKIP_SUFFIXES = ("num_batches_tracked",)


def convert_state_dict(sd: dict, depth: int = 50, strict: bool = True) -> dict:
    """torchvision resnet state_dict (numpy arrays) -> flat {path: array}.

    Convs transpose OIHW -> HWIO; BN (weight, bias, running_mean, running_var)
    land in batch_stats as (gamma, beta, mean, var) — FrozenBatchNorm layout.

    ``strict`` (default): any source key that is neither consumed nor a known
    skip (classifier head, BN bookkeeping) raises — misspelled or structurally
    unexpected checkpoints must not pass silently. Missing expected keys raise
    KeyError either way.
    """
    out = {}
    consumed = set()

    def conv(dst, src):
        w = np.asarray(sd[src + ".weight"])
        if w.ndim != 4:
            raise ValueError(f"{src}.weight: expected 4-d conv kernel, got {w.shape}")
        consumed.add(src + ".weight")
        out[f"params/{dst}/kernel"] = w.transpose(2, 3, 1, 0)

    def bn(dst, src):
        for t_name, f_name in (("weight", "gamma"), ("bias", "beta"),
                               ("running_mean", "mean"), ("running_var", "var")):
            consumed.add(f"{src}.{t_name}")
            out[f"batch_stats/{dst}/{f_name}"] = np.asarray(sd[f"{src}.{t_name}"])

    conv("stem_conv", "conv1")
    bn("stem_bn", "bn1")
    for s, nblocks in enumerate(STAGE_BLOCKS[depth]):
        for b in range(nblocks):
            pre = f"layer{s + 1}.{b}"
            dst = f"layer{s + 1}_block{b}"
            for i in (1, 2, 3):
                conv(f"{dst}/conv{i}", f"{pre}.conv{i}")
                bn(f"{dst}/bn{i}", f"{pre}.bn{i}")
            if f"{pre}.downsample.0.weight" in sd:
                conv(f"{dst}/downsample_conv", f"{pre}.downsample.0")
                bn(f"{dst}/downsample_bn", f"{pre}.downsample.1")

    leftover = [k for k in sd
                if k not in consumed
                and not k.startswith(_SKIP_PREFIXES)
                and not k.endswith(_SKIP_SUFFIXES)]
    if leftover and strict:
        raise ValueError(
            f"{len(leftover)} unexpected key(s) in source checkpoint "
            f"(first: {sorted(leftover)[:5]}); wrong --depth or not a "
            f"torchvision resnet state dict? Pass strict=False to ignore.")
    return out


def load_torch_checkpoint(path: str) -> dict:
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--depth", type=int, default=50)
    args = ap.parse_args()
    sd = load_torch_checkpoint(args.src)
    flat = convert_state_dict(sd, args.depth)
    np.savez(args.dst, **flat)
    print(f"wrote {len(flat)} arrays to {args.dst}")


if __name__ == "__main__":
    main()
