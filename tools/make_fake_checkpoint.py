#!/usr/bin/env python3
"""Synthesize a reference-shaped torch .pth checkpoint for a config.

No released FocalFormer3D weights ship in this environment (zero egress), so
this tool creates a .pth whose state_dict carries the exact keys/shapes of a
real released checkpoint (inventory: focalformer3d_tpu/utils/ref_keys.py).
Used to exercise tools/convert_checkpoint.py --require-full end-to-end; with
real weights the same CLI path produces a loadable orbax checkpoint.

Usage: python tools/make_fake_checkpoint.py FocalFormer3D_L out.pth
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(config_name: str, out_path: str, seed: int = 0) -> None:
    import torch

    from focalformer3d_tpu.configs import get_config
    from focalformer3d_tpu.utils.ref_keys import make_fake_state_dict

    cfg = get_config(config_name)["model"]
    sd = {k: torch.from_numpy(v.copy()) if v.ndim else torch.tensor(int(v))
          for k, v in make_fake_state_dict(cfg, seed).items()}
    torch.save({"state_dict": sd, "meta": {"synthetic": True}}, out_path)
    print(f"wrote {out_path} ({len(sd)} tensors)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("out")
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    main(a.config, a.out, a.seed)
