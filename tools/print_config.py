#!/usr/bin/env python3
"""Print a named config fully resolved (counterpart of
/root/reference/tools/misc/print_config.py)."""
from __future__ import annotations

import argparse
import dataclasses
import pprint
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from focalformer3d_tpu.configs import available, get_config  # noqa: E402


def to_dict(obj):
    if dataclasses.is_dataclass(obj):
        return {
            f.name: to_dict(getattr(obj, f.name))
            for f in dataclasses.fields(obj)
        }
    if isinstance(obj, dict):
        return {k: to_dict(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(to_dict(v) for v in obj)
    return obj


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default=None)
    a = p.parse_args()
    if a.config is None:
        print("available:", ", ".join(available()))
    else:
        pprint.pprint(to_dict(get_config(a.config)), width=100)
