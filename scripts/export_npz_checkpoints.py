#!/usr/bin/env python
"""Export the bundled orbax checkpoints to flat .npz fast-load files.

Run after (re)training demo checkpoints. The npz sits next to the orbax
dir as ``<kind>/best.npz`` and is what the CLIs/bench load (seconds instead
of the ~4-minute orbax restore measured on this host — see
core/checkpoint.py).
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # never touch the TPU tunnel

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vfloodnet_tpu.core.checkpoint import restore_as_numpy, save_flat_npz

RECORDS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "records", "checkpoints")


def main():
    for kind in ("video", "image", "stopsign_tiny"):
        src = os.path.join(RECORDS, kind, "best")
        if not os.path.isdir(src):
            print(f"skip {kind}: no orbax checkpoint at {src}")
            continue
        dst = os.path.join(RECORDS, kind, "best.npz")
        tree = restore_as_numpy(src)
        save_flat_npz(dst, tree)
        mb = os.path.getsize(dst) / 1e6
        print(f"{kind}: {src} -> {dst} ({mb:.1f} MB)")


if __name__ == "__main__":
    main()
