"""Converts reference (mmap_ninja RaggedMmap) feature dirs into
microwakeword_tpu ragged stores.

Usage:
    python scripts/convert_mmap_ninja.py --input <reference_features_dir> \
        --output <new_features_dir>

Walks `<input>/**/*_mmap` RaggedMmap directories (the reference layout,
data.py:171-190) and writes each as a RaggedSpectrogramStore at the same
relative path under <output>, so an existing reference dataset tree
(training/ validation/ testing/ validation_ambient/ testing_ambient/)
drops into a microwakeword_tpu YAML config unchanged.

Requires mmap_ninja to read the legacy dirs (the package that created them);
install it in the environment you run this one-time migration from.
"""
import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert_tree(input_dir: str, output_dir: str, log=print) -> int:
    try:
        from mmap_ninja.ragged import RaggedMmap
    except ImportError:
        raise SystemExit(
            "mmap_ninja is required to READ the legacy stores "
            "(pip install mmap_ninja), only for this one-time conversion."
        )
    from microwakeword_tpu.data.ragged_store import RaggedSpectrogramStore

    mmap_dirs = sorted(
        p for p in Path(input_dir).glob("**/*_mmap") if p.is_dir()
    )
    if not mmap_dirs:
        log(f"no *_mmap directories under {input_dir}")
        return 0
    for src in mmap_dirs:
        legacy = RaggedMmap(str(src))
        rel = src.relative_to(input_dir)
        dst = Path(output_dir) / rel
        n = len(legacy)
        store = RaggedSpectrogramStore.create(
            str(dst),
            (np.asarray(legacy[i], np.uint16) for i in range(n)),
        )
        log(f"{src} -> {dst}: {len(store)} spectrograms, "
            f"{store.total_frames} frames")
    return len(mmap_dirs)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="reference features dir")
    ap.add_argument("--output", required=True, help="destination dir")
    args = ap.parse_args(argv)
    n = convert_tree(args.input, args.output)
    print(f"converted {n} stores")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
