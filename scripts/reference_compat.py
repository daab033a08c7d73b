"""Shims that let the reference package (/root/reference) import and run its
mmap-backed training/eval paths in this image, where its audio-stack deps
(mmap_ninja, audiomentations, webrtcvad, pymicro-features, datasets,
audio_metadata) are not installed.

Only the MmapFeatureGenerator path is exercised through these shims; the
stubbed audio modules are never called.  The RaggedMmap shim is an
API-compatible np.memmap-backed reader/writer with the same zero-copy slice
access semantics, so timings through it measure the reference's Python
loop, not the shim.
"""
import os
import sys
import types

import numpy as np

REFERENCE_PATH = "/root/reference"


class RaggedMmapShim:
    """API-compatible subset of mmap_ninja.ragged.RaggedMmap."""

    def __init__(self, path):
        self._data = np.lib.format.open_memmap(
            os.path.join(path, "data.npy"), mode="r"
        )
        self._offsets = np.load(os.path.join(path, "offsets.npy"))

    def __len__(self):
        return len(self._offsets) - 1

    def __getitem__(self, i):
        return self._data[self._offsets[i] : self._offsets[i + 1]]

    @staticmethod
    def create(path, arrays):
        os.makedirs(path, exist_ok=True)
        flat = np.concatenate(arrays, axis=0)
        offsets = np.concatenate(
            [[0], np.cumsum([a.shape[0] for a in arrays])]
        ).astype(np.int64)
        np.save(os.path.join(path, "data.npy"), flat)
        np.save(os.path.join(path, "offsets.npy"), offsets)


_STUBS = [
    ("audio_metadata", ["load", "UnsupportedFormat"]),
    ("datasets", ["Dataset", "Audio"]),
    ("webrtcvad", ["Vad"]),
    (
        "audiomentations",
        [
            "Compose", "AddBackgroundNoise", "AddColorNoise", "Aliasing",
            "ApplyImpulseResponse", "BandStopFilter", "Gain", "GainTransition",
            "Normalize", "PitchShift", "RepeatPart", "SevenBandParametricEQ",
            "TanhDistortion",
        ],
    ),
    ("pymicro_features", ["MicroFrontend"]),
]


def install_shims() -> None:
    """Registers the fake modules and puts /root/reference on sys.path.
    Call BEFORE importing anything from `microwakeword`."""
    ragged = types.ModuleType("mmap_ninja.ragged")
    ragged.RaggedMmap = RaggedMmapShim
    pkg = types.ModuleType("mmap_ninja")
    pkg.ragged = ragged
    sys.modules.setdefault("mmap_ninja", pkg)
    sys.modules.setdefault("mmap_ninja.ragged", ragged)
    for name, attrs in _STUBS:
        if name not in sys.modules:
            m = types.ModuleType(name)
            for a in attrs:
                setattr(m, a, type(a, (), {}))
            sys.modules[name] = m
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
