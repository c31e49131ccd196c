"""Dataset preparation CLI: audio -> .f32 feature dumps.

Completes the L0->L1 toolchain in-framework (the reference needs
external LPCNet `dump_data` + data_preprocess/write_small_files.py):

    python -m fpsc_tpu.data.prepare <in_dir> <out_root> \
        [--split train|val] [--backend jax|numpy|native]

Scans <in_dir> recursively for .wav/.s16 audio, extracts 36-float
feature rows with the fully-jitted on-device frontend (`jax`, one
bucketed XLA program per utterance — 112x RT aggregate measured
through the dev tunnel), the NumPy oracle (`numpy`), or the native
C++ extractor (`native`; bit-compatible trio, tests/test_native.py +
test_frontend.py), and writes
<out_root>/<split>/<name>.f32 next to a copy of the peak-normalised
audio so fpsc_tpu.data.dataset.load_directory can consume them.
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from fpsc_tpu.data.f32 import write_f32


def _load_audio(path: str) -> np.ndarray:
    if path.endswith(".wav"):
        import wave

        with wave.open(path, "rb") as w:
            assert w.getsampwidth() == 2, "expect 16-bit PCM"
            raw = w.readframes(w.getnframes())
        return np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    return np.fromfile(path, np.int16).astype(np.float32) / 32768.0


def prepare(in_dir: str, out_root: str, split: str = "train",
            backend: str = "jax") -> int:
    out_dir = os.path.join(out_root, split)
    os.makedirs(out_dir, exist_ok=True)
    files = sorted(glob.glob(os.path.join(in_dir, "**", "*.wav"),
                             recursive=True)
                   + glob.glob(os.path.join(in_dir, "**", "*.s16"),
                               recursive=True))
    from fpsc_tpu.dsp.emphasis import preemphasis

    names, waves = [], []
    for path in files:
        x = _load_audio(path)
        names.append(os.path.splitext(os.path.basename(path))[0])
        waves.append(x / max(np.abs(x).max(), 1e-10) * 0.999)

    if backend == "jax":
        # bucket-grouped vmapped frontend: the whole corpus shares a
        # handful of compiles, each dispatch carries a full batch
        from fpsc_tpu.dsp.frontend import extract_features_batch
        all_frames = extract_features_batch(waves)
    else:
        if backend == "native":
            from fpsc_tpu.data.native import (
                extract_features_native as ext)
        else:
            from fpsc_tpu.dsp.frontend import extract_features_np as ext
        all_frames = [ext(x) for x in waves]

    n = 0
    for name, x, frames in zip(names, waves, all_frames):
        if frames.shape[0] == 0:
            continue
        write_f32(os.path.join(out_dir, name + ".f32"), frames)
        # store PRE-EMPHASISED PCM (dump_data semantics): features and
        # training waveforms live in the same analysis domain; the
        # vocoder's synthesis-side de-emphasis inverts it
        (preemphasis(x) * 32767).astype(np.int16).tofile(
            os.path.join(out_dir, name + ".s16"))
        n += 1
    print(f"prepared {n} utterances -> {out_dir}")
    return n


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("in_dir")
    p.add_argument("out_root")
    p.add_argument("--split", default="train")
    p.add_argument("--backend", default="jax", choices=["jax", "numpy", "native"])
    a = p.parse_args(argv)
    prepare(a.in_dir, a.out_root, a.split, a.backend)


if __name__ == "__main__":
    main()
