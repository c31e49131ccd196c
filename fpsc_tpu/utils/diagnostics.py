"""Visual training diagnostics (reference inspection ergonomics).

The reference dumps feature heatmaps every 20 epochs
(src/train_frame.py:95-114), excitation traces per epoch
(src/train.py:153-165) and mel spectrograms of train outputs
(src/utils.py:160-179 plot_training_output).  This module restores
that capability TPU-side: pure host-side matplotlib (Agg) on numpy
arrays that the train loops already hold, gated by
`train.plot_every` (0 = off, the default — image IO has no business
on the step path).  Images land under
<save_dir>/<label>/diagnostics/ next to the JSONL metrics stream.

Everything here degrades gracefully: if matplotlib is unavailable
the functions are no-ops (the JSONL metrics remain the record).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    _HAVE_MPL = True
except Exception:  # pragma: no cover - environment without matplotlib
    _HAVE_MPL = False


def plot_dir(save_dir: str, label: str) -> str:
    d = os.path.join(save_dir, label, "diagnostics")
    os.makedirs(d, exist_ok=True)
    return d


def should_plot(plot_every: int, epoch: int) -> bool:
    return _HAVE_MPL and plot_every > 0 and epoch % plot_every == 0


def save_feature_heatmap(save_dir: str, label: str, epoch: int,
                         feat: np.ndarray,
                         coded: Optional[np.ndarray] = None) -> None:
    """Target (and optionally predicted/coded) feature heatmaps for
    one utterance — the reference's per-20-epoch `feat_{e}.jpg` /
    `feat_out_{e}.jpg` pair (src/train_frame.py:101-114).

    feat/coded: (L, D) feature frames (cepstra-first layout).
    """
    if not _HAVE_MPL:
        return
    d = plot_dir(save_dir, label)
    panels = [("feat", np.asarray(feat))]
    if coded is not None:
        panels.append(("feat_out", np.asarray(coded)))
    for name, arr in panels:
        fig, ax = plt.subplots(figsize=(8, 3))
        im = ax.imshow(arr.T, origin="lower", aspect="auto",
                       interpolation="nearest")
        ax.set_xlabel("frame")
        ax.set_ylabel("dim")
        ax.set_title(f"{name} epoch {epoch}")
        fig.colorbar(im, ax=ax)
        fig.savefig(os.path.join(d, f"{name}_{epoch}.png"),
                    dpi=100, bbox_inches="tight")
        plt.close(fig)


def save_excitation_plot(save_dir: str, label: str, epoch: int,
                         exc: np.ndarray,
                         exc_out: Optional[np.ndarray] = None) -> None:
    """Teacher-forced excitation trace vs the model's own draw — the
    reference's per-epoch `exc_{e}.jpg` / `exc_out_{e}.jpg`
    (src/train.py:157-165).  exc/exc_out: (T,) linear excitation.
    """
    if not _HAVE_MPL:
        return
    d = plot_dir(save_dir, label)
    panels = [("exc", np.asarray(exc))]
    if exc_out is not None:
        panels.append(("exc_out", np.asarray(exc_out)))
    for name, arr in panels:
        fig, ax = plt.subplots(figsize=(8, 2.5))
        ax.plot(arr, linewidth=0.5)
        ax.set_xlabel("sample")
        ax.set_title(f"{name} epoch {epoch}")
        fig.savefig(os.path.join(d, f"{name}_{epoch}.png"),
                    dpi=100, bbox_inches="tight")
        plt.close(fig)


def save_spectrogram(save_dir: str, label: str, epoch: int,
                     y: np.ndarray,
                     y_hat: Optional[np.ndarray] = None,
                     name: str = "spec") -> None:
    """Log-mel spectrogram image(s) of waveform(s) — the reference's
    plot_training_output (src/utils.py:160-179), computed with the
    in-framework mel transform (dsp/stft.mel_spec) instead of
    librosa.  y/y_hat: (T,) waveforms.
    """
    if not _HAVE_MPL:
        return
    import jax.numpy as jnp

    from fpsc_tpu.dsp.stft import mel_spec

    d = plot_dir(save_dir, label)
    panels = [(name, np.asarray(y))]
    if y_hat is not None:
        panels.append((name + "_out", np.asarray(y_hat)))
    for nm, wav in panels:
        m = np.asarray(mel_spec(jnp.asarray(wav.astype(np.float32))))
        logm = 10.0 * np.log10(np.maximum(m, 1e-10))  # power dB
        fig, ax = plt.subplots(figsize=(8, 3))
        im = ax.imshow(logm, origin="lower", aspect="auto",
                       interpolation="nearest")
        ax.set_xlabel("frame")
        ax.set_ylabel("mel bin")
        ax.set_title(f"{nm} epoch {epoch} (dB)")
        fig.colorbar(im, ax=ax)
        fig.savefig(os.path.join(d, f"{nm}_{epoch}.png"),
                    dpi=100, bbox_inches="tight")
        plt.close(fig)
