"""WaveNet synthesis entry point.

Capability parity with reference src/synthesis.py: load a vocoder
checkpoint, slice features/LPC/periods from the validation set, run the
autoregressive generator and write PCM_16 wavs - with the ring-buffer
lax.scan generator replacing the reference's per-sample full-receptive-
field loop (synthesis.py:90-126).

Run:  python -m fpsc_tpu.train.synthesis data.synthetic=true \
          codec.codebook_path=... train.transfer_model=<label_s>
"""
from __future__ import annotations

import os
import wave

import jax
import jax.numpy as jnp
import numpy as np

from fpsc_tpu.config.config import Config, parse_cli
from fpsc_tpu.data.dataset import build_dataset
from fpsc_tpu.dsp import constants as C
from fpsc_tpu.models import wavenet as wn
from fpsc_tpu.train import checkpoint as ckpt
from fpsc_tpu.train.train_lpcnet import vocoder_inputs
from fpsc_tpu.train.train_vocoder import model_config


def save_wav(path: str, x: np.ndarray, sr: int = C.SAMPLE_RATE) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    x = np.asarray(x, np.float64)
    x = x / max(np.abs(x).max(), 1e-9)
    pcm = (x * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def run(cfg: Config, num_samples: int = 2, out_dir=None):
    mcfg = model_config(cfg)
    params = wn.init_wavenet(jax.random.PRNGKey(cfg.train.seed), mcfg)
    if cfg.train.transfer_model:
        payload = ckpt.load(ckpt.checkpoint_path(
            cfg.train.save_dir, cfg.train.transfer_model,
            cfg.train.transfer_epoch))
        params = ckpt.restore_params(params, payload, "WaveNet")

    ds = build_dataset(cfg.data, "val")
    out_dir = out_dir or os.path.join(cfg.train.save_dir,
                                      f"samples_{cfg.label}")
    outputs = []
    for ns, batch in enumerate(ds.iter_batches(1, seed=0)):
        if ns >= num_samples:
            break
        arrs = vocoder_inputs(batch, cfg.data.normalize)
        lpc_sample = np.repeat(arrs["lpc"], C.FRAME_SIZE, axis=1)
        y = np.asarray(wn.generate_lpc(
            params, mcfg, jax.random.PRNGKey(ns),
            jnp.asarray(np.swapaxes(arrs["feat"], 1, 2)),
            jnp.asarray(arrs["periods"]),
            jnp.asarray(lpc_sample)))
        name = batch["name"][0]
        # training waveforms live in the pre-emphasis domain; the
        # generated y is already de-emphasised - bring truth to the
        # same listening domain
        from fpsc_tpu.dsp.emphasis import deemphasis
        save_wav(os.path.join(out_dir, f"{name}_truth.wav"),
                 deemphasis(arrs["x"][0]))
        save_wav(os.path.join(out_dir, f"{name}_xout.wav"), y[0])
        outputs.append((name, y))
        print(f"synthesised {name}: {y.shape[-1]} samples -> {out_dir}")
    return outputs


if __name__ == "__main__":
    run(parse_cli())
