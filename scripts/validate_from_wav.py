"""End-to-end rehearsal of the REAL-DATA path from .wav recordings
(VERDICT r4 next #7).

Every flagship number so far came from the in-memory synthetic
fixtures; the hooks for disk corpora (`prepare` -> .f32 + .s16 ->
`data.root` -> load_directory) each have unit tests but the full
train-from-wav pipeline had never been driven as one piece.  This
script IS that piece — when a real corpus (e.g. LibriSpeech wav/flac
-> wav) becomes reachable, pointing stage 0 at it is the only change
(reference ingestion: data_preprocess/write_small_files.py:18-73 +
LPCNet dump_data):

  0. "record" a corpus: listening-domain speech-like waveforms
     written as 16-bit PCM .wav files (train + val directories),
  1. python -m fpsc_tpu.data.prepare on both splits (on-TPU frontend
     -> .f32 feature dumps + pre-emphasised .s16 audio),
  2. flagship chain on data.root (data.synthetic=false): predictor ->
     codebooks -> entropy-coded encode -> PRODUCTION bunched+sparse
     vocoder -> decoded-audio metrics, identical recipe to
     validate_flagship.py.

    python scripts/validate_from_wav.py [pred_epochs] [voc_epochs] \
        [train_utts] [val_utts]
"""
import os
import shutil
import sys
import time
import wave

sys.path.insert(0, ".")

import numpy as np

ROOT = "/tmp/fpsc_wav"
OUT = f"{ROOT}/artifacts"


def write_corpus(train_utts: int, val_utts: int, seconds: float = 2.4):
    from fpsc_tpu.data.synthetic import speech_like_waveform

    n = int(seconds * 16000)
    for split, count, base in (("train", train_utts, 1000),
                               ("val", val_utts, 9000)):
        d = f"{ROOT}/raw_{split}"
        os.makedirs(d, exist_ok=True)
        for i in range(count):
            x = np.asarray(speech_like_waveform(
                np.random.RandomState(base + i), n))
            x = x / max(np.abs(x).max(), 1e-9) * 0.95
            with wave.open(f"{d}/utt{i:04d}.wav", "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes((x * 32767).astype(np.int16).tobytes())
        print(f"wrote {count} x {seconds:.1f}s wav -> {d}", flush=True)


def main(pred_epochs: int = 200, voc_epochs: int = 200,
         train_utts: int = 48, val_utts: int = 8):
    import jax
    import jax.numpy as jnp

    from fpsc_tpu.config.config import Config, apply_overrides
    from fpsc_tpu.train import generate_qtz_features, train_cb, train_frame

    if os.path.isdir(ROOT):
        shutil.rmtree(ROOT)
    label = time.strftime("wav_%m%d_%H%M%S")

    print("=== 0. record wav corpus ===", flush=True)
    write_corpus(train_utts, val_utts)

    print("=== 1. prepare: wav -> .f32 + .s16 (on-TPU frontend) ===",
          flush=True)
    from fpsc_tpu.data.prepare import prepare
    t0 = time.time()
    n_tr = prepare(f"{ROOT}/raw_train", f"{ROOT}/data", "train")
    n_va = prepare(f"{ROOT}/raw_val", f"{ROOT}/data", "val")
    assert n_tr == train_utts and n_va == val_utts
    print(f"prepared in {time.time()-t0:.0f}s", flush=True)

    data = [
        "data.synthetic=false", f"data.root={ROOT}/data",
        "data.chunks=6", "data.batch_size=16",
    ]
    overrides = data + [
        "predictor.gru_units1=384", "predictor.gru_units2=128",
        f"train.epochs={pred_epochs}", "train.learning_rate=0.001",
        f"train.save_dir={OUT}", "train.save_every=50",
        "codec.vq_entries=1024,1024", "codec.vq_entries_bl=512",
        "codec.scl_entries=256", "codec.scl_entries_bl=16",
        f"codec.codebook_path={OUT}/cb.npz",
        "codec.entropy_coding=true",
    ]
    cfg = Config(label=label)
    apply_overrides(cfg, overrides)

    print(f"=== 2. predictor (384/128, {train_utts} wav utts) ===",
          flush=True)
    t0 = time.time()
    _, min_loss = train_frame.run(cfg)
    print(f"{pred_epochs} epochs in {time.time()-t0:.0f}s, "
          f"min val loss {min_loss:.4f}", flush=True)

    transfer = [f"train.transfer_model={label}",
                f"train.transfer_epoch={pred_epochs - 1}"]
    print("=== 3. codebooks ===", flush=True)
    cfg_cb = Config(label=label)
    apply_overrides(cfg_cb, overrides + transfer + [
        "train.debugging=true"])
    train_cb.run(cfg_cb)

    print("=== 4. encode val: bitrate + MSE ===", flush=True)
    out = generate_qtz_features.run(cfg_cb, max_utterances=8,
                                    out_dir=f"{OUT}/qtz")
    priors = out["priors"]
    print(f"coded-feature MSE {out['mse']:.6f}; fixed-layout bitrate "
          f"{out['bitrate']:.0f} b/s", flush=True)

    print("=== 5. PRODUCTION vocoder on the wav corpus ===", flush=True)
    from fpsc_tpu.train import train_lpcnet
    cfg_v = Config(label=label + "_voc")
    apply_overrides(cfg_v, data + [
        "train.learning_rate=0.001", f"train.epochs={voc_epochs}",
        f"train.save_dir={OUT}", "train.save_every=100",
        "lpcnet.bunch=2", "lpcnet.gru_b_units=32",
        "lpcnet.gru_a_density=0.2", "lpcnet.sparsify_start=200",
        f"lpcnet.sparsify_end={voc_epochs * 4}",
        "lpcnet.noise_levels=2", "lpcnet.noise_warmup_frac=0.5",
    ])
    t0 = time.time()
    voc_params, ce = train_lpcnet.run(cfg_v)
    print(f"{voc_epochs} epochs in {time.time()-t0:.0f}s, CE {ce:.3f}",
          flush=True)

    print("=== 6. decode + metrics ===", flush=True)
    from fpsc_tpu.data.dataset import build_dataset
    from fpsc_tpu.dsp.emphasis import deemphasis
    from fpsc_tpu.eval.metrics import (log_spectral_distance,
                                       stft_log_spectral_distance)
    from fpsc_tpu.eval.nsim import nsim
    from fpsc_tpu.train import synthesis_qtz

    cfg_s = Config(label=label)
    apply_overrides(cfg_s, overrides + transfer)
    results = synthesis_qtz.run(cfg_s, num_samples=3,
                                out_dir=f"{OUT}/samples",
                                vocoder_params=voc_params,
                                priors=priors)
    ds = build_dataset(cfg_s.data, "val")
    lsds, slsds, rates, nsims = [], [], [], []
    for ns, batch in enumerate(ds.iter_batches(1, seed=0)):
        if ns >= len(results):
            break
        truth = deemphasis(batch["x"][0])
        y = results[ns]["wav"][:len(truth)]
        lsds.append(log_spectral_distance(truth[:len(y)], y))
        slsds.append(stft_log_spectral_distance(truth[:len(y)], y))
        rates.append(results[ns]["bitrate"])
        nsims.append(nsim(truth[:len(y)], y))
    noise_sig = np.random.RandomState(0).randn(len(truth)).astype(
        np.float32) * truth.std()
    lsd_n = log_spectral_distance(truth, noise_sig)
    print(f"decoded-audio Bark-LSD {np.mean(lsds):.3f} "
          f"(noise {lsd_n:.3f}); STFT-LSD {np.mean(slsds):.2f} dB; "
          f"NSIM {np.mean(nsims):.3f} "
          f"(noise {nsim(truth, noise_sig):.3f}); entropy-coded "
          f"bitrate {np.mean(rates):.0f} b/s", flush=True)
    assert np.mean(lsds) < 0.8 * lsd_n, "decode should beat noise"
    assert np.mean(rates) < 2200.0
    print("FROM-WAV VALIDATION PASSED", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200,
         int(sys.argv[2]) if len(sys.argv) > 2 else 200,
         int(sys.argv[3]) if len(sys.argv) > 3 else 48,
         int(sys.argv[4]) if len(sys.argv) > 4 else 8)
