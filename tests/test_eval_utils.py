"""Eval metrics + logging utils tests."""
import json
import numpy as np

from fpsc_tpu.eval.metrics import (coded_feature_mse,
                                   log_spectral_distance, segmental_snr)
from fpsc_tpu.eval.rtf import synthesis_rtf
from fpsc_tpu.utils.logging import MetricsLogger

RNG = np.random.RandomState(61)


def test_coded_feature_mse():
    a = RNG.randn(2, 10, 20).astype(np.float32)
    assert coded_feature_mse(a, a) == 0.0
    assert coded_feature_mse(a + 0.1, a) > 0


def test_segmental_snr_orders():
    x = RNG.randn(3200).astype(np.float32)
    assert segmental_snr(x, x) > 30.0
    noisy = x + 0.3 * RNG.randn(3200).astype(np.float32)
    assert segmental_snr(x, x) > segmental_snr(x, noisy)


def test_lsd_zero_for_identical():
    from fpsc_tpu.data.synthetic import synth_waveform
    x = synth_waveform(np.random.RandomState(1), 4000)
    assert log_spectral_distance(x, x) < 1e-5
    assert log_spectral_distance(x, x[::-1].copy()) > 0.01


def test_rtf():
    assert synthesis_rtf(128, 16000, 1.0) == 128.0


def test_stft_lsd_orders():
    """The external (frontend-independent) LSD: zero on identity,
    monotone in distortion, large for noise."""
    from fpsc_tpu.eval.metrics import stft_log_spectral_distance
    from fpsc_tpu.data.synthetic import synth_waveform
    x = synth_waveform(np.random.RandomState(2), 8000)
    assert stft_log_spectral_distance(x, x) < 1e-9
    mild = x + 0.05 * RNG.randn(len(x)).astype(np.float32)
    noise = RNG.randn(len(x)).astype(np.float32) * x.std()
    a = stft_log_spectral_distance(x, mild)
    b = stft_log_spectral_distance(x, noise)
    assert 0 < a < b


def test_speech_style_fixture():
    """The speech-realistic generator: voiced majority with credible
    pitch, segmental dynamics (small within-segment deltas, larger
    transitions), and full dataset integration."""
    from fpsc_tpu.config.config import Config, apply_overrides
    from fpsc_tpu.data.dataset import build_dataset
    from fpsc_tpu.data.synthetic import speech_like_waveform
    from fpsc_tpu.dsp.frontend import extract_features_np

    x = speech_like_waveform(np.random.RandomState(1), 32000)
    assert np.isfinite(x).all() and np.abs(x).max() <= 1.0
    f = extract_features_np(x)
    corr = f[:, 19] + 0.5
    per = 0.1 + 50 * f[:, 18] + 100
    voiced = corr > 0.6
    assert voiced.mean() > 0.4, voiced.mean()
    assert 60 < np.median(per[voiced]) < 220
    d = np.abs(np.diff(f[:, :18], axis=0)).mean(-1)
    # transition frames move more than within-segment glide frames
    # (continuous coarticulated glides keep the ratio moderate)
    assert np.percentile(d, 90) > 2.0 * np.median(d)

    cfg = Config()
    apply_overrides(cfg, ["data.synthetic=true",
                          "data.synthetic_style=speech",
                          "data.synthetic_utterances=2",
                          "data.chunks=2", "data.batch_size=2"])
    ds = build_dataset(cfg.data, "train")
    batch = next(ds.iter_batches(2, seed=0))
    assert batch["x"].shape == (2, 2 * 2400)
    assert np.isfinite(batch["feat"]).all()


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "m.jsonl")
    log = MetricsLogger(p)
    log.log(0, loss=1.5)
    log.log(1, loss=1.2, lr=1e-4)
    rows = [json.loads(l) for l in open(p)]
    assert rows[1]["loss"] == 1.2 and rows[1]["step"] == 1
