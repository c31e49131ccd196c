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


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "m.jsonl")
    log = MetricsLogger(p)
    log.log(0, loss=1.5)
    log.log(1, loss=1.2, lr=1e-4)
    rows = [json.loads(l) for l in open(p)]
    assert rows[1]["loss"] == 1.2 and rows[1]["step"] == 1
