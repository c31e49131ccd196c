"""Native C++ feature extractor vs the JAX frontend (parity)."""
import os
import subprocess

import numpy as np
import pytest

from fpsc_tpu.data.synthetic import synth_waveform
from fpsc_tpu.dsp.frontend import extract_features_np


@pytest.fixture(scope="module")
def wave():
    return synth_waveform(np.random.RandomState(9), 8000)


def test_native_matches_jax_frontend(wave):
    from fpsc_tpu.data.native import extract_features_native
    want = extract_features_np(wave)
    got = extract_features_native(wave)
    assert got.shape == want.shape
    # cepstra: double-precision DFT vs float32 jnp rfft
    np.testing.assert_allclose(got[:, :18], want[:, :18],
                               rtol=2e-3, atol=2e-3)
    # pitch features: identical search -> identical lags
    np.testing.assert_allclose(got[:, 18], want[:, 18], atol=1e-6)
    np.testing.assert_allclose(got[:, 19], want[:, 19], atol=1e-4)
    # LPC from (slightly different) cepstra
    np.testing.assert_allclose(got[:, 20:], want[:, 20:],
                               rtol=5e-2, atol=5e-3)


def test_cli_roundtrip(tmp_path, wave):
    cpp_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "cpp")
    exe = os.path.join(str(tmp_path), "dump_features")
    subprocess.run(["g++", "-O2", "-DFE_MAIN", "-o", exe,
                    os.path.join(cpp_dir, "feature_extractor.cpp")],
                   check=True)
    pcm_path = str(tmp_path / "in.s16")
    (wave * 32767).astype(np.int16).tofile(pcm_path)
    out_path = str(tmp_path / "out.f32")
    subprocess.run([exe, pcm_path, out_path, "s16"], check=True)
    from fpsc_tpu.data.f32 import read_f32
    frames = read_f32(out_path)
    assert frames.shape[1] == 36
    assert frames.shape[0] == len(wave) // 160 - 1
    # ingestion path consumes it
    from fpsc_tpu.data.f32 import window_features
    wins = window_features(frames)
    assert wins.shape[1:] == (19, 36)
