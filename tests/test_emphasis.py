"""Pre-/de-emphasis chain: inverse pair, frontend integration, domain
consistency of the synthetic fixtures (round-2 fix of the round-1
asymmetry: de-emphasis at synthesis with no pre-emphasis at analysis)."""
import numpy as np

from fpsc_tpu.dsp.emphasis import PREEMPH, deemphasis, preemphasis


def test_roundtrip_exact_inverse():
    x = np.random.RandomState(0).randn(4000).astype(np.float32) * 0.5
    np.testing.assert_allclose(deemphasis(preemphasis(x)), x,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(preemphasis(deemphasis(x)), x,
                               rtol=1e-5, atol=1e-6)


def test_preemphasis_definition():
    x = np.asarray([1.0, 2.0, 3.0], np.float32)
    want = np.asarray([1.0, 2.0 - PREEMPH, 3.0 - 2 * PREEMPH], np.float32)
    np.testing.assert_allclose(preemphasis(x), want, rtol=1e-6)


def test_frontend_applies_preemphasis():
    """extract_features_np(x) must equal extract_features_np of the
    pre-emphasised signal with preemph disabled."""
    from fpsc_tpu.dsp.frontend import extract_features_np

    rng = np.random.RandomState(3)
    x = rng.randn(160 * 8 + 160).astype(np.float32) * 0.3
    a = extract_features_np(x)
    b = extract_features_np(preemphasis(x), preemph=0.0)
    np.testing.assert_array_equal(a, b)
    c = extract_features_np(x, preemph=0.0)
    assert np.abs(a[:, :18] - c[:, :18]).max() > 1e-3  # actually differs


def test_synthetic_waveform_is_preemphasis_domain():
    """synth_utterance's waveform and features share the pre-emphasis
    domain: re-analysing the de-emphasised waveform with the standard
    frontend reproduces the stored cepstra."""
    from fpsc_tpu.data.synthetic import synth_utterance
    from fpsc_tpu.dsp.frontend import extract_features_np

    wav, windows = synth_utterance(0, n_chunks=2)
    # stored windows row layout: (k, 19, 36); reconstruct the frame
    # track of the first window's non-context rows
    feats = extract_features_np(deemphasis(wav), preemph=PREEMPH)
    # stored features for the same frames: windows[0, 2:..] starts at
    # the first non-context frame
    got = feats[:10, :18]
    want = windows[0, 2:12, :18]
    # the waveform slice lost the pre-context samples so the first
    # frames' analysis differs slightly at the boundary; compare the
    # interior
    np.testing.assert_allclose(got[4:], want[4:], rtol=5e-2, atol=5e-2)
