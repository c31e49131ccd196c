"""Scalar/NumPy oracle implementations used only by the test-suite.

Each oracle is an independent, deliberately-naive transcription of the
published math (LPCNet's lpc_from_cepstrum, textbook Levinson-Durbin
with the 30 dB early exit, mu-law companding, LBG/k-means, and the
m-best multi-stage VQ beam) so the fast XLA implementations in
fpsc_tpu can be checked against a slow ground truth.
"""
from __future__ import annotations

import numpy as np

NB_BANDS = 18
LPC_ORDER = 16
FREQ = 161
EBAND = [0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24, 28, 34, 40]
COMP = [0.8, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.666667, 0.5, 0.5, 0.5,
        0.333333, 0.25, 0.25, 0.2, 0.166667, 0.173913]


def idct_1(vec):
    out = np.zeros(NB_BANDS)
    for i in range(NB_BANDS):
        acc = 0.0
        for j in range(NB_BANDS):
            w = np.cos((i + 0.5) * j * np.pi / NB_BANDS)
            if j == 0:
                w *= np.sqrt(0.5)
            acc += vec[j] * w
        out[i] = acc * np.sqrt(2.0 / NB_BANDS)
    return out


def interp_1(band_e):
    g = np.zeros(FREQ)
    for i in range(NB_BANDS - 1):
        width = (EBAND[i + 1] - EBAND[i]) * 4
        for j in range(width):
            frac = j / width
            g[EBAND[i] * 4 + j] = (1 - frac) * band_e[i] + frac * band_e[i + 1]
    return g


def levinson_1(ac, order=LPC_ORDER):
    """Textbook Levinson-Durbin with the dual early-exit of celt_lpc."""
    err = ac[0]
    lpc = np.zeros(order)
    rc = np.zeros(order)
    if ac[0] != 0:
        for i in range(order):
            acc = ac[i + 1]
            for j in range(i):
                acc += lpc[j] * ac[i - j]
            k = -acc / err
            rc[i] = k
            old = lpc.copy()
            for j in range(i):
                lpc[j] = old[j] + k * old[i - 1 - j]
            lpc[i] = k
            err *= (1 - k * k)
            if err < ac[0] / 1024.0 or err < 0.001 * ac[0]:
                break
    return err, lpc, rc


def ceps2lpc_1(cep):
    """Single-vector cepstrum -> LPC oracle (float64)."""
    tmp = np.array(cep[:NB_BANDS], dtype=np.float64)
    tmp[0] += 4.0
    ex = (10.0 ** idct_1(tmp)) * np.array(COMP)
    xr = interp_1(ex)
    ac = np.fft.irfft(xr)[:LPC_ORDER + 1]
    ac[0] += ac[0] * 1e-4 + 320.0 / 12.0 / 38.0
    for i in range(1, LPC_ORDER + 1):
        ac[i] *= 1 - 6e-5 * i * i
    return levinson_1(ac)


def lpc_pred_1(x, lpc_frames, frame_size=160):
    """pred[t] = -sum_i a[t, i] x[t-i] with per-frame coefficients."""
    t_len = len(x)
    order = lpc_frames.shape[-1]
    a = np.repeat(lpc_frames, frame_size, axis=0)[:t_len]
    xp = np.concatenate([np.zeros(order), x])
    pred = np.zeros(t_len)
    for t in range(t_len):
        for i in range(order):
            pred[t] -= a[t, i] * xp[order + t - i]
    return pred


def mulaw_enc_1(x):
    s = np.sign(x)
    u = s * 128.0 * np.log1p(255.0 / 32768.0 * np.abs(x)) / np.log(256.0)
    return np.clip(128.0 + u, 0.0, 255.0)


def mulaw_dec_1(u):
    u = np.asarray(u, np.float64) - 128.0
    return np.sign(u) * (32768.0 / 255.0) * (
        np.exp(np.abs(u) / 128.0 * np.log(256.0)) - 1.0)


def nearest_1(data, codebook):
    d = ((data[:, None, :] - codebook[None, :, :]) ** 2).sum(-1)
    return d.argmin(1)


def kmeans_update_1(data, codebook):
    idx = nearest_1(data, codebook)
    e, d = codebook.shape
    cb = np.zeros((e, d))
    cnt = np.zeros(e)
    for v, i in zip(data, idx):
        cb[i] += v
        cnt[i] += 1
    return cb / (cnt[:, None] + 1e-20), cnt


def lbg_train_1(data, nb_entries, rng):
    """Grow-by-one LBG with .001*U/2 perturbations (4 inner, 10 final)."""
    d = data.shape[1]
    cb = np.zeros((nb_entries, d))
    cb[0] = data.mean(0)
    for e in range(1, nb_entries):
        cb[e] = cb[0]
        cb[:e] += 0.001 * (rng.rand(e, d) / 2.0)
        for _ in range(4):
            cb[:e + 1], _ = kmeans_update_1(data, cb[:e + 1])
    for _ in range(10):
        cb, _ = kmeans_update_1(data, cb)
    return cb


def mbest_1(x, codebooks, survivors=5):
    """Multi-stage m-best beam, insertion-merge formulation.

    Keeps a sorted survivor list; each stage expands every survivor
    against the whole stage codebook and stable-merges (existing
    entries win ties; within a survivor, lower entry index wins).
    Returns (reconstruction, best index path).
    """
    def topk(vec, k):
        order = sorted(range(len(vec)), key=lambda i: (vec[i], i))[:k]
        return order, [vec[i] for i in order]

    d0 = ((x - codebooks[0]) ** 2).sum(-1)
    idx, dist = topk(d0, survivors)
    beam = [([i], v) for i, v in zip(idx, dist)]

    for cb in codebooks[1:]:
        cand = []
        for rank, (path, _) in enumerate(beam):
            recon = sum(codebooks[s][path[s]] for s in range(len(path)))
            d = ((x - recon - cb) ** 2).sum(-1)
            ids, ds = topk(d, survivors)
            for m, (i, v) in enumerate(zip(ids, ds)):
                cand.append((v, rank, m, path + [i]))
        cand.sort(key=lambda t: (t[0], t[1], t[2]))
        beam = [(path, v) for v, _, _, path in cand[:survivors]]

    best = beam[0][0]
    recon = sum(codebooks[s][best[s]] for s in range(len(best)))
    return recon, best
