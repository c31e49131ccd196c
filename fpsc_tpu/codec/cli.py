"""File codec CLI: wav -> `.fpsc` bitstream file -> wav.

The user-facing codec the reference never shipped (its pipeline stops
at decoded FEATURE dumps handed to an external vocoder,
src/generate_qtz_features.py + README.md:42-47).  Here a standalone
encoder process writes a self-contained container and a separate
decoder process reconstructs audio from it — artifacts (predictor
checkpoint, codebook .npz with attached priors) are the only shared
state, exactly like a deployed codec.

    # encode: wav in, one .fpsc out
    python -m fpsc_tpu.codec.cli encode OUT.fpsc IN.wav [IN2.wav ...] \
        train.transfer_model=<label> codec.codebook_path=cb.npz \
        [codec.preset=lean] [codec.use_mask=true] [key=value ...]

    # decode: .fpsc in, wavs out
    python -m fpsc_tpu.codec.cli decode IN.fpsc OUT_DIR \
        train.transfer_model=<label> codec.codebook_path=cb.npz \
        train.vocoder_model=<label_s> [key=value ...]

Encode side: on-TPU analysis frontend (dsp/frontend.extract_features
— the whole chain is one XLA program) -> closed-loop encode (single
lax.scan with in-scan VQ) -> native C++ range coder.  Decode side:
entropy decode -> closed-loop feature decode -> ceps2lpc -> fused
Pallas LPCNet sampler.

Lossy-transport mode: `codec.packet_ms=50` writes independently
decodable packets (add `codec.fec=true` for in-band lean-preset
redundancy); on decode, `codec.sim_drop=0.1` simulates an iid 10%
packet-drop channel — lost spans recover from FEC or conceal through
the closed-loop predictor (codec/plc.py), and the decoder prints the
per-utterance recovery report.
"""
from __future__ import annotations

import os
import sys
from typing import List, Optional, Sequence

import numpy as np

from fpsc_tpu.codec import container


def _jax():
    # honor JAX_PLATFORMS=cpu for subprocess tests: the env var alone
    # is ignored once the axon plugin registers (CLAUDE.md env rule 3)
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    return jax


def load_artifacts(cfg, need_vocoder: bool = False):
    """(frame_params, codebooks, priors, orders, rcmod, sizes
    [, vocoder_params]) from the checkpoint/codebook paths in cfg.
    The rate preset (cfg.codec.preset) is applied to the codebooks
    here so every downstream layer sees the reduced geometry."""
    jax = _jax()
    from fpsc_tpu.codec import native_rc, rate_control
    from fpsc_tpu.train import checkpoint as ckpt
    from fpsc_tpu.train.generate_qtz_features import codebook_sizes
    from fpsc_tpu.train.train_frame import build_model as build_frame

    frame_params = build_frame(cfg, jax.random.PRNGKey(cfg.train.seed))
    if cfg.train.transfer_model:
        payload = ckpt.load(ckpt.checkpoint_path(
            cfg.train.save_dir, cfg.train.transfer_model,
            cfg.train.transfer_epoch))
        frame_params = ckpt.restore_params(
            frame_params, payload, "predictor")
    codebooks = ckpt.load_codebooks(cfg.codec.codebook_path)
    if cfg.codec.preset != "full":
        codebooks = rate_control.preset_codebooks(
            codebooks, **rate_control.PRESETS[cfg.codec.preset])
    priors = ckpt.load_priors(cfg.codec.codebook_path)
    rcmod = native_rc.best()
    orders = rcmod.scalar_orders(codebooks)
    sizes = codebook_sizes(codebooks)
    if priors is not None and cfg.codec.preset != "full":
        # priors were collected at the FULL geometry; reduced presets
        # drop VECTOR streams only (scalar gains always survive), and
        # the remaining streams' count arrays are unchanged — drop the
        # priors of the removed stages
        dropped = {f"vq_{s}" for s in range(len(sizes["vq"]), 9)}
        dropped |= {f"vq_bl_{s}"
                    for s in range(len(sizes["vq_bl"]), 9)}
        priors = {k: v for k, v in priors.items() if k not in dropped}
    out = [frame_params, codebooks, priors, orders, rcmod, sizes]
    if need_vocoder:
        out.append(_load_vocoder(cfg, ckpt))
    return out


def _load_vocoder(cfg, ckpt):
    jax = _jax()
    from fpsc_tpu.models import lpcnet
    lcfg = lpcnet.LPCNetConfig(
        gru_a_units=cfg.lpcnet.gru_a_units,
        gru_b_units=cfg.lpcnet.gru_b_units,
        embed_dim=cfg.lpcnet.embed_dim,
        cond_units=cfg.lpcnet.cond_units)
    key = jax.random.PRNGKey(cfg.train.seed + 2)
    if cfg.lpcnet.bunch in (2, 4):
        from fpsc_tpu.models import lpcnet_bunched
        init = (lpcnet_bunched.init_bunched if cfg.lpcnet.bunch == 2
                else lpcnet_bunched.init_bunched4)
        params = init(key, lcfg)
    else:
        params = lpcnet.init_lpcnet(key, lcfg)
    if cfg.train.vocoder_model:
        payload = ckpt.load(ckpt.checkpoint_path(
            cfg.train.save_dir, cfg.train.vocoder_model,
            cfg.train.vocoder_epoch))
        params = ckpt.restore_params(
            params, payload, f"vocoder (bunch={cfg.lpcnet.bunch})")
    return params


def read_wav(path: str) -> np.ndarray:
    """16 kHz mono float waveform in [-1, 1] (listening domain)."""
    from scipy.io import wavfile
    from fpsc_tpu.dsp import constants as C
    sr, x = wavfile.read(path)
    if x.ndim > 1:
        x = x.mean(axis=1)
    if x.dtype == np.int16:
        x = x.astype(np.float32) / 32768.0
    x = np.asarray(x, np.float32)
    if sr != C.SAMPLE_RATE:
        from math import gcd
        from fpsc_tpu.eval.stoi import resample_poly
        g = gcd(C.SAMPLE_RATE, int(sr))
        x = resample_poly(x, C.SAMPLE_RATE // g,
                          int(sr) // g).astype(np.float32)
    return x


def encode_paths(cfg, wav_paths: Sequence[str], out_path: str,
                 artifacts=None) -> dict:
    """Encode wav files into one .fpsc container; returns per-file
    rates.  The analysis frontend runs fully on-device."""
    jax = _jax()
    import jax.numpy as jnp
    from fpsc_tpu.codec import bitstream as bs
    from fpsc_tpu.codec.codec import encode
    from fpsc_tpu.dsp import constants as C
    from fpsc_tpu.dsp.frontend import extract_features_batch

    (frame_params, codebooks, priors, orders, rcmod,
     sizes) = artifacts or load_artifacts(cfg)
    scale = C.MAXI if cfg.data.normalize else 1.0

    # bucket utterances by frame count and run each bucket as ONE
    # batched closed-loop encode — the scan compiles once per length
    # and every dispatch carries a full batch (per-call dispatch is
    # the tunneled-TPU bottleneck, CLAUDE.md env rules)
    names = [os.path.splitext(os.path.basename(p))[0]
             for p in wav_paths]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(
            "duplicate wav basenames would silently collide in the "
            f"container: {dupes} — rename the inputs")
    waves = [read_wav(p) for p in wav_paths]
    all_rows = extract_features_batch(waves)   # bucketed batched XLA
    feats, buckets = {}, {}
    for path, rows in zip(wav_paths, all_rows):
        rows = np.asarray(rows)
        if rows.shape[0] == 0:
            raise ValueError(f"{path}: too short to code (<2 frames)")
        # condition the closed-loop encoder on the DEQUANTIZED pitch —
        # exactly what the decoder will reconstruct from the stream —
        # so the two closed loops track bit-identically (the
        # reference's qtz-pitch substitution, dataset_orig.py:69-71)
        pitch_dq = bs.dequantize_pitch(
            bs.quantize_pitch(rows[:, 18:20]))
        name = os.path.splitext(os.path.basename(path))[0]
        feats[name] = np.concatenate([rows[:, :18], pitch_dq], axis=1)
        buckets.setdefault(rows.shape[0], []).append(name)

    packet_frames = cfg.codec.packet_ms // 10
    if cfg.codec.packet_ms and not cfg.codec.entropy_coding:
        raise ValueError("codec.packet_ms requires entropy_coding")
    if cfg.codec.fec and not packet_frames:
        raise ValueError("codec.fec requires codec.packet_ms > 0")
    fec_books = fec_sizes = None
    if cfg.codec.fec:
        from fpsc_tpu.codec import plc, rate_control
        from fpsc_tpu.train.generate_qtz_features import codebook_sizes
        fec_books = rate_control.preset_codebooks(
            codebooks, **rate_control.PRESETS["lean"])
        fec_sizes = codebook_sizes(fec_books)

    coded = {}
    for n_frames, names in buckets.items():
        feat = jnp.asarray(np.stack([feats[n] for n in names]) / scale)
        enc = encode(frame_params, codebooks, feat,
                     l1=cfg.codec.l1, l2=cfg.codec.l2,
                     use_mask=cfg.codec.use_mask,
                     scale=cfg.codec.mask_scale)
        fidx = (plc.fec_requantize(fec_books, enc["r"], enc["ind1"],
                                   enc["ind2"])
                if cfg.codec.fec else None)
        for i, name in enumerate(names):
            coded[name] = (
                np.asarray(enc["ind1"])[i], np.asarray(enc["ind2"])[i],
                {k: np.asarray(v)[i]
                 for k, v in enc["indices"].items()},
                None if fidx is None else
                {k: np.asarray(v)[i] for k, v in fidx.items()})

    utts, rates = [], {}
    for path in wav_paths:            # preserve CLI argument order
        name = os.path.splitext(os.path.basename(path))[0]
        ind1, ind2, idx, fidx = coded[name]
        pitch_raw = feats[name][:, 18:20]
        if cfg.codec.fec:
            from fpsc_tpu.codec import range_coder as rc
            payload = rc.pack_packets_fec(
                ind1, ind2, idx, bs.quantize_pitch(pitch_raw), sizes,
                fidx, fec_sizes, packet_frames=packet_frames,
                priors=priors, orders=orders)
            nbytes = sum(len(p) for p in payload)
        elif packet_frames:
            from fpsc_tpu.codec import range_coder as rc
            payload = rc.pack_packets(
                ind1, ind2, idx, bs.quantize_pitch(pitch_raw), sizes,
                packet_frames=packet_frames, priors=priors,
                orders=orders)
            nbytes = sum(len(p) for p in payload)
        elif cfg.codec.entropy_coding:
            payload = rcmod.pack_utterance_rc(
                ind1, ind2, idx, bs.quantize_pitch(pitch_raw), sizes,
                priors=priors, orders=orders)
            nbytes = len(payload)
        else:
            payload = bs.pack_utterance(ind1, ind2, idx, pitch_raw,
                                        sizes)
            nbytes = len(payload)
        utts.append((name, payload))
        rates[name] = bs.bitrate_bps(nbytes, feats[name].shape[0])
    total = container.write_fpsc(
        out_path, utts, sizes, entropy=cfg.codec.entropy_coding,
        use_mask=cfg.codec.use_mask, l1=cfg.codec.l1, l2=cfg.codec.l2,
        mask_scale=cfg.codec.mask_scale, preset=cfg.codec.preset,
        sample_rate=C.SAMPLE_RATE, packet_frames=packet_frames,
        fec=cfg.codec.fec,
        frame_counts={n: f.shape[0] for n, f in feats.items()})
    for name, bps in rates.items():
        print(f"{name}: {bps:.0f} b/s")
    print(f"wrote {out_path}: {len(utts)} utterance(s), {total} bytes")
    return {"rates": rates, "bytes": total, "sizes": sizes}


def decode_file(cfg, in_path: str, out_dir: str,
                use_pallas: bool = True, artifacts=None,
                vocoder_params=None) -> List[dict]:
    """Decode every utterance in a .fpsc container to
    out_dir/<name>.wav; returns the decoded features + audio."""
    jax = _jax()
    import jax.numpy as jnp
    from fpsc_tpu.codec import bitstream as bs
    from fpsc_tpu.codec.codec import decode
    from fpsc_tpu.dsp import constants as C
    from fpsc_tpu.dsp.ceps2lpc import ceps2lpc
    from fpsc_tpu.train.synthesis import save_wav

    if artifacts is None:
        *artifacts, vocoder_params = load_artifacts(
            cfg, need_vocoder=True)
    (frame_params, codebooks, priors, orders, rcmod,
     sizes) = artifacts
    box = container.read_fpsc(in_path)
    meta = box["meta"]
    container.check_geometry(meta, sizes)
    scale = C.MAXI if cfg.data.normalize else 1.0
    os.makedirs(out_dir, exist_ok=True)

    pf = meta.get("packet_frames", 0)
    fec = meta.get("fec", False)
    fec_books = fec_sizes = None
    if fec:
        from fpsc_tpu.codec import rate_control
        from fpsc_tpu.train.generate_qtz_features import codebook_sizes
        fec_books = rate_control.preset_codebooks(
            codebooks, **rate_control.PRESETS["lean"])
        fec_sizes = codebook_sizes(fec_books)
    drop_rng = np.random.RandomState(cfg.codec.sim_seed)

    # entropy decode on host, then bucket by length and run each
    # bucket's feature decode + vocoder as ONE batched program
    # (mirrors the encoder's bucketing)
    from fpsc_tpu.codec import range_coder as rc
    unpacked, buckets, order = {}, {}, []
    for name, payload in box["utterances"]:
        if pf:
            nbytes = sum(len(p) for p in payload)
            total_frames = meta["frame_counts"].get(name)
            if cfg.codec.sim_drop > 0:
                keep = drop_rng.rand(len(payload)) >= cfg.codec.sim_drop
                keep[0] = True          # session start always arrives
                payload = [p if keep[j] else None
                           for j, p in enumerate(payload)]
            if fec:
                got = rc.unpack_packets_fec(
                    payload, sizes, fec_sizes, packet_frames=pf,
                    total_frames=total_frames,
                    priors=priors, orders=orders)
            else:
                got = rc.unpack_packets(payload, sizes,
                                        packet_frames=pf,
                                        total_frames=total_frames,
                                        priors=priors, orders=orders)
            if got["lost"].any() or got.get(
                    "from_fec", np.zeros(1, bool)).any():
                print(f"{name}: {int(got['lost'].sum())} frame(s) "
                      f"concealed"
                      + (f", {int(got['from_fec'].sum())} recovered "
                         "from FEC" if fec else ""))
        elif meta["entropy"]:
            got = rcmod.unpack_utterance_rc(payload, sizes,
                                            priors=priors,
                                            orders=orders)
            nbytes = len(payload)
        else:
            got = bs.unpack_utterance(payload, sizes)
            nbytes = len(payload)
        unpacked[name] = (got, nbytes)
        buckets.setdefault(len(got["ind1"]), []).append(name)
        order.append(name)

    out = {}
    for n_frames, names in buckets.items():
        stack = lambda f: jnp.asarray(np.stack(
            [f(unpacked[n][0]) for n in names]))
        g0 = unpacked[names[0]][0]
        if pf and fec:
            from fpsc_tpu.codec import plc
            r_rows, lost_rows = [], []
            for n in names:
                g = unpacked[n][0]
                r, _, lost = plc.fec_merge_residual(codebooks,
                                                    fec_books, g)
                r_rows.append(np.asarray(r)[0])
                lost_rows.append(np.asarray(lost)[0])
            coded = plc.conceal_decode_residual(
                frame_params, jnp.asarray(np.stack(r_rows)),
                stack(lambda g: g["pitch"]) / scale,
                jnp.asarray(np.stack(lost_rows)))
        elif pf:
            from fpsc_tpu.codec import plc
            coded = plc.conceal_decode(
                frame_params, codebooks,
                stack(lambda g: g["ind1"]),
                stack(lambda g: g["ind2"]),
                {k: stack(lambda g, k=k: g["indices"][k])
                 for k in g0["indices"]},
                stack(lambda g: g["pitch"]) / scale,
                stack(lambda g: g["lost"]))
        else:
            coded = decode(frame_params, codebooks,
                           stack(lambda g: g["ind1"]),
                           stack(lambda g: g["ind2"]),
                           {k: stack(lambda g, k=k: g["indices"][k])
                            for k in g0["indices"]},
                           stack(lambda g: g["pitch"]) / scale)
        coded_un = np.asarray(coded) * scale
        periods = (0.1 + 50.0 * coded_un[..., 18] + 100.0
                   ).astype(np.int32)
        _, lpc, _ = ceps2lpc(jnp.asarray(
            coded_un.reshape(-1, 20)[:, :18]))
        lpc = np.asarray(lpc).reshape(coded_un.shape[0], -1, 16)
        y = _synthesize(vocoder_params, coded, periods, lpc,
                        coded_un[..., 19], use_pallas)
        for i, name in enumerate(names):
            out[name] = {"name": name, "coded": np.asarray(coded)[i],
                         "wav": y[i]}

    results = []
    for name in order:                # container order
        r = out[name]
        wav_path = os.path.join(out_dir, f"{name}.wav")
        save_wav(wav_path, r["wav"])
        print(f"{name}: {unpacked[name][1]} bytes -> "
              f"{len(r['wav'])} samples -> {wav_path}")
        results.append(r)
    return results


def _synthesize(vocoder_params, coded, periods, lpc, corr,
                use_pallas: bool):
    jax = _jax()
    import jax.numpy as jnp
    from fpsc_tpu.models import lpcnet
    if jax.default_backend() == "cpu":
        # Pallas TPU kernels only interpret (slowly) on CPU — use the
        # XLA scan sampler there; the fused kernel is the TPU path
        use_pallas = False
    if use_pallas:
        from fpsc_tpu.ops.lpcnet_sampler import (auto_block_pattern,
                                                 pallas_generate)
        return np.asarray(pallas_generate(
            vocoder_params, coded, jnp.asarray(periods),
            jnp.asarray(lpc), jax.random.PRNGKey(0),
            corr=jnp.asarray(corr),
            gru_a_pattern=auto_block_pattern(vocoder_params)))
    if hasattr(vocoder_params, "base"):
        from fpsc_tpu.models import lpcnet_bunched
        gen = lpcnet_bunched.generate_any
    else:
        gen = lpcnet.generate
    return np.asarray(gen(vocoder_params, coded, jnp.asarray(periods),
                          jnp.asarray(lpc), jax.random.PRNGKey(0),
                          corr=jnp.asarray(corr)))


def main(argv: Optional[List[str]] = None) -> int:
    from fpsc_tpu.config.config import Config, apply_overrides
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in ("encode", "decode"):
        print(__doc__)
        return 2
    cmd, rest = argv[0], argv[1:]
    paths = [a for a in rest if "=" not in a]
    overrides = [a for a in rest if "=" in a]
    cfg = Config()
    apply_overrides(cfg, overrides)
    if cmd == "encode":
        if len(paths) < 2:
            print("encode OUT.fpsc IN.wav [IN2.wav ...] [key=value]")
            return 2
        encode_paths(cfg, paths[1:], paths[0])
    else:
        if len(paths) != 2:
            print("decode IN.fpsc OUT_DIR [key=value]")
            return 2
        decode_file(cfg, paths[0], paths[1])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
