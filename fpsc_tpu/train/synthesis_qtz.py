"""Full-codec synthesis entry point (encode -> bitstream -> decode ->
vocoder).

Capability parity with reference src/synthesis_qtz.py (which encodes
selected utterances with the hard mask and dumps feature files for the
EXTERNAL LPCNet vocoder, synthesis_qtz.py:93-166 + README.md:42-47).
Here the whole codec closes in-framework: the coded features drive the
batched LPCNet sampler (fused Pallas kernel) directly, producing wavs
plus the coded-feature .npy dumps for interchange.

Run:  python -m fpsc_tpu.train.synthesis_qtz data.synthetic=true \
          codec.codebook_path=codebooks/default.npz
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fpsc_tpu.codec import bitstream as bs
from fpsc_tpu.codec.codec import coded_feature_windows, decode, encode
from fpsc_tpu.config.config import Config, parse_cli
from fpsc_tpu.data.dataset import build_dataset, predictor_inputs
from fpsc_tpu.dsp import constants as C
from fpsc_tpu.dsp.ceps2lpc import ceps2lpc
from fpsc_tpu.models import lpcnet
from fpsc_tpu.ops.lpcnet_sampler import pallas_generate
from fpsc_tpu.train import checkpoint as ckpt
from fpsc_tpu.train.generate_qtz_features import codebook_sizes
from fpsc_tpu.train.synthesis import save_wav
from fpsc_tpu.train.train_frame import build_model as build_frame


def run(cfg: Config, num_samples: int = 2, out_dir: Optional[str] = None,
        vocoder_params: Optional[lpcnet.LPCNetParams] = None,
        use_pallas: bool = True, priors: Optional[dict] = None):
    """priors: optional shared entropy-model priors
    (range_coder.collect_priors output); must be the identical dict on
    the decode side - here both directions use it symmetrically."""
    frame_params = build_frame(cfg, jax.random.PRNGKey(cfg.train.seed))
    if cfg.train.transfer_model:
        payload = ckpt.load(ckpt.checkpoint_path(
            cfg.train.save_dir, cfg.train.transfer_model,
            cfg.train.transfer_epoch))
        frame_params = ckpt.restore_params(
            frame_params, payload, "predictor")
    codebooks = ckpt.load_codebooks(cfg.codec.codebook_path)
    sizes = codebook_sizes(codebooks)

    if vocoder_params is None:
        lcfg = lpcnet.LPCNetConfig(
            gru_a_units=cfg.lpcnet.gru_a_units,
            gru_b_units=cfg.lpcnet.gru_b_units,
            embed_dim=cfg.lpcnet.embed_dim,
            cond_units=cfg.lpcnet.cond_units)
        assert cfg.lpcnet.bunch in (1, 2, 4), cfg.lpcnet.bunch
        key = jax.random.PRNGKey(cfg.train.seed + 2)
        if cfg.lpcnet.bunch == 2:
            from fpsc_tpu.models import lpcnet_bunched
            vocoder_params = lpcnet_bunched.init_bunched(key, lcfg)
        elif cfg.lpcnet.bunch == 4:
            from fpsc_tpu.models import lpcnet_bunched
            vocoder_params = lpcnet_bunched.init_bunched4(key, lcfg)
        else:
            vocoder_params = lpcnet.init_lpcnet(key, lcfg)
        if cfg.train.vocoder_model:
            payload = ckpt.load(ckpt.checkpoint_path(
                cfg.train.save_dir, cfg.train.vocoder_model,
                cfg.train.vocoder_epoch))
            vocoder_params = ckpt.restore_params(
                vocoder_params, payload,
                f"vocoder (bunch={cfg.lpcnet.bunch})")

    ds = build_dataset(cfg.data, "val")
    out_dir = out_dir or os.path.join(cfg.train.save_dir,
                                      f"qtz_samples_{cfg.label}")
    os.makedirs(out_dir, exist_ok=True)
    results = []
    for ns, batch in enumerate(ds.iter_batches(1, seed=0)):
        if ns >= num_samples:
            break
        name = batch["name"][0]
        feat = jnp.asarray(predictor_inputs(batch, cfg.data.normalize))

        # --- transmit chain: encode -> pack -> unpack -> decode ---
        enc = encode(frame_params, codebooks, feat,
                     l1=cfg.codec.l1, l2=cfg.codec.l2,
                     use_mask=cfg.codec.use_mask,
                     scale=cfg.codec.mask_scale)
        # quantize_pitch's 8-bit period / 3-bit corr codes are defined
        # on the RAW feature scale (period = 0.1 + 50*p + 100,
        # reference src/train.py:123); feat here is MAXI-normalised,
        # so un-normalise before packing and re-normalise the unpacked
        # pitch before handing it back to the (normalised-domain)
        # decoder.
        scale = C.MAXI if cfg.data.normalize else 1.0
        ind1_np = np.asarray(enc["ind1"])[0]
        ind2_np = np.asarray(enc["ind2"])[0]
        idx_np = {k: np.asarray(v)[0] for k, v in enc["indices"].items()}
        pitch_raw = np.asarray(feat)[0, :, 18:] * scale
        if cfg.codec.entropy_coding:
            from fpsc_tpu.codec import native_rc
            rcmod = native_rc.best()  # byte-identical C++ when built
            # both sides derive the identical value-rank orders from
            # the codebook artifacts (energy context buckets)
            orders = rcmod.scalar_orders(codebooks)
            packed = rcmod.pack_utterance_rc(
                ind1_np, ind2_np, idx_np, bs.quantize_pitch(pitch_raw),
                sizes, priors=priors, orders=orders)
            got = rcmod.unpack_utterance_rc(packed, sizes,
                                            priors=priors,
                                            orders=orders)
        else:
            packed = bs.pack_utterance(ind1_np, ind2_np, idx_np,
                                       pitch_raw, sizes)
            got = bs.unpack_utterance(packed, sizes)
        coded = decode(frame_params, codebooks,
                       jnp.asarray(got["ind1"][None]),
                       jnp.asarray(got["ind2"][None]),
                       {k: jnp.asarray(v[None])
                        for k, v in got["indices"].items()},
                       jnp.asarray(got["pitch"][None]) / scale)

        # coded-feature windows for interchange (reference dump format)
        windows = coded_feature_windows(coded)[0]
        np.save(os.path.join(out_dir, f"{name}_features.npy"), windows)

        # --- vocoder synthesis from the DECODED features only ---
        coded_un = np.asarray(coded) * scale
        periods = (0.1 + 50.0 * coded_un[..., 18] + 100.0
                   ).astype(np.int32)
        _, lpc, _ = ceps2lpc(jnp.asarray(
            coded_un.reshape(-1, 20)[:, :18]))
        lpc = np.asarray(lpc).reshape(coded_un.shape[0], -1, 16)
        if use_pallas:
            # sparse-trained vocoders automatically use the kernel's
            # static block-sparse recurrent path
            from fpsc_tpu.ops.lpcnet_sampler import auto_block_pattern
            pat = auto_block_pattern(vocoder_params)
            y = np.asarray(pallas_generate(
                vocoder_params, coded, jnp.asarray(periods),
                jnp.asarray(lpc), jax.random.PRNGKey(ns),
                corr=jnp.asarray(coded_un[..., 19]),
                gru_a_pattern=pat))
        else:
            if hasattr(vocoder_params, "base"):     # bunched variants
                from fpsc_tpu.models import lpcnet_bunched
                gen = lpcnet_bunched.generate_any
            else:
                gen = lpcnet.generate
            y = np.asarray(gen(
                vocoder_params, coded, jnp.asarray(periods),
                jnp.asarray(lpc), jax.random.PRNGKey(ns),
                corr=jnp.asarray(coded_un[..., 19])))
        from fpsc_tpu.dsp.emphasis import deemphasis
        save_wav(os.path.join(out_dir, f"{name}_truth.wav"),
                 deemphasis(batch["x"][0]))
        save_wav(os.path.join(out_dir, f"{name}_dec.wav"), y[0])
        rate = bs.bitrate_bps(len(packed), feat.shape[1])
        print(f"{name}: {len(packed)} bytes ({rate:.0f} b/s) "
              f"-> {y.shape[-1]} samples")
        results.append({"name": name, "bitrate": rate,
                        "wav": y[0], "packed": packed})
    return results


if __name__ == "__main__":
    run(parse_cli())
