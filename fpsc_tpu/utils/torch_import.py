"""Import reference PyTorch checkpoints into fpsc_tpu param pytrees.

Users of the reference repo hold trained `.pth` state dicts (saved by
src/utils.py:127-157); these converters map them onto our models so
they can switch frameworks without retraining:

* Wavernn (src/models/wavernn.py:22-60)  -> FramePredictorParams
* Wavenet (src/models/wavenet.py:11-81)  -> WavenetParams

Both mappings are exact (same math, torch weight layout preserved);
tests/test_torch_import.py checks forward parity against torch
execution of the same state dict.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from fpsc_tpu.models.common import DenseParams, EmbeddingParams
from fpsc_tpu.models.gru import GRUParams


def _t(sd: Dict, key: str) -> jnp.ndarray:
    v = sd[key]
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return jnp.asarray(np.asarray(v), jnp.float32)


def _gru(sd: Dict, prefix: str) -> GRUParams:
    return GRUParams(
        wi=_t(sd, f"{prefix}.weight_ih_l0"),
        wh=_t(sd, f"{prefix}.weight_hh_l0"),
        bi=_t(sd, f"{prefix}.bias_ih_l0"),
        bh=_t(sd, f"{prefix}.bias_hh_l0"),
    )


def load_state_dict(path: str) -> Dict:
    import torch

    return torch.load(path, map_location="cpu")


def wavernn_to_frame_predictor(sd: Dict):
    """Reference Wavernn state dict -> FramePredictorParams.

    The reference's mask_rnn/mask_fc layers are commented out in its
    released model (wavernn.py:54-58); when absent, fresh mask layers
    are initialised (the threshold codec paths never use them).
    """
    import jax

    from fpsc_tpu.models.frame_predictor import (FramePredictorConfig,
                                                 init_frame_predictor)

    rnn1 = _gru(sd, "rnn1")
    rnn2 = _gru(sd, "rnn2")
    fc = DenseParams(w=_t(sd, "dual_fc.0.weight"),
                     b=_t(sd, "dual_fc.0.bias"))
    cfg = FramePredictorConfig(
        in_features=rnn1.wi.shape[1],
        gru_units1=rnn1.units,
        gru_units2=rnn2.units,
        fc_units=fc.w.shape[0],
    )
    params = init_frame_predictor(jax.random.PRNGKey(0), cfg)
    params = params._replace(rnn1=rnn1, rnn2=rnn2, fc=fc)
    if "mask_rnn.weight_ih_l0" in sd:
        params = params._replace(
            mask_fwd=_gru(sd, "mask_rnn"),
            mask_bwd=GRUParams(
                wi=_t(sd, "mask_rnn.weight_ih_l0_reverse"),
                wh=_t(sd, "mask_rnn.weight_hh_l0_reverse"),
                bi=_t(sd, "mask_rnn.bias_ih_l0_reverse"),
                bh=_t(sd, "mask_rnn.bias_hh_l0_reverse"),
            ),
            mask_fc=DenseParams(w=_t(sd, "mask_fc.0.weight"),
                                b=_t(sd, "mask_fc.0.bias")),
        )
    return params, cfg


def wavernn_para_to_params(sd: Dict):
    """Reference Wavernn_para state dict (wavernn_para.py:21-50) ->
    (ParaParams, ParaConfig)."""
    from fpsc_tpu.models.frame_predictor_para import ParaConfig, ParaParams

    rnn1 = _gru(sd, "rnn1")
    rnn2 = _gru(sd, "rnn2")
    rnn3 = _gru(sd, "rnn3")
    fc = DenseParams(w=_t(sd, "dual_fc.0.weight"),
                     b=_t(sd, "dual_fc.0.bias"))
    cfg = ParaConfig(in_features=rnn1.wi.shape[1],
                     gru_units1=rnn1.units,
                     gru_units2=rnn2.units,
                     fc_units=fc.w.shape[0])
    return ParaParams(rnn1=rnn1, rnn2=rnn2, rnn3=rnn3, fc=fc), cfg


def _wnconv(sd: Dict, prefix: str, weight_norm: bool = True):
    """torch Conv1d (optionally weight_norm-wrapped) -> WNConvParams."""
    from fpsc_tpu.models.wavenet import WNConvParams

    if weight_norm and f"{prefix}.weight_v" in sd:
        v = _t(sd, f"{prefix}.weight_v")
        g = _t(sd, f"{prefix}.weight_g")
        # torch keeps g shaped (out, 1, 1)
        g = g.reshape(-1)
    else:
        v = _t(sd, f"{prefix}.weight")
        g = jnp.sqrt(jnp.sum(v * v, axis=tuple(range(1, v.ndim))))
    b = (_t(sd, f"{prefix}.bias") if f"{prefix}.bias" in sd
         else jnp.zeros((v.shape[0],)))
    return WNConvParams(v=v, g=g, b=b)


def wavenet_to_params(sd: Dict, cfg=None):
    """Reference Wavenet state dict -> (WavenetParams, WavenetConfig)."""
    from fpsc_tpu.models.wavenet import (ResBlockParams, UpsamplerParams,
                                         WavenetConfig, WavenetParams)

    n_blocks = len({k.split(".")[1] for k in sd
                    if k.startswith("res_blocks.")})
    blocks = []
    for i in range(n_blocks):
        p = f"res_blocks.{i}"
        blocks.append(ResBlockParams(
            filter_conv=_wnconv(sd, f"{p}.filter_conv.conv"),
            gate_conv=_wnconv(sd, f"{p}.gate_conv.conv"),
            res_conv=_wnconv(sd, f"{p}.res_conv"),
            skip_conv=_wnconv(sd, f"{p}.skip_conv"),
            filter_cond=_wnconv(sd, f"{p}.filter_conv_c"),
            gate_cond=_wnconv(sd, f"{p}.gate_conv_c"),
        ))
    front = _wnconv(sd, "front_conv.0.conv")
    final1 = _wnconv(sd, "final_conv.1.conv")
    final2 = _wnconv(sd, "final_conv.3.conv")

    convt, convt_g, convt_b = [], [], []
    i = 0
    while f"upsample_conv.{i}.weight_v" in sd:
        convt.append(_t(sd, f"upsample_conv.{i}.weight_v"))
        convt_g.append(_t(sd, f"upsample_conv.{i}.weight_g").reshape(()))
        convt_b.append(_t(sd, f"upsample_conv.{i}.bias").reshape(()))
        i += 2  # LeakyReLU between transposed convs

    # the reference uses Embedding(256, 64); our upsampler clips
    # periods to 0..511, so edge-pad the imported table to 512 rows
    emb_table = _t(sd, "embedding.weight")
    if emb_table.shape[0] < 512:
        pad = jnp.repeat(emb_table[-1:], 512 - emb_table.shape[0], 0)
        emb_table = jnp.concatenate([emb_table, pad], 0)
    upsampler = UpsamplerParams(
        period_emb=EmbeddingParams(emb_table),
        c_conv1=_wnconv(sd, "c_conv.0", weight_norm=False),
        c_conv2=_wnconv(sd, "c_conv.2", weight_norm=False),
        c_fc1=DenseParams(w=_t(sd, "c_fc.0.weight"),
                          b=_t(sd, "c_fc.0.bias")),
        c_fc2=DenseParams(w=_t(sd, "c_fc.2.weight"),
                          b=_t(sd, "c_fc.2.bias")),
        convt=tuple(convt), convt_g=tuple(convt_g),
        convt_b=tuple(convt_b),
    )
    params = WavenetParams(front=front, blocks=tuple(blocks),
                           final1=final1, final2=final2,
                           upsampler=upsampler)
    return params
