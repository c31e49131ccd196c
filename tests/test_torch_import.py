"""Reference-checkpoint import: torch state dicts -> fpsc_tpu params."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpsc_tpu.models import frame_predictor as fp
from fpsc_tpu.utils.torch_import import (wavenet_to_params,
                                         wavernn_to_frame_predictor)

RNG = np.random.RandomState(81)


def test_wavernn_import_matches_torch_forward():
    """A torch predictor's state dict imports and reproduces torch's
    own forward computation."""
    import torch

    class Wavernn(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.rnn1 = torch.nn.GRU(20, 24, 1, batch_first=True)
            self.rnn2 = torch.nn.GRU(24, 12, 1, batch_first=True)
            self.dual_fc = torch.nn.Sequential(
                torch.nn.Linear(12, 18), torch.nn.Tanh())

    m = Wavernn()
    x = RNG.randn(2, 9, 20).astype(np.float32) * 0.3
    with torch.no_grad():
        h1, _ = m.rnn1(torch.tensor(x))
        h2, _ = m.rnn2(h1)
        # the reference head sums the shared FC applied to two copies
        # == 2*tanh(Wx+b) on the ReLU'd GRU output
        want = 2.0 * m.dual_fc(torch.relu(h2))
    params, cfg = wavernn_to_frame_predictor(m.state_dict())
    assert cfg.gru_units1 == 24 and cfg.fc_units == 18
    got, _, _ = fp.forward(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_wavernn_import_then_encode():
    """Imported predictors drive the closed-loop codec directly."""
    import torch

    class Wavernn(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.rnn1 = torch.nn.GRU(20, 16, 1, batch_first=True)
            self.rnn2 = torch.nn.GRU(16, 8, 1, batch_first=True)
            self.dual_fc = torch.nn.Sequential(
                torch.nn.Linear(8, 18), torch.nn.Tanh())

    params, cfg = wavernn_to_frame_predictor(Wavernn().state_dict())
    feat = (RNG.randn(1, 8, 20) * 0.3).astype(np.float32)
    out = fp.encoder(params, jnp.asarray(feat), l1=0.09, l2=0.28,
                     qtz=False)
    assert out["c_in"].shape == (1, 8, 20)


def test_wavenet_import_roundtrip():
    """A torch-layout Wavenet state dict (synthesised from our own
    params) imports back to numerically identical behaviour."""
    import torch

    from fpsc_tpu.models import wavenet as wn

    cfg = wn.WavenetConfig(num_blocks=1, num_layers=2,
                           residual_channels=8, gate_channels=12,
                           skip_channels=8, cout_channels=12,
                           front_kernel=4, cin_channels=20)
    params = wn.init_wavenet(jax.random.PRNGKey(0), cfg)

    def tt(a):
        return torch.tensor(np.asarray(a))

    sd = {}
    def put_wn(prefix, p, g_shape):
        sd[f"{prefix}.weight_v"] = tt(p.v)
        sd[f"{prefix}.weight_g"] = tt(p.g).reshape(g_shape)
        sd[f"{prefix}.bias"] = tt(p.b)

    put_wn("front_conv.0.conv", params.front, (-1, 1, 1))
    for i, blk in enumerate(params.blocks):
        put_wn(f"res_blocks.{i}.filter_conv.conv", blk.filter_conv,
               (-1, 1, 1))
        put_wn(f"res_blocks.{i}.gate_conv.conv", blk.gate_conv,
               (-1, 1, 1))
        put_wn(f"res_blocks.{i}.res_conv", blk.res_conv, (-1, 1, 1))
        put_wn(f"res_blocks.{i}.skip_conv", blk.skip_conv, (-1, 1, 1))
        put_wn(f"res_blocks.{i}.filter_conv_c", blk.filter_cond,
               (-1, 1, 1))
        put_wn(f"res_blocks.{i}.gate_conv_c", blk.gate_cond, (-1, 1, 1))
    put_wn("final_conv.1.conv", params.final1, (-1, 1, 1))
    put_wn("final_conv.3.conv", params.final2, (-1, 1, 1))
    up = params.upsampler
    sd["embedding.weight"] = tt(up.period_emb.table[:256])
    sd["c_conv.0.weight"] = tt(wn.wn_weight(up.c_conv1))
    sd["c_conv.0.bias"] = tt(up.c_conv1.b)
    sd["c_conv.2.weight"] = tt(wn.wn_weight(up.c_conv2))
    sd["c_conv.2.bias"] = tt(up.c_conv2.b)
    sd["c_fc.0.weight"] = tt(up.c_fc1.w)
    sd["c_fc.0.bias"] = tt(up.c_fc1.b)
    sd["c_fc.2.weight"] = tt(up.c_fc2.w)
    sd["c_fc.2.bias"] = tt(up.c_fc2.b)
    for i, (k, g, b) in enumerate(zip(up.convt, up.convt_g, up.convt_b)):
        sd[f"upsample_conv.{2*i}.weight_v"] = tt(k)
        sd[f"upsample_conv.{2*i}.weight_g"] = tt(g).reshape(1, 1, 1, 1)
        sd[f"upsample_conv.{2*i}.bias"] = tt(b).reshape(1)

    imported = wavenet_to_params(sd)
    x = (RNG.randn(1, 1, 320) * 0.1).astype(np.float32)
    c = (RNG.randn(1, 20, 2) * 0.3).astype(np.float32)
    periods = RNG.randint(32, 250, (1, 2)).astype(np.int32)
    want = np.asarray(wn.forward(params, cfg, jnp.asarray(x),
                                 jnp.asarray(periods), jnp.asarray(c)))
    got = np.asarray(wn.forward(imported, cfg, jnp.asarray(x),
                                jnp.asarray(periods), jnp.asarray(c)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
