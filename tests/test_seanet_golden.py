"""Golden tests: EnCodec-layout SEANet checkpoints import bit-comparably.

Builds a torch replica of the pip `encodec` package's SEANet modules
(modules/conv.py SConv1d/SConvTranspose1d padding semantics, seanet.py
SEANetResnetBlock/SLSTM/SEANetEncoder/SEANetDecoder Sequential layout —
the thing reference autoencoders.py:793-836 wraps), exports its state dict,
imports through import_seanet_encoder/decoder, and asserts output parity.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch.nn.utils import weight_norm  # noqa: E402

from stable_audio_tools_tpu.io.checkpoints import (  # noqa: E402
    import_seanet_decoder,
    import_seanet_encoder,
    import_torch_lstm,
)
from stable_audio_tools_tpu.models.seanet import (  # noqa: E402

    SEANetDecoder,
    SEANetEncoder,
    SEANetLSTM,
)

pytestmark = pytest.mark.slow  # heavyweight golden/integration tier


# ---- torch replica of pip encodec (test fixture for importer validation) ----


def _pad1d(x, pl, pr, mode):
    if mode == "reflect":
        length = x.shape[-1]
        max_pad = max(pl, pr)
        extra = 0
        if length <= max_pad:
            extra = max_pad - length + 1
            x = F.pad(x, (0, extra))
        padded = F.pad(x, (pl, pr), "reflect")
        end = padded.shape[-1] - extra
        return padded[..., :end]
    return F.pad(x, (pl, pr))


class SConv1d(tnn.Module):
    def __init__(self, in_ch, out_ch, k, stride=1, dilation=1, causal=False,
                 pad_mode="reflect"):
        super().__init__()

        class NormConv1d(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv = weight_norm(
                    tnn.Conv1d(in_ch, out_ch, k, stride, dilation=dilation))

            def forward(self, x):
                return self.conv(x)

        self.conv = NormConv1d()
        self.causal, self.pad_mode = causal, pad_mode
        self.k, self.stride, self.dilation = k, stride, dilation

    def forward(self, x):
        k_eff = (self.k - 1) * self.dilation + 1
        pt = k_eff - self.stride
        T = x.shape[-1]
        n_frames = (T - k_eff + pt) / self.stride + 1
        ideal = (math.ceil(n_frames) - 1) * self.stride + (k_eff - pt)
        extra = max(ideal - T, 0)
        if self.causal:
            x = _pad1d(x, pt, extra, self.pad_mode)
        else:
            pr = pt // 2
            x = _pad1d(x, pt - pr, pr + extra, self.pad_mode)
        return self.conv(x)


class SConvTranspose1d(tnn.Module):
    def __init__(self, in_ch, out_ch, k, stride, causal=False,
                 trim_right_ratio=1.0):
        super().__init__()

        class NormConvTranspose1d(tnn.Module):
            def __init__(self):
                super().__init__()
                self.convtr = weight_norm(
                    tnn.ConvTranspose1d(in_ch, out_ch, k, stride))

            def forward(self, x):
                return self.convtr(x)

        self.convtr = NormConvTranspose1d()
        self.k, self.stride = k, stride
        self.causal, self.trim_right_ratio = causal, trim_right_ratio

    def forward(self, x):
        pt = self.k - self.stride
        y = self.convtr(x)
        if self.causal:
            pr = math.ceil(pt * self.trim_right_ratio)
        else:
            pr = pt // 2
        pl = pt - pr
        end = y.shape[-1] - pr
        return y[..., pl:end]


class TResnetBlock(tnn.Module):
    def __init__(self, dim, dilation, compress=2, true_skip=False):
        super().__init__()
        hidden = dim // compress
        self.block = tnn.Sequential(
            tnn.ELU(), SConv1d(dim, hidden, 3, dilation=dilation),
            tnn.ELU(), SConv1d(hidden, dim, 1),
        )
        self.shortcut = tnn.Identity() if true_skip else SConv1d(dim, dim, 1)

    def forward(self, x):
        return self.shortcut(x) + self.block(x)


class TSLSTM(tnn.Module):
    def __init__(self, dim, num_layers=2):
        super().__init__()
        self.lstm = tnn.LSTM(dim, dim, num_layers)

    def forward(self, x):
        x = x.permute(2, 0, 1)
        y, _ = self.lstm(x)
        y = y + x
        return y.permute(1, 2, 0)


def _torch_seanet_encoder(channels, dimension, n_filters, ratios,
                          n_res=1, lstm=2, true_skip=False):
    model = [SConv1d(channels, n_filters, 7)]
    mult = 1
    for ratio in ratios:
        for j in range(n_res):
            model += [TResnetBlock(mult * n_filters, dilation=2 ** j,
                                   true_skip=true_skip)]
        model += [tnn.ELU(),
                  SConv1d(mult * n_filters, mult * n_filters * 2,
                          ratio * 2, stride=ratio)]
        mult *= 2
    if lstm:
        model += [TSLSTM(mult * n_filters, lstm)]
    model += [tnn.ELU(), SConv1d(mult * n_filters, dimension, 7)]

    class Enc(tnn.Module):
        def __init__(self):
            super().__init__()
            self.model = tnn.Sequential(*model)

        def forward(self, x):
            return self.model(x)

    return Enc()


def _torch_seanet_decoder(channels, dimension, n_filters, ratios,
                          n_res=1, lstm=2, true_skip=False):
    mult = 2 ** len(ratios)
    model = [SConv1d(dimension, mult * n_filters, 7)]
    if lstm:
        model += [TSLSTM(mult * n_filters, lstm)]
    for ratio in ratios:
        model += [tnn.ELU(),
                  SConvTranspose1d(mult * n_filters, mult * n_filters // 2,
                                   ratio * 2, stride=ratio)]
        for j in range(n_res):
            model += [TResnetBlock(mult * n_filters // 2, dilation=2 ** j,
                                   true_skip=true_skip)]
        mult //= 2
    model += [tnn.ELU(), SConv1d(n_filters, channels, 7)]

    class Dec(tnn.Module):
        def __init__(self):
            super().__init__()
            self.model = tnn.Sequential(*model)

        def forward(self, x):
            return self.model(x)

    return Dec()


def _sd(mod, prefix):
    return {f"{prefix}{k}": v.detach().numpy()
            for k, v in mod.state_dict().items()}


def test_torch_lstm_import_parity():
    torch.manual_seed(0)
    tl = TSLSTM(6, num_layers=2).eval()
    x = torch.randn(2, 6, 20)
    with torch.no_grad():
        ref = tl(x).numpy()
    params = import_torch_lstm(_sd(tl, ""), "lstm", 2)
    m = SEANetLSTM(dim=6, num_layers=2)
    out = m.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                  jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref,
                               rtol=1e-4, atol=1e-5)


def test_seanet_encoder_import_parity():
    torch.manual_seed(1)
    # odd ratio (5) exercises the asymmetric reflect pad; [5, 2] mimics the
    # musicgen-style mixed strides
    tenc = _torch_seanet_encoder(1, 8, 4, ratios=[5, 2]).eval()
    x = torch.randn(2, 1, 200)
    with torch.no_grad():
        ref = tenc(x).numpy()
    params = import_seanet_encoder(_sd(tenc, "encoder."), "encoder.",
                                   n_ratios=2, n_residual_layers=1, lstm=2)
    m = SEANetEncoder(channels=1, dimension=8, n_filters=4, ratios=(5, 2))
    out = m.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                  jnp.asarray(x.numpy().transpose(0, 2, 1)))
    out = np.asarray(out).transpose(0, 2, 1)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_seanet_decoder_import_parity():
    torch.manual_seed(2)
    tdec = _torch_seanet_decoder(1, 8, 4, ratios=[5, 2]).eval()
    z = torch.randn(2, 8, 20) * 0.5
    with torch.no_grad():
        ref = tdec(z).numpy()
    params = import_seanet_decoder(_sd(tdec, "decoder."), "decoder.",
                                   n_ratios=2, n_residual_layers=1, lstm=2)
    m = SEANetDecoder(channels=1, dimension=8, n_filters=4, ratios=(5, 2))
    out = m.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                  jnp.asarray(z.numpy().transpose(0, 2, 1)))
    out = np.asarray(out).transpose(0, 2, 1)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_seanet_autoencoder_dispatch():
    """import_autoencoder_state_dict routes SEANet towers, via the factory."""
    from stable_audio_tools_tpu.io.checkpoints import (
        import_autoencoder_state_dict,
    )
    from stable_audio_tools_tpu.models.factory import create_model_from_config

    config = {
        "model_type": "autoencoder",
        "sample_size": 200,
        "sample_rate": 16000,
        "audio_channels": 1,
        "model": {
            "encoder": {"type": "seanet", "config": {
                "channels": 1, "dimension": 8, "n_filters": 4,
                "ratios": [5, 2], "n_residual_layers": 1, "lstm": 2,
                "norm": "weight_norm"}},
            "decoder": {"type": "seanet", "config": {
                "channels": 1, "dimension": 8, "n_filters": 4,
                "ratios": [5, 2], "n_residual_layers": 1, "lstm": 2,
                "norm": "weight_norm"}},
            "latent_dim": 8,
            "downsampling_ratio": 10,
            "io_channels": 1,
        },
    }
    model = create_model_from_config(config)
    torch.manual_seed(3)
    tenc = _torch_seanet_encoder(1, 8, 4, ratios=[5, 2]).eval()
    tdec = _torch_seanet_decoder(1, 8, 4, ratios=[5, 2]).eval()
    sd = {**_sd(tenc, "encoder."), **_sd(tdec, "decoder.")}
    variables = import_autoencoder_state_dict(model, sd)

    x = np.random.RandomState(0).randn(1, 1, 200).astype(np.float32)
    with torch.no_grad():
        ref = tdec(tenc(torch.from_numpy(x))).numpy()
    z = model.apply(variables, jnp.asarray(x), method=model.encode)
    y = model.apply(variables, z, method=model.decode)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-3, atol=1e-4)
