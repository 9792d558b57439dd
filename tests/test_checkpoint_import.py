"""Golden tests: torch weight-norm checkpoints import bit-comparably.

Builds small torch modules matching the reference's layer layouts, exports
their state dicts, imports through the torch→JAX conversion layer, and
asserts element-level output parity.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
from torch.nn.utils import weight_norm

from stable_audio_tools_tpu.io.checkpoints import (
    convert_wn_conv1d,
    convert_wn_conv_transpose1d,
    copy_state_dict,
    flatten_params,
    import_autoencoder_state_dict,
    load_checkpoint,
    save_checkpoint,
    torch_linear_weight,
    unflatten_params,
)
from stable_audio_tools_tpu.models.factory import create_model_from_config
from stable_audio_tools_tpu.ops.conv import WNConv1d, WNConvTranspose1d


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def test_wn_conv1d_import_parity():
    torch.manual_seed(0)
    tconv = weight_norm(nn.Conv1d(4, 8, 7, padding=3))
    x = torch.randn(2, 4, 32)
    ref = tconv(x).detach().numpy().transpose(0, 2, 1)

    sd = {f"conv.{k}": v for k, v in _sd(tconv).items()}
    params = convert_wn_conv1d(sd, "conv")
    m = WNConv1d(features=8, kernel_size=7, padding=3)
    out = m.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_wn_conv_transpose1d_import_parity():
    torch.manual_seed(1)
    tconv = weight_norm(nn.ConvTranspose1d(6, 3, 8, stride=4, padding=2))
    x = torch.randn(1, 6, 16)
    ref = tconv(x).detach().numpy().transpose(0, 2, 1)

    sd = {f"up.{k}": v for k, v in _sd(tconv).items()}
    params = convert_wn_conv_transpose1d(sd, "up")
    m = WNConvTranspose1d(features=3, kernel_size=8, stride=4, padding=2)
    out = m.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def _torch_oobleck_encoder(in_ch=2, channels=8, c_mults=(1, 2), strides=(2, 4),
                           latent_dim=8):
    """Minimal torch replica of the reference OobleckEncoder layout
    (test fixture for importer validation; snake replaced by exact formula)."""

    class SnakeBeta(nn.Module):
        def __init__(self, ch):
            super().__init__()
            self.alpha = nn.Parameter(torch.zeros(ch))
            self.beta = nn.Parameter(torch.zeros(ch))

        def forward(self, x):
            a = torch.exp(self.alpha)[None, :, None]
            b = torch.exp(self.beta)[None, :, None]
            return x + (1.0 / (b + 1e-9)) * torch.sin(x * a) ** 2

    def WN(*args, **kw):
        return weight_norm(nn.Conv1d(*args, **kw))

    class ResUnit(nn.Module):
        def __init__(self, ch, dil):
            super().__init__()
            pad = (dil * 6) // 2
            self.layers = nn.Sequential(
                SnakeBeta(ch), WN(ch, ch, 7, dilation=dil, padding=pad),
                SnakeBeta(ch), WN(ch, ch, 1),
            )

        def forward(self, x):
            return x + self.layers(x)

    class EncBlock(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.layers = nn.Sequential(
                ResUnit(cin, 1), ResUnit(cin, 3), ResUnit(cin, 9),
                SnakeBeta(cin),
                WN(cin, cout, 2 * stride, stride=stride,
                   padding=math.ceil(stride / 2)),
            )

        def forward(self, x):
            return self.layers(x)

    cm = (1,) + tuple(c_mults)
    layers = [WN(in_ch, cm[0] * channels, 7, padding=3)]
    for i in range(len(cm) - 1):
        layers.append(EncBlock(cm[i] * channels, cm[i + 1] * channels, strides[i]))
    layers += [SnakeBeta(cm[-1] * channels),
               WN(cm[-1] * channels, latent_dim, 3, padding=1)]

    class Enc(nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = nn.Sequential(*layers)

        def forward(self, x):
            return self.layers(x)

    return Enc()


def test_oobleck_encoder_import_parity():
    torch.manual_seed(2)
    tenc = _torch_oobleck_encoder()
    x = torch.randn(1, 2, 64) * 0.3
    ref = tenc(x).detach().numpy()

    sd = {f"encoder.{k}": v for k, v in _sd(tenc).items()}

    from stable_audio_tools_tpu.io.checkpoints import import_oobleck_encoder
    from stable_audio_tools_tpu.models.autoencoders import OobleckEncoder

    params = import_oobleck_encoder(sd, "encoder.", n_blocks=2, use_snake=True)
    m = OobleckEncoder(in_channels=2, channels=8, latent_dim=8,
                       c_mults=(1, 2), strides=(2, 4), use_snake=True)
    out = m.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x.numpy().transpose(0, 2, 1)),
    )
    out = np.asarray(out).transpose(0, 2, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_native_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones(4)}}
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, tree, metadata={"step": 3})
    restored = load_checkpoint(path, tree)
    np.testing.assert_allclose(np.asarray(restored["a"]), np.asarray(tree["a"]))


def test_copy_state_dict_partial():
    params = {"w": jnp.zeros((2, 3)), "inner": {"b": jnp.zeros(4)}}
    updates = {"w": np.ones((2, 3), np.float32), "inner.b": np.ones(9, np.float32)}
    new, loaded, skipped = copy_state_dict(params, updates)
    assert loaded == 1
    assert "inner.b" in skipped
    np.testing.assert_allclose(np.asarray(new["w"]), 1.0)


def test_flatten_unflatten_roundtrip():
    tree = {"a": 1, "b": {"c": 2, "d": {"e": 3}}}
    assert unflatten_params(flatten_params(tree)) == tree


def _torch_oobleck_decoder(out_ch=2, channels=8, c_mults=(1, 2), strides=(2, 4),
                           latent_dim=4):
    """Minimal torch replica of the reference OobleckDecoder layout."""
    from torch.nn.utils import weight_norm as WNorm

    class SnakeBeta(nn.Module):
        def __init__(self, ch):
            super().__init__()
            self.alpha = nn.Parameter(torch.zeros(ch))
            self.beta = nn.Parameter(torch.zeros(ch))

        def forward(self, x):
            a = torch.exp(self.alpha)[None, :, None]
            b = torch.exp(self.beta)[None, :, None]
            return x + (1.0 / (b + 1e-9)) * torch.sin(x * a) ** 2

    def WN(*args, **kw):
        return WNorm(nn.Conv1d(*args, **kw))

    def WNT(*args, **kw):
        return WNorm(nn.ConvTranspose1d(*args, **kw))

    class ResUnit(nn.Module):
        def __init__(self, ch, dil):
            super().__init__()
            pad = (dil * 6) // 2
            self.layers = nn.Sequential(
                SnakeBeta(ch), WN(ch, ch, 7, dilation=dil, padding=pad),
                SnakeBeta(ch), WN(ch, ch, 1),
            )

        def forward(self, x):
            return x + self.layers(x)

    class DecBlock(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.layers = nn.Sequential(
                SnakeBeta(cin),
                WNT(cin, cout, 2 * stride, stride=stride,
                    padding=math.ceil(stride / 2)),
                ResUnit(cout, 1), ResUnit(cout, 3), ResUnit(cout, 9),
            )

        def forward(self, x):
            return self.layers(x)

    cm = (1,) + tuple(c_mults)
    depth = len(cm)
    layers = [WN(latent_dim, cm[-1] * channels, 7, padding=3)]
    for i in range(depth - 1, 0, -1):
        layers.append(DecBlock(cm[i] * channels, cm[i - 1] * channels,
                               strides[i - 1]))
    layers += [SnakeBeta(cm[0] * channels),
               WN(cm[0] * channels, out_ch, 7, padding=3, bias=False)]

    class Dec(nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = nn.Sequential(*layers)

        def forward(self, x):
            return torch.tanh(self.layers(x))

    return Dec()


def test_oobleck_decoder_import_parity():
    torch.manual_seed(5)
    tdec = _torch_oobleck_decoder()
    z = torch.randn(1, 4, 16) * 0.3
    ref = tdec(z).detach().numpy()

    sd = {f"decoder.{k}": v for k, v in _sd(tdec).items()}

    from stable_audio_tools_tpu.io.checkpoints import import_oobleck_decoder
    from stable_audio_tools_tpu.models.autoencoders import OobleckDecoder

    params = import_oobleck_decoder(sd, "decoder.", n_blocks=2, use_snake=True)
    m = OobleckDecoder(out_channels=2, channels=8, latent_dim=4,
                       c_mults=(1, 2), strides=(2, 4), use_snake=True,
                       final_tanh=True)
    out = m.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(z.numpy().transpose(0, 2, 1)),
    )
    out = np.asarray(out).transpose(0, 2, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_import_dac_autoencoder_golden():
    """DAC (descript-audio-codec) layout import matches torch forward."""
    import math as _math

    import torch.nn as tnn
    from torch.nn.utils import weight_norm as _wn

    torch.manual_seed(0)

    def WNC(i, o, **kw):
        return _wn(tnn.Conv1d(i, o, **kw))

    class Snake1d(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.alpha = tnn.Parameter(torch.rand(1, c, 1) + 0.5)

        def forward(self, x):
            return x + (self.alpha + 1e-9).reciprocal() * torch.sin(
                self.alpha * x).pow(2)

    class RU(tnn.Module):
        def __init__(self, dim, dil):
            super().__init__()
            pad = ((7 - 1) * dil) // 2
            self.block = tnn.Sequential(
                Snake1d(dim),
                WNC(dim, dim, kernel_size=7, dilation=dil, padding=pad),
                Snake1d(dim),
                WNC(dim, dim, kernel_size=1),
            )

        def forward(self, x):
            return x + self.block(x)

    class EB(tnn.Module):
        def __init__(self, dim, stride):
            super().__init__()
            self.block = tnn.Sequential(
                RU(dim // 2, 1), RU(dim // 2, 3), RU(dim // 2, 9),
                Snake1d(dim // 2),
                WNC(dim // 2, dim, kernel_size=2 * stride, stride=stride,
                    padding=_math.ceil(stride / 2)),
            )

        def forward(self, x):
            return self.block(x)

    class TEnc(tnn.Module):
        def __init__(self, d_model, strides, in_ch):
            super().__init__()
            layers = [WNC(in_ch, d_model, kernel_size=7, padding=3)]
            d = d_model
            for st in strides:
                d *= 2
                layers.append(EB(d, st))
            layers += [Snake1d(d), WNC(d, d, kernel_size=3, padding=1)]
            self.block = tnn.Sequential(*layers)

        def forward(self, x):
            return self.block(x)

    class DB(tnn.Module):
        def __init__(self, in_dim, out_dim, stride):
            super().__init__()
            self.block = tnn.Sequential(
                Snake1d(in_dim),
                _wn(tnn.ConvTranspose1d(in_dim, out_dim,
                                        kernel_size=2 * stride, stride=stride,
                                        padding=_math.ceil(stride / 2))),
                RU(out_dim, 1), RU(out_dim, 3), RU(out_dim, 9),
            )

        def forward(self, x):
            return self.block(x)

    class TDec(tnn.Module):
        def __init__(self, input_channel, channels, rates, d_out):
            super().__init__()
            layers = [WNC(input_channel, channels, kernel_size=7, padding=3)]
            ch = channels
            for r in rates:
                layers.append(DB(ch, ch // 2, r))
                ch //= 2
            layers += [Snake1d(ch), WNC(ch, d_out, kernel_size=7, padding=3),
                       tnn.Tanh()]
            self.model = tnn.Sequential(*layers)

        def forward(self, x):
            return self.model(x)

    d_model, strides, in_ch, latent = 8, (2, 4), 2, 6
    enc_t = TEnc(d_model, strides, in_ch).eval()
    proj_t = tnn.Conv1d(d_model * 4, latent, kernel_size=1)
    dec_t = TDec(latent // 2, 16, (4, 2), in_ch).eval()

    sd = {f"encoder.encoder.{k}": v.detach().numpy()
          for k, v in enc_t.state_dict().items()}
    sd.update({f"encoder.proj_out.{k}": v.detach().numpy()
               for k, v in proj_t.state_dict().items()})
    sd.update({f"decoder.decoder.{k}": v.detach().numpy()
               for k, v in dec_t.state_dict().items()})

    from stable_audio_tools_tpu.io.checkpoints import import_autoencoder_state_dict
    from stable_audio_tools_tpu.models.dac import DACDecoder, DACEncoder

    enc = DACEncoder(d_model=d_model, strides=strides, in_channels=in_ch,
                     latent_dim=latent)
    dec = DACDecoder(input_channel=latent // 2, channels=16, rates=(4, 2),
                     d_out=in_ch)

    class _M:
        encoder = enc
        decoder = dec

    variables = import_autoencoder_state_dict(_M(), sd)

    x = np.random.RandomState(3).randn(1, in_ch, 256).astype(np.float32)
    with torch.no_grad():
        z_t = proj_t(enc_t(torch.from_numpy(x))).numpy()
    z_j = np.asarray(enc.apply(
        {"params": variables["params"]["encoder"]},
        jnp.asarray(x.transpose(0, 2, 1)))).transpose(0, 2, 1)
    np.testing.assert_allclose(z_j, z_t, rtol=1e-4, atol=1e-5)

    lat = np.random.RandomState(4).randn(1, latent // 2, 16).astype(np.float32)
    with torch.no_grad():
        y_t = dec_t(torch.from_numpy(lat)).numpy()
    y_j = np.asarray(dec.apply(
        {"params": variables["params"]["decoder"]},
        jnp.asarray(lat.transpose(0, 2, 1)))).transpose(0, 2, 1)
    np.testing.assert_allclose(y_j, y_t, rtol=1e-4, atol=1e-5)

    # raw descript dac.DAC layout (tower directly under encoder./decoder.,
    # no wrapper nesting) must import identically via prefix detection
    sd_raw = {}
    for k, v in sd.items():
        if k.startswith("encoder.encoder."):
            sd_raw["encoder." + k[len("encoder.encoder."):]] = v
        elif k.startswith("decoder.decoder."):
            sd_raw["decoder." + k[len("decoder.decoder."):]] = v
        else:
            sd_raw[k] = v
    v_raw = import_autoencoder_state_dict(_M(), sd_raw)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(v_raw),
                    jax.tree_util.tree_leaves(variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
