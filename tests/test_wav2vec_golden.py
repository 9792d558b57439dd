"""Golden tests for the wav2vec2/HuBERT tower port (HubertLoss backend).

Torch replica follows torchaudio.models.wav2vec2 component naming and math
(feature_extractor conv stack, feature_projection, weight-normed conv pos
embedding, pre-/post-LN encoder layers, extract_features per-layer outputs).
Reference consumer: stable_audio_tools/training/losses/semantic.py:15-72.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch.nn.utils import weight_norm  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stable_audio_tools_tpu.models.wav2vec import (  # noqa: E402

    CONV_LAYERS,
    Wav2Vec2Model,
    import_wav2vec2,
)

pytestmark = pytest.mark.slow  # heavyweight golden/integration tier


class TConvLayerBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, k, s, norm, bias):
        super().__init__()
        self.conv = tnn.Conv1d(in_ch, out_ch, k, s, bias=bias)
        self.norm_kind = norm
        if norm == "group":
            self.layer_norm = tnn.GroupNorm(out_ch, out_ch)
        elif norm == "layer":
            self.layer_norm = tnn.LayerNorm(out_ch)

    def forward(self, x):
        x = self.conv(x)
        if self.norm_kind == "group":
            x = self.layer_norm(x)
        elif self.norm_kind == "layer":
            x = self.layer_norm(x.transpose(-2, -1)).transpose(-2, -1)
        return F.gelu(x)


class TWav2Vec2(tnn.Module):
    def __init__(self, mode="group_norm", embed_dim=16, num_layers=2,
                 num_heads=2, ff_hidden=32, layer_norm_first=False):
        super().__init__()
        self.layer_norm_first = layer_norm_first

        class FE(tnn.Module):
            def __init__(self):
                super().__init__()
                layers, in_ch = [], 1
                for i, (ch, k, s) in enumerate(CONV_LAYERS):
                    if mode == "group_norm":
                        layers.append(TConvLayerBlock(
                            in_ch, ch, k, s, "group" if i == 0 else "none",
                            bias=False))
                    else:
                        layers.append(TConvLayerBlock(in_ch, ch, k, s,
                                                      "layer", bias=True))
                    in_ch = ch
                self.conv_layers = tnn.ModuleList(layers)

            def forward(self, x):
                x = x.unsqueeze(1)
                for l in self.conv_layers:
                    x = l(x)
                return x.transpose(1, 2)

        class FP(tnn.Module):
            def __init__(self):
                super().__init__()
                self.layer_norm = tnn.LayerNorm(512)
                self.projection = tnn.Linear(512, embed_dim)

            def forward(self, x):
                return self.projection(self.layer_norm(x))

        class PosConv(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv = weight_norm(
                    tnn.Conv1d(embed_dim, embed_dim, 128, padding=64,
                               groups=16), dim=2)

            def forward(self, x):
                x = self.conv(x.transpose(1, 2))
                x = x[:, :, :-1]
                return F.gelu(x).transpose(1, 2)

        class Layer(tnn.Module):
            def __init__(self):
                super().__init__()

                class Attn(tnn.Module):
                    def __init__(self):
                        super().__init__()
                        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
                            setattr(self, n, tnn.Linear(embed_dim, embed_dim))

                    def forward(self, x):
                        B, T, C = x.shape
                        hd = C // num_heads

                        def h(t):
                            return t.view(B, T, num_heads, hd).transpose(1, 2)

                        a = ((h(self.q_proj(x)) * hd ** -0.5)
                             @ h(self.k_proj(x)).transpose(-2, -1))
                        a = a.softmax(-1) @ h(self.v_proj(x))
                        a = a.transpose(1, 2).reshape(B, T, C)
                        return self.out_proj(a)

                class FFw(tnn.Module):
                    def __init__(self):
                        super().__init__()
                        self.intermediate_dense = tnn.Linear(embed_dim, ff_hidden)
                        self.output_dense = tnn.Linear(ff_hidden, embed_dim)

                    def forward(self, x):
                        return self.output_dense(
                            F.gelu(self.intermediate_dense(x)))

                self.attention = Attn()
                self.layer_norm = tnn.LayerNorm(embed_dim)
                self.feed_forward = FFw()
                self.final_layer_norm = tnn.LayerNorm(embed_dim)

            def forward(self, x, lnf):
                res = x
                if lnf:
                    x = self.layer_norm(x)
                x = res + self.attention(x)
                if lnf:
                    x = x + self.feed_forward(self.final_layer_norm(x))
                else:
                    x = self.layer_norm(x)
                    x = x + self.feed_forward(x)
                    x = self.final_layer_norm(x)
                return x

        class Transformer(tnn.Module):
            def __init__(self):
                super().__init__()
                self.pos_conv_embed = PosConv()
                self.layer_norm = tnn.LayerNorm(embed_dim)
                self.layers = tnn.ModuleList(
                    [Layer() for _ in range(num_layers)])

        class Encoder(tnn.Module):
            def __init__(self):
                super().__init__()
                self.feature_projection = FP()
                self.transformer = Transformer()

        self.feature_extractor = FE()
        self.encoder = Encoder()

    def extract_features(self, wave):
        x = self.feature_extractor(wave)
        x = self.encoder.feature_projection(x)
        tr = self.encoder.transformer
        x = x + tr.pos_conv_embed(x)
        if self.layer_norm_first:
            x = tr.layer_norm(x)
        outs = []
        for layer in tr.layers:
            x = layer(x, self.layer_norm_first)
            outs.append(x)
        return outs


@pytest.mark.parametrize("mode,lnf", [("group_norm", False),
                                      ("layer_norm", True)])
def test_wav2vec2_golden(mode, lnf):
    torch.manual_seed(0)
    tm = TWav2Vec2(mode=mode, layer_norm_first=lnf).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    jm = Wav2Vec2Model(extractor_mode=mode, embed_dim=16, num_layers=2,
                       num_heads=2, ff_hidden=32, layer_norm_first=lnf)
    params = import_wav2vec2(sd, "", num_layers=2, extractor_mode=mode)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}

    wave = np.random.RandomState(1).randn(2, 3200).astype(np.float32) * 0.2
    with torch.no_grad():
        refs = tm.extract_features(torch.from_numpy(wave))
    outs = jm.apply(variables, jnp.asarray(wave))
    assert len(outs) == len(refs)
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(o), r.numpy(),
                                   rtol=2e-3, atol=2e-4)


def test_hubert_loss_end_to_end(tmp_path):
    """HubertLoss loads a torchaudio-format ckpt and produces the reference
    per-layer normalized L1."""
    torch.manual_seed(2)
    tm = TWav2Vec2(mode="group_norm", layer_norm_first=False).eval()
    path = str(tmp_path / "hubert.pth")
    torch.save(tm.state_dict(), path)

    from stable_audio_tools_tpu.models import wav2vec as w2v
    from stable_audio_tools_tpu.training.losses.semantic import HubertLoss

    w2v.PRESETS["TINY_TEST"] = dict(
        extractor_mode="group_norm", embed_dim=16, num_layers=2, num_heads=2,
        ff_hidden=32, layer_norm_first=False, normalize_waveform=False)
    loss = HubertLoss(weight=2.0, model_name="TINY_TEST", ckpt_path=path,
                      feature_ids=[1])
    rng = np.random.RandomState(3)
    x = rng.randn(1, 2, 3200).astype(np.float32) * 0.1
    y = x + rng.randn(*x.shape).astype(np.float32) * 0.01
    val = float(loss(jnp.asarray(x), jnp.asarray(y)))

    with torch.no_grad():
        fx = tm.extract_features(torch.from_numpy(x.reshape(-1, 3200)))[1]
        fy = tm.extract_features(torch.from_numpy(y.reshape(-1, 3200)))[1]
        ref = 2.0 * float(F.l1_loss(fx, fy) / (fy.std() + 1e-5))
    np.testing.assert_allclose(val, ref, rtol=1e-2)


def test_hubert_loss_requires_tower():
    from stable_audio_tools_tpu.training.losses.semantic import HubertLoss

    with pytest.raises(RuntimeError, match="allow_missing"):
        HubertLoss()
    loss = HubertLoss(allow_missing=True)
    assert float(loss(jnp.zeros((1, 1, 100)), jnp.zeros((1, 1, 100)))) == 0.0
