"""wav2vec2/HuBERT speech tower (torchaudio layout), flax inference port.

Rebuild target: torchaudio.pipelines HUBERT_BASE/LARGE and
WAV2VEC2_LARGE_LV60K, the feature towers the reference HubertLoss uses
(reference stable_audio_tools/training/losses/semantic.py:15-72). WavLM's
gated relative-position attention is not ported; HUBERT_*/WAV2VEC2_* share
this architecture:

  waveform → 7-layer conv feature extractor (512 ch, strides 5/2/2/2/2/2/2,
  kernels 10/3/3/3/3/2/2; 'group_norm': GN on layer 0 only, no conv bias;
  'layer_norm': LN per layer, conv bias) → feature projection (LN + Linear)
  → conv positional embedding (k=128, groups=16, weight-norm folded, GELU,
  trim 1) → N transformer layers (pre-LN for *_LARGE, post-LN for *_BASE),
  returning every layer's output (torchaudio extract_features).

Frozen inference only (the reference freezes it too). Import via
import_wav2vec2 from a torchaudio-format state dict.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


CONV_LAYERS = [(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2


class _ConvLayerBlock(nn.Module):
    out_ch: int
    kernel: int
    stride: int
    norm: str  # 'group' | 'layer' | 'none'
    bias: bool

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, (self.kernel,), strides=(self.stride,),
                    padding="VALID", use_bias=self.bias, name="conv",
                    param_dtype=jnp.float32)(x)
        if self.norm == "group":
            x = nn.GroupNorm(num_groups=self.out_ch, epsilon=1e-5, name="norm")(x)
        elif self.norm == "layer":
            x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return jax.nn.gelu(x, approximate=False)


class FeatureExtractor(nn.Module):
    mode: str = "group_norm"  # 'group_norm' (base) | 'layer_norm' (large)

    @nn.compact
    def __call__(self, x):
        """x: [B, T] → [B, frames, 512]."""
        x = x[:, :, None]
        for i, (ch, k, s) in enumerate(CONV_LAYERS):
            if self.mode == "group_norm":
                norm = "group" if i == 0 else "none"
                bias = False
            else:
                norm, bias = "layer", True
            x = _ConvLayerBlock(ch, k, s, norm, bias,
                                name=f"conv_layers_{i}")(x)
        return x


class FeatureProjection(nn.Module):
    embed_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)
        return nn.Dense(self.embed_dim, name="projection",
                        param_dtype=jnp.float32)(x)


class ConvPosEmbed(nn.Module):
    embed_dim: int
    kernel: int = 128
    groups: int = 16

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        h = nn.Conv(self.embed_dim, (self.kernel,), padding=[(pad, pad)],
                    feature_group_count=self.groups, name="conv",
                    param_dtype=jnp.float32)(x)
        if self.kernel % 2 == 0:
            h = h[:, :-1]
        return jax.nn.gelu(h, approximate=False)


class _SelfAttention(nn.Module):
    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        hd = self.embed_dim // self.num_heads
        q = nn.Dense(self.embed_dim, name="q_proj", param_dtype=jnp.float32)(x)
        k = nn.Dense(self.embed_dim, name="k_proj", param_dtype=jnp.float32)(x)
        v = nn.Dense(self.embed_dim, name="v_proj", param_dtype=jnp.float32)(x)

        def heads(t):
            return t.reshape(B, T, self.num_heads, hd).transpose(0, 2, 1, 3)

        attn = jax.nn.softmax(
            (heads(q) * hd ** -0.5) @ jnp.swapaxes(heads(k), -2, -1), axis=-1
        )
        out = (attn @ heads(v)).transpose(0, 2, 1, 3).reshape(B, T, C)
        return nn.Dense(self.embed_dim, name="out_proj",
                        param_dtype=jnp.float32)(out)


class _FeedForward(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="intermediate_dense",
                     param_dtype=jnp.float32)(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.out, name="output_dense",
                        param_dtype=jnp.float32)(x)


class EncoderLayer(nn.Module):
    embed_dim: int
    num_heads: int
    ff_hidden: int
    layer_norm_first: bool

    @nn.compact
    def __call__(self, x):
        residual = x
        if self.layer_norm_first:
            x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)
        x = _SelfAttention(self.embed_dim, self.num_heads, name="attention")(x)
        x = residual + x
        if self.layer_norm_first:
            x = x + _FeedForward(self.ff_hidden, self.embed_dim,
                                 name="feed_forward")(
                nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x))
        else:
            x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)
            x = x + _FeedForward(self.ff_hidden, self.embed_dim,
                                 name="feed_forward")(x)
            x = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)
        return x


class Wav2Vec2Model(nn.Module):
    """Feature tower; __call__ returns the list of per-layer outputs
    (torchaudio extract_features semantics)."""

    extractor_mode: str = "group_norm"
    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ff_hidden: int = 3072
    layer_norm_first: bool = False
    normalize_waveform: bool = False

    def setup(self):
        self.feature_extractor = FeatureExtractor(self.extractor_mode,
                                                  name="feature_extractor")
        self.feature_projection = FeatureProjection(self.embed_dim,
                                                    name="feature_projection")
        self.pos_conv_embed = ConvPosEmbed(self.embed_dim,
                                           name="pos_conv_embed")
        if self.layer_norm_first:
            self.encoder_layer_norm = nn.LayerNorm(epsilon=1e-5, name="encoder_layer_norm")
        self.encoder_layers = [
            EncoderLayer(self.embed_dim, self.num_heads, self.ff_hidden,
                         self.layer_norm_first, name=f"layers_{i}")
            for i in range(self.num_layers)
        ]

    def __call__(self, wave, num_layers: tp.Optional[int] = None):
        """wave: [B, T] → list of [B, frames, embed_dim], one per layer.

        torchaudio extract_features returns the raw per-layer outputs (the
        post-stack encoder LayerNorm of post-LN models is NOT applied)."""
        if self.normalize_waveform:
            mu = jnp.mean(wave, axis=-1, keepdims=True)
            var = jnp.var(wave, axis=-1, keepdims=True)
            wave = (wave - mu) / jnp.sqrt(var + 1e-5)
        feats = self.feature_extractor(wave)
        x = self.feature_projection(feats)
        x = x + self.pos_conv_embed(x)
        if self.layer_norm_first:
            x = self.encoder_layer_norm(x)
        outs = []
        n = num_layers or self.num_layers
        for layer in self.encoder_layers[:n]:
            x = layer(x)
            outs.append(x)
        return outs

    def conv_features(self, wave):
        """Conv-extractor features only (reference feature_ids == [-1])."""
        if self.normalize_waveform:
            # reference applies per-tensor layer_norm over the whole batch
            mu, var = jnp.mean(wave), jnp.var(wave)
            wave = (wave - mu) / jnp.sqrt(var + 1e-5)
        return self.feature_extractor(wave)


PRESETS = {
    "HUBERT_BASE": dict(extractor_mode="group_norm", embed_dim=768,
                        num_layers=12, num_heads=12, ff_hidden=3072,
                        layer_norm_first=False, normalize_waveform=False),
    "HUBERT_LARGE": dict(extractor_mode="layer_norm", embed_dim=1024,
                         num_layers=24, num_heads=16, ff_hidden=4096,
                         layer_norm_first=True, normalize_waveform=True),
    "WAV2VEC2_LARGE_LV60K": dict(extractor_mode="layer_norm", embed_dim=1024,
                                 num_layers=24, num_heads=16, ff_hidden=4096,
                                 layer_norm_first=True,
                                 normalize_waveform=True),
}


# ---------------------------------------------------------------------------
# torchaudio state-dict import
# ---------------------------------------------------------------------------


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"].astype(np.float32),
            "bias": sd[f"{name}.bias"].astype(np.float32)}


def _dense(sd, name):
    out = {"kernel": sd[f"{name}.weight"].T.astype(np.float32)}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"].astype(np.float32)
    return out


def _conv1d(sd, name, bias=True):
    out = {"kernel": sd[f"{name}.weight"].transpose(2, 1, 0).astype(np.float32)}
    if bias and f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"].astype(np.float32)
    return out


def _fold_wn_pos_conv(sd, name):
    """fairseq pos_conv weight_norm(dim=2): g [1,1,k] normalizes over
    (out, in) per kernel position. Folded to a plain kernel."""
    if f"{name}.weight_g" in sd:
        g, v = sd[f"{name}.weight_g"], sd[f"{name}.weight_v"]
    elif f"{name}.parametrizations.weight.original0" in sd:
        g = sd[f"{name}.parametrizations.weight.original0"]
        v = sd[f"{name}.parametrizations.weight.original1"]
    else:
        w = sd[f"{name}.weight"]
        return {"kernel": w.transpose(2, 1, 0).astype(np.float32),
                "bias": sd[f"{name}.bias"].astype(np.float32)}
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = v * (g / norm)
    return {"kernel": w.transpose(2, 1, 0).astype(np.float32),
            "bias": sd[f"{name}.bias"].astype(np.float32)}


def import_wav2vec2(sd: tp.Dict[str, np.ndarray], prefix: str = "",
                    num_layers: int = 12,
                    extractor_mode: str = "group_norm") -> dict:
    """torchaudio wav2vec2/HuBERT state dict → our Wav2Vec2Model params.

    torchaudio names: feature_extractor.conv_layers.{i}.{conv,layer_norm},
    encoder.feature_projection.{layer_norm,projection},
    encoder.transformer.pos_conv_embed.conv,
    encoder.transformer.layers.{i}.{attention.*_proj, layer_norm,
    feed_forward.{intermediate,output}_dense, final_layer_norm},
    encoder.transformer.layer_norm.
    """
    p: dict = {"feature_extractor": {}, "feature_projection": {},
               "pos_conv_embed": {}}
    for i in range(len(CONV_LAYERS)):
        src = f"{prefix}feature_extractor.conv_layers.{i}"
        layer = {"conv": _conv1d(sd, f"{src}.conv")}
        if f"{src}.layer_norm.weight" in sd:
            layer["norm"] = _ln(sd, f"{src}.layer_norm")
        p["feature_extractor"][f"conv_layers_{i}"] = layer
    p["feature_projection"] = {
        "layer_norm": _ln(sd, f"{prefix}encoder.feature_projection.layer_norm"),
        "projection": _dense(sd, f"{prefix}encoder.feature_projection.projection"),
    }
    p["pos_conv_embed"]["conv"] = _fold_wn_pos_conv(
        sd, f"{prefix}encoder.transformer.pos_conv_embed.conv")
    if f"{prefix}encoder.transformer.layer_norm.weight" in sd:
        p["encoder_layer_norm"] = _ln(sd, f"{prefix}encoder.transformer.layer_norm")
    for i in range(num_layers):
        src = f"{prefix}encoder.transformer.layers.{i}"
        p[f"layers_{i}"] = {
            "attention": {n: _dense(sd, f"{src}.attention.{n}")
                          for n in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "layer_norm": _ln(sd, f"{src}.layer_norm"),
            "feed_forward": {
                "intermediate_dense": _dense(
                    sd, f"{src}.feed_forward.intermediate_dense"),
                "output_dense": _dense(sd, f"{src}.feed_forward.output_dense"),
            },
            "final_layer_norm": _ln(sd, f"{src}.final_layer_norm"),
        }
    return p


def load_wav2vec2_tower(ckpt_path: str, model_name: str = "HUBERT_BASE"):
    """Build the tower from a local torchaudio-format checkpoint. Returns
    (model, variables)."""
    from ..io.checkpoints import load_ckpt_state_dict

    preset = PRESETS[model_name]
    sd = load_ckpt_state_dict(ckpt_path)
    # torchaudio bundles save with a 'model.' or bare prefix
    prefix = ""
    if not any(k.startswith("feature_extractor.") for k in sd):
        for cand in ("model.", "wav2vec2."):
            if any(k.startswith(cand + "feature_extractor.") for k in sd):
                prefix = cand
                break
    model = Wav2Vec2Model(**preset)
    params = import_wav2vec2(sd, prefix, preset["num_layers"],
                             preset["extractor_mode"])
    return model, {"params": jax.tree_util.tree_map(jnp.asarray, params)}
