"""HTSAT audio tower (laion-clap's audio branch), JAX/flax inference port.

Rebuild target: laion_clap's HTSAT_Swin_Transformer as used by the reference
CLAPAudioConditioner (reference stable_audio_tools/models/conditioners.py:
222-286 via `laion_clap.CLAP_Module(..., amodel="HTSAT-base")`). CLAP's audio
embedding is the Swin trunk's final-norm token mean ("embedding" =
global-avg-pooled latent), so the SED heads (tscam_conv/head) are not needed
and are not ported.

Pipeline (HTSAT-base, 48 kHz):
  waveform → STFT(1024/480, hann, reflect-center) → power spectrum →
  slaney mel (64 bins, 50–14k) → 10·log10 → BatchNorm2d(64, eval stats) →
  reshape_wav2img (bicubic align-corners time interp to 1024 frames, fold
  freq_ratio=4 → 256×256 image) → PatchEmbed 4×4 → Swin stages
  [2,2,12,2] / heads [4,8,16,32], window 8, patch-merge between stages →
  LayerNorm → token mean → [B, 1024].

Inference-only (the conditioner tower is frozen in the reference too);
no drop-path/dropout. The enable_fusion PatchEmbed variant (mel_conv2d +
AFF) is ported structurally for weight-loading parity; the `longer=False`
path (all clips ≤ 10 s after repeat-padding, which is what
get_audio_embedding_from_data produces) is exact.
"""

from __future__ import annotations

import math
import typing as tp
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.stft import mel_filterbank, stft


# ---------------------------------------------------------------------------
# static helpers (numpy at trace time)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=16)
def _relative_position_index(window_size: int) -> np.ndarray:
    """Swin relative position index [ws*ws, ws*ws] (static buffer)."""
    ws = window_size
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # [N, N]


@lru_cache(maxsize=32)
def _shift_attn_mask(H: int, W: int, window: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows [nW, N, N] (0 / -100 like torch)."""
    img = np.zeros((H, W))
    cnt = 0
    for h in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for w in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[h, w] = cnt
            cnt += 1
    wins = img.reshape(H // window, window, W // window, window)
    wins = wins.transpose(0, 2, 1, 3).reshape(-1, window * window)
    mask = wins[:, None, :] - wins[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


@lru_cache(maxsize=16)
def _bicubic_weights(n_in: int, n_out: int) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Catmull-Rom (a=-0.75, torch 'bicubic') align_corners=True 1-D resize
    tables: indices [n_out, 4] and weights [n_out, 4]."""
    a = -0.75
    if n_out == 1:
        pos = np.zeros(1)
    else:
        pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    i0 = np.floor(pos).astype(np.int64)
    t = pos - i0

    def k(x):
        x = np.abs(x)
        return np.where(
            x <= 1, (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1,
            np.where(x < 2, a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a, 0.0),
        )

    idx = np.stack([i0 - 1, i0, i0 + 1, i0 + 2], axis=1)
    w = k(idx - pos[:, None])
    idx = np.clip(idx, 0, n_in - 1)
    return idx.astype(np.int32), w.astype(np.float32)


def bicubic_resize_1d(x, n_out: int, axis: int):
    """torch F.interpolate(mode='bicubic', align_corners=True) along one axis."""
    n_in = x.shape[axis]
    if n_in == n_out:
        return x
    idx, w = _bicubic_weights(n_in, n_out)
    gathered = jnp.take(x, jnp.asarray(idx.reshape(-1)), axis=axis)
    shp = list(x.shape)
    shp[axis: axis + 1] = [n_out, 4]
    gathered = gathered.reshape(shp)
    w_shape = [1] * gathered.ndim
    w_shape[axis], w_shape[axis + 1] = n_out, 4
    return jnp.sum(gathered * jnp.asarray(w).reshape(w_shape), axis=axis + 1)


# ---------------------------------------------------------------------------
# Swin components
# ---------------------------------------------------------------------------


class SwinMLP(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1", param_dtype=jnp.float32)(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.out, name="fc2", param_dtype=jnp.float32)(x)


class WindowAttention(nn.Module):
    dim: int
    window: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        """x: [B_, N, C] windows; mask: [nW, N, N] or None."""
        B_, N, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, name="qkv", param_dtype=jnp.float32)(x)
        qkv = qkv.reshape(B_, N, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * (head_dim ** -0.5)) @ jnp.swapaxes(k, -2, -1)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads),
            jnp.float32,
        )
        rel_idx = jnp.asarray(_relative_position_index(self.window).reshape(-1))
        bias = table[rel_idx].reshape(N, N, self.num_heads)
        attn = attn + jnp.transpose(bias, (2, 0, 1))[None].astype(attn.dtype)

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, self.num_heads, N, N)
            attn = attn + mask[None, :, None, :, :].astype(attn.dtype)
            attn = attn.reshape(B_, self.num_heads, N, N)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(self.dim, name="proj", param_dtype=jnp.float32)(out)


def _window_partition(x, window: int):
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, C)


def _window_reverse(wins, window: int, H: int, W: int):
    B = wins.shape[0] // (H * W // window // window)
    x = wins.reshape(B, H // window, W // window, window, window, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


class SwinBlock(nn.Module):
    dim: int
    input_resolution: tp.Tuple[int, int]
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        H, W = self.input_resolution
        window, shift = self.window, self.shift
        if min(H, W) <= window:
            window, shift = min(H, W), 0
        B, N, C = x.shape
        shortcut = x
        x = nn.LayerNorm(name="norm1")(x).reshape(B, H, W, C)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        wins = _window_partition(x, window)
        mask = None
        if shift > 0:
            mask = jnp.asarray(_shift_attn_mask(H, W, window, shift))
        wins = WindowAttention(self.dim, window, self.num_heads, name="attn")(
            wins, mask=mask
        )
        x = _window_reverse(wins, window, H, W)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + x.reshape(B, N, C)
        h = nn.LayerNorm(name="norm2")(x)
        x = x + SwinMLP(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(h)
        return x


class PatchMerging(nn.Module):
    dim: int
    input_resolution: tp.Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        H, W = self.input_resolution
        B, N, C = x.shape
        x = x.reshape(B, H, W, C)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        ).reshape(B, -1, 4 * C)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, name="reduction",
                        param_dtype=jnp.float32)(x)


class BasicLayer(nn.Module):
    dim: int
    input_resolution: tp.Tuple[int, int]
    depth: int
    num_heads: int
    window: int
    downsample: bool

    @nn.compact
    def __call__(self, x):
        for j in range(self.depth):
            x = SwinBlock(
                self.dim, self.input_resolution, self.num_heads, self.window,
                shift=0 if j % 2 == 0 else self.window // 2,
                name=f"blocks_{j}",
            )(x)
        if self.downsample:
            x = PatchMerging(self.dim, self.input_resolution, name="downsample")(x)
        return x


class AFF2d(nn.Module):
    """laion-clap feature_fusion.AFF (2D): attention feature fusion."""

    channels: int
    r: int = 4

    @nn.compact
    def __call__(self, x, residual):
        inter = max(self.channels // self.r, 1)

        def branch(h, name, pooled):
            h = nn.Conv(inter, (1, 1), name=f"{name}_conv1",
                        param_dtype=jnp.float32)(h)
            h = nn.BatchNorm(use_running_average=True, name=f"{name}_bn1")(h)
            h = jax.nn.relu(h)
            h = nn.Conv(self.channels, (1, 1), name=f"{name}_conv2",
                        param_dtype=jnp.float32)(h)
            return nn.BatchNorm(use_running_average=True, name=f"{name}_bn2")(h)

        xa = x + residual
        xl = branch(xa, "local", False)
        xg = branch(jnp.mean(xa, axis=(1, 2), keepdims=True), "global", True)
        wei = jax.nn.sigmoid(xl + xg)
        return 2 * x * wei + 2 * residual * (1 - wei)


class HTSATPatchEmbed(nn.Module):
    embed_dim: int
    patch_size: int = 4
    patch_stride: int = 4
    enable_fusion: bool = False

    @nn.compact
    def __call__(self, x, longer=None):
        """x: [B, C_in, H, W] (C_in 1, or 4 with fusion mel stacks)."""
        glob = x[:, 0:1] if self.enable_fusion else x
        g = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_stride, self.patch_stride), padding="VALID",
            name="proj", param_dtype=jnp.float32,
        )(jnp.transpose(glob, (0, 2, 3, 1)))  # NHWC
        if self.enable_fusion and longer is not None:
            # local branch: 3 local mel stacks through mel_conv2d, fused via
            # AFF at matching time positions (laion feature_fusion 'aff_2d')
            B, _, H, W = x.shape
            local = x[:, 1:].reshape(B * 3, H, W, 1)
            l = nn.Conv(
                self.embed_dim, (self.patch_size, self.patch_size * 3),
                strides=(self.patch_stride, self.patch_stride * 3),
                padding="VALID", name="mel_conv2d", param_dtype=jnp.float32,
            )(local)
            Hp, Wp = l.shape[1], l.shape[2]
            l = l.reshape(B, 3, Hp, Wp, self.embed_dim)
            l = jnp.concatenate([l[:, 0], l[:, 1], l[:, 2]], axis=2)
            TW = g.shape[2]
            if l.shape[2] < TW:
                l = jnp.pad(l, ((0, 0), (0, 0), (0, TW - l.shape[2]), (0, 0)))
            else:
                l = l[:, :, :TW]
            fused = AFF2d(self.embed_dim, name="fusion_model")(g, l)
            use = longer.astype(g.dtype).reshape(-1, 1, 1, 1)
            g = fused * use + g * (1 - use)
        B, Hp, Wp, C = g.shape
        g = g.reshape(B, Hp * Wp, C)
        return nn.LayerNorm(name="norm")(g), (Hp, Wp)


class HTSAT(nn.Module):
    """HTSAT-base Swin trunk → CLAP audio 'embedding' (pre-projection)."""

    spec_size: int = 256
    patch_size: int = 4
    embed_dim: int = 128
    depths: tp.Tuple[int, ...] = (2, 2, 12, 2)
    num_heads: tp.Tuple[int, ...] = (4, 8, 16, 32)
    window: int = 8
    mel_bins: int = 64
    enable_fusion: bool = False

    @property
    def freq_ratio(self):
        return self.spec_size // self.mel_bins

    def reshape_wav2img(self, x):
        """x: [B, C, T, F] logmel → [B, C, spec, spec] image."""
        target_t = self.spec_size * self.freq_ratio
        target_f = self.spec_size // self.freq_ratio
        x = x[:, :, :target_t, :target_f]
        if x.shape[2] < target_t:
            x = bicubic_resize_1d(x, target_t, axis=2)
        if x.shape[3] < target_f:
            x = bicubic_resize_1d(x, target_f, axis=3)
        B, C, T, F = x.shape
        x = jnp.transpose(x, (0, 1, 3, 2))  # B, C, F, T
        x = x.reshape(B, C, F, self.freq_ratio, T // self.freq_ratio)
        x = jnp.transpose(x, (0, 1, 3, 2, 4))
        return x.reshape(B, C, F * self.freq_ratio, T // self.freq_ratio)

    @nn.compact
    def __call__(self, mel, longer=None):
        """mel: [B, C, T, F] log-mel (C=1, or 4 for fusion) → [B, num_feat]."""
        # bn0: torch transposes so BatchNorm2d runs over the mel-bin axis;
        # here mel bins are already the trailing axis (flax feature axis)
        x = nn.BatchNorm(use_running_average=True, name="bn0",
                         param_dtype=jnp.float32)(mel)
        x = self.reshape_wav2img(x)
        x, (Hp, Wp) = HTSATPatchEmbed(
            self.embed_dim, self.patch_size, self.patch_size,
            self.enable_fusion, name="patch_embed",
        )(x, longer=longer)
        res = (Hp, Wp)
        dim = self.embed_dim
        for i, depth in enumerate(self.depths):
            last = i == len(self.depths) - 1
            x = BasicLayer(
                dim, res, depth, self.num_heads[i], self.window,
                downsample=not last, name=f"layers_{i}",
            )(x)
            if not last:
                res = (res[0] // 2, res[1] // 2)
                dim *= 2
        x = nn.LayerNorm(name="norm")(x)
        return jnp.mean(x, axis=1)  # CLAP 'embedding' (avg-pooled latent)


# ---------------------------------------------------------------------------
# 48 kHz CLAP mel frontend (torchlibrosa Spectrogram+LogmelFilterBank)
# ---------------------------------------------------------------------------


def clap_logmel(audio, sample_rate: int = 48000, n_fft: int = 1024,
                hop: int = 480, mels: int = 64, fmin: float = 50.0,
                fmax: float = 14000.0):
    """audio: [B, T] mono → log-mel [B, 1, frames, mels].

    torchlibrosa semantics: hann window, center reflect pad, power spectrum,
    librosa slaney mel, 10*log10(clamp(x, 1e-10)) (ref=1, top_db=None).
    """
    s = stft(audio, n_fft, hop, n_fft, center=True)
    power = jnp.real(s) ** 2 + jnp.imag(s) ** 2  # [B, frames, bins]
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, mels, fmin, fmax,
                                    htk=False, norm="slaney"))
    mel = power @ fb.T
    logmel = 10.0 * jnp.log10(jnp.clip(mel, 1e-10, None))
    return logmel[:, None, :, :]


def prepare_clap_audio(audio: np.ndarray, max_len: int = 480000) -> np.ndarray:
    """laion data.get_audio_features 'repeatpad' filling for clips ≤ max_len:
    tile the clip to fill, then zero-pad the tail. Longer clips are center-
    truncated (the fusion path's random crops are not reproducible)."""
    audio = np.asarray(audio, np.float32).ravel()
    if audio.size == 0:
        return np.zeros(max_len, np.float32)
    if audio.size < max_len:
        n_repeat = max(int(max_len / audio.size), 1)
        audio = np.tile(audio, n_repeat)
        out = np.zeros(max_len, np.float32)
        out[: audio.size] = audio[:max_len]
        return out
    start = (audio.size - max_len) // 2
    return audio[start: start + max_len]


# ---------------------------------------------------------------------------
# torch → flax import (laion-clap audio_branch.* keys)
# ---------------------------------------------------------------------------


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"].astype(np.float32),
            "bias": sd[f"{name}.bias"].astype(np.float32)}


def _dense(sd, name):
    out = {"kernel": sd[f"{name}.weight"].T.astype(np.float32)}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"].astype(np.float32)
    return out


def _conv2d(sd, name):
    out = {"kernel": sd[f"{name}.weight"].transpose(2, 3, 1, 0).astype(np.float32)}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"].astype(np.float32)
    return out


def import_htsat(sd: tp.Dict[str, np.ndarray], prefix: str = "audio_branch.",
                 depths: tp.Sequence[int] = (2, 2, 12, 2),
                 enable_fusion: bool = False) -> tp.Dict[str, tp.Any]:
    """laion-clap HTSAT state dict → our HTSAT variables (params+batch_stats)."""
    params: dict = {}
    stats: dict = {}

    # bn0 over mel bins
    params["bn0"] = {"scale": sd[f"{prefix}bn0.weight"].astype(np.float32),
                     "bias": sd[f"{prefix}bn0.bias"].astype(np.float32)}
    stats["bn0"] = {"mean": sd[f"{prefix}bn0.running_mean"].astype(np.float32),
                    "var": sd[f"{prefix}bn0.running_var"].astype(np.float32)}

    pe = {"proj": _conv2d(sd, f"{prefix}patch_embed.proj"),
          "norm": _ln(sd, f"{prefix}patch_embed.norm")}
    if enable_fusion and f"{prefix}patch_embed.mel_conv2d.weight" in sd:
        pe["mel_conv2d"] = _conv2d(sd, f"{prefix}patch_embed.mel_conv2d")
        fm_params, fm_stats = {}, {}
        for ours, theirs in (("local", "local_att"), ("global", "global_att")):
            # torch Sequential: [Conv, BN, ReLU, Conv, BN] (global has a
            # leading AdaptiveAvgPool2d, shifting indices by one)
            off = 1 if ours == "global" else 0
            fm_params[f"{ours}_conv1"] = _conv2d(
                sd, f"{prefix}patch_embed.fusion_model.{theirs}.{off}")
            fm_params[f"{ours}_bn1"] = {
                "scale": sd[f"{prefix}patch_embed.fusion_model.{theirs}.{off+1}.weight"].astype(np.float32),
                "bias": sd[f"{prefix}patch_embed.fusion_model.{theirs}.{off+1}.bias"].astype(np.float32)}
            fm_stats[f"{ours}_bn1"] = {
                "mean": sd[f"{prefix}patch_embed.fusion_model.{theirs}.{off+1}.running_mean"].astype(np.float32),
                "var": sd[f"{prefix}patch_embed.fusion_model.{theirs}.{off+1}.running_var"].astype(np.float32)}
            fm_params[f"{ours}_conv2"] = _conv2d(
                sd, f"{prefix}patch_embed.fusion_model.{theirs}.{off+3}")
            fm_params[f"{ours}_bn2"] = {
                "scale": sd[f"{prefix}patch_embed.fusion_model.{theirs}.{off+4}.weight"].astype(np.float32),
                "bias": sd[f"{prefix}patch_embed.fusion_model.{theirs}.{off+4}.bias"].astype(np.float32)}
            fm_stats[f"{ours}_bn2"] = {
                "mean": sd[f"{prefix}patch_embed.fusion_model.{theirs}.{off+4}.running_mean"].astype(np.float32),
                "var": sd[f"{prefix}patch_embed.fusion_model.{theirs}.{off+4}.running_var"].astype(np.float32)}
        pe["fusion_model"] = fm_params
        stats["patch_embed"] = {"fusion_model": fm_stats}
    params["patch_embed"] = pe

    for i, depth in enumerate(depths):
        layer: dict = {}
        for j in range(depth):
            b = f"{prefix}layers.{i}.blocks.{j}"
            layer[f"blocks_{j}"] = {
                "norm1": _ln(sd, f"{b}.norm1"),
                "attn": {
                    "qkv": _dense(sd, f"{b}.attn.qkv"),
                    "proj": _dense(sd, f"{b}.attn.proj"),
                    "relative_position_bias_table": sd[
                        f"{b}.attn.relative_position_bias_table"
                    ].astype(np.float32),
                },
                "norm2": _ln(sd, f"{b}.norm2"),
                "mlp": {"fc1": _dense(sd, f"{b}.mlp.fc1"),
                        "fc2": _dense(sd, f"{b}.mlp.fc2")},
            }
        if f"{prefix}layers.{i}.downsample.reduction.weight" in sd:
            layer["downsample"] = {
                "norm": _ln(sd, f"{prefix}layers.{i}.downsample.norm"),
                "reduction": {
                    "kernel": sd[
                        f"{prefix}layers.{i}.downsample.reduction.weight"
                    ].T.astype(np.float32)
                },
            }
        params[f"layers_{i}"] = layer

    params["norm"] = _ln(sd, f"{prefix}norm")
    return {"params": params, "batch_stats": stats}
