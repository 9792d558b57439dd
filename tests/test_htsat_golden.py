"""Golden tests for the HTSAT (CLAP audio branch) port.

Torch replica follows laion_clap's htsat.py module naming and forward math
(Swin v1 trunk: window attention with relative position bias, shifted
windows, patch merging; bn0 over mel bins; reshape_wav2img with bicubic
align-corners interpolation; CLAP embedding = final-norm token mean).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from stable_audio_tools_tpu.models.htsat import (  # noqa: E402

    HTSAT,
    bicubic_resize_1d,
    clap_logmel,
    import_htsat,
    prepare_clap_audio,
)

pytestmark = pytest.mark.slow  # heavyweight golden/integration tier


# ---- torch replica (laion_clap htsat.py layout) ------------------------------


class TWindowAttention(tnn.Module):
    def __init__(self, dim, window, heads):
        super().__init__()
        self.dim, self.window, self.heads = dim, window, heads
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)
        self.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.02)
        coords = torch.stack(torch.meshgrid(
            torch.arange(window), torch.arange(window), indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += window - 1
        rel[:, :, 1] += window - 1
        rel[:, :, 0] *= 2 * window - 1
        self.register_buffer("relative_position_index", rel.sum(-1))

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        hd = self.dim // self.heads
        qkv = self.qkv(x).reshape(B_, N, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(N, N, -1)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, self.heads, N, N) + \
                mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.heads, N, N)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(x)


def t_window_partition(x, w):
    B, H, W, C = x.shape
    x = x.view(B, H // w, w, W // w, w, C)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, w * w, C)


def t_window_reverse(wins, w, H, W):
    B = wins.shape[0] // (H * W // w // w)
    x = wins.view(B, H // w, W // w, w, w, -1)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(B, H, W, -1)


class TSwinBlock(tnn.Module):
    def __init__(self, dim, resolution, heads, window, shift, mlp_ratio=4.0):
        super().__init__()
        self.resolution = resolution
        if min(resolution) <= window:
            window, shift = min(resolution), 0
        self.window, self.shift = window, shift
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TWindowAttention(dim, window, heads)
        self.norm2 = tnn.LayerNorm(dim)
        hidden = int(dim * mlp_ratio)
        self.mlp = tnn.ModuleDict(
            {"fc1": tnn.Linear(dim, hidden), "fc2": tnn.Linear(hidden, dim)})
        if shift > 0:
            H, W = resolution
            img = torch.zeros(1, H, W, 1)
            cnt = 0
            for h in (slice(0, -window), slice(-window, -shift),
                      slice(-shift, None)):
                for ww in (slice(0, -window), slice(-window, -shift),
                           slice(-shift, None)):
                    img[:, h, ww, :] = cnt
                    cnt += 1
            wins = t_window_partition(img, window).view(-1, window * window)
            mask = wins.unsqueeze(1) - wins.unsqueeze(2)
            mask = mask.masked_fill(mask != 0, -100.0).masked_fill(mask == 0, 0.0)
            self.register_buffer("attn_mask", mask)
        else:
            self.attn_mask = None

    def forward(self, x):
        H, W = self.resolution
        B, N, C = x.shape
        shortcut = x
        x = self.norm1(x).view(B, H, W, C)
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        wins = t_window_partition(x, self.window)
        wins = self.attn(wins, self.attn_mask)
        x = t_window_reverse(wins, self.window, H, W)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + x.view(B, N, C)
        h = self.norm2(x)
        x = x + self.mlp["fc2"](F.gelu(self.mlp["fc1"](h)))
        return x


class TPatchMerging(tnn.Module):
    def __init__(self, dim, resolution):
        super().__init__()
        self.resolution = resolution
        self.norm = tnn.LayerNorm(4 * dim)
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):
        H, W = self.resolution
        B, N, C = x.shape
        x = x.view(B, H, W, C)
        x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                       x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
        x = x.view(B, -1, 4 * C)
        return self.reduction(self.norm(x))


class THTSAT(tnn.Module):
    def __init__(self, spec_size=32, patch=4, embed_dim=8, depths=(1, 2),
                 heads=(2, 4), window=4, mel_bins=8):
        super().__init__()
        self.spec_size, self.mel_bins = spec_size, mel_bins
        self.freq_ratio = spec_size // mel_bins
        self.bn0 = tnn.BatchNorm2d(mel_bins)
        self.bn0.running_mean.normal_()
        self.bn0.running_var.uniform_(0.5, 1.5)

        class PE(tnn.Module):
            def __init__(self):
                super().__init__()
                self.proj = tnn.Conv2d(1, embed_dim, patch, patch)
                self.norm = tnn.LayerNorm(embed_dim)

            def forward(self, x):
                x = self.proj(x).flatten(2).transpose(1, 2)
                return self.norm(x)

        self.patch_embed = PE()
        grid = spec_size // patch
        self.layers = tnn.ModuleList()
        dim, res = embed_dim, (grid, grid)
        for i, depth in enumerate(depths):
            layer = tnn.Module()
            layer.blocks = tnn.ModuleList([
                TSwinBlock(dim, res, heads[i], window,
                           0 if j % 2 == 0 else window // 2)
                for j in range(depth)])
            if i < len(depths) - 1:
                layer.downsample = TPatchMerging(dim, res)
                res = (res[0] // 2, res[1] // 2)
                dim *= 2
            self.layers.append(layer)
        self.norm = tnn.LayerNorm(dim)

    def reshape_wav2img(self, x):
        target_t = self.spec_size * self.freq_ratio
        target_f = self.spec_size // self.freq_ratio
        x = x[:, :, :target_t, :target_f]
        if x.shape[2] < target_t:
            x = F.interpolate(x, (target_t, x.shape[3]), mode="bicubic",
                              align_corners=True)
        B, C, T, Fr = x.shape
        x = x.permute(0, 1, 3, 2).contiguous()
        x = x.reshape(B, C, Fr, self.freq_ratio, T // self.freq_ratio)
        x = x.permute(0, 1, 3, 2, 4).contiguous()
        return x.reshape(B, C, Fr * self.freq_ratio, T // self.freq_ratio)

    def forward(self, mel):
        x = mel.transpose(1, 3)
        x = self.bn0(x)
        x = x.transpose(1, 3)
        x = self.reshape_wav2img(x)
        x = self.patch_embed(x)
        for layer in self.layers:
            for blk in layer.blocks:
                x = blk(x)
            if hasattr(layer, "downsample"):
                x = layer.downsample(x)
        x = self.norm(x)
        return x.mean(dim=1)


def test_bicubic_align_corners_matches_torch():
    x = np.random.RandomState(0).randn(2, 1, 27, 8).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), (64, 8), mode="bicubic",
                        align_corners=True).numpy()
    out = bicubic_resize_1d(jnp.asarray(x), 64, axis=2)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_htsat_golden_vs_torch_replica():
    torch.manual_seed(0)
    tm = THTSAT().eval()
    sd = {f"audio_branch.{k}": v.detach().numpy()
          for k, v in tm.state_dict().items()}

    jm = HTSAT(spec_size=32, patch_size=4, embed_dim=8, depths=(1, 2),
               num_heads=(2, 4), window=4, mel_bins=8)
    variables = jax.tree_util.tree_map(
        jnp.asarray, import_htsat(sd, "audio_branch.", depths=(1, 2)))

    mel = np.random.RandomState(1).randn(2, 1, 100, 8).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(mel)).numpy()
    out = jm.apply(variables, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-4)


def test_clap_logmel_shapes_and_scale():
    audio = np.random.RandomState(2).randn(1, 48000).astype(np.float32) * 0.1
    mel = clap_logmel(jnp.asarray(audio))
    assert mel.shape == (1, 1, 101, 64)
    m = np.asarray(mel)
    assert np.all(m <= 10 * math.log10(1e10))  # log10 clamp floor respected
    assert np.all(np.isfinite(m))


def test_prepare_clap_audio_repeatpad():
    a = np.ones(100, np.float32)
    out = prepare_clap_audio(a, max_len=250)
    assert out.shape == (250,)
    assert out[:200].sum() == 200 and out[200:].sum() == 0
    long = np.arange(300, dtype=np.float32)
    out = prepare_clap_audio(long, max_len=100)
    assert out[0] == 100  # center crop
