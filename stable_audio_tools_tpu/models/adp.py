"""ADP 1-D UNet family (audio-diffusion-pytorch) — the SA-1.0 backbone.

Capability parity with reference stable_audio_tools/models/adp.py:
streaming-style asymmetric conv padding (:125-171), ResnetBlock1d with
scale-shift time mapping (:214-330), Patcher/Unpatcher (:336-388),
Transformer1d with cross-attention (:476-635), Downsample/Upsample/Bottleneck
blocks (:687-984), UNet1d with per-level skip lists (:986-1236), FixedEmbedding
learned null embedding + UNetCFG1d batch-CFG with rescale (:1238-1384),
UNetNCCA1d noise-aug channel conditioning (:1385-1432), UNetAll1d (CFG+NCCA,
:1434-1441), the XUNet1d dispatch (:1443-1453), and the spectral-domain
use_stft/use_stft_context path with the STFT encode1d/decode1d helper
(:1001-1080, 1169, 1206, 1482-1562).

NLC internally; public forward takes/returns [B, C, T].
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import dot_product_attention


def _pad_conv1d(x, k_eff, stride, causal):
    """Asymmetric 'streaming' padding (reference adp.py:129-144), NLC."""
    T = x.shape[1]
    padding_total = k_eff - stride
    n_frames = (T - k_eff + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (k_eff - padding_total)
    extra = max(ideal - T, 0)
    if causal:
        return jnp.pad(x, ((0, 0), (padding_total, extra), (0, 0)))
    pr = padding_total // 2
    pl = padding_total - pr
    return jnp.pad(x, ((0, 0), (pl, pr + extra), (0, 0)))


class ADPConv1d(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, causal=False):
        in_ch = x.shape[-1]
        bound = 1.0 / math.sqrt(in_ch * self.kernel_size)

        def u_init(key, s, dt):
            return jax.random.uniform(key, s, dt, -bound, bound)

        kernel = self.param(
            "kernel", u_init, (self.kernel_size, in_ch, self.features), jnp.float32
        )
        bias = self.param("bias", u_init, (self.features,), jnp.float32)
        k_eff = (self.kernel_size - 1) * self.dilation + 1
        xp = _pad_conv1d(x, k_eff, self.stride, causal)
        out = jax.lax.conv_general_dilated(
            xp, kernel.astype(x.dtype), window_strides=(self.stride,),
            padding=[(0, 0)], rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return out + bias.astype(x.dtype)


class ADPConvTranspose1d(nn.Module):
    features: int
    kernel_size: int
    stride: int

    @nn.compact
    def __call__(self, x, causal=False):
        in_ch = x.shape[-1]
        bound = 1.0 / math.sqrt(in_ch * self.kernel_size)

        def u_init(key, s, dt):
            return jax.random.uniform(key, s, dt, -bound, bound)

        kernel = self.param(
            "kernel", u_init, (self.kernel_size, in_ch, self.features), jnp.float32
        )
        bias = self.param("bias", u_init, (self.features,), jnp.float32)
        k = self.kernel_size
        out = jax.lax.conv_general_dilated(
            x, jnp.flip(kernel, 0).astype(x.dtype), window_strides=(1,),
            padding=[(k - 1, k - 1)], lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + bias.astype(x.dtype)
        padding_total = k - self.stride
        pr = padding_total // 2
        pl = padding_total - pr
        return out[:, pl: out.shape[1] - pr if pr else None, :]


class ConvBlock1d(nn.Module):
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    num_groups: int = 8
    use_norm: bool = True

    @nn.compact
    def __call__(self, x, scale_shift=None, causal=False):
        if self.use_norm:
            x = nn.GroupNorm(num_groups=self.num_groups, name="groupnorm")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        x = jax.nn.silu(x)
        return ADPConv1d(self.out_channels, self.kernel_size, self.stride,
                         self.dilation, name="project")(x, causal=causal)


class ResnetBlock1d(nn.Module):
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_norm: bool = True
    num_groups: int = 8
    context_mapping_features: tp.Optional[int] = None

    @nn.compact
    def __call__(self, x, mapping=None, causal=False):
        in_ch = x.shape[-1]
        h = ConvBlock1d(self.out_channels, self.kernel_size, self.stride,
                        self.dilation, self.num_groups, self.use_norm,
                        name="block1")(x, causal=causal)
        scale_shift = None
        if self.context_mapping_features is not None:
            ss = nn.Dense(self.out_channels * 2, name="to_scale_shift",
                          param_dtype=jnp.float32)(jax.nn.silu(mapping))
            scale, shift = jnp.split(ss[:, None, :], 2, axis=-1)
            scale_shift = (scale, shift)
        h = ConvBlock1d(self.out_channels, num_groups=self.num_groups,
                        use_norm=self.use_norm, name="block2")(
            h, scale_shift=scale_shift, causal=causal
        )
        if in_ch != self.out_channels:
            x = ADPConv1d(self.out_channels, 1, name="to_out")(x)
        return h + x


class Patcher(nn.Module):
    out_channels: int
    patch_size: int
    context_mapping_features: tp.Optional[int] = None

    @nn.compact
    def __call__(self, x, mapping=None, causal=False):
        x = ResnetBlock1d(
            self.out_channels // self.patch_size, num_groups=1,
            context_mapping_features=self.context_mapping_features, name="block",
        )(x, mapping, causal=causal)
        if self.patch_size > 1:
            B, T, C = x.shape
            p = self.patch_size
            x = x.reshape(B, T // p, p, C).transpose(0, 1, 3, 2).reshape(
                B, T // p, C * p
            )
        return x


class Unpatcher(nn.Module):
    out_channels: int
    patch_size: int
    context_mapping_features: tp.Optional[int] = None

    @nn.compact
    def __call__(self, x, mapping=None, causal=False):
        if self.patch_size > 1:
            B, S, CP = x.shape
            p = self.patch_size
            x = x.reshape(B, S, CP // p, p).transpose(0, 1, 3, 2).reshape(
                B, S * p, CP // p
            )
        return ResnetBlock1d(
            self.out_channels, num_groups=1,
            context_mapping_features=self.context_mapping_features, name="block",
        )(x, mapping, causal=causal)


class ADPAttention(nn.Module):
    head_features: int
    num_heads: int
    context_features: tp.Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None, context_mask=None, causal=False):
        features = x.shape[-1]
        mid = self.head_features * self.num_heads
        ctx = context if context is not None else x
        # adp Attention (reference adp.py:475-530): norm / norm_context are
        # *both* biased LayerNorms, and norm_context is applied even in
        # self-attention (context defaults to x but uses separate params).
        xn = nn.LayerNorm(name="norm")(x)
        cn = nn.LayerNorm(name="norm_context")(ctx)
        q = nn.Dense(mid, use_bias=False, name="to_q", param_dtype=jnp.float32)(xn)
        kv = nn.Dense(mid * 2, use_bias=False, name="to_kv", param_dtype=jnp.float32)(cn)
        k, v = jnp.split(kv, 2, axis=-1)
        if context_mask is not None:
            # reference zeroes masked k/v rows (adp.py:522-525) instead of
            # -inf softmax masking; match exactly for checkpoint parity.
            m = context_mask.astype(k.dtype)[:, :, None]
            k = k * m
            v = v * m

        def split_heads(t):
            B, N, _ = t.shape
            return t.reshape(B, N, self.num_heads, self.head_features).transpose(
                0, 2, 1, 3
            )

        out = dot_product_attention(
            split_heads(q), split_heads(k), split_heads(v), causal=causal,
        )
        B, H, N, D = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, N, H * D)
        return nn.Dense(features, name="to_out", param_dtype=jnp.float32)(out)


class ADPTransformerBlock(nn.Module):
    head_features: int
    num_heads: int
    multiplier: int
    context_features: tp.Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None, context_mask=None, causal=False):
        x = ADPAttention(self.head_features, self.num_heads, name="attention")(
            x, causal=causal
        ) + x
        if self.context_features is not None and self.context_features > 0:
            x = ADPAttention(
                self.head_features, self.num_heads,
                context_features=self.context_features, name="cross_attention",
            )(x, context=context, context_mask=context_mask) + x
        h = nn.Dense(x.shape[-1] * self.multiplier, name="ff1",
                     param_dtype=jnp.float32)(x)
        h = jax.nn.gelu(h, approximate=False)  # torch nn.GELU default is exact
        x = nn.Dense(x.shape[-1], name="ff2", param_dtype=jnp.float32)(h) + x
        return x


class Transformer1d(nn.Module):
    num_layers: int
    num_heads: int
    head_features: int
    multiplier: int
    context_features: tp.Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None, context_mask=None, causal=False):
        channels = x.shape[-1]
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_in")(x)
        h = ADPConv1d(channels, 1, name="conv_in")(h)
        for i in range(self.num_layers):
            h = ADPTransformerBlock(
                self.head_features, self.num_heads, self.multiplier,
                self.context_features, name=f"block_{i}",
            )(h, context=context, context_mask=context_mask, causal=causal)
        # reference Transformer1d (adp.py:628-634) has NO outer residual
        return ADPConv1d(channels, 1, name="conv_out")(h)


class TimePositionalEmbedding(nn.Module):
    dim: int
    out_features: int

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        weights = self.param("weights", nn.initializers.normal(1.0), (half,),
                             jnp.float32)
        tb = t[:, None].astype(jnp.float32)
        freqs = tb * weights[None, :] * 2 * math.pi
        f = jnp.concatenate([jnp.sin(freqs), jnp.cos(freqs)], axis=-1)
        f = jnp.concatenate([tb, f], axis=-1)
        return nn.Dense(self.out_features, name="to_out", param_dtype=jnp.float32)(f)


def _make_transformer(channels, n_blocks, heads, feats, mult, ctx_feats, name):
    if feats is None and heads is not None:
        feats = channels // heads
    if heads is None and feats is not None:
        heads = channels // feats
    return Transformer1d(
        num_layers=n_blocks, num_heads=heads, head_features=feats,
        multiplier=mult, context_features=ctx_feats, name=name,
    )


class DownsampleBlock1d(nn.Module):
    out_channels: int
    factor: int
    num_groups: int
    num_layers: int
    kernel_multiplier: int = 2
    use_skip: bool = True
    context_channels: int = 0
    num_transformer_blocks: int = 0
    attention_heads: tp.Optional[int] = None
    attention_features: tp.Optional[int] = None
    attention_multiplier: tp.Optional[int] = None
    context_mapping_features: tp.Optional[int] = None
    context_embedding_features: tp.Optional[int] = None

    @nn.compact
    def __call__(self, x, mapping=None, channels=None, embedding=None,
                 embedding_mask=None, causal=False):
        x = ADPConv1d(
            self.out_channels, self.factor * self.kernel_multiplier + 1,
            stride=self.factor, name="downsample",
        )(x, causal=causal)
        if self.context_channels > 0 and channels is not None:
            x = jnp.concatenate([x, channels], axis=-1)
        skips = []
        for i in range(self.num_layers):
            x = ResnetBlock1d(
                self.out_channels, num_groups=self.num_groups,
                context_mapping_features=self.context_mapping_features,
                name=f"block_{i}",
            )(x, mapping, causal=causal)
            if self.use_skip:
                skips.append(x)
        if self.num_transformer_blocks > 0:
            x = _make_transformer(
                self.out_channels, self.num_transformer_blocks,
                self.attention_heads, self.attention_features,
                self.attention_multiplier, self.context_embedding_features,
                "transformer",
            )(x, context=embedding, context_mask=embedding_mask, causal=causal)
            if self.use_skip:
                skips.append(x)
        return (x, skips) if self.use_skip else x


class UpsampleBlock1d(nn.Module):
    out_channels: int
    factor: int
    num_layers: int
    num_groups: int
    use_nearest: bool = False
    use_skip: bool = True
    skip_channels: int = 0
    use_skip_scale: bool = False
    num_transformer_blocks: int = 0
    attention_heads: tp.Optional[int] = None
    attention_features: tp.Optional[int] = None
    attention_multiplier: tp.Optional[int] = None
    context_mapping_features: tp.Optional[int] = None
    context_embedding_features: tp.Optional[int] = None

    @nn.compact
    def __call__(self, x, skips=None, mapping=None, embedding=None,
                 embedding_mask=None, causal=False):
        in_channels = x.shape[-1]
        skip_scale = 2 ** -0.5 if self.use_skip_scale else 1.0
        skips = list(skips) if skips is not None else None
        for i in range(self.num_layers):
            if skips is not None:
                x = jnp.concatenate([x, skips.pop() * skip_scale], axis=-1)
            x = ResnetBlock1d(
                in_channels, num_groups=self.num_groups,
                context_mapping_features=self.context_mapping_features,
                name=f"block_{i}",
            )(x, mapping, causal=causal)
        if self.num_transformer_blocks > 0:
            x = _make_transformer(
                in_channels, self.num_transformer_blocks, self.attention_heads,
                self.attention_features, self.attention_multiplier,
                self.context_embedding_features, "transformer",
            )(x, context=embedding, context_mask=embedding_mask, causal=causal)
        if self.factor == 1:
            x = ADPConv1d(self.out_channels, 3, name="upsample")(x, causal=causal)
        elif self.use_nearest:
            x = jnp.repeat(x, self.factor, axis=1)
            x = ADPConv1d(self.out_channels, 3, name="upsample")(x, causal=causal)
        else:
            x = ADPConvTranspose1d(self.out_channels, self.factor * 2,
                                   self.factor, name="upsample")(x, causal=causal)
        return x


class BottleneckBlock1d(nn.Module):
    num_groups: int
    num_transformer_blocks: int = 0
    attention_heads: tp.Optional[int] = None
    attention_features: tp.Optional[int] = None
    attention_multiplier: tp.Optional[int] = None
    context_mapping_features: tp.Optional[int] = None
    context_embedding_features: tp.Optional[int] = None

    @nn.compact
    def __call__(self, x, mapping=None, embedding=None, embedding_mask=None,
                 causal=False):
        channels = x.shape[-1]
        x = ResnetBlock1d(
            channels, num_groups=self.num_groups,
            context_mapping_features=self.context_mapping_features,
            name="pre_block",
        )(x, mapping, causal=causal)
        if self.num_transformer_blocks > 0:
            x = _make_transformer(
                channels, self.num_transformer_blocks, self.attention_heads,
                self.attention_features, self.attention_multiplier,
                self.context_embedding_features, "transformer",
            )(x, context=embedding, context_mask=embedding_mask, causal=causal)
        x = ResnetBlock1d(
            channels, num_groups=self.num_groups,
            context_mapping_features=self.context_mapping_features,
            name="post_block",
        )(x, mapping, causal=causal)
        return x


def _closest_power_2(x: float) -> int:
    """reference adp.py closest_power_2: nearest power of two by log distance."""
    lo = 2 ** math.floor(math.log2(x))
    hi = 2 ** math.ceil(math.log2(x))
    return lo if (math.log2(x) - math.log2(lo)) < (math.log2(hi) - math.log2(x)) else hi


class ADPSTFT:
    """Spectral-domain helper: torch stft/istft parity (reference
    adp.py:1482-1562 STFT). Stateless; encode1d/decode1d map
    [B, C, T] <-> [B, C*2*bins, frames] with torch.stft(normalized=True)
    semantics. use_complex=False packs (magnitude, phase), True (real, imag).

    The forward runs as one strided MXU conv against the windowed DFT basis
    (ops/stft.py::stft_reim_conv); the inverse as one matmul + shifted-add
    overlap-add with the COLA envelope divided out at trace time
    (ops/stft.py::istft)."""

    def __init__(self, num_fft: int = 1023, hop_length: int = 256,
                 window_length: tp.Optional[int] = None,
                 length: tp.Optional[int] = None, use_complex: bool = False):
        self.num_fft = num_fft
        self.hop_length = hop_length if hop_length is not None else num_fft // 4
        self.window_length = window_length or num_fft
        self.length = length
        self.use_complex = use_complex
        self.bins = num_fft // 2 + 1

    @property
    def out_channels_mult(self) -> int:
        """stft_channels in the reference's bookkeeping (adp.py:1076)."""
        return 2 * self.bins

    def encode1d(self, wave: jax.Array) -> jax.Array:
        from ..ops.stft import stft_reim_conv

        B, C, T = wave.shape
        reim = stft_reim_conv(wave, self.num_fft, self.hop_length,
                              self.window_length, center=True)
        reim = reim * (self.num_fft ** -0.5)  # torch normalized=True
        re, im = reim[..., :self.bins], reim[..., self.bins:]
        # DC (and Nyquist, even n_fft) bins are exactly real in rfft; the
        # conv-DFT basis leaves ~1e-7 imag noise there, which flips
        # atan2-phase between +-pi when re < 0 — zero them (exact math,
        # and torch.angle parity at the branch point)
        real_bins = np.zeros(self.bins, bool)
        real_bins[0] = True
        if self.num_fft % 2 == 0:
            real_bins[-1] = True
        # where (not multiply): +0.0 regardless of the noise sign, so
        # atan2 gives torch's +pi on negative-real bins
        im = jnp.where(jnp.asarray(real_bins), 0.0, im)
        if self.use_complex:
            a, b = re, im
        else:
            a = jnp.sqrt(re * re + im * im)
            b = jnp.arctan2(im, re)
        # [B, C, frames, bins] -> [B, (C bins), frames]; stacked a then b
        def pack(s):
            return jnp.swapaxes(s, 2, 3).reshape(B, C * self.bins, -1)

        return jnp.concatenate([pack(a), pack(b)], axis=1)

    def decode1d(self, z: jax.Array, length: tp.Optional[int] = None) -> jax.Array:
        from ..ops.stft import istft

        B, C2, frames = z.shape
        C = C2 // (2 * self.bins)
        a, b = jnp.split(z, 2, axis=1)

        def unpack(s):
            return jnp.swapaxes(s.reshape(B, C, self.bins, frames), 2, 3)

        a, b = unpack(a), unpack(b)
        if self.use_complex:
            re, im = a, b
        else:
            re, im = a * jnp.cos(b), a * jnp.sin(b)
        out_len = length or self.length or _closest_power_2(
            frames * self.hop_length)
        return istft(jnp.concatenate([re, im], axis=-1), self.num_fft,
                     self.hop_length, self.window_length, length=out_len,
                     center=True, torch_normalized=True)


class UNet1d(nn.Module):
    in_channels: int
    channels: int
    multipliers: tp.Tuple[int, ...]
    factors: tp.Tuple[int, ...]
    num_blocks: tp.Tuple[int, ...]
    attentions: tp.Tuple[int, ...]
    patch_size: int = 1
    resnet_groups: int = 8
    use_context_time: bool = True
    kernel_multiplier_downsample: int = 2
    use_nearest_upsample: bool = False
    use_skip_scale: bool = True
    out_channels: tp.Optional[int] = None
    context_features: tp.Optional[int] = None
    context_features_multiplier: int = 4
    context_channels: tp.Tuple[int, ...] = ()
    context_embedding_features: tp.Optional[int] = None
    attention_heads: tp.Optional[int] = None
    attention_features: tp.Optional[int] = None
    attention_multiplier: int = 2
    # spectral-domain path (reference adp.py:1001-1080): the UNet runs on
    # stacked STFT channels; stft_* mirror the reference's stft_ kwargs
    use_stft: bool = False
    use_stft_context: bool = False
    stft_num_fft: tp.Optional[int] = None
    stft_hop_length: int = 256
    stft_window_length: tp.Optional[int] = None
    stft_length: tp.Optional[int] = None
    stft_use_complex: bool = False

    def _stft(self) -> "ADPSTFT":
        assert self.stft_num_fft is not None, \
            "stft_num_fft required if use_stft=True"
        return ADPSTFT(self.stft_num_fft, self.stft_hop_length,
                       self.stft_window_length, self.stft_length,
                       self.stft_use_complex)

    def _mapping_features(self):
        if self.use_context_time or self.context_features is not None:
            return self.channels * self.context_features_multiplier
        return None

    @nn.compact
    def unet_forward(self, x, time=None, features=None, channels_list=None,
                     embedding=None, embedding_mask=None, causal=False):
        """x: [B, C, T] (reference layout)."""
        num_layers = len(self.multipliers) - 1
        ctx_channels = list(self.context_channels) + [0] * (
            num_layers + 1 - len(self.context_channels)
        )
        mapping_features = self._mapping_features()

        stft = None
        T_in = x.shape[-1]
        if self.use_stft:
            stft = self._stft()
            x = stft.encode1d(x)

        chan_ids = {}
        cid = 0
        for i, c in enumerate(ctx_channels):
            if c > 0:
                chan_ids[i] = cid
                cid += 1

        xl = jnp.swapaxes(x, 1, 2)  # NLC
        channels_nlc = None
        if channels_list:
            channels_list = list(channels_list)
            if self.use_stft_context and 0 in chan_ids:
                # layer-0 context joins x in the spectral domain
                # (reference adp.py:1169)
                ctx_stft = stft if stft is not None else self._stft()
                channels_list[chan_ids[0]] = ctx_stft.encode1d(
                    channels_list[chan_ids[0]])
            channels_nlc = [jnp.swapaxes(c, 1, 2) for c in channels_list]

        if channels_nlc is not None and 0 in chan_ids:
            xl = jnp.concatenate([xl, channels_nlc[chan_ids[0]]], axis=-1)

        # time/features mapping
        mapping = None
        if mapping_features is not None:
            items = []
            if self.use_context_time:
                te = TimePositionalEmbedding(self.channels, mapping_features,
                                             name="to_time")(time)
                items.append(jax.nn.gelu(te, approximate=False))
            if self.context_features is not None:
                fe = nn.Dense(mapping_features, name="to_features",
                              param_dtype=jnp.float32)(features)
                items.append(jax.nn.gelu(fe, approximate=False))
            mapping = sum(items)
            h = nn.Dense(mapping_features, name="to_mapping_0",
                         param_dtype=jnp.float32)(mapping)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Dense(mapping_features, name="to_mapping_2",
                         param_dtype=jnp.float32)(h)
            mapping = jax.nn.gelu(h, approximate=False)

        xl = Patcher(
            self.channels * self.multipliers[0], self.patch_size,
            mapping_features, name="to_in",
        )(xl, mapping, causal=causal)

        skips_list = [xl]
        for i in range(num_layers):
            channels_i = (
                channels_nlc[chan_ids[i + 1]]
                if channels_nlc is not None and (i + 1) in chan_ids else None
            )
            xl, skips = DownsampleBlock1d(
                out_channels=self.channels * self.multipliers[i + 1],
                factor=self.factors[i],
                kernel_multiplier=self.kernel_multiplier_downsample,
                num_groups=self.resnet_groups,
                num_layers=self.num_blocks[i],
                context_channels=ctx_channels[i + 1],
                num_transformer_blocks=self.attentions[i],
                attention_heads=self.attention_heads,
                attention_features=self.attention_features,
                attention_multiplier=self.attention_multiplier,
                context_mapping_features=mapping_features,
                context_embedding_features=self.context_embedding_features,
                name=f"downsamples_{i}",
            )(xl, mapping=mapping, channels=channels_i, embedding=embedding,
              embedding_mask=embedding_mask, causal=causal)
            skips_list.append(skips)

        xl = BottleneckBlock1d(
            num_groups=self.resnet_groups,
            num_transformer_blocks=self.attentions[num_layers],
            attention_heads=self.attention_heads,
            attention_features=self.attention_features,
            attention_multiplier=self.attention_multiplier,
            context_mapping_features=mapping_features,
            context_embedding_features=self.context_embedding_features,
            name="bottleneck",
        )(xl, mapping=mapping, embedding=embedding,
          embedding_mask=embedding_mask, causal=causal)

        for j, i in enumerate(reversed(range(num_layers))):
            skips = skips_list.pop()
            xl = UpsampleBlock1d(
                out_channels=self.channels * self.multipliers[i],
                factor=self.factors[i],
                num_layers=self.num_blocks[i] + (1 if self.attentions[i] else 0),
                num_groups=self.resnet_groups,
                use_nearest=self.use_nearest_upsample,
                use_skip_scale=self.use_skip_scale,
                skip_channels=self.channels * self.multipliers[i + 1],
                num_transformer_blocks=self.attentions[i],
                attention_heads=self.attention_heads,
                attention_features=self.attention_features,
                attention_multiplier=self.attention_multiplier,
                context_mapping_features=mapping_features,
                context_embedding_features=self.context_embedding_features,
                name=f"upsamples_{j}",
            )(xl, skips=skips, mapping=mapping, embedding=embedding,
              embedding_mask=embedding_mask, causal=causal)

        xl = xl + skips_list.pop()
        out_ch = self.out_channels or self.in_channels
        if stft is not None:
            # reference bookkeeping: out_channels *= stft_channels
            # (adp.py:1078)
            out_ch *= stft.out_channels_mult
        xl = Unpatcher(out_ch, self.patch_size, mapping_features, name="to_out")(
            xl, mapping, causal=causal
        )
        out = jnp.swapaxes(xl, 1, 2)
        if stft is not None:
            # decode back to the waveform; the input length is static under
            # jit, so pass it rather than the reference's
            # closest_power_2(frames*hop) (identical whenever that working
            # assumption — power-of-two sample_size — holds, and shape-safe
            # otherwise; stft_length overrides both)
            out = stft.decode1d(out, length=self.stft_length or T_in)
        return out

    def __call__(self, *args, **kwargs):
        return self.unet_forward(*args, **kwargs)


class NumberEmbedder(nn.Module):
    """Fourier-embed arbitrary-shaped float tensors (reference adp.py:1455-1477)."""

    features: int
    dim: int = 256

    @nn.compact
    def __call__(self, x):
        shape = x.shape
        flat = x.reshape(-1)
        emb = TimePositionalEmbedding(self.dim, self.features, name="embedding")(flat)
        return emb.reshape(*shape, self.features)


def _ncca_augment(mod, channels_list, channels_augmentation, channels_scale,
                  context_features):
    """Noise channel conditioning augmentation (reference adp.py:1385-1432).

    Each conditioning channel item is blended with gaussian noise at
    per-item scale (scale * augmentation flag); the scales are Fourier-
    embedded (NumberEmbedder) and sum-reduced over items into the UNet's
    `features` context vector. Must be called inside a compact method of
    `mod` (creates the `embedder` submodule and draws the `sample` RNG).
    Items are [B, C, T] (reference layout).
    """
    b, n = channels_list[0].shape[0], len(channels_list)
    dt = jnp.asarray(channels_list[0]).dtype
    aug = jnp.broadcast_to(jnp.asarray(channels_augmentation, dt), (b, n))
    scale = jnp.broadcast_to(jnp.asarray(channels_scale, dt), (b, n))
    s_eff = scale * aug
    out = []
    for i, item in enumerate(channels_list):
        s = s_eff[:, i][:, None, None]
        noise = jax.random.normal(mod.make_rng("sample"), item.shape, item.dtype)
        out.append(noise * s + item * (1 - s))
    emb = NumberEmbedder(features=context_features, name="embedder")(scale)
    return out, emb.sum(axis=1)


class UNetCFG1d(nn.Module):
    """UNet1d + classifier-free guidance via learned null embedding.

    Composition (not subclassing): flax allows one compact method per module.
    With `use_ncca=True` this is the reference's `UNetAll1d` (adp.py:1434-1441,
    CFG MRO over NCCA): conditioning channels are noise-augmented and the
    scale embedding replaces the `features` context vector.
    """

    in_channels: int
    channels: int
    multipliers: tp.Tuple[int, ...]
    factors: tp.Tuple[int, ...]
    num_blocks: tp.Tuple[int, ...]
    attentions: tp.Tuple[int, ...]
    patch_size: int = 1
    resnet_groups: int = 8
    use_context_time: bool = True
    kernel_multiplier_downsample: int = 2
    use_nearest_upsample: bool = False
    use_skip_scale: bool = True
    out_channels: tp.Optional[int] = None
    context_features: tp.Optional[int] = None
    context_features_multiplier: int = 4
    context_channels: tp.Tuple[int, ...] = ()
    context_embedding_features: tp.Optional[int] = None
    attention_heads: tp.Optional[int] = None
    attention_features: tp.Optional[int] = None
    attention_multiplier: int = 2
    context_embedding_max_length: int = 79
    use_xattn_time: bool = False
    use_ncca: bool = False
    use_stft: bool = False
    use_stft_context: bool = False
    stft_num_fft: tp.Optional[int] = None
    stft_hop_length: int = 256
    stft_window_length: tp.Optional[int] = None
    stft_length: tp.Optional[int] = None
    stft_use_complex: bool = False

    def _make_unet(self):
        return UNet1d(
            in_channels=self.in_channels,
            channels=self.channels,
            multipliers=self.multipliers,
            factors=self.factors,
            num_blocks=self.num_blocks,
            attentions=self.attentions,
            patch_size=self.patch_size,
            resnet_groups=self.resnet_groups,
            use_context_time=self.use_context_time,
            kernel_multiplier_downsample=self.kernel_multiplier_downsample,
            use_nearest_upsample=self.use_nearest_upsample,
            use_skip_scale=self.use_skip_scale,
            out_channels=self.out_channels,
            context_features=self.context_features,
            context_features_multiplier=self.context_features_multiplier,
            context_channels=self.context_channels,
            context_embedding_features=self.context_embedding_features,
            attention_heads=self.attention_heads,
            attention_features=self.attention_features,
            attention_multiplier=self.attention_multiplier,
            use_stft=self.use_stft,
            use_stft_context=self.use_stft_context,
            stft_num_fft=self.stft_num_fft,
            stft_hop_length=self.stft_hop_length,
            stft_window_length=self.stft_window_length,
            stft_length=self.stft_length,
            stft_use_complex=self.stft_use_complex,
            name="unet",
        )

    @nn.compact
    def __call__(
        self,
        x,
        time,
        embedding=None,
        embedding_mask=None,
        embedding_scale: float = 1.0,
        embedding_mask_proba: float = 0.0,
        batch_cfg: bool = True,
        rescale_cfg: bool = False,
        scale_phi: float = 0.4,
        negative_embedding=None,
        negative_embedding_mask=None,
        features=None,
        channels_list=None,
        channels_augmentation=False,
        channels_scale=0.0,
        causal=False,
        train=False,
    ):
        B = x.shape[0]
        max_len = self.context_embedding_max_length + (1 if self.use_xattn_time else 0)
        if self.use_xattn_time:
            te = TimePositionalEmbedding(
                self.channels, self.context_embedding_features,
                name="to_time_embedding",
            )(time)
            embedding = jnp.concatenate(
                [embedding, jax.nn.gelu(te, approximate=False)[:, None, :]], axis=1
            )
            if embedding_mask is not None:
                embedding_mask = jnp.concatenate(
                    [embedding_mask, jnp.ones((B, 1), embedding_mask.dtype)], axis=1
                )

        fixed_table = self.param(
            "fixed_embedding",
            nn.initializers.normal(1.0),
            (max_len, self.context_embedding_features),
            jnp.float32,
        )
        L = embedding.shape[1]
        fixed = jnp.broadcast_to(
            fixed_table[None, :L, :], embedding.shape
        ).astype(embedding.dtype)

        if embedding_mask_proba > 0.0 and train:
            keep = jax.random.bernoulli(
                self.make_rng("cfg"), embedding_mask_proba, (B, 1, 1)
            )
            embedding = jnp.where(keep, fixed, embedding)

        if embedding_scale != 1.0:
            batch_x = jnp.concatenate([x, x], axis=0)
            batch_time = jnp.concatenate([time, time], axis=0)
            if negative_embedding is not None:
                if negative_embedding_mask is not None:
                    m = negative_embedding_mask.astype(bool)[:, :, None]
                    negative_embedding = jnp.where(m, negative_embedding, fixed)
                batch_embed = jnp.concatenate([embedding, negative_embedding], axis=0)
            else:
                batch_embed = jnp.concatenate([embedding, fixed], axis=0)
            batch_mask = None
            if embedding_mask is not None:
                batch_mask = jnp.concatenate([embedding_mask, embedding_mask], axis=0)
            batch_features = None
            if self.context_features is not None and features is not None:
                batch_features = jnp.concatenate([features, features], axis=0)
            batch_channels = None
            if channels_list:
                batch_channels = [jnp.concatenate([c, c], axis=0)
                                  for c in channels_list]
            if self.use_ncca:
                # NCCA applies after batch doubling (reference UNetAll1d MRO:
                # CFG forward → NCCA forward); the scale embedding replaces
                # the features context vector.
                batch_channels, batch_features = _ncca_augment(
                    self, batch_channels, channels_augmentation,
                    channels_scale, self.context_features,
                )
            unet = self._make_unet()
            batch_out = unet(
                batch_x, batch_time, features=batch_features,
                channels_list=batch_channels, embedding=batch_embed,
                embedding_mask=batch_mask, causal=causal,
            )
            out, out_masked = jnp.split(batch_out, 2, axis=0)
            out_cfg = out_masked + (out - out_masked) * embedding_scale
            if rescale_cfg:
                out_std = jnp.std(out, axis=1, keepdims=True)
                out_cfg_std = jnp.std(out_cfg, axis=1, keepdims=True)
                return scale_phi * (out_cfg * (out_std / (out_cfg_std + 1e-12))) + (
                    1 - scale_phi
                ) * out_cfg
            return out_cfg
        if self.use_ncca:
            channels_list, features = _ncca_augment(
                self, channels_list, channels_augmentation, channels_scale,
                self.context_features,
            )
        unet = self._make_unet()
        return unet(
            x, time, features=features, channels_list=channels_list,
            embedding=embedding, embedding_mask=embedding_mask, causal=causal,
        )


class UNetNCCA1d(nn.Module):
    """UNet1d with Noise Channel Conditioning Augmentation (reference
    adp.py:1385-1432): conditioning channels are blended with gaussian noise
    at a per-item scale, and the Fourier-embedded scales (sum-reduced over
    items) become the UNet's `features` context vector. Needs the `sample`
    RNG collection."""

    in_channels: int
    channels: int
    multipliers: tp.Tuple[int, ...]
    factors: tp.Tuple[int, ...]
    num_blocks: tp.Tuple[int, ...]
    attentions: tp.Tuple[int, ...]
    context_features: int = 0
    patch_size: int = 1
    resnet_groups: int = 8
    use_context_time: bool = True
    kernel_multiplier_downsample: int = 2
    use_nearest_upsample: bool = False
    use_skip_scale: bool = True
    out_channels: tp.Optional[int] = None
    context_features_multiplier: int = 4
    context_channels: tp.Tuple[int, ...] = ()
    context_embedding_features: tp.Optional[int] = None
    attention_heads: tp.Optional[int] = None
    attention_features: tp.Optional[int] = None
    attention_multiplier: int = 2
    use_stft: bool = False
    use_stft_context: bool = False
    stft_num_fft: tp.Optional[int] = None
    stft_hop_length: int = 256
    stft_window_length: tp.Optional[int] = None
    stft_length: tp.Optional[int] = None
    stft_use_complex: bool = False

    @nn.compact
    def __call__(self, x, time, *, channels_list, channels_augmentation=False,
                 channels_scale=0.0, embedding=None, embedding_mask=None,
                 causal=False, **kwargs):
        assert self.context_features > 0, "UNetNCCA1d requires context_features"
        channels_list, features = _ncca_augment(
            self, list(channels_list), channels_augmentation, channels_scale,
            self.context_features,
        )
        unet = UNet1d(
            in_channels=self.in_channels,
            channels=self.channels,
            multipliers=self.multipliers,
            factors=self.factors,
            num_blocks=self.num_blocks,
            attentions=self.attentions,
            patch_size=self.patch_size,
            resnet_groups=self.resnet_groups,
            use_context_time=self.use_context_time,
            kernel_multiplier_downsample=self.kernel_multiplier_downsample,
            use_nearest_upsample=self.use_nearest_upsample,
            use_skip_scale=self.use_skip_scale,
            out_channels=self.out_channels,
            context_features=self.context_features,
            context_features_multiplier=self.context_features_multiplier,
            context_channels=self.context_channels,
            context_embedding_features=self.context_embedding_features,
            attention_heads=self.attention_heads,
            attention_features=self.attention_features,
            attention_multiplier=self.attention_multiplier,
            use_stft=self.use_stft,
            use_stft_context=self.use_stft_context,
            stft_num_fft=self.stft_num_fft,
            stft_hop_length=self.stft_hop_length,
            stft_window_length=self.stft_window_length,
            stft_length=self.stft_length,
            stft_use_complex=self.stft_use_complex,
            name="unet",
        )
        return unet(
            x, time, features=features, channels_list=channels_list,
            embedding=embedding, embedding_mask=embedding_mask, causal=causal,
        )


def UNetAll1d(**kwargs):
    """CFG + NCCA combined variant (reference adp.py:1434-1441)."""
    return UNetCFG1d(use_ncca=True, **kwargs)


def XUNet1d(type: str = "base", **kwargs):
    """UNet variant dispatch (reference adp.py:1443-1453)."""
    if type == "base":
        return UNet1d(**kwargs)
    elif type == "all":
        return UNetAll1d(**kwargs)
    elif type == "cfg":
        return UNetCFG1d(**kwargs)
    elif type == "ncca":
        return UNetNCCA1d(**kwargs)
    raise ValueError(f"Unknown XUNet1d type: {type}")


UNET_FIELDS = {f for f in UNet1d.__dataclass_fields__
               if f not in ("parent", "name")}
UNETCFG_FIELDS = {f for f in UNetCFG1d.__dataclass_fields__
                  if f not in ("parent", "name")}


class UNet1DUncondWrapper(nn.Module):
    """Unconditional plain-UNet adapter (reference diffusion.py:337-358).

    The reference halves all params once at init (a training-start detail);
    not replicated here — checkpoint import overwrites params and capability
    is unaffected.
    """

    unet: UNet1d

    def __call__(self, x, t, **kwargs):
        return self.unet(x, t, **{k: v for k, v in kwargs.items()
                                  if k in ("features", "channels_list",
                                           "embedding", "embedding_mask",
                                           "causal")})


class UNetCFG1DWrapper(nn.Module):
    """ConditionedDiffusionModel adapter (reference diffusion.py:222-283)."""

    unet: UNetCFG1d

    def __call__(self, x, t, cross_attn_cond=None, cross_attn_mask=None,
                 negative_cross_attn_cond=None, negative_cross_attn_mask=None,
                 input_concat_cond=None, global_cond=None, prepend_cond=None,
                 prepend_cond_mask=None, cfg_scale=1.0, cfg_dropout_prob=0.0,
                 batch_cfg=True, rescale_cfg=False, scale_phi=0.0,
                 train=False, **kwargs):
        channels_list = None
        if input_concat_cond is not None:
            channels_list = [input_concat_cond]
        return self.unet(
            x, t,
            embedding=cross_attn_cond,
            embedding_mask=cross_attn_mask,
            embedding_scale=cfg_scale,
            embedding_mask_proba=cfg_dropout_prob,
            batch_cfg=True,
            rescale_cfg=scale_phi != 0.0,
            scale_phi=scale_phi,
            negative_embedding=negative_cross_attn_cond,
            negative_embedding_mask=negative_cross_attn_mask,
            features=global_cond,
            channels_list=channels_list,
            train=train,
        )


class UNet1DCondWrapper(nn.Module):
    """Plain conditional UNet adapter (reference diffusion.py:284-336)."""

    unet: UNet1d

    def __call__(self, x, t, input_concat_cond=None, global_cond=None,
                 cross_attn_cond=None, cross_attn_mask=None, train=False, **kwargs):
        channels_list = [input_concat_cond] if input_concat_cond is not None else None
        return self.unet(
            x, t, features=global_cond, channels_list=channels_list,
            embedding=cross_attn_cond, embedding_mask=cross_attn_mask,
        )


def create_adp_cond_wrapper(model_type: str, config: tp.Dict[str, tp.Any]):
    cfg = {k: tuple(v) if isinstance(v, list) else v for k, v in config.items()}
    if model_type == "adp_cfg_1d":
        kwargs = {k: v for k, v in cfg.items() if k in UNETCFG_FIELDS}
        return UNetCFG1DWrapper(unet=UNetCFG1d(**kwargs))
    elif model_type == "adp_1d":
        kwargs = {k: v for k, v in cfg.items() if k in UNET_FIELDS}
        return UNet1DCondWrapper(unet=UNet1d(**kwargs))
    raise ValueError(f"Unknown adp model type {model_type}")
