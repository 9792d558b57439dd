"""Dance Diffusion 1-D UNet (DiffusionAttnUnet1D) — NLC layout.

Capability parity with reference stable_audio_tools/models/diffusion.py:393-505
and the blocks it uses (models/blocks.py): ResConvBlock (GroupNorm(1)+GELU),
SelfAttention1d, FIR cubic down/upsampling, recursive skip concat, Fourier
timestep planes, optional conditioning-noise augmentation.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.conv import Conv1d
from ..ops.embeddings import FourierFeatures

_KERNELS = {
    "linear": [1 / 8, 3 / 8, 3 / 8, 1 / 8],
    "cubic": [
        -0.01171875, -0.03515625, 0.11328125, 0.43359375,
        0.43359375, 0.11328125, -0.03515625, -0.01171875,
    ],
}


class ResConvBlock(nn.Module):
    c_mid: int
    c_out: int
    is_last: bool = False
    kernel_size: int = 5
    conv_bias: bool = True

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        skip = x
        if c_in != self.c_out:
            skip = Conv1d(self.c_out, 1, use_bias=False, name="skip")(x)
        h = Conv1d(self.c_mid, self.kernel_size, padding=self.kernel_size // 2,
                   use_bias=self.conv_bias, name="conv1")(x)
        h = nn.GroupNorm(num_groups=1, name="norm1")(h)
        h = jax.nn.gelu(h)
        h = Conv1d(self.c_out, self.kernel_size, padding=self.kernel_size // 2,
                   use_bias=self.conv_bias, name="conv2")(h)
        if not self.is_last:
            h = nn.GroupNorm(num_groups=1, name="norm2")(h)
            h = jax.nn.gelu(h)
        return h + skip


class SelfAttention1d(nn.Module):
    n_head: int = 1

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        h = nn.GroupNorm(num_groups=1, name="norm")(x)
        qkv = Conv1d(C * 3, 1, name="qkv_proj")(h)
        qkv = qkv.reshape(B, T, 3, self.n_head, C // self.n_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, T, H, D]
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        scale = (C // self.n_head) ** -0.5
        att = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
            * scale,
            axis=-1,
        ).astype(x.dtype)
        y = jnp.einsum("bhqk,bhkd->bhqd", att, v).transpose(0, 2, 1, 3).reshape(B, T, C)
        y = Conv1d(C, 1, name="out_proj")(y)
        return x + y


def fir_downsample(x, kernel="cubic"):
    """Depthwise FIR downsample by 2 with reflect padding (blocks.py:112-131)."""
    k = np.asarray(_KERNELS[kernel], np.float32)
    pad = len(k) // 2 - 1
    C = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    kern = jnp.tile(jnp.asarray(k)[:, None, None], (1, 1, C)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        xp, kern, window_strides=(2,), padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=C,
    )


def fir_upsample(x, kernel="cubic"):
    """Depthwise FIR transpose-upsample by 2 (blocks.py:134-152)."""
    k = np.asarray(_KERNELS[kernel], np.float32) * 2
    pad = len(k) // 2 - 1
    C = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), ((pad + 1) // 2,) * 2, (0, 0)), mode="reflect")
    kern = jnp.tile(jnp.asarray(k)[:, None, None], (1, 1, C)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        xp,
        jnp.flip(kern, 0),
        window_strides=(1,),
        padding=[(len(k) - 1 - (pad * 2 + 1),) * 2],
        lhs_dilation=(2,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=C,
    )


class DiffusionAttnUnet1D(nn.Module):
    io_channels: int = 2
    depth: int = 14
    n_attn_layers: int = 6
    channels: Sequence[int] = tuple([128, 128, 256, 256] + [512] * 10)
    cond_dim: int = 0
    cond_noise_aug: bool = False
    kernel_size: int = 5
    learned_resample: bool = False
    strides: Sequence[int] = tuple([2] * 13)
    conv_bias: bool = True
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, t, cond=None, cond_aug_scale=None, train=False):
        """x: [B, C, T] (reference layout). Returns [B, C, T]."""
        in_dtype = x.dtype
        if self.compute_dtype is not None:
            x = x.astype(jnp.dtype(self.compute_dtype))
            if cond is not None:
                cond = cond.astype(x.dtype)
        xl = jnp.swapaxes(x, 1, 2)  # NLC
        B, T, _ = xl.shape

        temb = FourierFeatures(1, 16, name="timestep_embed")(t[:, None])
        temb_planes = jnp.broadcast_to(temb[:, None, :], (B, T, 16)).astype(xl.dtype)
        inputs = [xl, temb_planes]

        if cond is not None:
            cond_l = jnp.swapaxes(cond, 1, 2)
            if cond_l.shape[1] != T:
                # linear interpolation to match x length
                cond_l = jax.image.resize(
                    cond_l, (B, T, cond_l.shape[-1]), method="linear"
                )
            if self.cond_noise_aug:
                if cond_aug_scale is None:
                    aug_level = jax.random.uniform(self.make_rng("sample"), (B,))
                else:
                    aug_level = jnp.full((B,), cond_aug_scale)
                noise = jax.random.normal(self.make_rng("sample"), cond_l.shape,
                                          cond_l.dtype)
                cond_l = cond_l + noise * aug_level[:, None, None]
                aug_embed = FourierFeatures(1, 16, name="aug_embed")(aug_level[:, None])
                inputs.append(
                    jnp.broadcast_to(aug_embed[:, None, :], (B, T, 16)).astype(xl.dtype)
                )
            inputs.append(cond_l.astype(xl.dtype))

        h = jnp.concatenate(inputs, axis=-1)

        channels = list(self.channels)
        strides = [1] + list(self.strides)
        attn_layer = self.depth - self.n_attn_layers

        conv = lambda c_mid, c_out, name, is_last=False: ResConvBlock(
            c_mid, c_out, is_last=is_last, kernel_size=self.kernel_size,
            conv_bias=self.conv_bias, name=name,
        )

        def maybe_attn(c, i, name):
            if i >= attn_layer and self.n_attn_layers > 0:
                return SelfAttention1d(n_head=max(c // 32, 1), name=name)
            return lambda x: x

        # Built iteratively instead of the reference's recursive module nest:
        # down path outermost(level=1)→innermost(depth), then up path back.
        skips = []
        # level 1 (outermost) input convs
        c0 = channels[0]
        h = conv(c0, c0, "head_0")(h)
        h = conv(c0, c0, "head_1")(h)
        h = conv(c0, c0, "head_2")(h)
        skips.append(h)
        for i in range(2, self.depth + 1):
            c = channels[i - 1]
            if strides[i - 1] == 2:
                h = fir_downsample(h, "cubic")
            h = conv(c, c, f"down_{i}_0")(h)
            h = maybe_attn(c, i, f"down_attn_{i}_0")(h)
            h = conv(c, c, f"down_{i}_1")(h)
            h = maybe_attn(c, i, f"down_attn_{i}_1")(h)
            h = conv(c, c, f"down_{i}_2")(h)
            h = maybe_attn(c, i, f"down_attn_{i}_2")(h)
            if i < self.depth:
                skips.append(h)
        for i in range(self.depth, 1, -1):
            c = channels[i - 1]
            c_prev = channels[i - 2]
            if i < self.depth:
                h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = conv(c, c, f"up_{i}_0")(h)
            h = maybe_attn(c, i, f"up_attn_{i}_0")(h)
            h = conv(c, c, f"up_{i}_1")(h)
            h = maybe_attn(c, i, f"up_attn_{i}_1")(h)
            h = conv(c, c_prev, f"up_{i}_2")(h)
            h = maybe_attn(c_prev, i, f"up_attn_{i}_2")(h)
            if strides[i - 1] == 2:
                h = fir_upsample(h, "cubic")
        h = jnp.concatenate([h, skips.pop()], axis=-1)
        h = conv(c0, c0, "tail_0")(h)
        h = conv(c0, c0, "tail_1")(h)
        h = conv(c0, self.io_channels, "tail_2", is_last=True)(h)
        out = jnp.swapaxes(h, 1, 2)
        if self.compute_dtype is not None:
            out = out.astype(in_dtype)
        return out
