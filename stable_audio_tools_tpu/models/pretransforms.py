"""Pretransforms: invertible-ish transforms applied outside the trainable core.

Capability parity with reference stable_audio_tools/models/pretransforms.py:
AutoencoderPretransform (scale, chunked), WaveletPretransform, PQMFPretransform,
PatchedPretransform, plus tokenize/decode_tokens for discrete pretransforms.

All pretransforms operate on [B, C, T] arrays (reference convention).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class Pretransform(nn.Module):
    enable_grad: bool = False
    io_channels: int = 2
    is_discrete: bool = False
    encoded_channels: Optional[int] = None
    downsampling_ratio: Optional[int] = None

    def encode(self, x):
        raise NotImplementedError

    def decode(self, z):
        raise NotImplementedError

    def tokenize(self, x):
        raise NotImplementedError

    def decode_tokens(self, tokens):
        raise NotImplementedError

    def __call__(self, x):
        return self.encode(x)


class AutoencoderPretransform(Pretransform):
    model: Optional[nn.Module] = None
    scale: float = 1.0
    model_half: bool = False
    chunked: bool = False

    @property
    def _ratio(self):
        return self.model.downsampling_ratio

    def encode(self, x, **kwargs):
        x = x.astype(jnp.bfloat16) if self.model_half else x
        if self.chunked:
            z = self.model.encode_audio(x, chunked=True, **kwargs)
        else:
            z = self.model.encode(x, **kwargs)
        z = z.astype(jnp.float32) if self.model_half else z
        return z / self.scale

    def decode(self, z, **kwargs):
        z = z * self.scale
        z = z.astype(jnp.bfloat16) if self.model_half else z
        if self.chunked:
            out = self.model.decode_audio(z, chunked=True, **kwargs)
        else:
            out = self.model.decode(z, **kwargs)
        return out.astype(jnp.float32) if self.model_half else out

    def tokenize(self, x, **kwargs):
        assert self.model.is_discrete, "Cannot tokenize with a continuous model"
        _, info = self.model.encode(x, return_info=True, **kwargs)
        return info[self.model.bottleneck.tokens_id]

    def decode_tokens(self, tokens, **kwargs):
        assert self.model.is_discrete, "Cannot decode tokens with a continuous model"
        return self.model.decode_tokens(tokens, **kwargs)


class PretrainedCodecPretransform(AutoencoderPretransform):
    """Frozen pretrained neural codec as a pretransform.

    Covers the reference's PretrainedDACPretransform (pretransforms.py:167)
    and AudiocraftCompressionPretransform (:228). Instead of downloading via
    the `dac`/`audiocraft` packages, the factory builds the equivalent
    in-repo codec (DAC towers + projected RVQ, or SEANet towers + EMA RVQ)
    and the weights import from a local torch checkpoint through
    io.checkpoints.import_codec_variables (`ckpt_path` in the config).

    quantize_on_decode semantics (reference :170,186-219) are realized by the
    DACRVQBottleneck's own quantize_on_decode flag: encode returns
    pre-quantizer latents and decode quantizes first.
    """

    num_quantizers: int = 0
    codebook_size: int = 0
    ckpt_path: Optional[str] = None


class PatchedPretransform(Pretransform):
    """Reshape-patching: [B, C, T] -> [B, C*patch, T/patch] (reference :111-143)."""

    patch_size: int = 1

    def encode(self, x):
        B, C, T = x.shape
        p = self.patch_size
        return x.reshape(B, C, T // p, p).transpose(0, 1, 3, 2).reshape(B, C * p, T // p)

    def decode(self, z):
        B, CP, S = z.shape
        p = self.patch_size
        C = CP // p
        return z.reshape(B, C, p, S).transpose(0, 1, 3, 2).reshape(B, C, S * p)


class WaveletPretransform(Pretransform):
    channels: int = 2
    levels: int = 4
    wavelet: str = "bior4.4"

    def encode(self, x):
        from .wavelets import wavelet_encode

        return wavelet_encode(x, self.wavelet, self.levels)

    def decode(self, z):
        from .wavelets import wavelet_decode

        return wavelet_decode(z, self.wavelet, self.levels)


class PQMFPretransform(Pretransform):
    attenuation: int = 100
    num_bands: int = 16

    def encode(self, x):
        from .pqmf import pqmf_analysis

        return pqmf_analysis(x, self.attenuation, self.num_bands)

    def decode(self, z):
        from .pqmf import pqmf_synthesis

        return pqmf_synthesis(z, self.attenuation, self.num_bands)
