"""Audio autoencoders (Oobleck / TAAE / DAC-style / SEANet) — NLC layout.

Capability parity with reference stable_audio_tools/models/autoencoders.py:
- ResidualUnit / EncoderBlock / DecoderBlock / OobleckEncoder / OobleckDecoder
  (reference :57-355): weight-normed conv stacks with snake/elu activations,
  stride-2s downsampling (kernel 2*stride, padding ceil(stride/2)).
- TAAE encoder/decoder (reference :91-230): conv stride blocks interleaved
  with sliding-window transformer blocks.
- DAC-style encoder/decoder (dac package equivalent, in-repo).
- SEANet-style encoder/decoder (encodec package equivalent, in-repo).
- AudioAutoencoder.encode/decode/decode_tokens (+ soft_clip, bottleneck,
  nested pretransform) and chunked overlap-paste encode/decode for long audio
  (reference :601-732).

Public-facing array convention: audio/latents are [batch, channels, time]
like the reference; internally everything runs [batch, time, channels].
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.activations import SnakeBeta, get_activation
from ..ops.conv import WNConv1d, WNConvTranspose1d
from ..ops.transformer import TransformerBlock
from .bottleneck import Bottleneck


def nct_to_nlc(x):
    return jnp.swapaxes(x, 1, 2)


def nlc_to_nct(x):
    return jnp.swapaxes(x, 1, 2)


def act_then_conv(act: str, antialias: bool, channels: int, x, conv,
                  residual=None):
    """activation → conv, fusing a snake activation into the conv's VMEM
    pass (ops/kernels/conv1d_snake.py) where the kernel supports it;
    `residual` additionally fuses a trailing skip add into the same pass.

    `conv` is an already-constructed (WN)Conv1d / WNConvTranspose1d module.
    Module construction order — and therefore every parameter path — is
    identical to `get_activation(...)(x)` followed by `conv(x)`.
    """
    act_mod = get_activation(act, antialias, channels)
    if isinstance(act_mod, SnakeBeta):
        try:
            return conv(x, pre_snake=act_mod(return_params=True,
                                             dtype=x.dtype),
                        residual=residual)
        except TypeError:
            # conv modules without residual support (transposed)
            out = conv(x, pre_snake=act_mod(return_params=True,
                                            dtype=x.dtype))
            return out if residual is None else out + residual
    out = conv(act_mod(x))
    return out if residual is None else out + residual


class ResidualUnit(nn.Module):
    out_channels: int
    dilation: int
    use_snake: bool = False
    antialias: bool = False

    @nn.compact
    def __call__(self, x):
        res = x
        act = "snake" if self.use_snake else "elu"
        padding = (self.dilation * (7 - 1)) // 2
        x = act_then_conv(act, self.antialias, self.out_channels, x, WNConv1d(
            features=self.out_channels, kernel_size=7, dilation=self.dilation,
            padding=padding, name="conv1",
        ))
        # the skip add is fused into conv2's Pallas output pass
        return act_then_conv(act, self.antialias, self.out_channels, x,
                             WNConv1d(features=self.out_channels,
                                      kernel_size=1, name="conv2"),
                             residual=res)


class EncoderBlock(nn.Module):
    in_channels: int
    out_channels: int
    stride: int
    use_snake: bool = False
    antialias: bool = False

    @nn.compact
    def __call__(self, x):
        for i, dilation in enumerate((1, 3, 9)):
            x = ResidualUnit(
                out_channels=self.in_channels, dilation=dilation,
                use_snake=self.use_snake, name=f"res_{i}",
            )(x)
        act = "snake" if self.use_snake else "elu"
        x = act_then_conv(act, self.antialias, self.in_channels, x, WNConv1d(
            features=self.out_channels,
            kernel_size=2 * self.stride,
            stride=self.stride,
            padding=math.ceil(self.stride / 2),
            name="down",
        ))
        return x


class DecoderBlock(nn.Module):
    in_channels: int
    out_channels: int
    stride: int
    use_snake: bool = False
    antialias: bool = False
    use_nearest_upsample: bool = False

    @nn.compact
    def __call__(self, x):
        act = "snake" if self.use_snake else "elu"
        if self.use_nearest_upsample:
            x = get_activation(act, self.antialias, self.in_channels)(x)
            x = jnp.repeat(x, self.stride, axis=1)
            x = WNConv1d(
                features=self.out_channels, kernel_size=2 * self.stride,
                stride=1, use_bias=False, padding="same", name="up",
            )(x)
        else:
            x = act_then_conv(
                act, self.antialias, self.in_channels, x,
                WNConvTranspose1d(
                    features=self.out_channels,
                    kernel_size=2 * self.stride,
                    stride=self.stride,
                    padding=math.ceil(self.stride / 2),
                    name="up",
                ))
        for i, dilation in enumerate((1, 3, 9)):
            x = ResidualUnit(
                out_channels=self.out_channels, dilation=dilation,
                use_snake=self.use_snake, name=f"res_{i}",
            )(x)
        return x


class OobleckEncoder(nn.Module):
    in_channels: int = 2
    channels: int = 128
    latent_dim: int = 32
    c_mults: Sequence[int] = (1, 2, 4, 8)
    strides: Sequence[int] = (2, 4, 8, 8)
    use_snake: bool = False
    antialias: bool = False

    @nn.compact
    def __call__(self, x):
        """x: [B, T, in_channels] → [B, T/prod(strides), latent_dim]."""
        c_mults = (1,) + tuple(self.c_mults)
        x = WNConv1d(features=c_mults[0] * self.channels, kernel_size=7, padding=3,
                     name="conv_in")(x)
        for i in range(len(c_mults) - 1):
            x = EncoderBlock(
                in_channels=c_mults[i] * self.channels,
                out_channels=c_mults[i + 1] * self.channels,
                stride=self.strides[i],
                use_snake=self.use_snake,
                name=f"block_{i}",
            )(x)
        act = "snake" if self.use_snake else "elu"
        x = act_then_conv(act, self.antialias, c_mults[-1] * self.channels, x,
                          WNConv1d(features=self.latent_dim, kernel_size=3,
                                   padding=1, name="conv_out"))
        return x


class OobleckDecoder(nn.Module):
    out_channels: int = 2
    channels: int = 128
    latent_dim: int = 32
    c_mults: Sequence[int] = (1, 2, 4, 8)
    strides: Sequence[int] = (2, 4, 8, 8)
    use_snake: bool = False
    antialias: bool = False
    use_nearest_upsample: bool = False
    final_tanh: bool = True

    @nn.compact
    def __call__(self, x):
        c_mults = (1,) + tuple(self.c_mults)
        depth = len(c_mults)
        x = WNConv1d(features=c_mults[-1] * self.channels, kernel_size=7, padding=3,
                     name="conv_in")(x)
        for j, i in enumerate(range(depth - 1, 0, -1)):
            x = DecoderBlock(
                in_channels=c_mults[i] * self.channels,
                out_channels=c_mults[i - 1] * self.channels,
                stride=self.strides[i - 1],
                use_snake=self.use_snake,
                use_nearest_upsample=self.use_nearest_upsample,
                name=f"block_{j}",
            )(x)
        act = "snake" if self.use_snake else "elu"
        x = act_then_conv(act, self.antialias, c_mults[0] * self.channels, x,
                          WNConv1d(features=self.out_channels, kernel_size=7,
                                   padding=3, use_bias=False, name="conv_out"))
        if self.final_tanh:
            x = jnp.tanh(x)
        return x


def preprocess_audio_for_encoder(audio_list, in_sr_list, model):
    """Host-side batch prep (reference autoencoders.py:548-599): resample to
    the model rate, pad to a multiple of the downsampling ratio, fix channel
    count, stack to [B, C, T]."""
    import numpy as np

    from ..data.resample import resample_poly_np
    from ..inference.utils import set_audio_channels

    processed = []
    max_len = 0
    for audio, in_sr in zip(audio_list, in_sr_list):
        audio = np.asarray(audio, np.float32)
        if audio.ndim == 1:
            audio = audio[None]
        if in_sr != model.sample_rate:
            audio = np.stack(
                [resample_poly_np(ch, in_sr, model.sample_rate) for ch in audio]
            )
        max_len = max(max_len, audio.shape[-1])
        processed.append(audio)
    ratio = int(model.downsampling_ratio)
    padded_len = ((max_len + ratio - 1) // ratio) * ratio
    in_ch = model.in_channels or model.io_channels
    batch = []
    for audio in processed:
        audio = np.pad(audio, ((0, 0), (0, padded_len - audio.shape[-1])))
        audio = np.asarray(set_audio_channels(audio[None], in_ch))[0]
        batch.append(audio)
    return np.stack(batch)


class TAAEBlock(nn.Module):
    """Conv stride block + sliding-window transformer stack (reference :91-230)."""

    in_channels: int
    out_channels: int
    stride: int
    block_type: str = "encoder"  # or "decoder"
    transformer_depth: int = 3
    use_snake: bool = False
    sliding_window: Tuple[int, int] = (31, 32)
    conformer: bool = False
    layer_scale: bool = True

    @nn.compact
    def __call__(self, x):
        transformer_dim = self.out_channels if self.block_type == "encoder" else self.in_channels

        def run_transformers(h):
            for i in range(self.transformer_depth):
                h = TransformerBlock(
                    dim=transformer_dim,
                    dim_heads=128,
                    causal=False,
                    zero_init_branch_outputs=not self.layer_scale,
                    conformer=self.conformer,
                    layer_scale=self.layer_scale,
                    add_rope=True,
                    qk_norm="ln",
                    ff_mult=4,
                    ff_no_bias=False,
                    norm_eps=1e-2,
                    sliding_window=self.sliding_window,
                    name=f"transformer_{i}",
                )(h)
            return h

        if self.block_type == "encoder":
            x = WNConv1d(
                features=self.out_channels, kernel_size=2 * self.stride,
                stride=self.stride, padding=math.ceil(self.stride / 2), name="conv",
            )(x)
            x = run_transformers(x)
        else:
            x = run_transformers(x)
            x = WNConvTranspose1d(
                features=self.out_channels, kernel_size=2 * self.stride,
                stride=self.stride, padding=math.ceil(self.stride / 2), name="conv",
            )(x)
        return x


class TAAEEncoder(nn.Module):
    in_channels: int = 2
    channels: int = 128
    latent_dim: int = 32
    c_mults: Sequence[int] = (1, 2, 4, 8)
    strides: Sequence[int] = (2, 4, 8, 8)
    transformer_depths: Optional[Sequence[int]] = None
    use_snake: bool = False
    sliding_window: Tuple[int, int] = (31, 32)

    @nn.compact
    def __call__(self, x):
        c_mults = (1,) + tuple(self.c_mults)
        depths = self.transformer_depths or [3] * (len(c_mults) - 1)
        x = WNConv1d(features=c_mults[0] * self.channels, kernel_size=7, padding=3,
                     name="conv_in")(x)
        for i in range(len(c_mults) - 1):
            x = TAAEBlock(
                in_channels=c_mults[i] * self.channels,
                out_channels=c_mults[i + 1] * self.channels,
                stride=self.strides[i],
                block_type="encoder",
                transformer_depth=depths[i],
                use_snake=self.use_snake,
                sliding_window=self.sliding_window,
                name=f"block_{i}",
            )(x)
        act = "snake" if self.use_snake else "elu"
        x = get_activation(act, False, c_mults[-1] * self.channels)(x)
        x = WNConv1d(features=self.latent_dim, kernel_size=3, padding=1, name="conv_out")(x)
        return x


class TAAEDecoder(nn.Module):
    out_channels: int = 2
    channels: int = 128
    latent_dim: int = 32
    c_mults: Sequence[int] = (1, 2, 4, 8)
    strides: Sequence[int] = (2, 4, 8, 8)
    transformer_depths: Optional[Sequence[int]] = None
    use_snake: bool = False
    sliding_window: Tuple[int, int] = (31, 32)
    final_tanh: bool = True

    @nn.compact
    def __call__(self, x):
        c_mults = (1,) + tuple(self.c_mults)
        depth = len(c_mults)
        depths = self.transformer_depths or [3] * (depth - 1)
        x = WNConv1d(features=c_mults[-1] * self.channels, kernel_size=7, padding=3,
                     name="conv_in")(x)
        for j, i in enumerate(range(depth - 1, 0, -1)):
            x = TAAEBlock(
                in_channels=c_mults[i] * self.channels,
                out_channels=c_mults[i - 1] * self.channels,
                stride=self.strides[i - 1],
                block_type="decoder",
                transformer_depth=depths[i - 1],
                use_snake=self.use_snake,
                sliding_window=self.sliding_window,
                name=f"block_{j}",
            )(x)
        act = "snake" if self.use_snake else "elu"
        x = get_activation(act, False, c_mults[0] * self.channels)(x)
        x = WNConv1d(features=self.out_channels, kernel_size=7, padding=3,
                     use_bias=False, name="conv_out")(x)
        if self.final_tanh:
            x = jnp.tanh(x)
        return x


class AudioAutoencoder(nn.Module):
    """Encoder + bottleneck + decoder (+ optional nested pretransform).

    encode/decode take and return [B, C, T] (reference convention); the
    encoder/decoder submodules run NLC internally.
    """

    encoder: Optional[nn.Module]
    decoder: Optional[nn.Module]
    latent_dim: int
    downsampling_ratio: int
    sample_rate: int
    io_channels: int = 2
    bottleneck: Optional[Bottleneck] = None
    pretransform: Optional[nn.Module] = None
    in_channels: Optional[int] = None
    out_channels: Optional[int] = None
    soft_clip: bool = False

    @property
    def is_discrete(self):
        return self.bottleneck is not None and self.bottleneck.is_discrete

    @property
    def min_length(self):
        return self.downsampling_ratio

    def __call__(self, audio, train=False):
        """Roundtrip (used for init and AE training)."""
        latents, info = self.encode(audio, return_info=True, train=train)
        if (self.bottleneck is not None
                and getattr(self.bottleneck, "quantize_on_decode", False)
                and "z" in info):
            # encode already ran the quantizer (codes/losses in info); feed
            # its quantized output to the decoder instead of re-quantizing.
            return self.decode(nlc_to_nct(info["z"]), train=train,
                               quantized=True), info
        return self.decode(latents, train=train), info

    def encode(
        self,
        audio,
        return_info=False,
        skip_bottleneck: bool = False,
        skip_pretransform: bool = False,
        train: bool = False,
        **bottleneck_kwargs,
    ):
        info: Dict[str, Any] = {}
        if self.pretransform is not None and not skip_pretransform:
            audio = self.pretransform.encode(audio)
            if not self.pretransform.enable_grad:
                audio = jax.lax.stop_gradient(audio)
        if self.encoder is not None:
            latents = nlc_to_nct(self.encoder(nct_to_nlc(audio)))
        else:
            latents = audio
        info["pre_bottleneck_latents"] = latents
        if self.bottleneck is not None and not skip_bottleneck:
            z, b_info = self.bottleneck.encode(
                nct_to_nlc(latents), return_info=True, train=train, **bottleneck_kwargs
            )
            latents = nlc_to_nct(z)
            info.update(b_info)
        if return_info:
            return latents, info
        return latents

    def decode(self, latents, skip_bottleneck: bool = False, train: bool = False,
               quantized: bool = False):
        if self.bottleneck is not None and not skip_bottleneck:
            fn = (self.bottleneck.decode_quantized if quantized
                  else self.bottleneck.decode)
            latents = nlc_to_nct(fn(nct_to_nlc(latents), train=train))
        decoded = nlc_to_nct(self.decoder(nct_to_nlc(latents)))
        if self.pretransform is not None:
            decoded = self.pretransform.decode(decoded)
            if not self.pretransform.enable_grad:
                decoded = jax.lax.stop_gradient(decoded)
        if self.soft_clip:
            decoded = jnp.tanh(decoded)
        return decoded

    def decode_tokens(self, tokens, train: bool = False):
        assert self.bottleneck is not None and self.bottleneck.is_discrete, (
            "decode_tokens only works with discrete autoencoders"
        )
        latents = self.bottleneck.decode_tokens(tokens)
        # bottleneck returns NLC; decode() expects NCT and will re-run
        # bottleneck.decode, so skip it (already decoded).
        return self.decode(nlc_to_nct(latents), skip_bottleneck=True, train=train)

    # -- chunked overlap-paste codec (reference :601-732), TPU-first --------
    #
    # The reference runs a python loop of encode() calls. Here chunk starts
    # are static, every chunk has identical shape, and the per-chunk model
    # call runs under lax.map — sequential on-device, bounded memory, one
    # compile. Pasting uses static slice indices.

    @staticmethod
    def _chunk_starts(total: int, chunk: int, hop: int):
        starts = list(range(0, total - chunk + 1, hop))
        if not starts:
            starts = [0]
        if starts[-1] + chunk != total:
            starts.append(total - chunk)  # final chunk pinned to the end
        return starts

    def _overlap_paste(self, chunks_out, starts, chunk_len, total_len, overlap_half):
        """chunks_out: [N, B, C, L_chunk] → pasted [B, C, total_len]."""
        N, B, C, L = chunks_out.shape
        y = jnp.zeros((B, C, total_len), chunks_out.dtype)
        for i, s in enumerate(starts):
            t_start, t_end = s, s + chunk_len
            c_start, c_end = 0, L
            if i > 0:
                t_start += overlap_half
                c_start += overlap_half
            if i < N - 1:
                t_end -= overlap_half
                c_end -= overlap_half
            y = jax.lax.dynamic_update_slice(
                y, chunks_out[i, :, :, c_start:c_end], (0, 0, t_start)
            )
        return y

    @staticmethod
    def _run_chunks(fn, chunks, chunk_pspec, batch_size: int = 8):
        """Chunk-batched lax.map by default; data-parallel over the mesh
        with chunk_pspec.

        Sequential chunk-at-a-time decode left the MXU starved — 64 batch-1
        decodes of an SA-2.0 285 s generate measured 2.03 s (convs at
        ~27 TF/s). lax.map(batch_size=8) vmaps groups of 8 chunks, an
        ~8x-wider conv batch at bounded memory (the whole point of chunking
        is not materializing full-length decoder activations; a group's
        activations are ~8 chunk-lengths, still far under the full length).
        With chunk_pspec, chunks run data-parallel over the mesh instead:
        vmap + GSPMD sharding of the chunk axis, so an N-chunk codec pass
        on an n-device mesh costs ~N/n chunk decodes of wall-clock."""
        if chunk_pspec is None:
            n = chunks.shape[0]
            return jax.lax.map(fn, chunks,
                               batch_size=min(batch_size, n))
        chunks = jax.lax.with_sharding_constraint(chunks, chunk_pspec)
        out = jax.vmap(fn)(chunks)
        return jax.lax.with_sharding_constraint(out, chunk_pspec)

    def encode_audio(self, audio, chunked=False, overlap=32, chunk_size=128,
                     chunk_pspec=None, **kwargs):
        """audio: [B, C, T]. chunk_size/overlap measured in latents."""
        if not chunked or audio.shape[2] <= chunk_size * int(self.downsampling_ratio):
            return self.encode(audio, **kwargs)
        spl = int(self.downsampling_ratio)
        total = audio.shape[2]
        cs, ol = chunk_size * spl, overlap * spl
        hop = cs - ol
        starts = self._chunk_starts(total, cs, hop)
        chunks = jnp.stack([jax.lax.dynamic_slice_in_dim(audio, s, cs, 2) for s in starts])
        enc = lambda c: self.encode(c, **kwargs)
        y_chunks = self._run_chunks(enc, chunks, chunk_pspec)  # [N, B, latent, cs/spl]
        lat_starts = [s // spl for s in starts]
        return self._overlap_paste(
            y_chunks, lat_starts, cs // spl, total // spl, overlap // 2
        )

    def decode_audio(self, latents, chunked=False, overlap=32, chunk_size=128,
                     chunk_pspec=None, **kwargs):
        """latents: [B, latent_dim, S]. chunk_size/overlap measured in latents."""
        if not chunked or latents.shape[2] <= chunk_size:
            return self.decode(latents, **kwargs)
        spl = int(self.downsampling_ratio)
        total = latents.shape[2]
        hop = chunk_size - overlap
        starts = self._chunk_starts(total, chunk_size, hop)
        chunks = jnp.stack(
            [jax.lax.dynamic_slice_in_dim(latents, s, chunk_size, 2) for s in starts]
        )
        dec = lambda c: self.decode(c, **kwargs)
        y_chunks = self._run_chunks(dec, chunks, chunk_pspec)
        audio_starts = [s * spl for s in starts]
        return self._overlap_paste(
            y_chunks, audio_starts, chunk_size * spl, total * spl, (overlap // 2) * spl
        )
