"""Diffusion autoencoder: AE whose decoder is a conditioned diffusion model.

Capability parity with reference stable_audio_tools/models/autoencoders.py
DiffusionAutoencoder (:735-780) and create_diffAE_from_config (:912-974):
encoder → (bottleneck) → latents; decode upsamples latents to the audio rate
and runs v-diffusion sampling with input-concat conditioning.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..inference.sampling import sample
from .autoencoders import nct_to_nlc, nlc_to_nct
from .bottleneck import Bottleneck


class DiffusionAutoencoder(nn.Module):
    encoder: tp.Optional[nn.Module]
    decoder: tp.Optional[nn.Module]
    diffusion: nn.Module  # DAU1DCondWrapper / UNet1DCondWrapper / DiTWrapper
    io_channels: int
    sample_rate: int
    latent_dim: int
    downsampling_ratio: int
    diffusion_downsampling_ratio: int = 1
    bottleneck: tp.Optional[Bottleneck] = None
    pretransform: tp.Optional[nn.Module] = None

    @property
    def min_length(self):
        return self.downsampling_ratio

    def encode(self, audio, return_info=False, skip_bottleneck=False, train=False):
        info = {}
        if self.pretransform is not None:
            audio = self.pretransform.encode(audio)
            if not self.pretransform.enable_grad:
                audio = jax.lax.stop_gradient(audio)
        latents = nlc_to_nct(self.encoder(nct_to_nlc(audio))) \
            if self.encoder is not None else audio
        if self.bottleneck is not None and not skip_bottleneck:
            z, b_info = self.bottleneck.encode(
                nct_to_nlc(latents), return_info=True, train=train
            )
            latents = nlc_to_nct(z)
            info.update(b_info)
        if return_info:
            return latents, info
        return latents

    def diffusion_forward(self, x, t, latents, train=False):
        """Denoiser forward with upsampled-latent input-concat conditioning."""
        upsampled_length = x.shape[2]
        cond = latents
        if self.decoder is not None:
            cond = nlc_to_nct(self.decoder(nct_to_nlc(cond)))
        if cond.shape[2] != upsampled_length:
            idx = jnp.floor(
                jnp.arange(upsampled_length) * (cond.shape[2] / upsampled_length)
            ).astype(jnp.int32)
            cond = cond[:, :, idx]
        return self.diffusion(x, t, input_concat_cond=cond, train=train)

    def decode(self, latents, steps: int = 100, train=False):
        """Sample audio from latents (reference :749-779)."""
        upsampled_length = latents.shape[2] * self.downsampling_ratio
        if self.bottleneck is not None:
            latents = nlc_to_nct(self.bottleneck.decode(nct_to_nlc(latents)))
        noise = jax.random.normal(
            self.make_rng("sample"),
            (latents.shape[0], self.io_channels, upsampled_length),
        )
        decoded = sample(
            lambda x, t, **kw: self.diffusion_forward(x, t, latents),
            noise, steps, 0.0,
        )
        if self.pretransform is not None:
            decoded = self.pretransform.decode(decoded)
            if not self.pretransform.enable_grad:
                decoded = jax.lax.stop_gradient(decoded)
        return decoded

    def pretransform_encode(self, audio):
        z = self.pretransform.encode(audio)
        return jax.lax.stop_gradient(z) if not self.pretransform.enable_grad else z

    def __call__(self, audio, t, train=False):
        """Training forward: encode + denoise (used for init)."""
        latents, info = self.encode(audio, return_info=True, train=train)
        x = jnp.zeros(
            (audio.shape[0], self.io_channels,
             latents.shape[2] * self.downsampling_ratio)
        )
        v = self.diffusion_forward(x, t, latents, train=train)
        return v, latents, info


def create_diffAE_from_config(config: tp.Dict[str, tp.Any]):
    from .dance_unet import DiffusionAttnUnet1D
    from .diffusion import DAU1DCondWrapper, DiTWrapper, _dit_from_config
    from .factory import (
        _filter_kwargs,
        create_bottleneck_from_config,
        create_encoder_from_config,
        create_decoder_from_config,
        create_pretransform_from_config,
    )

    diffae_config = config["model"]
    encoder = (create_encoder_from_config(diffae_config["encoder"])
               if "encoder" in diffae_config else None)
    decoder = (create_decoder_from_config(diffae_config["decoder"])
               if "decoder" in diffae_config else None)

    d_type = diffae_config["diffusion"]["type"]
    d_cfg = diffae_config["diffusion"]["config"]
    if d_type == "DAU1d":
        diffusion = DAU1DCondWrapper(
            unet=DiffusionAttnUnet1D(**_filter_kwargs(DiffusionAttnUnet1D, d_cfg))
        )
        ddr = int(np.prod(d_cfg["strides"]))
    elif d_type == "adp_1d":
        from .adp import create_adp_cond_wrapper

        diffusion = create_adp_cond_wrapper("adp_1d", d_cfg)
        ddr = int(np.prod(d_cfg["factors"]))
    elif d_type == "dit":
        diffusion = DiTWrapper(dit=_dit_from_config(d_cfg, "v"))
        ddr = 1
    else:
        raise ValueError(f"Unknown diffusion type {d_type}")

    sample_rate = config.get("sample_rate", None)
    assert sample_rate is not None
    bottleneck = diffae_config.get("bottleneck", None)
    if bottleneck is not None:
        bottleneck = create_bottleneck_from_config(bottleneck)
    pretransform = diffae_config.get("pretransform", None)
    if pretransform is not None:
        pretransform = create_pretransform_from_config(pretransform, sample_rate)

    return DiffusionAutoencoder(
        encoder=encoder,
        decoder=decoder,
        diffusion=diffusion,
        io_channels=diffae_config["io_channels"],
        sample_rate=sample_rate,
        latent_dim=diffae_config["latent_dim"],
        downsampling_ratio=diffae_config["downsampling_ratio"],
        diffusion_downsampling_ratio=ddr,
        bottleneck=bottleneck,
        pretransform=pretransform,
    )
