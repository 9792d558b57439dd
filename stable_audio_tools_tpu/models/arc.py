"""ARC discriminator heads (reference models/arc.py).

ConvDiscriminator: strided-conv score head over DiT hidden states;
ConvNeXtDiscriminator: ConvNeXt encoder score head; relativistic losses.
Inputs are NLC ([B, T, C]) — the DiT hidden states as produced by
exit_layer_ix.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv import Conv1d


def get_relativistic_losses(score_real, score_fake):
    diff = score_real - score_fake
    dis_loss = jnp.mean(jax.nn.softplus(-diff))
    gen_loss = jnp.mean(jax.nn.softplus(diff))
    return dis_loss, gen_loss


class ConvDiscriminator(nn.Module):
    channels: int
    soft_clip_scale: tp.Optional[float] = None
    loss_type: str = "relativistic"

    @nn.compact
    def __call__(self, x):
        """x: [B, T, C] hidden states → scores [B, T', 1]."""
        for i in range(4):
            x = Conv1d(self.channels, 4, stride=2, padding=1, name=f"conv_{i}")(x)
            x = nn.GroupNorm(num_groups=min(32, self.channels), name=f"norm_{i}")(x)
            x = jax.nn.silu(x)
        # 'same' padding (reference uses pad 0; same keeps short test
        # sequences from collapsing to zero-length scores)
        x = Conv1d(1, 4, stride=1, padding="same", name="conv_out")(x)
        if self.soft_clip_scale is not None:
            x = self.soft_clip_scale * jnp.tanh(x / self.soft_clip_scale)
        return x

    def loss(self, reals, fakes):
        real_scores = self(reals)
        fake_scores = self(fakes)
        if self.loss_type == "lsgan":
            loss_dis = jnp.mean(fake_scores ** 2) + jnp.mean((1 - real_scores) ** 2)
            loss_adv = jnp.mean((1 - fake_scores) ** 2)
        else:
            loss_dis, loss_adv = get_relativistic_losses(real_scores, fake_scores)
        return {"loss_dis": loss_dis, "loss_adv": loss_adv}


class ConvNeXtDiscriminator(nn.Module):
    loss_type: str = "relativistic"
    in_channels: int = 2
    channels: int = 128
    latent_dim: int = 1
    c_mults: tp.Tuple[int, ...] = (1, 2, 4, 8)
    strides: tp.Tuple[int, ...] = (2, 4, 8, 8)

    @nn.compact
    def __call__(self, x):
        from .convnext import ConvNeXtEncoder

        # encoder expects NCT
        return ConvNeXtEncoder(
            in_channels=self.in_channels, channels=self.channels,
            latent_dim=self.latent_dim, c_mults=self.c_mults,
            strides=self.strides, name="encoder",
        )(jnp.swapaxes(x, 1, 2))

    def loss(self, reals, fakes):
        real_scores = self(reals)
        fake_scores = self(fakes)
        if self.loss_type == "lsgan":
            loss_dis = jnp.mean(fake_scores ** 2) + jnp.mean((1 - real_scores) ** 2)
            loss_adv = jnp.mean((1 - fake_scores) ** 2)
        else:
            loss_dis, loss_adv = get_relativistic_losses(real_scores, fake_scores)
        return {"loss_dis": loss_dis, "loss_adv": loss_adv}
