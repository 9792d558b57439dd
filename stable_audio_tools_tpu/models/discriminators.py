"""GAN discriminators for autoencoder training.

Capability parity with reference stable_audio_tools/models/discriminators.py
and models/encodec.py: EncodecDiscriminator (MS-STFT complex-spectrogram 2D
conv stacks, hinge/relativistic losses + feature matching, :18-58), Oobleck
MultiScaleDiscriminator/MultiPeriodDiscriminator over SharedDiscriminatorConvNet
(:67-304), DAC MPD/MSD/MRD band-split (:309-467) with DACGANLoss (:595).

All discriminators are flax modules exposing
    loss(reals, fakes) -> (dis_loss, adv_loss, feature_matching_distance)
with audio in [B, C, T]. Inside, 1-D convs run NLC and 2-D convs NHWC.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.conv import (Conv1d, WNConv1d, WNConv2d, pack_w_pairs,
                        unpack_w_pairs)
from ..ops.stft import stft_reim_conv


def get_hinge_losses(score_real, score_fake):
    gen_loss = -jnp.mean(score_fake)
    dis_loss = jnp.mean(jax.nn.relu(1 - score_real)) + jnp.mean(
        jax.nn.relu(1 + score_fake)
    )
    return dis_loss, gen_loss


def stacked_real_fake(forward, reals, fakes):
    """One batch-2B forward over [reals; fakes], split back per side.

    Exact: every discriminator op is per-sample, so stacking just doubles
    MXU/FFT occupancy vs two passes. Works for any pytree of [2B, ...]
    logits/feature-map leaves."""
    B = reals.shape[0]
    both = forward(jnp.concatenate([reals, fakes], axis=0))
    real = jax.tree_util.tree_map(lambda a: a[:B], both)
    fake = jax.tree_util.tree_map(lambda a: a[B:], both)
    return real, fake


def get_relativistic_losses(score_real, score_fake):
    """RpGAN: relativistic pairing of real/fake scores (models/arc.py:6-11)."""
    diff = score_real - score_fake
    dis_loss = jnp.mean(jax.nn.softplus(-diff))
    gen_loss = jnp.mean(jax.nn.softplus(diff))
    return dis_loss, gen_loss


class DiscriminatorSTFT(nn.Module):
    """EnCodec STFT sub-discriminator (encodec.py:37-107)."""

    filters: int
    in_channels: int = 1
    out_channels: int = 1
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    max_filters: int = 1024
    filters_scale: int = 1
    kernel_size: tp.Tuple[int, int] = (3, 9)
    dilations: tp.Tuple[int, ...] = (1, 2, 4)
    stride: tp.Tuple[int, int] = (1, 1)
    normalized: bool = True
    compute_dtype: str = "float32"
    use_w_packed: bool = True  # lane-packed conv stack (exact; tests compare)

    @nn.compact
    def __call__(self, x, packed_fmaps: bool = False):
        """x: [B, C, T] → (logits [B, t, w, 1], fmaps).

        packed_fmaps=True returns fmaps in the packed [B,t,W/2,2C] layout
        instead of unpacking each one. The pad column is kept exactly zero,
        so loss reductions stay exact by dividing sums by the true valid
        count (see EncodecDiscriminator.loss); skipping the per-fmap
        unpack+slice copies saved ~20 ms/pair of the SA-2.0 GAN step."""
        B, C, T = x.shape
        flat = x.reshape(B * C, T)
        # conv-DFT STFT (one strided MXU conv, window + 1/sqrt(sum w²)
        # normalization baked into the kernel) instead of unfold+rfft —
        # exact to ~1e-6 (tests/test_stft.py) and kills the fft op soup
        # that dominated the disc phase of the GAN-step trace
        z = stft_reim_conv(flat, self.n_fft, self.hop_length,
                           self.win_length, center=False,
                           normalized=self.normalized)
        bins = self.n_fft // 2 + 1
        # [B*C, frames, (re bins | im bins)] → NHWC [B, t, w, 2C] with the
        # reference channel order [re_c0..re_cC, im_c0..im_cC]
        z = z.reshape(B, C, z.shape[-2], 2, bins)
        z = z.transpose(0, 2, 4, 3, 1).reshape(B, z.shape[2], bins, 2 * C)
        # conv stack in the configured compute dtype: f32 convs bypass the
        # MXU on v5e (docs/performance.md); STFT itself stays f32
        z = z.astype(jnp.dtype(self.compute_dtype))

        def pad2d(ks, dil=(1, 1)):
            return (((ks[0] - 1) * dil[0]) // 2, ((ks[1] - 1) * dil[1]) // 2)

        # run the whole stack in the W-pair-packed layout so the 64-channel
        # convs fill all 128 MXU lanes (ops/conv.py::pack_w_pairs; ~1.8×).
        # Params and returned fmaps/logits keep the reference layout exactly.
        # Packing requires stride 1 and odd kernel widths (even kw + same-pad
        # would change the output width) — fall back to the plain path else.
        packed = (self.use_w_packed and self.stride == (1, 1)
                  and self.kernel_size[1] % 2 == 1
                  and self.kernel_size[0] % 2 == 1)
        w_valid = z.shape[2]
        if packed:
            if w_valid % 2:
                # mask_edge below keeps this padded column zero into every
                # layer, exactly like the reference's out-of-range zero pad
                z = jnp.pad(z, ((0, 0), (0, 0), (0, 1), (0, 0)))
            z = pack_w_pairs(z)

        def finish(z):
            if not packed:
                return z
            return unpack_w_pairs(z)[:, :, :w_valid]

        def keep(z):
            return z if (packed and packed_fmaps) else finish(z)

        def mask_edge(z):
            if not packed or w_valid % 2 == 0:
                return z
            # static multiplicative mask (zeros only the pad half of the last
            # packed column) — fuses into the activation pass, unlike the
            # .at[].set dynamic-update-slice it replaces
            W2, C2 = z.shape[2], z.shape[-1] // 2
            m = np.ones((W2, 2 * C2), np.float32)
            m[-1, C2:] = 0.0
            return z * jnp.asarray(m, z.dtype)

        fmap = []
        z = WNConv2d(self.filters, self.kernel_size,
                     padding=pad2d(self.kernel_size), w_packed=packed,
                     name="conv_in")(z)
        z = mask_edge(jax.nn.leaky_relu(z, 0.2))
        fmap.append(keep(z))
        in_chs = min(self.filters_scale * self.filters, self.max_filters)
        for i, dilation in enumerate(self.dilations):
            out_chs = min((self.filters_scale ** (i + 1)) * self.filters,
                          self.max_filters)
            z = WNConv2d(
                out_chs, self.kernel_size, stride=self.stride,
                dilation=(dilation, 1),
                padding=pad2d(self.kernel_size, (dilation, 1)),
                w_packed=packed,
                name=f"conv_{i}",
            )(z)
            z = mask_edge(jax.nn.leaky_relu(z, 0.2))
            fmap.append(keep(z))
            in_chs = out_chs
        out_chs = min(
            (self.filters_scale ** (len(self.dilations) + 1)) * self.filters,
            self.max_filters,
        )
        ks2 = (self.kernel_size[0], self.kernel_size[0])
        z = WNConv2d(out_chs, ks2, padding=pad2d(ks2), w_packed=packed,
                     name="conv_pre_post")(z)
        z = mask_edge(jax.nn.leaky_relu(z, 0.2))
        fmap.append(keep(z))
        z = WNConv2d(self.out_channels, ks2, padding=pad2d(ks2),
                     w_packed=packed, name="conv_post")(z)
        return finish(z).astype(jnp.float32), fmap


class MultiScaleSTFTDiscriminator(nn.Module):
    filters: int
    in_channels: int = 1
    out_channels: int = 1
    n_ffts: tp.Tuple[int, ...] = (1024, 2048, 512)
    hop_lengths: tp.Tuple[int, ...] = (256, 512, 128)
    win_lengths: tp.Tuple[int, ...] = (1024, 2048, 512)
    compute_dtype: str = "float32"
    use_w_packed: bool = True

    @nn.compact
    def __call__(self, x, packed_fmaps: bool = False):
        logits, fmaps = [], []
        for i in range(len(self.n_ffts)):
            logit, fmap = DiscriminatorSTFT(
                filters=self.filters, in_channels=self.in_channels,
                out_channels=self.out_channels, n_fft=self.n_ffts[i],
                hop_length=self.hop_lengths[i], win_length=self.win_lengths[i],
                compute_dtype=self.compute_dtype,
                use_w_packed=self.use_w_packed,
                name=f"disc_{i}",
            )(x, packed_fmaps=packed_fmaps)
            logits.append(logit)
            fmaps.append(fmap)
        return logits, fmaps


class EncodecDiscriminator(nn.Module):
    """MS-STFT discriminator + hinge/rpgan losses (discriminators.py:18-58)."""

    filters: int = 32
    in_channels: int = 1
    out_channels: int = 1
    n_ffts: tp.Tuple[int, ...] = (2048, 1024, 512, 256, 128)
    hop_lengths: tp.Tuple[int, ...] = (512, 256, 128, 64, 32)
    win_lengths: tp.Tuple[int, ...] = (2048, 1024, 512, 256, 128)
    normalize_losses: bool = False
    loss_type: str = "hinge"
    compute_dtype: str = "float32"
    use_w_packed: bool = True

    def setup(self):
        self.discriminators = MultiScaleSTFTDiscriminator(
            filters=self.filters, in_channels=self.in_channels,
            out_channels=self.out_channels, n_ffts=self.n_ffts,
            hop_lengths=self.hop_lengths, win_lengths=self.win_lengths,
            compute_dtype=self.compute_dtype,
            use_w_packed=self.use_w_packed,
        )

    def __call__(self, x):
        return self.discriminators(x)

    def loss(self, reals, fakes):
        # fmaps stay in the packed layout (zero pad column); reductions below
        # divide by the true valid element count, so the numbers are exact
        fwd = lambda y: self.discriminators(y, packed_fmaps=True)
        (logits_true, feature_true), (logits_fake, feature_fake) = (
            stacked_real_fake(fwd, reals, fakes)
        )

        # feature maps may be bf16 (compute_dtype): reduce in f32.
        # `frac` = valid fraction of a (possibly pad-column-packed) fmap;
        # the pad column is zero in BOTH real and fake so |a-b| sums are
        # unaffected and only the mean's divisor needs the correction.
        def fm(a, b, frac):
            n = a.size * frac
            d = jnp.sum(jnp.abs(a - b).astype(jnp.float32)) / n
            if self.normalize_losses:
                d = d / (jnp.sum(jnp.abs(a).astype(jnp.float32)) / n + 1e-3)
            return d

        dis_loss = 0.0
        adv_loss = 0.0
        feature_matching = 0.0
        for i, (scale_true, scale_fake) in enumerate(zip(feature_true, feature_fake)):
            bins = self.n_ffts[i] // 2 + 1
            feature_matching = feature_matching + sum(
                fm(a, b, bins / (2 * a.shape[2]) if a.shape[2] != bins else 1.0)
                for a, b in zip(scale_true, scale_fake)
            ) / len(scale_true)
            if self.loss_type == "hinge":
                d, a = get_hinge_losses(logits_true[i], logits_fake[i])
            else:
                d, a = get_relativistic_losses(logits_true[i], logits_fake[i])
            dis_loss = dis_loss + d
            adv_loss = adv_loss + a
        n = len(logits_true)
        return dis_loss / n, adv_loss / n, feature_matching / n


class SharedDiscriminatorConvNet(nn.Module):
    """Oobleck conv score head, 1d or 2d (discriminators.py:67-120)."""

    conv_dim: int = 1  # 1 → conv1d over [B, T, C]; 2 → conv2d over [B, T/n, n, C]
    out_size: int = 1
    capacity: int = 32
    n_layers: int = 4
    kernel_size: int = 15
    stride: int = 4
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        """x NLC (1d) or NHWC (2d). Returns (score [B], features)."""
        channels = [self.capacity * 2 ** i for i in range(self.n_layers)]
        features = []
        h = x.astype(jnp.dtype(self.compute_dtype))
        for i in range(self.n_layers):
            if self.conv_dim == 1:
                h = WNConv1d(
                    channels[i], kernel_size=self.kernel_size, stride=self.stride,
                    padding=self.kernel_size // 2, name=f"conv_{i}",
                )(h)
            else:
                h = WNConv2d(
                    channels[i], (self.kernel_size, 1), stride=(self.stride, 1),
                    padding=(self.kernel_size // 2, 0), name=f"conv_{i}",
                )(h)
            features.append(h)
            h = jax.nn.silu(h)
        if self.conv_dim == 1:
            h = Conv1d(self.out_size, 1, name="conv_out")(h)
        else:
            h = WNConv2d(self.out_size, (1, 1), name="conv_out")(h)
        features.append(h)
        score = jnp.mean(h.reshape(h.shape[0], -1).astype(jnp.float32), axis=-1)
        return score, features


class OobleckDiscriminator(nn.Module):
    """MultiScale (3 scales) + MultiPeriod ([2,3,5,7,11]) hinge discriminator."""

    in_channels: int = 1
    n_scales: int = 3
    periods: tp.Tuple[int, ...] = (2, 3, 5, 7, 11)
    compute_dtype: str = "float32"

    def setup(self):
        self.scale_discs = [
            SharedDiscriminatorConvNet(conv_dim=1, name=f"msd_{i}",
                                       compute_dtype=self.compute_dtype)
            for i in range(self.n_scales)
        ]
        self.period_discs = [
            SharedDiscriminatorConvNet(conv_dim=2, name=f"mpd_{i}",
                                       compute_dtype=self.compute_dtype)
            for i in range(len(self.periods))
        ]

    def _forward_all(self, x):
        """x: [B, C, T] → (total score [B], features list)."""
        score = 0.0
        features = []
        h = jnp.swapaxes(x, 1, 2)  # NLC
        for disc in self.scale_discs:
            s, f = disc(h)
            score = score + s
            features.extend(f)
            # avg_pool1d stride 2
            h = jax.lax.reduce_window(
                h, 0.0, jax.lax.add, (1, 2, 1), (1, 2, 1), "VALID"
            ) / 2.0
        B, C, T = x.shape
        for disc, n in zip(self.period_discs, self.periods):
            pad = (n - (T % n)) % n
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
            folded = xp.reshape(B, C, -1, n).transpose(0, 2, 3, 1)  # NHWC
            s, f = disc(folded)
            score = score + s
            features.extend(f)
        return score, features

    def __call__(self, x):
        return self._forward_all(x)

    def loss(self, reals, fakes):
        batch = jnp.concatenate([reals, fakes], axis=0)
        score, features = self._forward_all(batch)
        B = reals.shape[0]
        score_real, score_fake = score[:B], score[B:]
        dis_loss, gen_loss = get_hinge_losses(score_real, score_fake)
        fm = 0.0
        for f in features:
            fm = fm + jnp.mean(jnp.abs(f[:B] - f[B:]).astype(jnp.float32))
        fm = fm / len(features)
        return dis_loss, gen_loss, fm


# ---------------------------------------------------------------------------
# DAC discriminators (discriminators.py:309-467)
# ---------------------------------------------------------------------------


class DACMPD(nn.Module):
    period: int
    channels: int = 1
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        """x: [B, C, T] → (fmap list, logits)."""
        x = x.astype(jnp.dtype(self.compute_dtype))
        B, C, T = x.shape
        pad = (self.period - T % self.period) % self.period
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad)), mode="reflect" if pad < T else "constant")
        h = xp.reshape(B, C, -1, self.period).transpose(0, 2, 3, 1)  # NHWC
        fmap = []
        chs = [32, 128, 512, 1024]
        for i, ch in enumerate(chs):
            h = WNConv2d(ch, (5, 1), stride=(3, 1), padding=(2, 0), name=f"conv_{i}")(h)
            h = jax.nn.leaky_relu(h, 0.1)
            fmap.append(h)
        h = WNConv2d(1024, (5, 1), padding=(2, 0), name="conv_4")(h)
        h = jax.nn.leaky_relu(h, 0.1)
        fmap.append(h)
        h = WNConv2d(1, (3, 1), padding=(1, 0), name="conv_post")(h)
        fmap.append(h)
        return fmap


class DACMSD(nn.Module):
    rate: int = 1
    sample_rate: int = 44100
    channels: int = 1
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        h = jnp.swapaxes(x, 1, 2).astype(jnp.dtype(self.compute_dtype))  # NLC
        if self.rate > 1:
            h = h[:, :: self.rate, :]
        fmap = []
        convs = [
            (16, 15, 1, 1), (64, 41, 4, 4), (256, 41, 4, 16), (1024, 41, 4, 64),
            (1024, 41, 4, 256), (1024, 5, 1, 1),
        ]
        for i, (ch, k, s, g) in enumerate(convs):
            h = WNConv1d(ch, kernel_size=k, stride=s, padding=k // 2,
                         name=f"conv_{i}")(h)
            h = jax.nn.leaky_relu(h, 0.1)
            fmap.append(h)
        h = WNConv1d(1, kernel_size=3, padding=1, name="conv_post")(h)
        fmap.append(h)
        return fmap


class DACMRD(nn.Module):
    """Band-split complex-STFT discriminator (DAC MRD)."""

    n_fft: int = 2048
    hop_factor: float = 0.25
    sample_rate: int = 44100
    bands: tp.Tuple[tp.Tuple[float, float], ...] = (
        (0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0),
    )
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        B, C, T = x.shape
        hop = int(self.n_fft * self.hop_factor)
        flat = x.reshape(B * C, T)
        z = stft_reim_conv(flat, self.n_fft, hop, self.n_fft)
        bins = self.n_fft // 2 + 1
        # [B*C, t, (re bins | im bins)] → [B, t, f, 2C], order [re×C, im×C]
        zr = z.reshape(B, C, z.shape[-2], 2, bins)
        zr = zr.transpose(0, 2, 4, 3, 1).reshape(B, zr.shape[2], bins, 2 * C)
        zr = zr.astype(jnp.dtype(self.compute_dtype))
        n_bins = zr.shape[2]
        fmap = []
        band_outs = []
        for bi, (lo, hi) in enumerate(self.bands):
            band = zr[:, :, int(lo * n_bins): int(hi * n_bins), :]
            h = band
            for i, ch in enumerate([32, 32, 32, 32, 32]):
                ks = (3, 9) if i == 0 else (3, 3)
                st = (1, 1) if i in (0, 4) else (1, 2)
                h = WNConv2d(ch, ks, stride=st,
                             padding=((ks[0] - 1) // 2, (ks[1] - 1) // 2),
                             name=f"band{bi}_conv_{i}")(h)
                h = jax.nn.leaky_relu(h, 0.1)
                fmap.append(h)
            band_outs.append(h)
        h = jnp.concatenate(band_outs, axis=2)
        h = WNConv2d(1, (3, 3), padding=(1, 1), name="conv_post")(h)
        fmap.append(h)
        return fmap


class DACGANLoss(nn.Module):
    """DAC GAN loss bundle: MPD + MSD + MRD (discriminators.py:595-658)."""

    periods: tp.Tuple[int, ...] = (2, 3, 5, 7, 11)
    rates: tp.Tuple[int, ...] = ()
    fft_sizes: tp.Tuple[int, ...] = (2048, 1024, 512)
    sample_rate: int = 44100
    channels: int = 1
    compute_dtype: str = "float32"

    def setup(self):
        self.mpds = [DACMPD(p, channels=self.channels, name=f"mpd_{p}",
                            compute_dtype=self.compute_dtype)
                     for p in self.periods]
        self.msds = [DACMSD(r, sample_rate=self.sample_rate, channels=self.channels,
                            name=f"msd_{r}", compute_dtype=self.compute_dtype)
                     for r in self.rates]
        self.mrds = [DACMRD(f, sample_rate=self.sample_rate, name=f"mrd_{f}",
                            compute_dtype=self.compute_dtype)
                     for f in self.fft_sizes]

    def _all(self, x):
        return (
            [d(x) for d in self.mpds]
            + [d(x) for d in self.msds]
            + [d(x) for d in self.mrds]
        )

    def __call__(self, x):
        return self._all(x)

    def loss(self, reals, fakes):
        d_real, d_fake = stacked_real_fake(self._all, reals, fakes)
        dis_loss = 0.0
        adv_loss = 0.0
        fm = 0.0
        for fr, ff in zip(d_real, d_fake):
            lr = fr[-1].astype(jnp.float32)
            lf = ff[-1].astype(jnp.float32)
            dis_loss = dis_loss + jnp.mean((1 - lr) ** 2) + jnp.mean(lf ** 2)
            adv_loss = adv_loss + jnp.mean((1 - lf) ** 2)
            for a, b in zip(fr[:-1], ff[:-1]):
                fm = fm + jnp.mean(jnp.abs(a - b).astype(jnp.float32))
        return dis_loss, adv_loss, fm


class MultiScaleSubbandCQTDiscriminator(nn.Module):
    """BigVGAN-v2-style CQT discriminator (reference discriminators.py:469-593).

    Uses a TRUE complex constant-Q transform (ops/cqt.py, CQT2010-style
    octave decimation — the same algorithm as the reference's nnAudio
    CQT2010v2 dependency): per scale, the complex CQT's real/imag parts feed
    the 2D conv stack as channels, matching BigVGAN's DiscriminatorCQT input
    surface.
    """

    sample_rate: int = 44100
    channels: int = 1
    filters: int = 32
    hop_lengths: tp.Tuple[int, ...] = (512, 256, 256)
    n_octaves: tp.Tuple[int, ...] = (9, 9, 9)
    bins_per_octaves: tp.Tuple[int, ...] = (24, 36, 48)
    fmin: float = 32.7
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        from ..ops.cqt import cqt as _cqt

        logits, fmaps = [], []
        B, C, T = x.shape
        for si, hop in enumerate(self.hop_lengths):
            n_oct = self.n_octaves[si]
            # per-octave hops must stay integral (CQT2010 constraint), and
            # the top octave must stay below Nyquist (nnAudio raises there;
            # we reduce the range with a warning)
            while (hop % (2 ** (n_oct - 1)) != 0
                   or self.fmin * 2 ** n_oct >= self.sample_rate / 2):
                n_oct -= 1
            if n_oct != self.n_octaves[si]:
                import logging

                logging.getLogger(__name__).warning(
                    "CQT discriminator scale %d: hop %d only supports %d "
                    "octaves (requested %d) — use a hop divisible by "
                    "2**(n_octaves-1) to keep the full range", si, hop,
                    n_oct, self.n_octaves[si],
                )
            flat = x.reshape(B * C, T)
            re, im = _cqt(flat, self.sample_rate, hop, fmin=self.fmin,
                          n_octaves=n_oct,
                          bins_per_octave=self.bins_per_octaves[si],
                          complex_output=False)
            frames, bins = re.shape[-2], re.shape[-1]
            h = jnp.stack([re, im], axis=1)
            h = h.reshape(B, C * 2, frames, bins).transpose(0, 2, 3, 1)  # NHWC
            h = h.astype(jnp.dtype(self.compute_dtype))
            fmap = []
            for i in range(3):
                h = WNConv2d(self.filters, (3, 9), stride=(1, 2 if i else 1),
                             padding=(1, 4), name=f"scale{si}_conv_{i}")(h)
                h = jax.nn.leaky_relu(h, 0.1)
                fmap.append(h)
            h = WNConv2d(1, (3, 3), padding=(1, 1), name=f"scale{si}_post")(h)
            fmap.append(h)
            logits.append(h.astype(jnp.float32))
            fmaps.append(fmap)
        return logits, fmaps

    def loss(self, reals, fakes):
        (l_true, f_true), (l_fake, f_fake) = stacked_real_fake(
            self, reals, fakes
        )
        dis_loss = 0.0
        adv_loss = 0.0
        fm = 0.0
        for i in range(len(l_true)):
            d, a = get_hinge_losses(l_true[i], l_fake[i])
            dis_loss = dis_loss + d
            adv_loss = adv_loss + a
            fm = fm + sum(jnp.mean(jnp.abs(x - y).astype(jnp.float32))
                          for x, y in zip(f_true[i], f_fake[i])) / len(f_true[i])
        n = len(l_true)
        return dis_loss / n, adv_loss / n, fm / n


class BigVGANDiscriminator(nn.Module):
    """MPD + multi-scale CQT bundle (reference discriminators.py:660-683)."""

    channels: int = 1
    sample_rate: int = 44100
    periods: tp.Tuple[int, ...] = (2, 3, 5, 7, 11)
    compute_dtype: str = "float32"

    def setup(self):
        self.mpd = OobleckDiscriminator(
            in_channels=self.channels, n_scales=0, periods=self.periods,
            compute_dtype=self.compute_dtype,
        )
        self.cqt = MultiScaleSubbandCQTDiscriminator(
            sample_rate=self.sample_rate, channels=self.channels,
            compute_dtype=self.compute_dtype,
        )

    def loss(self, reals, fakes):
        d1, a1, f1 = self.mpd.loss(reals, fakes)
        d2, a2, f2 = self.cqt.loss(reals, fakes)
        return d1 + d2, a1 + a2, f1 + f2


def create_discriminator_from_config(discriminator_config: tp.Dict[str, tp.Any]):
    d_type = discriminator_config.get("type", None)
    cfg = discriminator_config.get("config", {})
    cfg = {k: tuple(v) if isinstance(v, list) else v for k, v in cfg.items()}
    if d_type == "encodec":
        from .factory import _filter_kwargs

        return EncodecDiscriminator(**_filter_kwargs(EncodecDiscriminator, cfg))
    elif d_type == "oobleck":
        from .factory import _filter_kwargs

        return OobleckDiscriminator(**_filter_kwargs(OobleckDiscriminator, cfg))
    elif d_type == "dac":
        from .factory import _filter_kwargs

        return DACGANLoss(**_filter_kwargs(DACGANLoss, cfg))
    else:
        raise ValueError(f"Unknown discriminator type: {d_type}")
