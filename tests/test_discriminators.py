"""Parity tests for the W-pair-packed discriminator conv path.

The MS-STFT discriminator (reference encodec.py:37-107) runs 64-channel 2D
convs; on TPU those fill only half the 128 MXU lanes. ops/conv.py::WNConv2d
(w_packed=True) folds W-column pairs into channels — these tests pin that
rewrite to be EXACT against the plain conv path (same params), for even and
odd bin counts, forward and backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.models.discriminators import DiscriminatorSTFT
from stable_audio_tools_tpu.ops.conv import (WNConv2d, pack_w_pairs,
                                             unpack_w_pairs)


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, 8, 3).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(unpack_w_pairs(pack_w_pairs(x))),
                                  np.asarray(x))


@pytest.mark.parametrize("kh,kw,dil_h,cin,cout", [
    (3, 9, 1, 2, 8),
    (3, 9, 2, 8, 16),
    (3, 3, 1, 16, 1),
    (1, 5, 1, 3, 4),
])
def test_wnconv2d_w_packed_matches_plain(kh, kw, dil_h, cin, cout):
    rng = np.random.RandomState(1)
    B, H, W = 2, 12, 10  # W even: packing needs no edge column
    x = jnp.asarray(rng.randn(B, H, W, cin).astype(np.float32))
    pad = (((kh - 1) * dil_h) // 2, (kw - 1) // 2)

    plain = WNConv2d(cout, (kh, kw), padding=pad, dilation=(dil_h, 1))
    packed = WNConv2d(cout, (kh, kw), padding=pad, dilation=(dil_h, 1),
                      w_packed=True)
    params = plain.init(jax.random.PRNGKey(0), x)
    ref = plain.apply(params, x)
    out = unpack_w_pairs(packed.apply(params, pack_w_pairs(x)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n_fft", [128, 256])
@pytest.mark.slow
def test_discriminator_stft_packed_matches_unpacked(n_fft):
    # n_fft//2+1 bins is odd → exercises the padded-column masking
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 1, 4096).astype(np.float32))
    kw = dict(filters=8, n_fft=n_fft, hop_length=n_fft // 4, win_length=n_fft,
              filters_scale=2, max_filters=32)
    ref_mod = DiscriminatorSTFT(use_w_packed=False, **kw)
    packed_mod = DiscriminatorSTFT(use_w_packed=True, **kw)
    params = ref_mod.init(jax.random.PRNGKey(0), x)
    # identical param trees: packing is a layout change, not a reparam
    chex_tree = jax.tree_util.tree_structure(params)
    assert chex_tree == jax.tree_util.tree_structure(
        packed_mod.init(jax.random.PRNGKey(0), x))

    logits_ref, fmap_ref = ref_mod.apply(params, x)
    logits_p, fmap_p = packed_mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(logits_ref),
                               rtol=2e-4, atol=2e-4)
    assert len(fmap_p) == len(fmap_ref)
    for a, b in zip(fmap_p, fmap_ref):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

    def loss(mod):
        def f(p):
            lg, fm = mod.apply(p, x)
            return jnp.mean(lg ** 2) + sum(jnp.mean(jnp.abs(m)) for m in fm)
        return f

    g_ref = jax.grad(loss(ref_mod))(params)
    g_p = jax.grad(loss(packed_mod))(params)
    flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
    flat_p, _ = jax.tree_util.tree_flatten(g_p)
    for a, b in zip(flat_p, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# Stacked real/fake loss forwards (one batch-2B pass) match two-pass math
# ---------------------------------------------------------------------------


def _audio_pair(channels=1, t=4096):
    rng = np.random.RandomState(3)
    reals = jnp.asarray(rng.randn(2, channels, t).astype(np.float32) * 0.3)
    fakes = jnp.asarray(rng.randn(2, channels, t).astype(np.float32) * 0.3)
    return reals, fakes


@pytest.mark.slow
def test_encodec_disc_stacked_loss_matches_two_pass():
    from stable_audio_tools_tpu.models.discriminators import (
        EncodecDiscriminator, get_hinge_losses)

    disc = EncodecDiscriminator(filters=4, n_ffts=(256, 128),
                                hop_lengths=(64, 32), win_lengths=(256, 128))
    reals, fakes = _audio_pair()
    params = disc.init(jax.random.PRNGKey(0), reals)
    d, a, fm = disc.apply(params, reals, fakes, method=disc.loss)

    lt, ft = disc.apply(params, reals)
    lf, ff = disc.apply(params, fakes)
    d2 = a2 = fm2 = 0.0
    for i in range(len(lt)):
        fm2 = fm2 + sum(
            float(jnp.mean(jnp.abs(x - y))) for x, y in zip(ft[i], ff[i])
        ) / len(ft[i])
        dd, aa = get_hinge_losses(lt[i], lf[i])
        d2, a2 = d2 + float(dd), a2 + float(aa)
    n = len(lt)
    np.testing.assert_allclose(float(d), d2 / n, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(a), a2 / n, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(fm), fm2 / n, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_dac_gan_stacked_loss_matches_two_pass():
    from stable_audio_tools_tpu.models.discriminators import DACGANLoss

    disc = DACGANLoss(periods=(2, 3), rates=(1,), fft_sizes=(512,),
                      sample_rate=16000)
    reals, fakes = _audio_pair()
    params = disc.init(jax.random.PRNGKey(1), reals)
    d, a, fm = disc.apply(params, reals, fakes, method=disc.loss)

    d_real = disc.apply(params, reals)
    d_fake = disc.apply(params, fakes)
    d2 = a2 = fm2 = 0.0
    for fr, ffk in zip(d_real, d_fake):
        lr, lf = fr[-1], ffk[-1]
        d2 += float(jnp.mean((1 - lr) ** 2) + jnp.mean(lf ** 2))
        a2 += float(jnp.mean((1 - lf) ** 2))
        for x, y in zip(fr[:-1], ffk[:-1]):
            fm2 += float(jnp.mean(jnp.abs(x - y)))
    np.testing.assert_allclose(float(d), d2, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(a), a2, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(fm), fm2, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_cqt_disc_stacked_loss_matches_two_pass():
    from stable_audio_tools_tpu.models.discriminators import (
        MultiScaleSubbandCQTDiscriminator, get_hinge_losses)

    disc = MultiScaleSubbandCQTDiscriminator(
        sample_rate=16000, filters=4, hop_lengths=(256,), n_octaves=(5,),
        bins_per_octaves=(12,))
    reals, fakes = _audio_pair(t=8192)
    params = disc.init(jax.random.PRNGKey(2), reals)
    d, a, fm = disc.apply(params, reals, fakes, method=disc.loss)

    lt, ft = disc.apply(params, reals)
    lf, ff = disc.apply(params, fakes)
    d2 = a2 = fm2 = 0.0
    for i in range(len(lt)):
        dd, aa = get_hinge_losses(lt[i], lf[i])
        d2, a2 = d2 + float(dd), a2 + float(aa)
        fm2 += sum(float(jnp.mean(jnp.abs(x - y)))
                   for x, y in zip(ft[i], ff[i])) / len(ft[i])
    n = len(lt)
    np.testing.assert_allclose(float(d), d2 / n, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(a), a2 / n, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(fm), fm2 / n, rtol=1e-5, atol=1e-6)
