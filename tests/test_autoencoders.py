"""Autoencoder + bottleneck tests: factory configs, roundtrip shapes, chunked codec."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.models.factory import (
    create_bottleneck_from_config,
    create_model_from_config,
)

TINY_VAE_CONFIG = {
    "model_type": "autoencoder",
    "sample_rate": 16000,
    "sample_size": 4096,
    "audio_channels": 2,
    "model": {
        "encoder": {
            "type": "oobleck",
            "config": {
                "in_channels": 2,
                "channels": 16,
                "c_mults": [1, 2],
                "strides": [2, 4],
                "latent_dim": 8,  # 2x latent for VAE mean/scale
                "use_snake": True,
            },
        },
        "decoder": {
            "type": "oobleck",
            "config": {
                "out_channels": 2,
                "channels": 16,
                "c_mults": [1, 2],
                "strides": [2, 4],
                "latent_dim": 4,
                "use_snake": True,
                "final_tanh": False,
            },
        },
        "bottleneck": {"type": "vae"},
        "latent_dim": 4,
        "downsampling_ratio": 8,
        "io_channels": 2,
    },
}


@pytest.mark.slow
def test_oobleck_vae_roundtrip():
    model = create_model_from_config(TINY_VAE_CONFIG)
    audio = jnp.asarray(np.random.RandomState(0).randn(2, 2, 256).astype(np.float32)) * 0.1
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    variables = model.init(rngs, audio)
    recon, info = model.apply(variables, audio, rngs={"sample": jax.random.PRNGKey(2)})
    assert recon.shape == audio.shape
    assert "kl" in info
    assert np.isfinite(float(info["kl"]))

    latents = model.apply(
        variables, audio, rngs={"sample": jax.random.PRNGKey(3)},
        method=model.encode,
    )
    assert latents.shape == (2, 4, 32)  # 256 / 8 = 32
    decoded = model.apply(variables, latents, method=model.decode)
    assert decoded.shape == (2, 2, 256)


@pytest.mark.slow
def test_chunked_encode_decode_matches_unchunked_interior():
    model = create_model_from_config(TINY_VAE_CONFIG)
    audio = jnp.asarray(np.random.RandomState(1).randn(1, 2, 2048).astype(np.float32)) * 0.1
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    variables = model.init(rngs, audio)

    # skip_bottleneck so encode is deterministic
    full = model.apply(
        variables, audio, method=model.encode, skip_bottleneck=True
    )
    chunked = model.apply(
        variables, audio, method=model.encode_audio,
        chunked=True, overlap=16, chunk_size=64, skip_bottleneck=True,
    )
    assert chunked.shape == full.shape
    # interiors should agree closely; edges of chunks may differ slightly
    diff = np.abs(np.asarray(full) - np.asarray(chunked))
    assert np.median(diff) < 1e-4

    latents = full[:, :4, :]  # mean half: valid 4-dim decoder input
    full_dec = model.apply(variables, latents, method=model.decode)
    chunked_dec = model.apply(
        variables, latents, method=model.decode_audio,
        chunked=True, overlap=16, chunk_size=64,
    )
    assert chunked_dec.shape == full_dec.shape
    dd = np.abs(np.asarray(full_dec) - np.asarray(chunked_dec))
    assert np.median(dd) < 1e-3


BOTTLENECK_CONFIGS = [
    ({"type": "tanh"}, 4, 4, False),
    ({"type": "vae"}, 8, 4, False),
    ({"type": "l2_norm"}, 4, 4, False),
    ({"type": "wasserstein", "config": {"use_tanh": True}}, 4, 4, False),
    ({"type": "rvq", "config": {"dim": 4, "codebook_size": 32, "num_quantizers": 2}}, 4, 4, True),
    ({"type": "rvq_vae", "config": {"dim": 4, "codebook_size": 32, "num_quantizers": 2}}, 8, 4, True),
    ({"type": "dac_rvq", "config": {"input_dim": 4, "n_codebooks": 2, "codebook_size": 32, "codebook_dim": 4}}, 4, 4, True),
    ({"type": "dac_rvq_vae", "config": {"input_dim": 4, "n_codebooks": 2, "codebook_size": 32, "codebook_dim": 4}}, 8, 4, True),
    ({"type": "fsq", "config": {"levels": [5, 5, 5, 5]}}, 4, 4, True),
    ({"type": "dithered_fsq", "config": {"dim": 4, "levels": 5}}, 4, 4, True),
]


@pytest.mark.parametrize("cfg,in_dim,out_dim,discrete", BOTTLENECK_CONFIGS)
def test_bottleneck_encode_decode(cfg, in_dim, out_dim, discrete):
    b = create_bottleneck_from_config(cfg)
    assert b.is_discrete == discrete
    x = jnp.asarray(np.random.RandomState(2).randn(2, 16, in_dim).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    variables = b.init(rngs, x, return_info=True, train=True)

    mutable = ["quantizer_state"] if "quantizer_state" in variables else False
    result = b.apply(
        variables, x, return_info=True, train=True,
        rngs={"sample": jax.random.PRNGKey(2)},
        mutable=mutable,
        method=b.encode,
    )
    if mutable:
        (z, info), _ = result
    else:
        z, info = result
    assert z.shape == (2, 16, out_dim)
    assert np.all(np.isfinite(np.asarray(z)))

    dec = b.apply(
        variables, z, rngs={"sample": jax.random.PRNGKey(3)}, method=b.decode
    )
    assert dec.shape[0:2] == (2, 16)

    if discrete:
        tokens_id = b.tokens_id
        assert tokens_id in info
        tokens = info[tokens_id]
        if tokens_id == "quantizer_indices" and cfg["type"] == "fsq":
            pass  # [B, Q, T] layout
        recon = b.apply(
            variables, tokens,
            rngs={"sample": jax.random.PRNGKey(4)},
            method=b.decode_tokens,
        )
        assert recon.shape[0] == 2


def test_fsq_roundtrip_exact():
    """FSQ decode_tokens(indices) must reproduce the quantized codes."""
    b = create_bottleneck_from_config({"type": "fsq", "config": {"levels": [8, 8, 8, 8]}})
    x = jnp.asarray(np.random.RandomState(3).randn(1, 12, 4).astype(np.float32))
    variables = b.init({"params": jax.random.PRNGKey(0)}, x, return_info=True)
    z, info = b.apply(variables, x, return_info=True, method=b.encode)
    recon = b.apply(variables, info["quantizer_indices"], method=b.decode_tokens)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(z), rtol=1e-5, atol=1e-6)


def test_rvq_ema_state_updates():
    from stable_audio_tools_tpu.models.bottleneck import ResidualVQ

    q = ResidualVQ(dim=4, codebook_size=16, num_quantizers=2)
    x = jnp.asarray(np.random.RandomState(4).randn(8, 32, 4).astype(np.float32))
    variables = q.init(jax.random.PRNGKey(0), x, train=False)
    (out, idx, loss), updates = q.apply(
        variables, x, train=True, mutable=["quantizer_state"]
    )
    before = np.asarray(variables["quantizer_state"]["codebooks"])
    after = np.asarray(updates["quantizer_state"]["codebooks"])
    assert not np.allclose(before, after), "EMA codebooks should move during training"
    assert out.shape == x.shape
    assert idx.shape == (8, 32, 2)


def test_rvq_kmeans_init():
    """First train step k-means-inits codebooks from the batch; flag flips once."""
    from stable_audio_tools_tpu.models.bottleneck import ResidualVQ, _kmeans

    q = ResidualVQ(dim=4, codebook_size=8, num_quantizers=2, kmeans_init=True,
                   kmeans_iters=20)
    x = jnp.asarray(np.random.RandomState(7).randn(4, 64, 4).astype(np.float32))
    variables = q.init(jax.random.PRNGKey(0), x, train=False)
    assert not bool(variables["quantizer_state"]["initted"])

    (out, idx, loss), updates = q.apply(
        variables, x, train=True, mutable=["quantizer_state"]
    )
    assert bool(updates["quantizer_state"]["initted"])
    # stage-0 codebook should be ~the k-means centers of the batch (one EMA step in)
    centers = np.asarray(_kmeans(x.reshape(-1, 4), 8, 20))
    cb0 = np.asarray(updates["quantizer_state"]["codebooks"][0])
    d = np.linalg.norm(cb0[:, None] - centers[None], axis=-1).min(axis=1)
    assert d.max() < 0.5, f"codebook far from k-means centers: {d.max()}"

    # second step must NOT re-init: codebooks only move by the small EMA amount
    variables2 = {"quantizer_state": updates["quantizer_state"]}
    (_, _, _), updates2 = q.apply(
        variables2, x, train=True, mutable=["quantizer_state"]
    )
    drift = np.abs(
        np.asarray(updates2["quantizer_state"]["codebooks"]) -
        np.asarray(updates["quantizer_state"]["codebooks"])
    ).max()
    assert drift < 0.5

    # eval path never mutates
    out_eval, idx_eval, _ = q.apply(variables2, x, train=False)
    assert out_eval.shape == x.shape


@pytest.mark.slow
def test_dac_seanet_encoders():
    from stable_audio_tools_tpu.models.dac import DACDecoder, DACEncoder
    from stable_audio_tools_tpu.models.seanet import SEANetDecoder, SEANetEncoder

    x = jnp.zeros((1, 512, 1))
    enc = DACEncoder(d_model=16, strides=(2, 4), d_latent=8)
    v = enc.init(jax.random.PRNGKey(0), x)
    z = enc.apply(v, x)
    assert z.shape == (1, 64, 8)

    dec = DACDecoder(input_channel=8, channels=32, rates=(4, 2), d_out=1)
    vd = dec.init(jax.random.PRNGKey(0), z)
    y = dec.apply(vd, z)
    assert y.shape == (1, 512, 1)

    senc = SEANetEncoder(channels=1, dimension=8, n_filters=4, ratios=(4, 2), lstm=1)
    vs = senc.init(jax.random.PRNGKey(0), x)
    zs = senc.apply(vs, x)
    assert zs.shape == (1, 64, 8)

    sdec = SEANetDecoder(channels=1, dimension=8, n_filters=4, ratios=(4, 2), lstm=1)
    vsd = sdec.init(jax.random.PRNGKey(0), zs)
    ys = sdec.apply(vsd, zs)
    assert ys.shape == (1, 512, 1)


def test_rvq_dead_code_revival():
    """Codes with EMA usage below threshold are re-seeded from the batch."""
    from stable_audio_tools_tpu.models.bottleneck import ResidualVQ

    q = ResidualVQ(dim=4, codebook_size=16, num_quantizers=1, decay=0.5,
                   threshold_ema_dead_code=2.0, kmeans_init=False)
    # batch that only ever hits a few codes → most codes decay toward dead
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 4).astype(np.float32))
    variables = q.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    qs = variables["quantizer_state"]
    for step in range(5):
        (_, _, _), updates = q.apply(
            {"quantizer_state": qs}, x, train=True,
            rngs={"sample": jax.random.PRNGKey(step)},
            mutable=["quantizer_state"],
        )
        qs = updates["quantizer_state"]
    counts = np.asarray(qs["ema_counts"][0])
    # revival keeps every code's EMA count at >= threshold
    assert counts.min() >= 2.0 - 1e-5
    # revived codes sit near actual batch vectors (finite, reasonable range)
    cb = np.asarray(qs["codebooks"][0])
    assert np.isfinite(cb).all() and np.abs(cb).max() < 10


def test_quantize_on_decode_single_pass_matches_double():
    """decode_quantized(encode info["z"]) must equal the decode() path that
    re-runs the quantizer (same deterministic quantizer, same input) — the
    trainer uses the single-pass route to avoid quantizing twice per step."""
    cfg = {"type": "dac_rvq", "config": {
        "input_dim": 4, "n_codebooks": 2, "codebook_size": 32,
        "codebook_dim": 4, "quantize_on_decode": True}}
    b = create_bottleneck_from_config(cfg)
    assert b.quantize_on_decode
    x = jnp.asarray(np.random.RandomState(5).randn(2, 16, 4).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    variables = b.init(rngs, x, return_info=True, train=True)

    z, info = b.apply(variables, x, return_info=True, train=True,
                      rngs={"sample": jax.random.PRNGKey(2)}, method=b.encode)
    # with quantize_on_decode, encode passes the latents through...
    np.testing.assert_allclose(np.asarray(z), np.asarray(x))
    assert "z" in info and "codes" in info

    dec_double = b.apply(variables, z,
                         rngs={"sample": jax.random.PRNGKey(3)}, method=b.decode)
    dec_single = b.apply(variables, info["z"],
                         rngs={"sample": jax.random.PRNGKey(3)},
                         method=b.decode_quantized)
    np.testing.assert_allclose(np.asarray(dec_double), np.asarray(dec_single),
                               rtol=1e-6, atol=1e-6)
