"""ModelHandle ergonomic API tests."""

import numpy as np
import pytest

from stable_audio_tools_tpu.models.handle import ModelHandle

pytestmark = pytest.mark.slow  # heavyweight golden/integration tier

AE_CFG = {
    "model_type": "autoencoder",
    "sample_size": 2048,
    "sample_rate": 16000,
    "audio_channels": 1,
    "model": {
        "encoder": {"type": "oobleck", "config": {
            "in_channels": 1, "channels": 8, "c_mults": [1, 2], "strides": [2, 4],
            "latent_dim": 8, "use_snake": True}},
        "decoder": {"type": "oobleck", "config": {
            "out_channels": 1, "channels": 8, "c_mults": [1, 2], "strides": [2, 4],
            "latent_dim": 4, "use_snake": True}},
        "bottleneck": {"type": "vae"},
        "latent_dim": 4, "downsampling_ratio": 8, "io_channels": 1,
    },
}

DIFF_CFG = {
    "model_type": "diffusion_cond",
    "sample_size": 256,
    "sample_rate": 16000,
    "audio_channels": 2,
    "model": {
        "conditioning": {"configs": [
            {"id": "seconds_total", "type": "number",
             "config": {"min_val": 0, "max_val": 512}}], "cond_dim": 16},
        "diffusion": {"cross_attention_cond_ids": ["seconds_total"],
                      "type": "dit",
                      "config": {"io_channels": 2, "embed_dim": 16, "depth": 1,
                                 "num_heads": 2, "cond_token_dim": 16,
                                 "use_checkpointing": False}},
        "io_channels": 2,
    },
}


def test_handle_autoencoder_roundtrip(tmp_path):
    h = ModelHandle.from_config(AE_CFG)
    audio = np.random.RandomState(0).randn(1, 1, 256).astype(np.float32) * 0.1
    z = h.encode(audio)
    assert z.shape == (1, 4, 32)
    recon = h.decode(z)
    assert recon.shape == (1, 1, 256)
    chunked = h.encode_audio(audio, chunked=True, chunk_size=16, overlap=8)
    assert chunked.shape == z.shape

    # save / load through the handle
    from stable_audio_tools_tpu.io.checkpoints import save_checkpoint

    path = str(tmp_path / "m.ckpt")
    save_checkpoint(path, {"params": h.variables["params"]})
    h2 = ModelHandle.from_config(AE_CFG, ckpt_path=path)
    z2 = h2.encode(audio)
    assert z2.shape == z.shape


def test_handle_generate():
    h = ModelHandle.from_config(DIFF_CFG)
    audio = h.generate(
        steps=2, cfg_scale=1.0, conditioning=[{"seconds_total": 5}],
        sampler_type="dpmpp-2m", seed=0,
    )
    assert audio.shape == (1, 2, 256)
    assert np.all(np.isfinite(np.asarray(audio)))
