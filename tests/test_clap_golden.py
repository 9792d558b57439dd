"""CLAP conditioner golden tests: a synthetic laion-clap checkpoint (torch
RoBERTa text_branch + HTSAT audio_branch + joint projections) loads into the
flax towers and reproduces the torch embeddings.

Reference behavior: stable_audio_tools/models/conditioners.py:128-286 via
laion_clap (text: pooler_output → text_projection; audio: HTSAT 'embedding'
= final-norm token mean → audio_projection).
"""

import numpy as np
import pytest

pytest.importorskip("torch")
import torch  # noqa: E402
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from stable_audio_tools_tpu.models.conditioners import (  # noqa: E402
    CLAPAudioConditioner,
    CLAPTextConditioner,
    _FallbackTokenizer,
)

from tests.test_htsat_golden import THTSAT  # noqa: E402

pytestmark = pytest.mark.slow  # heavyweight golden/integration tier



def _make_text_ckpt(tmp_path):
    from transformers import RobertaConfig, RobertaModel

    cfg = RobertaConfig(
        vocab_size=32002, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=1, intermediate_size=128,
        max_position_embeddings=80, type_vocab_size=1,
    )
    torch.manual_seed(0)
    roberta = RobertaModel(cfg).eval()
    proj = tnn.Sequential(tnn.Linear(64, 24), tnn.ReLU(),
                          tnn.Linear(24, 24)).eval()
    sd = {f"text_branch.{k}": v for k, v in roberta.state_dict().items()}
    sd.update({f"text_projection.{k}": v for k, v in proj.state_dict().items()})
    path = str(tmp_path / "clap_text.pth")
    torch.save({"state_dict": sd}, path)
    return roberta, proj, path


def test_clap_text_full_branch_import(tmp_path):
    roberta, proj, path = _make_text_ckpt(tmp_path)
    c = CLAPTextConditioner("prompt", output_dim=16, clap_ckpt_path=path)
    texts = ["a dog barking", "rain on leaves"]
    feats = c.prepare(texts)["features"]

    tok = _FallbackTokenizer(77)(texts)  # same hash-tokenizer both sides
    with torch.no_grad():
        out = roberta(
            input_ids=torch.from_numpy(tok["input_ids"]).long(),
            attention_mask=torch.from_numpy(tok["attention_mask"]).long(),
        )
        ref = proj(out.pooler_output).numpy()
    np.testing.assert_allclose(feats, ref, rtol=2e-3, atol=2e-4)


def test_clap_text_features_layer_ix(tmp_path):
    roberta, proj, path = _make_text_ckpt(tmp_path)
    c = CLAPTextConditioner("prompt", output_dim=16, clap_ckpt_path=path,
                            use_text_features=True, feature_layer_ix=-2)
    texts = ["hello world"]
    feats = c.prepare(texts)["features"]
    tok = _FallbackTokenizer(77)(texts)
    with torch.no_grad():
        hidden = roberta(
            input_ids=torch.from_numpy(tok["input_ids"]).long(),
            attention_mask=torch.from_numpy(tok["attention_mask"]).long(),
            output_hidden_states=True,
        ).hidden_states[-2].numpy()
    np.testing.assert_allclose(feats, hidden, rtol=2e-3, atol=2e-4)


def test_clap_audio_tower_import(tmp_path):
    """Synthetic HTSAT-base-layout audio branch + projection reproduce the
    torch replica's embedding through the full 48 kHz mel frontend."""
    torch.manual_seed(1)
    # full HTSAT-base geometry (spec 256, mel 64) at base width is slow on
    # CPU; the conditioner only fixes spec/depths, so use HTSAT-base with
    # its real geometry but verify on a 1 s clip
    tm = THTSAT(spec_size=256, patch=4, embed_dim=128, depths=(2, 2, 12, 2),
                heads=(4, 8, 16, 32), window=8, mel_bins=64).eval()
    proj = tnn.Sequential(tnn.Linear(1024, 512), tnn.ReLU(),
                          tnn.Linear(512, 512)).eval()
    sd = {f"audio_branch.{k}": v for k, v in tm.state_dict().items()}
    sd.update({f"audio_projection.{k}": v for k, v in proj.state_dict().items()})
    path = str(tmp_path / "clap_audio.pth")
    torch.save({"state_dict": sd}, path)

    c = CLAPAudioConditioner("aud", output_dim=16, clap_ckpt_path=path,
                             enable_fusion=False)
    rng = np.random.RandomState(3)
    audio = (rng.randn(48000) * 0.1).astype(np.float32)
    feats = c.prepare([audio])["features"]
    assert feats.shape == (1, 512)

    # torch reference: same repeatpad + torch.stft frontend + replica trunk
    from stable_audio_tools_tpu.models.htsat import prepare_clap_audio
    from stable_audio_tools_tpu.ops.stft import mel_filterbank

    wav = torch.from_numpy(prepare_clap_audio(audio)[None])
    window = torch.hann_window(1024)
    spec = torch.stft(wav, 1024, 480, window=window, center=True,
                      pad_mode="reflect", return_complex=True)
    power = spec.abs() ** 2  # [B, bins, frames]
    fb = torch.from_numpy(
        mel_filterbank(48000, 1024, 64, 50.0, 14000.0, htk=False,
                       norm="slaney"))
    mel = torch.matmul(power.transpose(1, 2), fb.t())
    logmel = 10.0 * torch.log10(torch.clamp(mel, min=1e-10))
    with torch.no_grad():
        emb = tm(logmel[:, None, :, :])
        ref = proj(emb).numpy()
    np.testing.assert_allclose(feats, ref, rtol=5e-3, atol=5e-3)
