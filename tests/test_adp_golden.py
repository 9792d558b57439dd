"""Golden activation tests: the real reference ADP UNet (torch) vs our JAX
rewrite, through the checkpoint importer.

Loads /root/reference/stable_audio_tools/models/adp.py directly (module-level
import, no package __init__) so the comparison target is the actual published
implementation, not a replica. Skipped when the reference checkout is absent.
"""

import importlib.util
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ADP = "/root/reference/stable_audio_tools/models/adp.py"

pytestmark = [
    pytest.mark.skipif(not os.path.exists(REF_ADP),
                       reason="reference checkout not available"),
    pytest.mark.slow,  # heavyweight golden/integration tier
]


def _load_reference_adp():
    if "einops_exts" not in sys.modules:
        # tiny shim: the reference only uses rearrange_many
        from einops import rearrange

        shim = types.ModuleType("einops_exts")
        shim.rearrange_many = lambda xs, *a, **kw: tuple(
            rearrange(x, *a, **kw) for x in xs
        )
        sys.modules["einops_exts"] = shim
    spec = importlib.util.spec_from_file_location("_ref_adp", REF_ADP)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


CFG = dict(
    in_channels=4,
    channels=16,
    multipliers=[2, 2, 4, 4],  # attention levels must be divisible by the
    factors=[1, 2, 2],         # reference Transformer1d's GroupNorm(32);
    num_blocks=[2, 1, 1],      # factor==1 exercises the conv upsample path
    attentions=[1, 0, 1, 1],
    resnet_groups=2,
    kernel_multiplier_downsample=2,
    use_nearest_upsample=False,
    use_skip_scale=True,
    use_context_time=True,
    attention_heads=2,
    attention_multiplier=2,
    context_embedding_features=12,
)


@pytest.fixture(scope="module")
def golden():
    ref = _load_reference_adp()
    torch.manual_seed(0)
    tmodel = ref.UNetCFG1d(context_embedding_max_length=7, **CFG)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    from stable_audio_tools_tpu.models.adp import UNetCFG1d
    from stable_audio_tools_tpu.io.torch_mapping import import_adp_unet_cfg

    jmodel = UNetCFG1d(
        context_embedding_max_length=7,
        **{k: tuple(v) if isinstance(v, list) else v for k, v in CFG.items()},
    )
    params = jax.tree_util.tree_map(
        jnp.asarray, import_adp_unet_cfg(sd, "", CFG["factors"])
    )

    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 64).astype(np.float32)
    t = np.array([0.3, 0.8], dtype=np.float32)
    emb = rng.randn(2, 7, 12).astype(np.float32)
    mask = np.array([[1, 1, 1, 1, 1, 0, 0], [1, 1, 0, 0, 0, 0, 0]],
                    dtype=np.float32)
    return tmodel, jmodel, params, x, t, emb, mask


def _torch_fwd(tmodel, x, t, emb, mask=None, scale=1.0):
    with torch.no_grad():
        out = tmodel(
            torch.from_numpy(x), torch.from_numpy(t),
            embedding=torch.from_numpy(emb),
            embedding_mask=torch.from_numpy(mask) if mask is not None else None,
            embedding_scale=scale, batch_cfg=True,
        )
    return out.numpy()


def test_adp_unetcfg_golden_uncond_scale(golden):
    tmodel, jmodel, params, x, t, emb, mask = golden
    ref = _torch_fwd(tmodel, x, t, emb)
    ours = jmodel.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t),
        embedding=jnp.asarray(emb),
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-4)


def test_adp_unetcfg_golden_masked(golden):
    tmodel, jmodel, params, x, t, emb, mask = golden
    ref = _torch_fwd(tmodel, x, t, emb, mask=mask)
    ours = jmodel.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t),
        embedding=jnp.asarray(emb), embedding_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-4)


def test_adp_unetcfg_golden_cfg_batch(golden):
    tmodel, jmodel, params, x, t, emb, mask = golden
    ref = _torch_fwd(tmodel, x, t, emb, mask=mask, scale=3.0)
    ours = jmodel.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t),
        embedding=jnp.asarray(emb), embedding_mask=jnp.asarray(mask),
        embedding_scale=3.0,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=3e-4)


def test_adp_unetcfg_golden_cfg_rescale(golden):
    tmodel, jmodel, params, x, t, emb, mask = golden
    with torch.no_grad():
        ref = tmodel(
            torch.from_numpy(x), torch.from_numpy(t),
            embedding=torch.from_numpy(emb),
            embedding_scale=2.0, batch_cfg=True,
            rescale_cfg=True, scale_phi=0.4,
        ).numpy()
    ours = jmodel.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t),
        embedding=jnp.asarray(emb), embedding_scale=2.0,
        rescale_cfg=True, scale_phi=0.4,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=3e-4)


def test_sa1_style_wrapped_checkpoint_import(golden):
    """Full SA-1.0-layout ckpt ('model.model.*' keys) imports through
    import_diffusion_cond_state_dict and drives the factory-built model."""
    import chex

    from stable_audio_tools_tpu.io.torch_mapping import (
        import_diffusion_cond_state_dict,
    )
    from stable_audio_tools_tpu.models.factory import create_model_from_config

    tmodel, jmodel, params, x, t, emb, mask = golden
    sd = {f"model.model.{k}": v.detach().numpy()
          for k, v in tmodel.state_dict().items()}

    config = {
        "model_type": "diffusion_cond",
        "sample_size": 1024,
        "sample_rate": 16000,
        "audio_channels": 2,
        "model": {
            "conditioning": {
                "configs": [
                    {"id": "seconds_start", "type": "number",
                     "config": {"min_val": 0, "max_val": 512}},
                ],
                "cond_dim": CFG["context_embedding_features"],
            },
            "diffusion": {
                "type": "adp_cfg_1d",
                "cross_attention_cond_ids": ["seconds_start"],
                "config": dict(CFG, context_embedding_max_length=7),
            },
            "io_channels": CFG["in_channels"],
        },
    }
    model = create_model_from_config(config)
    out = import_diffusion_cond_state_dict(model, sd)

    # the imported unet subtree must be shape-identical to a fresh init
    variables = model.model.unet.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t),
        embedding=jnp.asarray(emb),
    )
    chex.assert_trees_all_equal_shapes(
        variables["params"], out["params"]["model"]["unet"]
    )

    # and reproduce the torch forward exactly
    ref = _torch_fwd(tmodel, x, t, emb, mask=mask, scale=2.0)
    ours = model.model.unet.apply(
        {"params": out["params"]["model"]["unet"]},
        jnp.asarray(x), jnp.asarray(t), embedding=jnp.asarray(emb),
        embedding_mask=jnp.asarray(mask), embedding_scale=2.0,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=3e-4)


def test_adp_unetcfg_use_stft_golden():
    """Spectral-domain path (use_stft + stft_* kwargs) vs the reference
    module run directly: STFT encode1d -> UNet -> decode1d must match
    (reference adp.py:1001-1080, 1169, 1206, 1482-1562)."""
    ref = _load_reference_adp()

    # The reference's STFT.decode passes the pre-torch-2 stacked re/im
    # format to torch.istft, which now requires a complex tensor — the
    # reference path crashes as-is on modern torch. Modernize only that
    # call (identical math) so the golden can run.
    orig_decode = ref.STFT.decode

    def decode_complex(self, stft_a, stft_b):
        from einops import rearrange

        b, l = stft_a.shape[0], stft_a.shape[-1]  # noqa: E741
        length = ref.closest_power_2(l * self.hop_length)
        stft_a = rearrange(stft_a, "b c f l -> (b c) f l")
        stft_b = rearrange(stft_b, "b c f l -> (b c) f l")
        if self.use_complex:
            real, imag = stft_a, stft_b
        else:
            real = stft_a * torch.cos(stft_b)
            imag = stft_a * torch.sin(stft_b)
        wave = torch.istft(
            torch.complex(real, imag), n_fft=self.num_fft,
            hop_length=self.hop_length, win_length=self.window_length,
            window=self.window, length=self.length or length,
            normalized=True,
        )
        return rearrange(wave, "(b c) t -> b c t", b=b)

    ref.STFT.decode = decode_complex
    try:
        _run_use_stft_golden(ref)
    finally:
        ref.STFT.decode = orig_decode


def _run_use_stft_golden(ref):
    # use_complex=True for the end-to-end golden: re/im packing is exact.
    # Magnitude/PHASE packing (the default) is covered by the roundtrip
    # test below — at even-symmetric frames (reflect-pad boundaries) the
    # imaginary parts are mathematically zero and BOTH implementations
    # (torch included, verified) emit noise-signed atan2 phases of +-pi, so
    # bit-parity on raw phase channels is undefined even torch-vs-torch;
    # the flips cancel exactly through cos/sin in decode1d.
    stft_cfg = dict(
        in_channels=2,
        channels=16,
        multipliers=[1, 2, 4],
        factors=[2, 2],
        num_blocks=[1, 1],
        attentions=[0, 0, 0],
        resnet_groups=2,
        use_context_time=True,
        context_embedding_features=12,
        use_stft=True,
    )
    torch.manual_seed(3)
    tmodel = ref.UNetCFG1d(
        context_embedding_max_length=7, stft_num_fft=16, stft_hop_length=8,
        stft_length=120, stft_use_complex=True, **stft_cfg)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    from stable_audio_tools_tpu.io.torch_mapping import import_adp_unet_cfg
    from stable_audio_tools_tpu.models.adp import UNetCFG1d

    jmodel = UNetCFG1d(
        context_embedding_max_length=7, stft_num_fft=16, stft_hop_length=8,
        stft_length=120, stft_use_complex=True,
        **{k: tuple(v) if isinstance(v, list) else v
           for k, v in stft_cfg.items()},
    )
    params = jax.tree_util.tree_map(
        jnp.asarray, import_adp_unet_cfg(sd, "", stft_cfg["factors"]))

    rng = np.random.RandomState(5)
    # T=120, hop=8, center -> 16 frames (divisible by the factors)
    x = rng.randn(2, 2, 120).astype(np.float32)
    t = np.array([0.25, 0.9], dtype=np.float32)
    emb = rng.randn(2, 7, 12).astype(np.float32)

    ref_out = _torch_fwd(tmodel, x, t, emb, scale=2.0)
    ours = jmodel.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t),
        embedding=jnp.asarray(emb), embedding_scale=2.0,
    )
    assert ours.shape == ref_out.shape == (2, 2, 120)
    scale = np.abs(ref_out).max()
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=5e-3,
                               atol=5e-4 * max(scale, 1.0))


def test_adp_stft_helper_parity_and_magphase_roundtrip():
    """ADPSTFT vs reference STFT: re/im encode exact; mag-channel encode
    exact; decode1d(encode1d(x)) == x for BOTH packings (phase flips cancel
    through cos/sin); decode1d matches torch istft on shared input."""
    ref = _load_reference_adp()
    from stable_audio_tools_tpu.models.adp import ADPSTFT

    x = np.random.RandomState(5).randn(2, 2, 120).astype(np.float32)
    for use_complex in (True, False):
        t_stft = ref.STFT(num_fft=16, hop_length=8, length=120,
                          use_complex=use_complex)
        j_stft = ADPSTFT(num_fft=16, hop_length=8, length=120,
                         use_complex=use_complex)
        with torch.no_grad():
            te = t_stft.encode1d(torch.from_numpy(x)).numpy()
        je = np.asarray(j_stft.encode1d(jnp.asarray(x)))
        assert te.shape == je.shape == (2, 36, 16)
        if use_complex:
            np.testing.assert_allclose(je, te, atol=2e-5)
        else:
            # magnitudes exact; phases equal as ANGLES (+-pi flips allowed
            # where the imag part is mathematically zero — see
            # _run_use_stft_golden's note)
            np.testing.assert_allclose(je[:, :18], te[:, :18], atol=2e-5)
            ang = np.abs(np.angle(np.exp(1j * (je[:, 18:] - te[:, 18:]))))
            assert ang.max() < 1e-4, ang.max()
        # waveform-level roundtrip is exact for both packings
        back = np.asarray(j_stft.decode1d(jnp.asarray(je)))
        np.testing.assert_allclose(back, x, atol=5e-5)


def test_adp_unet_use_stft_trains_and_grads():
    """A use_stft UNet1d (complex packing) runs a jitted value_and_grad step
    with finite grads — the VERDICT #6 'trains a step' acceptance."""
    from stable_audio_tools_tpu.models.adp import UNet1d

    m = UNet1d(
        in_channels=2, channels=16, multipliers=(1, 2), factors=(2,),
        num_blocks=(1,), attentions=(0, 0), resnet_groups=2,
        use_context_time=True, use_stft=True, stft_num_fft=16,
        stft_hop_length=8, stft_use_complex=True,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 120), jnp.float32)
    t = jnp.array([0.5], jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, t)["params"]

    def loss(p):
        out = m.apply({"params": p}, x, t)
        assert out.shape == x.shape
        return jnp.mean((out - x) ** 2)

    val, grads = jax.jit(jax.value_and_grad(loss))(params)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)
