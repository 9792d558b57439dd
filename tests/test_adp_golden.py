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
