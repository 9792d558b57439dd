"""DiT torch-layout mapping: export → import roundtrip preserves outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_audio_tools_tpu.io.torch_mapping import (
    export_dit_state_dict,
    import_dit,
)
from stable_audio_tools_tpu.models.dit import DiffusionTransformer


def test_dit_export_import_roundtrip():
    dit = DiffusionTransformer(
        io_channels=4, embed_dim=32, depth=2, num_heads=4,
        cond_token_dim=16, use_checkpointing=False,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 32).astype(np.float32))
    t = jnp.full((1,), 0.5)
    ctx = jnp.asarray(np.random.RandomState(1).randn(1, 3, 16).astype(np.float32))
    variables = dit.init(
        {"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(1)},
        x, t, cross_attn_cond=ctx,
    )
    out_ref = dit.apply(variables, x, t, cross_attn_cond=ctx)

    # export to torch-layout names, then import back
    sd = export_dit_state_dict(variables["params"], prefix="model.model.")
    imported = import_dit(sd, "model.model.", depth=2, cross_attend=True)

    # merge imported over original structure (covers mapped tensors)
    def merge(orig, new):
        if isinstance(orig, dict):
            return {k: merge(orig[k], new[k]) if k in new else orig[k]
                    for k in orig}
        return jnp.asarray(new)

    merged = merge(variables["params"], imported)
    out_roundtrip = dit.apply({"params": merged}, x, t, cross_attn_cond=ctx)
    np.testing.assert_allclose(
        np.asarray(out_roundtrip), np.asarray(out_ref), rtol=1e-5, atol=1e-6
    )

    # all mapped tensor names follow the reference layout
    assert "model.model.transformer.layers.0.self_attn.to_qkv.weight" in sd
    assert "model.model.preprocess_conv.weight" in sd
    assert sd["model.model.preprocess_conv.weight"].shape[0] == \
        sd["model.model.preprocess_conv.weight"].shape[1]  # [out, in, k] 1x1
