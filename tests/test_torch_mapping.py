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
    sd = export_dit_state_dict(variables["params"], prefix="model.model.",
                               dim_heads=32 // 4)
    imported = import_dit(sd, "model.model.", depth=2, cross_attend=True,
                          dim_heads=32 // 4)

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


def test_import_number_conditioner_weights():
    """Reference NumberEmbedder layout → our conditioner params, value-exact."""
    from stable_audio_tools_tpu.io.torch_mapping import (
        import_diffusion_cond_state_dict,
    )
    from tests.test_diffusion_cond import TINY_DIT_CONFIG, CONDITIONING
    from stable_audio_tools_tpu.models.factory import create_model_from_config

    model = create_model_from_config(TINY_DIT_CONFIG)
    mc = model._multi_conditioner
    prepared = jax.tree_util.tree_map(jnp.asarray, mc.gather_inputs(CONDITIONING))
    x = jnp.zeros((1, 4, 64))
    t = jnp.ones((1,))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, t, cond=prepared, method=model.init_full,
    )

    rs = np.random.RandomState(5)
    sd = {}
    for cid in ("seconds_start", "seconds_total"):
        sd[f"conditioner.conditioners.{cid}.embedder.embedding.0.weights"] = (
            rs.randn(128).astype(np.float32))
        sd[f"conditioner.conditioners.{cid}.embedder.embedding.1.weight"] = (
            rs.randn(32, 257).astype(np.float32))
        sd[f"conditioner.conditioners.{cid}.embedder.embedding.1.bias"] = (
            rs.randn(32).astype(np.float32))
    from stable_audio_tools_tpu.io import torch_mapping as tm
    # the importer needs the DiT keys too: export our own DiT params
    dit = model.model.dit
    dit_sd = tm.export_dit_state_dict(
        variables["params"]["model"]["dit"], prefix="model.model.",
        dim_heads=dit.embed_dim // dit.num_heads)
    sd.update(dit_sd)
    out = import_diffusion_cond_state_dict(model, sd)
    got = out["params"]["conditioner"]["modules_seconds_start"]["embedder"]

    # reference math: normalized v → [v, sin(2πvw), cos(2πvw)] @ W.T + b
    v = 30.0 / 512.0  # seconds_total normalization (min 0 max 512)
    np.testing.assert_allclose(
        np.asarray(got["weights"]),
        sd["conditioner.conditioners.seconds_start.embedder.embedding.0.weights"])
    np.testing.assert_allclose(
        np.asarray(got["to_out"]["kernel"]),
        sd["conditioner.conditioners.seconds_start.embedder.embedding.1.weight"].T)
    w = sd["conditioner.conditioners.seconds_total.embedder.embedding.0.weights"]
    W = sd["conditioner.conditioners.seconds_total.embedder.embedding.1.weight"]
    b = sd["conditioner.conditioners.seconds_total.embedder.embedding.1.bias"]

    # end-to-end: run the bank with imported params and check the embedding
    merged = jax.tree_util.tree_map(lambda a: a, variables["params"])
    merged = dict(merged)
    merged["conditioner"] = out["params"]["conditioner"]
    tensors = model.apply({"params": merged}, prepared,
                          method=model.run_conditioner)
    emb = np.asarray(tensors["seconds_total"][0])[0, 0]
    freqs = v * w * 2 * np.pi
    feats = np.concatenate([[v], np.sin(freqs), np.cos(freqs)])
    expected = feats @ W.T + b
    np.testing.assert_allclose(emb, expected, rtol=2e-5, atol=1e-5)


@pytest.mark.slow
def test_t5_tower_load_from_torch_state_dict():
    """T5 tower weights from a (synthetic) reference ckpt drive the host T5."""
    torch = pytest.importorskip("torch")
    from transformers import T5Config, T5EncoderModel

    from stable_audio_tools_tpu.models.conditioners import T5Conditioner

    cfg = T5Config(
        vocab_size=100, d_model=32, num_layers=2, num_heads=2, d_kv=16,
        d_ff=64, relative_attention_num_buckets=8, feed_forward_proj="relu",
        is_encoder_decoder=False,
    )
    with torch.no_grad():
        pt_model = T5EncoderModel(cfg).eval()
    sd = {f"conditioner.conditioners.prompt.model.{k}": v.numpy()
          for k, v in pt_model.state_dict().items()}

    cond = T5Conditioner("prompt", output_dim=16, t5_model_name="t5-base")
    ok = cond.load_torch_state_dict(sd, "conditioner.conditioners.prompt.model.")
    assert ok and cond.dim == 32

    ids = np.array([[5, 17, 3, 1, 0, 0]], np.int32)
    mask = np.array([[1, 1, 1, 1, 0, 0]], np.int32)
    got = np.asarray(cond._encode(jnp.asarray(ids), jnp.asarray(mask)),
                     dtype=np.float32)
    with torch.no_grad():
        ref = pt_model(input_ids=torch.from_numpy(ids).long(),
                       attention_mask=torch.from_numpy(mask).long()
                       ).last_hidden_state.numpy()
    # flax tower runs bf16; compare loosely
    np.testing.assert_allclose(got[mask.astype(bool)], ref[mask.astype(bool)],
                               rtol=0.1, atol=0.05)
