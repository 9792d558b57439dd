"""Name/layout mapping between reference PyTorch checkpoints and our params.

Covers the transformer stack (ContinuousTransformer), DiffusionTransformer
(DiT) and the ConditionedDiffusionModelWrapper layout used by
stable-audio-open-style checkpoints, plus the Oobleck autoencoder (see
checkpoints.py). Both directions:

- import_*: torch state dict → flax params (for loading published ckpts);
- export_*: flax params → torch-layout state dict (so unwrap_model can emit
  reference-compatible safetensors).
"""

from __future__ import annotations

import typing as tp

import numpy as np

from .checkpoints import (
    torch_conv1d_weight,
    torch_linear_weight,
)


def _lin(sd, name):
    return {"kernel": torch_linear_weight(sd[f"{name}.weight"]).astype(np.float32)}


def _lin_b(sd, name):
    out = _lin(sd, name)
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"].astype(np.float32)
    return out


# -- fused-projection layout permutations ------------------------------------
#
# Our Attention/GLU store fused kernels INTERLEAVED (head-major [h][q|k|v][dh]
# for to_qkv/to_kv, pairwise (x_j, gate_j) for the GLU proj) so that
# tensor-parallel tiled shardings align with the downstream split for any
# shard count — see ops/attention.py / ops/transformer.py. Torch checkpoints
# store the [q|k|v] / [x|gate] concat layout; these helpers convert.


def _interleave_fused(kernel, n_fused, dim_heads):
    """[in, n*H*dh] concat [q|k|v] → head-major interleave [h][q|k|v][dh]."""
    din, dout = kernel.shape
    heads = dout // (n_fused * dim_heads)
    return kernel.reshape(din, n_fused, heads, dim_heads).transpose(
        0, 2, 1, 3).reshape(din, dout)


def _deinterleave_fused(kernel, n_fused, dim_heads):
    din, dout = kernel.shape
    heads = dout // (n_fused * dim_heads)
    return kernel.reshape(din, heads, n_fused, dim_heads).transpose(
        0, 2, 1, 3).reshape(din, dout)


def _interleave_glu(arr):
    """concat [x | gate] → pairwise (x_0, g_0, x_1, g_1, ...); last axis."""
    inner = arr.shape[-1] // 2
    return arr.reshape(*arr.shape[:-1], 2, inner).swapaxes(-1, -2).reshape(
        *arr.shape[:-1], 2 * inner)


def _deinterleave_glu(arr):
    inner = arr.shape[-1] // 2
    return arr.reshape(*arr.shape[:-1], inner, 2).swapaxes(-1, -2).reshape(
        *arr.shape[:-1], 2 * inner)


def _lin_fused(sd, name, n_fused, dim_heads):
    return {"kernel": _interleave_fused(
        torch_linear_weight(sd[f"{name}.weight"]).astype(np.float32),
        n_fused, dim_heads)}


def _lin_glu(sd, name):
    out = {"kernel": _interleave_glu(
        torch_linear_weight(sd[f"{name}.weight"]).astype(np.float32))}
    if f"{name}.bias" in sd:
        out["bias"] = _interleave_glu(sd[f"{name}.bias"].astype(np.float32))
    return out


def import_transformer_block(sd, prefix: str, cross_attend: bool,
                             dim_heads: int) -> dict:
    """reference models/transformer.py TransformerBlock → our TransformerBlock."""
    p = {}
    p["pre_norm"] = {"gamma": sd[f"{prefix}.pre_norm.gamma"].astype(np.float32)}
    p["ff_norm"] = {"gamma": sd[f"{prefix}.ff_norm.gamma"].astype(np.float32)}
    attn = {"to_qkv": _lin_fused(sd, f"{prefix}.self_attn.to_qkv", 3, dim_heads),
            "to_out": _lin(sd, f"{prefix}.self_attn.to_out")}
    if f"{prefix}.self_attn.q_norm.weight" in sd:
        attn["q_norm"] = {"scale": sd[f"{prefix}.self_attn.q_norm.weight"],
                          "bias": sd[f"{prefix}.self_attn.q_norm.bias"]}
        attn["k_norm"] = {"scale": sd[f"{prefix}.self_attn.k_norm.weight"],
                          "bias": sd[f"{prefix}.self_attn.k_norm.bias"]}
    p["self_attn"] = attn
    if cross_attend and f"{prefix}.cross_attn.to_q.weight" in sd:
        p["cross_attend_norm"] = {
            "gamma": sd[f"{prefix}.cross_attend_norm.gamma"].astype(np.float32)
        }
        cattn = {"to_q": _lin(sd, f"{prefix}.cross_attn.to_q"),
                 "to_kv": _lin_fused(sd, f"{prefix}.cross_attn.to_kv", 2,
                                     dim_heads),
                 "to_out": _lin(sd, f"{prefix}.cross_attn.to_out")}
        if f"{prefix}.cross_attn.q_norm.weight" in sd:
            cattn["q_norm"] = {"scale": sd[f"{prefix}.cross_attn.q_norm.weight"],
                               "bias": sd[f"{prefix}.cross_attn.q_norm.bias"]}
            cattn["k_norm"] = {"scale": sd[f"{prefix}.cross_attn.k_norm.weight"],
                               "bias": sd[f"{prefix}.cross_attn.k_norm.bias"]}
        p["cross_attn"] = cattn
    # FeedForward: ff.ff.0 = GLU(proj), ff.ff.2 = linear_out
    p["ff"] = {
        "linear_in": {"proj": _lin_glu(sd, f"{prefix}.ff.ff.0.proj")},
        "linear_out": _lin_b(sd, f"{prefix}.ff.ff.2"),
    }
    if f"{prefix}.to_scale_shift_gate" in sd:
        p["to_scale_shift_gate"] = sd[f"{prefix}.to_scale_shift_gate"].astype(
            np.float32
        )
    return p


def import_continuous_transformer(sd, prefix: str, depth: int,
                                  cross_attend: bool,
                                  dim_heads: int) -> dict:
    p = {}
    if f"{prefix}.project_in.weight" in sd:
        p["project_in"] = _lin(sd, f"{prefix}.project_in")
    if f"{prefix}.project_out.weight" in sd:
        p["project_out"] = _lin(sd, f"{prefix}.project_out")
    for i in range(depth):
        p[f"layers_{i}"] = import_transformer_block(
            sd, f"{prefix}.layers.{i}", cross_attend, dim_heads=dim_heads
        )
    if f"{prefix}.global_cond_embedder.0.weight" in sd:
        p["global_embed_0"] = _lin_b(sd, f"{prefix}.global_cond_embedder.0")
        p["global_embed_1"] = _lin_b(sd, f"{prefix}.global_cond_embedder.2")
    return p


def import_dit(sd, prefix: str, depth: int, cross_attend: bool = True,
               *, dim_heads: int) -> dict:
    """reference models/dit.py DiffusionTransformer → our DiffusionTransformer."""
    p = {}
    p["timestep_features"] = {
        "weight": sd[f"{prefix}timestep_features.weight"].astype(np.float32)
    }
    p["to_timestep_embed_0"] = _lin_b(sd, f"{prefix}to_timestep_embed.0")
    p["to_timestep_embed_2"] = _lin_b(sd, f"{prefix}to_timestep_embed.2")
    for ours, theirs in [("to_cond_embed", "to_cond_embed"),
                         ("to_global_embed", "to_global_embed"),
                         ("to_prepend_embed", "to_prepend_embed")]:
        if f"{prefix}{theirs}.0.weight" in sd:
            p[ours] = {"0": _lin(sd, f"{prefix}{theirs}.0"),
                       "2": _lin(sd, f"{prefix}{theirs}.2")}
    p["preprocess_conv"] = {
        "kernel": torch_conv1d_weight(sd[f"{prefix}preprocess_conv.weight"])
    }
    p["postprocess_conv"] = {
        "kernel": torch_conv1d_weight(sd[f"{prefix}postprocess_conv.weight"])
    }
    p["transformer"] = import_continuous_transformer(
        sd, f"{prefix}transformer", depth, cross_attend, dim_heads=dim_heads
    )
    return p


def import_diffusion_cond_state_dict(model, sd: tp.Dict[str, np.ndarray]) -> dict:
    """Reference ConditionedDiffusionModelWrapper (DiT) ckpt → our variables.

    Handles the 'model.model.' prefix of the wrapped layout and an optional
    pretransform + conditioner projections.
    """
    import jax
    import jax.numpy as jnp

    inner = model.model
    if hasattr(inner, "dit"):
        dit_cfg = inner.dit
        params: dict = {"model": {"dit": import_dit(
            sd, "model.model.", dit_cfg.depth, dit_cfg.cond_token_dim > 0,
            dim_heads=dit_cfg.embed_dim // dit_cfg.num_heads,
        )}}
    else:
        # ADP UNet families (reference diffusion.py:222-336 wrap the UNet as
        # .model; our wrappers name the flax submodule 'unet')
        unet = inner.unet
        if type(unet).__name__ == "UNetCFG1d":
            unet_params = import_adp_unet_cfg(
                sd, "model.model.", unet.factors, unet.use_nearest_upsample
            )
        else:
            unet_params = import_adp_unet1d(
                sd, "model.model.", unet.factors, unet.use_nearest_upsample
            )
        params = {"model": {"unet": unet_params}}

    if model.pretransform is not None and any(
        k.startswith("pretransform.") for k in sd
    ):
        from .checkpoints import import_autoencoder_state_dict

        ae = model.pretransform.model
        sub = {k[len("pretransform.model."):]: v for k, v in sd.items()
               if k.startswith("pretransform.model.")}
        params["pretransform"] = {
            "model": import_autoencoder_state_dict(ae, sub)["params"]
        }

    # conditioner modules: learnable embedders + proj_out projections. Flax
    # names each bank entry 'modules_{cid}' (ConditionerBank.modules dict).
    cond_params: dict = {}

    def _mod(cid):
        return cond_params.setdefault(f"modules_{cid}", {})

    cids = {k.split(".")[2] for k in sd if k.startswith("conditioner.conditioners.")}
    for cid in sorted(cids):
        pfx = f"conditioner.conditioners.{cid}."
        # Conditioner.proj_out (reference conditioners.py:30)
        if f"{pfx}proj_out.weight" in sd:
            po = {"kernel": torch_linear_weight(sd[f"{pfx}proj_out.weight"])}
            if f"{pfx}proj_out.bias" in sd:
                po["bias"] = sd[f"{pfx}proj_out.bias"].astype(np.float32)
            _mod(cid)["proj"] = {"proj_out": po}
        # NumberConditioner → NumberEmbedder(TimePositionalEmbedding)
        # (reference adp.py:1455-1474, conditioners.py:58-91)
        if f"{pfx}embedder.embedding.0.weights" in sd:
            _mod(cid)["embedder"] = {
                "weights": sd[f"{pfx}embedder.embedding.0.weights"].astype(np.float32),
                "to_out": _lin_b(sd, f"{pfx}embedder.embedding.1"),
            }
        # IntConditioner (reference conditioners.py:35-45)
        if f"{pfx}int_embedder.weight" in sd:
            _mod(cid)["int_embedder"] = {
                "embedding": sd[f"{pfx}int_embedder.weight"].astype(np.float32)
            }
        # ListConditioner (reference conditioners.py:93-112)
        if f"{pfx}embedder.weight" in sd:
            _mod(cid)["embedder"] = {
                "embedding": sd[f"{pfx}embedder.weight"].astype(np.float32)
            }
    if cond_params:
        params["conditioner"] = cond_params

    # frozen host-side towers (T5): hand the torch weights to the host
    # conditioner so generation uses the checkpoint's encoder, not random init
    mc = getattr(model, "_multi_conditioner", None)
    if mc is not None:
        for cid, host_cond in mc.conditioners.items():
            pfx = f"conditioner.conditioners.{cid}.model."
            if hasattr(host_cond, "load_torch_state_dict") and any(
                k.startswith(pfx) for k in sd
            ):
                host_cond.load_torch_state_dict(sd, pfx)

    return {"params": jax.tree_util.tree_map(jnp.asarray, params)}


# ---------------------------------------------------------------------------
# ADP UNet (SA-1.0) importer — reference models/adp.py:986-1384 layout
# ---------------------------------------------------------------------------


def _affine(sd, name):
    """torch GroupNorm/LayerNorm affine → flax {scale, bias}."""
    return {"scale": sd[f"{name}.weight"].astype(np.float32),
            "bias": sd[f"{name}.bias"].astype(np.float32)}


def _adp_conv(sd, name):
    from .checkpoints import torch_conv1d_weight as _c1d

    out = {"kernel": _c1d(sd[f"{name}.weight"]).astype(np.float32)}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"].astype(np.float32)
    return out


def _adp_conv_t(sd, name):
    from .checkpoints import torch_conv_transpose1d_weight as _ct

    return {"kernel": _ct(sd[f"{name}.weight"]).astype(np.float32),
            "bias": sd[f"{name}.bias"].astype(np.float32)}


def _adp_convblock(sd, name):
    p = {"project": _adp_conv(sd, f"{name}.project")}
    if f"{name}.groupnorm.weight" in sd:
        p["groupnorm"] = _affine(sd, f"{name}.groupnorm")
    return p


def _adp_resnet(sd, name):
    """reference adp.py ResnetBlock1d (:275-333): block1/block2 ConvBlock1d,
    to_scale_shift = MappingToScaleShift (Sequential [SiLU, Linear]),
    to_out 1x1 conv when in != out channels."""
    p = {"block1": _adp_convblock(sd, f"{name}.block1"),
         "block2": _adp_convblock(sd, f"{name}.block2")}
    if f"{name}.to_scale_shift.to_scale_shift.1.weight" in sd:
        p["to_scale_shift"] = _lin_b(sd, f"{name}.to_scale_shift.to_scale_shift.1")
    if f"{name}.to_out.weight" in sd:
        p["to_out"] = _adp_conv(sd, f"{name}.to_out")
    return p


def _adp_attention(sd, name):
    """reference adp.py Attention (:475-530): biased LayerNorms norm /
    norm_context, bias-free to_q/to_kv, AttentionBase.to_out linear."""
    return {"norm": _affine(sd, f"{name}.norm"),
            "norm_context": _affine(sd, f"{name}.norm_context"),
            "to_q": _lin(sd, f"{name}.to_q"),
            "to_kv": _lin(sd, f"{name}.to_kv"),
            "to_out": _lin_b(sd, f"{name}.attention.to_out")}


def _adp_transformer1d(sd, name):
    """reference adp.py Transformer1d (:587-635): to_in = [GroupNorm, Conv1d],
    blocks.{i} TransformerBlock, to_out = [Rearrange, Conv1d]."""
    p = {"norm_in": _affine(sd, f"{name}.to_in.0"),
         "conv_in": _adp_conv(sd, f"{name}.to_in.1"),
         "conv_out": _adp_conv(sd, f"{name}.to_out.1")}
    i = 0
    while f"{name}.blocks.{i}.attention.norm.weight" in sd:
        blk = {"attention": _adp_attention(sd, f"{name}.blocks.{i}.attention"),
               "ff1": _lin_b(sd, f"{name}.blocks.{i}.feed_forward.0"),
               "ff2": _lin_b(sd, f"{name}.blocks.{i}.feed_forward.2")}
        if f"{name}.blocks.{i}.cross_attention.norm.weight" in sd:
            blk["cross_attention"] = _adp_attention(
                sd, f"{name}.blocks.{i}.cross_attention"
            )
        p[f"block_{i}"] = blk
        i += 1
    return p


def _adp_tpe(sd, name):
    """reference TimePositionalEmbedding = Sequential(LearnedPositionalEmbedding,
    Linear) (adp.py:675-682)."""
    return {"weights": sd[f"{name}.0.weights"].astype(np.float32),
            "to_out": _lin_b(sd, f"{name}.1")}


def import_adp_unet1d(sd, prefix: str, factors: tp.Sequence[int],
                      use_nearest_upsample: bool = False) -> dict:
    """torch UNet1d state dict (reference adp.py:986-1236) → our UNet1d params.

    Structure is inferred from the state-dict keys (block/transformer counts);
    only the upsample conv kind needs `factors`/`use_nearest_upsample` because
    Conv1d (factor==1 / nearest) and ConvTranspose1d weights are both named
    `upsample.weight` but have transposed layouts.
    """
    p: dict = {}
    if f"{prefix}to_time.0.0.weights" in sd:
        p["to_time"] = _adp_tpe(sd, f"{prefix}to_time.0")
    if f"{prefix}to_features.0.weight" in sd:
        p["to_features"] = _lin_b(sd, f"{prefix}to_features.0")
    if f"{prefix}to_mapping.0.weight" in sd:
        p["to_mapping_0"] = _lin_b(sd, f"{prefix}to_mapping.0")
        p["to_mapping_2"] = _lin_b(sd, f"{prefix}to_mapping.2")

    p["to_in"] = {"block": _adp_resnet(sd, f"{prefix}to_in.block")}

    num_layers = len(factors)
    for i in range(num_layers):
        src = f"{prefix}downsamples.{i}"
        d = {"downsample": _adp_conv(sd, f"{src}.downsample")}
        j = 0
        while f"{src}.blocks.{j}.block1.project.weight" in sd:
            d[f"block_{j}"] = _adp_resnet(sd, f"{src}.blocks.{j}")
            j += 1
        if f"{src}.transformer.to_in.0.weight" in sd:
            d["transformer"] = _adp_transformer1d(sd, f"{src}.transformer")
        p[f"downsamples_{i}"] = d

    bott = {"pre_block": _adp_resnet(sd, f"{prefix}bottleneck.pre_block"),
            "post_block": _adp_resnet(sd, f"{prefix}bottleneck.post_block")}
    if f"{prefix}bottleneck.transformer.to_in.0.weight" in sd:
        bott["transformer"] = _adp_transformer1d(sd, f"{prefix}bottleneck.transformer")
    p["bottleneck"] = bott

    # torch upsamples are built over reversed(range(num_layers)) so
    # upsamples.{j} corresponds to level i = num_layers - 1 - j — same order
    # our upsamples_{j} run in.
    for j in range(num_layers):
        level = num_layers - 1 - j
        src = f"{prefix}upsamples.{j}"
        u: dict = {}
        k = 0
        while f"{src}.blocks.{k}.block1.project.weight" in sd:
            u[f"block_{k}"] = _adp_resnet(sd, f"{src}.blocks.{k}")
            k += 1
        if f"{src}.transformer.to_in.0.weight" in sd:
            u["transformer"] = _adp_transformer1d(sd, f"{src}.transformer")
        factor = factors[level]
        if factor == 1:
            u["upsample"] = _adp_conv(sd, f"{src}.upsample")
        elif use_nearest_upsample:
            u["upsample"] = _adp_conv(sd, f"{src}.upsample.1")
        else:
            u["upsample"] = _adp_conv_t(sd, f"{src}.upsample")
        p[f"upsamples_{j}"] = u

    p["to_out"] = {"block": _adp_resnet(sd, f"{prefix}to_out.block")}
    return p


def import_adp_unet_cfg(sd, prefix: str, factors: tp.Sequence[int],
                        use_nearest_upsample: bool = False) -> dict:
    """torch UNetCFG1d (reference adp.py:1262-1384) → our UNetCFG1d params."""
    p = {"unet": import_adp_unet1d(sd, prefix, factors, use_nearest_upsample)}
    p["fixed_embedding"] = sd[
        f"{prefix}fixed_embedding.embedding.weight"
    ].astype(np.float32)
    if f"{prefix}to_time_embedding.0.0.weights" in sd:
        p["to_time_embedding"] = _adp_tpe(sd, f"{prefix}to_time_embedding.0")
    return p


# ---------------------------------------------------------------------------
# export: our params → torch-layout names (reference-compatible safetensors)
# ---------------------------------------------------------------------------


def export_transformer_block(p: dict, prefix: str, out: dict,
                             dim_heads: int):
    out[f"{prefix}.pre_norm.gamma"] = np.asarray(p["pre_norm"]["gamma"])
    out[f"{prefix}.ff_norm.gamma"] = np.asarray(p["ff_norm"]["gamma"])
    out[f"{prefix}.self_attn.to_qkv.weight"] = _deinterleave_fused(
        np.asarray(p["self_attn"]["to_qkv"]["kernel"]), 3, dim_heads).T
    out[f"{prefix}.self_attn.to_out.weight"] = np.asarray(
        p["self_attn"]["to_out"]["kernel"]).T
    if "cross_attn" in p:
        out[f"{prefix}.cross_attend_norm.gamma"] = np.asarray(
            p["cross_attend_norm"]["gamma"])
        for n in ("to_q", "to_out"):
            out[f"{prefix}.cross_attn.{n}.weight"] = np.asarray(
                p["cross_attn"][n]["kernel"]).T
        out[f"{prefix}.cross_attn.to_kv.weight"] = _deinterleave_fused(
            np.asarray(p["cross_attn"]["to_kv"]["kernel"]), 2, dim_heads).T
    out[f"{prefix}.ff.ff.0.proj.weight"] = _deinterleave_glu(
        np.asarray(p["ff"]["linear_in"]["proj"]["kernel"])).T
    if "bias" in p["ff"]["linear_in"]["proj"]:
        out[f"{prefix}.ff.ff.0.proj.bias"] = _deinterleave_glu(
            np.asarray(p["ff"]["linear_in"]["proj"]["bias"]))
    out[f"{prefix}.ff.ff.2.weight"] = np.asarray(p["ff"]["linear_out"]["kernel"]).T
    if "bias" in p["ff"]["linear_out"]:
        out[f"{prefix}.ff.ff.2.bias"] = np.asarray(p["ff"]["linear_out"]["bias"])
    if "to_scale_shift_gate" in p:
        out[f"{prefix}.to_scale_shift_gate"] = np.asarray(p["to_scale_shift_gate"])


def export_dit_state_dict(dit_params: dict, prefix: str = "model.model.",
                          *, dim_heads: int) -> dict:
    out: dict = {}
    p = dit_params
    out[f"{prefix}timestep_features.weight"] = np.asarray(
        p["timestep_features"]["weight"])
    for i, ours in [(0, "to_timestep_embed_0"), (2, "to_timestep_embed_2")]:
        out[f"{prefix}to_timestep_embed.{i}.weight"] = np.asarray(
            p[ours]["kernel"]).T
        if "bias" in p[ours]:
            out[f"{prefix}to_timestep_embed.{i}.bias"] = np.asarray(p[ours]["bias"])
    for name in ("to_cond_embed", "to_global_embed", "to_prepend_embed"):
        if name in p:
            for i in ("0", "2"):
                out[f"{prefix}{name}.{i}.weight"] = np.asarray(
                    p[name][i]["kernel"]).T
    out[f"{prefix}preprocess_conv.weight"] = np.asarray(
        p["preprocess_conv"]["kernel"]).transpose(2, 1, 0)
    out[f"{prefix}postprocess_conv.weight"] = np.asarray(
        p["postprocess_conv"]["kernel"]).transpose(2, 1, 0)
    tp_ = p["transformer"]
    if "project_in" in tp_:
        out[f"{prefix}transformer.project_in.weight"] = np.asarray(
            tp_["project_in"]["kernel"]).T
    if "project_out" in tp_:
        out[f"{prefix}transformer.project_out.weight"] = np.asarray(
            tp_["project_out"]["kernel"]).T
    for key in tp_:
        if key.startswith("layers_"):
            i = int(key.split("_")[1])
            export_transformer_block(tp_[key], f"{prefix}transformer.layers.{i}",
                                     out, dim_heads=dim_heads)
    return out
