"""Checkpoint I/O: native (orbax/msgpack) + PyTorch safetensors importer.

Capability parity with reference stable_audio_tools/models/utils.py:
load_ckpt_state_dict (:23, safetensors or torch pickle), shape-checked
partial load copy_state_dict (:6); plus the torch→JAX conversion layer
(SURVEY.md §5.4): conv-weight layout flips, weight-norm g/v recombination,
linear transposes — so reference PyTorch checkpoints load bit-comparably.

Native checkpoints are flax msgpack for single-host and orbax for sharded
pytrees (async, atomic).
"""

from __future__ import annotations

import json
import os
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# loading raw state dicts
# ---------------------------------------------------------------------------


def load_ckpt_state_dict(ckpt_path: str) -> tp.Dict[str, np.ndarray]:
    """safetensors or torch checkpoint → {name: np.ndarray} (fp32)."""
    if ckpt_path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        try:
            return load_file(ckpt_path)
        except Exception:
            # may contain non-numpy dtypes (bf16): go through torch
            from safetensors.torch import load_file as load_torch

            sd = load_torch(ckpt_path)
            return {k: v.float().numpy() for k, v in sd.items()}
    else:
        import torch

        sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        return {
            k: (v.float().numpy() if hasattr(v, "numpy") else np.asarray(v))
            for k, v in sd.items()
        }


def copy_state_dict(params, updates: tp.Dict[str, np.ndarray]):
    """Shape-tolerant partial update of a flat {path: array} param mapping."""
    flat = flatten_params(params)
    loaded, skipped = 0, []
    for k, v in updates.items():
        if k in flat and flat[k].shape == v.shape:
            flat[k] = jnp.asarray(v)
            loaded += 1
        else:
            skipped.append(k)
    return unflatten_params(flat), loaded, skipped


# ---------------------------------------------------------------------------
# flat-path helpers
# ---------------------------------------------------------------------------


def flatten_params(tree, sep: str = ".") -> tp.Dict[str, tp.Any]:
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}{sep}{k}" if prefix else str(k), v)
        else:
            flat[prefix] = node

    walk("", tree)
    return flat


def unflatten_params(flat: tp.Dict[str, tp.Any], sep: str = ".") -> dict:
    tree: dict = {}
    for k, v in flat.items():
        parts = k.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


# ---------------------------------------------------------------------------
# torch → jax tensor conversions
# ---------------------------------------------------------------------------


def torch_conv1d_weight(w: np.ndarray) -> np.ndarray:
    """torch [out, in, k] → WIO [k, in, out]."""
    return np.transpose(w, (2, 1, 0))


def torch_conv_transpose1d_weight(w: np.ndarray) -> np.ndarray:
    """torch [in, out, k] → our KIO [k, in, out]."""
    return np.transpose(w, (2, 0, 1))


def torch_conv2d_weight(w: np.ndarray) -> np.ndarray:
    """torch [out, in, kh, kw] → HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def torch_linear_weight(w: np.ndarray) -> np.ndarray:
    """torch [out, in] → kernel [in, out]."""
    return np.transpose(w)


def convert_wn_conv1d(sd: tp.Dict[str, np.ndarray], prefix: str) -> tp.Dict[str, np.ndarray]:
    """torch weight_norm Conv1d (weight_g [out,1,1], weight_v [out,in,k]) →
    {v: [k,in,out], g: [out], bias?}."""
    out = {}
    if f"{prefix}.weight_g" in sd:
        g = sd[f"{prefix}.weight_g"].reshape(-1)
        v = sd[f"{prefix}.weight_v"]
    elif f"{prefix}.parametrizations.weight.original0" in sd:
        g = sd[f"{prefix}.parametrizations.weight.original0"].reshape(-1)
        v = sd[f"{prefix}.parametrizations.weight.original1"]
    else:
        # plain conv: fabricate weight-norm decomposition (g = ||w||)
        w = sd[f"{prefix}.weight"]
        norms = np.sqrt((w ** 2).sum(axis=(1, 2)))
        g, v = norms, w
    out["g"] = g.astype(np.float32)
    out["v"] = torch_conv1d_weight(v).astype(np.float32)
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"].astype(np.float32)
    return out


def convert_wn_conv_transpose1d(sd, prefix):
    """torch weight_norm ConvTranspose1d: g is per *input* channel [in,1,1]."""
    out = {}
    if f"{prefix}.weight_g" in sd:
        g = sd[f"{prefix}.weight_g"].reshape(-1)
        v = sd[f"{prefix}.weight_v"]
    elif f"{prefix}.parametrizations.weight.original0" in sd:
        g = sd[f"{prefix}.parametrizations.weight.original0"].reshape(-1)
        v = sd[f"{prefix}.parametrizations.weight.original1"]
    else:
        w = sd[f"{prefix}.weight"]
        norms = np.sqrt((w ** 2).sum(axis=(1, 2)))
        g, v = norms, w
    out["g"] = g.astype(np.float32)
    out["v"] = torch_conv_transpose1d_weight(v).astype(np.float32)
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"].astype(np.float32)
    return out


def convert_snake(sd, prefix):
    return {
        "alpha": sd[f"{prefix}.alpha"].astype(np.float32),
        "beta": sd[f"{prefix}.beta"].astype(np.float32),
    }


# ---------------------------------------------------------------------------
# Oobleck autoencoder importer (reference OobleckEncoder/Decoder layouts)
# ---------------------------------------------------------------------------


def import_oobleck_encoder(sd, prefix: str, n_blocks: int, use_snake: bool) -> dict:
    """torch OobleckEncoder state dict → flax params for our OobleckEncoder.

    torch Sequential layout (reference autoencoders.py:285-318):
      layers.0 = conv_in; layers.1..n = EncoderBlock; layers.n+1 = act;
      layers.n+2 = conv_out. EncoderBlock.layers = [RU, RU, RU, act, down];
      ResidualUnit.layers = [act, conv k7, act, conv k1].
    """
    p = {}
    p["conv_in"] = convert_wn_conv1d(sd, f"{prefix}layers.0")

    def conv_block(src, dst, down_conv_name="down"):
        blk = {}
        for j in range(3):
            ru = f"{src}.layers.{j}.layers"
            unit = {
                "conv1": convert_wn_conv1d(sd, f"{ru}.1"),
                "conv2": convert_wn_conv1d(sd, f"{ru}.3"),
            }
            if use_snake:
                unit["SnakeBeta_0"] = convert_snake(sd, f"{ru}.0")
                unit["SnakeBeta_1"] = convert_snake(sd, f"{ru}.2")
            blk[f"res_{j}"] = unit
        if use_snake:
            blk["SnakeBeta_0"] = convert_snake(sd, f"{src}.layers.3")
        blk[down_conv_name] = convert_wn_conv1d(sd, f"{src}.layers.4")
        return blk

    for i in range(n_blocks):
        p[f"block_{i}"] = conv_block(f"{prefix}layers.{i + 1}", f"block_{i}")
    if use_snake:
        p["SnakeBeta_0"] = convert_snake(sd, f"{prefix}layers.{n_blocks + 1}")
    p["conv_out"] = convert_wn_conv1d(sd, f"{prefix}layers.{n_blocks + 2}")
    return p


def import_oobleck_decoder(sd, prefix: str, n_blocks: int, use_snake: bool,
                           use_nearest_upsample: bool = False) -> dict:
    """torch OobleckDecoder layout (reference :320-355):
      layers.0 = conv_in; layers.1..n = DecoderBlock; layers.n+1 = act;
      layers.n+2 = conv_out (no bias). DecoderBlock.layers =
      [act, upsample, RU, RU, RU].
    """
    p = {}
    p["conv_in"] = convert_wn_conv1d(sd, f"{prefix}layers.0")
    for i in range(n_blocks):
        src = f"{prefix}layers.{i + 1}"
        blk = {}
        if use_snake:
            blk["SnakeBeta_0"] = convert_snake(sd, f"{src}.layers.0")
        if use_nearest_upsample:
            blk["up"] = convert_wn_conv1d(sd, f"{src}.layers.1.1")
        else:
            blk["up"] = convert_wn_conv_transpose1d(sd, f"{src}.layers.1")
        for j in range(3):
            ru = f"{src}.layers.{j + 2}.layers"
            unit = {
                "conv1": convert_wn_conv1d(sd, f"{ru}.1"),
                "conv2": convert_wn_conv1d(sd, f"{ru}.3"),
            }
            if use_snake:
                unit["SnakeBeta_0"] = convert_snake(sd, f"{ru}.0")
                unit["SnakeBeta_1"] = convert_snake(sd, f"{ru}.2")
            blk[f"res_{j}"] = unit
        p[f"block_{i}"] = blk
    if use_snake:
        p["SnakeBeta_0"] = convert_snake(sd, f"{prefix}layers.{n_blocks + 1}")
    p["conv_out"] = convert_wn_conv1d(sd, f"{prefix}layers.{n_blocks + 2}")
    return p


def _dac_snake(sd, key):
    """dac Snake1d alpha [1, C, 1] → (C,)."""
    return {"alpha": sd[key].reshape(-1).astype(np.float32)}


def import_dac_encoder(sd, prefix: str, n_blocks: int) -> dict:
    """descript-audio-codec Encoder state dict → our DACEncoder params.

    torch layout (dac.model.dac Encoder / reference DACEncoderWrapper
    autoencoders.py:365-386): `block.0` conv_in; `block.{1..n}` EncoderBlock
    (`block` = [RU, RU, RU, Snake1d, down-conv], RU.block =
    [Snake1d, conv k7, Snake1d, conv k1]); `block.{n+1}` Snake1d;
    `block.{n+2}` conv_out; wrapper-level `proj_out` 1x1 conv.
    """
    p = {}
    p["conv_in"] = convert_wn_conv1d(sd, f"{prefix}block.0")
    for i in range(n_blocks):
        src = f"{prefix}block.{i + 1}.block"
        blk = {}
        for j in range(3):
            ru = f"{src}.{j}.block"
            blk[f"res_{j}"] = {
                "Snake1d_0": _dac_snake(sd, f"{ru}.0.alpha"),
                "conv1": convert_wn_conv1d(sd, f"{ru}.1"),
                "Snake1d_1": _dac_snake(sd, f"{ru}.2.alpha"),
                "conv2": convert_wn_conv1d(sd, f"{ru}.3"),
            }
        blk["Snake1d_0"] = _dac_snake(sd, f"{src}.3.alpha")
        blk["down"] = convert_wn_conv1d(sd, f"{src}.4")
        p[f"block_{i}"] = blk
    p["Snake1d_0"] = _dac_snake(sd, f"{prefix}block.{n_blocks + 1}.alpha")
    p["conv_out"] = convert_wn_conv1d(sd, f"{prefix}block.{n_blocks + 2}")
    return p


def import_dac_decoder(sd, prefix: str, n_blocks: int) -> dict:
    """descript-audio-codec Decoder state dict → our DACDecoder params.

    torch layout: `model.0` conv_in; `model.{1..n}` DecoderBlock (`block` =
    [Snake1d, WN transpose conv, RU, RU, RU]); `model.{n+1}` Snake1d;
    `model.{n+2}` conv_out (Tanh at the end has no params).
    """
    p = {}
    p["conv_in"] = convert_wn_conv1d(sd, f"{prefix}model.0")
    for i in range(n_blocks):
        src = f"{prefix}model.{i + 1}.block"
        blk = {"Snake1d_0": _dac_snake(sd, f"{src}.0.alpha"),
               "up": convert_wn_conv_transpose1d(sd, f"{src}.1")}
        for j in range(3):
            ru = f"{src}.{j + 2}.block"
            blk[f"res_{j}"] = {
                "Snake1d_0": _dac_snake(sd, f"{ru}.0.alpha"),
                "conv1": convert_wn_conv1d(sd, f"{ru}.1"),
                "Snake1d_1": _dac_snake(sd, f"{ru}.2.alpha"),
                "conv2": convert_wn_conv1d(sd, f"{ru}.3"),
            }
        p[f"block_{i}"] = blk
    p["Snake1d_0"] = _dac_snake(sd, f"{prefix}model.{n_blocks + 1}.alpha")
    p["conv_out"] = convert_wn_conv1d(sd, f"{prefix}model.{n_blocks + 2}")
    return p


def import_torch_lstm(sd, prefix: str, num_layers: int) -> dict:
    """Stacked torch nn.LSTM → our SEANetLSTM params (per-gate flax cells).

    torch packs gates as [i, f, g, o] rows of weight_ih_l{n} [4H, in] /
    weight_hh_l{n} [4H, H]; flax OptimizedLSTMCell uses per-gate dense layers
    i{g} (no bias) and h{g} (bias), so b = b_ih + b_hh lands on the h dense.
    """
    p = {}
    for n in range(num_layers):
        wih = sd[f"{prefix}.weight_ih_l{n}"]
        whh = sd[f"{prefix}.weight_hh_l{n}"]
        bih = sd[f"{prefix}.bias_ih_l{n}"]
        bhh = sd[f"{prefix}.bias_hh_l{n}"]
        H = whh.shape[1]
        cell = {}
        for gi, gate in enumerate(("i", "f", "g", "o")):
            sl = slice(gi * H, (gi + 1) * H)
            cell[f"i{gate}"] = {"kernel": wih[sl].T.astype(np.float32)}
            cell[f"h{gate}"] = {
                "kernel": whh[sl].T.astype(np.float32),
                "bias": (bih[sl] + bhh[sl]).astype(np.float32),
            }
        p[f"lstm_{n}"] = cell
    return p


def _seanet_sconv(sd, name):
    """encodec SConv1d (`.conv.conv` weight-norm nesting) → EncodecConv1d."""
    return {"conv": convert_wn_conv1d(sd, f"{name}.conv.conv")}


def _seanet_resblock(sd, name):
    p = {"conv1": _seanet_sconv(sd, f"{name}.block.1"),
         "conv2": _seanet_sconv(sd, f"{name}.block.3")}
    if f"{name}.shortcut.conv.conv.weight_g" in sd or \
            f"{name}.shortcut.conv.conv.weight" in sd or \
            f"{name}.shortcut.conv.conv.parametrizations.weight.original0" in sd:
        p["shortcut"] = _seanet_sconv(sd, f"{name}.shortcut")
    return p


def import_seanet_encoder(sd, prefix: str, n_ratios: int,
                          n_residual_layers: int = 1, lstm: int = 2) -> dict:
    """pip-encodec SEANetEncoder state dict → our SEANetEncoder params.

    torch Sequential layout (encodec modules/seanet.py): model.0 = SConv1d in;
    per ratio: R resnet blocks, ELU, down SConv1d (R+2 indices); then SLSTM,
    ELU, SConv1d out.
    """
    R = n_residual_layers
    p = {"conv_in": _seanet_sconv(sd, f"{prefix}model.0")}
    for i in range(n_ratios):
        base = 1 + i * (R + 2)
        for j in range(R):
            p[f"res_{i}_{j}"] = _seanet_resblock(sd, f"{prefix}model.{base + j}")
        p[f"down_{i}"] = _seanet_sconv(sd, f"{prefix}model.{base + R + 1}")
    base = 1 + n_ratios * (R + 2)
    if lstm:
        p["lstm"] = import_torch_lstm(sd, f"{prefix}model.{base}.lstm", lstm)
        base += 1
    p["conv_out"] = _seanet_sconv(sd, f"{prefix}model.{base + 1}")
    return p


def import_seanet_decoder(sd, prefix: str, n_ratios: int,
                          n_residual_layers: int = 1, lstm: int = 2) -> dict:
    """pip-encodec SEANetDecoder layout: model.0 = SConv1d in; SLSTM; per
    ratio: ELU, SConvTranspose1d, R resnet blocks; then ELU, SConv1d out."""
    R = n_residual_layers
    p = {"conv_in": _seanet_sconv(sd, f"{prefix}model.0")}
    base = 1
    if lstm:
        p["lstm"] = import_torch_lstm(sd, f"{prefix}model.{base}.lstm", lstm)
        base += 1
    for i in range(n_ratios):
        start = base + i * (R + 2)
        p[f"up_{i}"] = {
            "conv": convert_wn_conv_transpose1d(
                sd, f"{prefix}model.{start + 1}.convtr.convtr"
            )
        }
        for j in range(R):
            p[f"res_{i}_{j}"] = _seanet_resblock(
                sd, f"{prefix}model.{start + 2 + j}"
            )
    end = base + n_ratios * (R + 2)
    p["conv_out"] = _seanet_sconv(sd, f"{prefix}model.{end + 1}")
    return p


def import_autoencoder_state_dict(model, sd: tp.Dict[str, np.ndarray]) -> dict:
    """Reference AudioAutoencoder torch state dict → our variables dict.

    Supports Oobleck and DAC encoder/decoder families (+VAE/tanh bottlenecks,
    which are parameter-free). Returns {'params': {...}} for model.apply.
    """
    enc = model.encoder
    dec = model.decoder
    params = {}
    if type(enc).__name__ == "SEANetEncoder":
        params["encoder"] = import_seanet_encoder(
            sd, "encoder.", len(enc.ratios), enc.n_residual_layers, enc.lstm
        )
        params["decoder"] = import_seanet_decoder(
            sd, "decoder.", len(dec.ratios), dec.n_residual_layers, dec.lstm
        )
        return {"params": params}
    if type(enc).__name__ == "DACEncoder":
        # two layouts exist: the reference DACEncoderWrapper nests the tower
        # under `encoder.encoder.`; descript's raw dac.DAC checkpoints put it
        # directly at `encoder.` — detect from the keys
        enc_prefix = ("encoder.encoder."
                      if any(k.startswith("encoder.encoder.") for k in sd)
                      else "encoder.")
        params["encoder"] = import_dac_encoder(sd, enc_prefix, len(enc.strides))
        if "encoder.proj_out.weight" in sd:
            w = sd["encoder.proj_out.weight"]  # [out, in, 1] conv1x1
            proj = {"kernel": w[:, :, 0].T.astype(np.float32)}
            if "encoder.proj_out.bias" in sd:
                proj["bias"] = sd["encoder.proj_out.bias"].astype(np.float32)
            params["encoder"]["proj_out"] = proj
    else:
        params["encoder"] = import_oobleck_encoder(
            sd, "encoder.", len(enc.c_mults), enc.use_snake
        )
    if type(dec).__name__ == "DACDecoder":
        dec_prefix = ("decoder.decoder."
                      if any(k.startswith("decoder.decoder.") for k in sd)
                      else "decoder.")
        params["decoder"] = import_dac_decoder(sd, dec_prefix, len(dec.rates))
    else:
        params["decoder"] = import_oobleck_decoder(
            sd, "decoder.", len(dec.c_mults), dec.use_snake,
            getattr(dec, "use_nearest_upsample", False),
        )
    return {"params": jax.tree_util.tree_map(jnp.asarray, params)}


def _fold_wn_1x1_to_dense(sd, prefix):
    """torch weight-norm 1x1 Conv1d → flax Dense {kernel, bias}."""
    wn = convert_wn_conv1d(sd, prefix)
    v, g = wn["v"], wn["g"]  # v: [1, in, out]
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = v * (g[None, None, :] / norm)
    out = {"kernel": w[0].astype(np.float32)}
    if "bias" in wn:
        out["bias"] = wn["bias"]
    return out


def import_dac_rvq(sd, prefix: str, n_codebooks: int) -> dict:
    """dac.nn.quantize.ResidualVectorQuantize → our DACResidualVQ params.

    torch layout: quantizers.{i}.in_proj / .out_proj (weight-norm 1x1 convs,
    folded into plain Dense kernels) and .codebook.weight [size, dim]."""
    p = {}
    for i in range(n_codebooks):
        q = f"{prefix}quantizers.{i}"
        p[f"quantizers_{i}"] = {
            "in_proj": _fold_wn_1x1_to_dense(sd, f"{q}.in_proj"),
            "out_proj": _fold_wn_1x1_to_dense(sd, f"{q}.out_proj"),
            "codebook": sd[f"{q}.codebook.weight"].astype(np.float32),
        }
    return p


def import_encodec_rvq(sd, prefix: str, num_quantizers: int) -> dict:
    """encodec/audiocraft ResidualVectorQuantizer → ResidualVQ state.

    torch layout: vq.layers.{i}._codebook.{embed, embed_avg, cluster_size,
    inited}. Returns the 'quantizer_state' collection subtree."""
    embeds, avgs, counts = [], [], []
    for i in range(num_quantizers):
        cb = f"{prefix}vq.layers.{i}._codebook"
        embed = sd[f"{cb}.embed"].astype(np.float32)
        embeds.append(embed)
        cs = sd.get(f"{cb}.cluster_size")
        cnt = (cs.astype(np.float32) if cs is not None
               else np.ones(embed.shape[0], np.float32))
        avg = sd.get(f"{cb}.embed_avg")
        # a consistent fallback must satisfy codebook ≈ ema_sums/ema_counts,
        # or the first EMA update collapses magnitudes by the count scale
        avgs.append(avg.astype(np.float32) if avg is not None
                    else embed * cnt[:, None])
        counts.append(cnt)
    return {
        "codebooks": np.stack(embeds),
        "ema_sums": np.stack(avgs),
        "ema_counts": np.stack(counts),
        "initted": np.asarray(True),
    }


def import_codec_variables(model, sd: tp.Dict[str, np.ndarray]) -> dict:
    """Full pretrained codec (towers + quantizer) → variables dict.

    Handles the dac.DAC layout (encoder/decoder/quantizer.*) and the
    encodec/audiocraft EncodecModel layout. Used by the dac_pretrained /
    audiocraft_pretrained pretransforms (reference pretransforms.py:167,228).
    """
    variables = import_autoencoder_state_dict(model, sd)
    bneck = model.bottleneck
    bname = type(bneck).__name__ if bneck is not None else ""
    if bname in ("DACRVQBottleneck", "DACRVQVAEBottleneck"):
        # raw dac.DAC uses `quantizer.quantizers.*`; a reference-wrapper
        # export nests it under the bottleneck
        if any(k.startswith("quantizer.quantizers.") for k in sd):
            q_prefix = "quantizer."
        elif any(k.startswith("bottleneck.quantizer.quantizers.") for k in sd):
            q_prefix = "bottleneck.quantizer."
        else:
            raise RuntimeError(
                "DAC checkpoint has no quantizer.quantizers.* / "
                "bottleneck.quantizer.quantizers.* keys; refusing to leave "
                "the RVQ codebooks random-initialized."
            )
        variables["params"]["bottleneck"] = {
            "quantizer": import_dac_rvq(sd, q_prefix, bneck.n_codebooks)
        }
    elif bname in ("RVQBottleneck", "RVQVAEBottleneck"):
        if not any(k.startswith("quantizer.vq.layers.") for k in sd):
            raise RuntimeError(
                "encodec checkpoint has no quantizer.vq.layers.* keys; "
                "refusing to leave the RVQ codebooks random-initialized."
            )
        variables["quantizer_state"] = {
            "bottleneck": {"quantizer": import_encodec_rvq(
                sd, "quantizer.", bneck.num_quantizers,
            )}
        }
    return jax.tree_util.tree_map(jnp.asarray, variables)


def remove_weight_norm_from_model(params):
    """Re-normalize WN params so g == ||v|| (reference models/utils.py:31).

    Numerically a no-op at inference; it resets the weight-norm
    reparameterization so subsequent fine-tuning behaves like a plain conv
    (matching the reference's remove_weight_norm semantics for pretransforms).
    """
    import jax

    def walk(node):
        if isinstance(node, dict):
            if "v" in node and "g" in node and hasattr(node["v"], "ndim"):
                v, g = node["v"], node["g"]
                axes = tuple(range(v.ndim - 1)) if g.shape[0] == v.shape[-1] else None
                if axes is not None:
                    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
                    w = v * (g.reshape((1,) * (v.ndim - 1) + (-1,)) / norm)
                    new_norm = jnp.sqrt(jnp.sum(jnp.square(w), axis=axes))
                    return {**node, "v": w, "g": new_norm}
            return {k: walk(vv) for k, vv in node.items()}
        return node

    return walk(params)


# ---------------------------------------------------------------------------
# native checkpoints
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, state, metadata: tp.Optional[dict] = None):
    """Atomic msgpack checkpoint of an arbitrary pytree state."""
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(state))
    os.replace(tmp, path)
    if metadata is not None:
        with open(path + ".json", "w") as f:
            json.dump(metadata, f)


def load_checkpoint(path: str, target):
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def save_checkpoint_orbax(path: str, state):
    """Sharded/async checkpoint via orbax (multi-host safe)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)


def load_checkpoint_orbax(path: str, target=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(os.path.abspath(path), item=target)
    return ckptr.restore(os.path.abspath(path))


def export_safetensors(path: str, params, metadata: tp.Optional[dict] = None):
    """Export flax params to safetensors (flat dot-joined names)."""
    from safetensors.numpy import save_file

    flat = {k: np.asarray(v) for k, v in flatten_params(params).items()}
    save_file(flat, path, metadata={k: str(v) for k, v in (metadata or {}).items()})


def load_safetensors_params(path: str) -> dict:
    from safetensors.numpy import load_file

    return unflatten_params({k: jnp.asarray(v) for k, v in load_file(path).items()})
