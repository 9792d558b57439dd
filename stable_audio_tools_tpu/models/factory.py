"""Config-driven factories — the JSON model config is the public API.

Mirrors reference stable_audio_tools/models/factory.py: the same JSON schema
(model_type, pretransform/bottleneck/encoder/decoder type+config sub-dicts)
builds the equivalent flax modules. Unsupported torch-specific kwargs are
accepted and ignored so reference configs run as-is.
"""

from __future__ import annotations

import json
from typing import Any, Dict

from flax import linen as nn


def _filter_kwargs(cls, cfg: Dict[str, Any], renames: Dict[str, str] = {}) -> Dict[str, Any]:
    """Keep only kwargs the flax dataclass accepts; apply renames."""
    cfg = {renames.get(k, k): v for k, v in cfg.items()}
    fields = {f.name for f in cls.__dataclass_fields__.values()} if hasattr(
        cls, "__dataclass_fields__"
    ) else set()
    out = {k: v for k, v in cfg.items() if k in fields}
    # lists -> tuples for hashable flax fields
    return {k: tuple(v) if isinstance(v, list) else v for k, v in out.items()}


def create_model_from_config(model_config: Dict[str, Any]):
    model_type = model_config.get("model_type", None)
    assert model_type is not None, "model_type must be specified in model config"

    if model_type == "autoencoder":
        from .autoencoders import AudioAutoencoder

        return create_autoencoder_from_config(model_config)
    elif model_type == "diffusion_uncond":
        from .diffusion import create_diffusion_uncond_from_config

        return create_diffusion_uncond_from_config(model_config)
    elif model_type in ("diffusion_cond", "diffusion_cond_inpaint"):
        from .diffusion import create_diffusion_cond_from_config

        return create_diffusion_cond_from_config(model_config)
    elif model_type == "diffusion_autoencoder":
        from .diffusion import create_diffAE_from_config

        return create_diffAE_from_config(model_config)
    elif model_type == "lm":
        from .lm import create_audio_lm_from_config

        return create_audio_lm_from_config(model_config)
    else:
        raise NotImplementedError(f"Unknown model type: {model_type}")


def create_model_from_config_path(model_config_path: str):
    with open(model_config_path) as f:
        return create_model_from_config(json.load(f))


def create_encoder_from_config(encoder_config: Dict[str, Any]):
    from .autoencoders import OobleckEncoder, TAAEEncoder
    from .dac import DACEncoder
    from .seanet import SEANetEncoder

    enc_type = encoder_config.get("type", None)
    assert enc_type is not None, "Encoder type must be specified"
    cfg = encoder_config.get("config", {})
    if enc_type == "oobleck":
        return OobleckEncoder(
            **_filter_kwargs(OobleckEncoder, cfg, {"antialias_activation": "antialias"})
        )
    elif enc_type == "taae":
        return TAAEEncoder(**_filter_kwargs(TAAEEncoder, cfg))
    elif enc_type == "dac":
        # reference DACEncoderWrapper (autoencoders.py:365-386): conv_out stays
        # at d_model*2^len(strides) and `latent_dim` adds a 1x1 proj after it
        return DACEncoder(**_filter_kwargs(DACEncoder, cfg))
    elif enc_type == "seanet":
        # The reference reverses ratios before pip SEANetEncoder
        # (autoencoders.py:795-800), and pip encodec re-reverses internally —
        # net effect: the encoder downsamples in *config order*. Our module
        # iterates ratios directly, so pass them through unchanged.
        return SEANetEncoder(**_filter_kwargs(SEANetEncoder, cfg))
    elif enc_type == "local_attn":
        from .local_attention import TransformerEncoder1D

        return TransformerEncoder1D(**_filter_kwargs(TransformerEncoder1D, cfg))
    else:
        raise ValueError(f"Unknown encoder type {enc_type}")


def create_decoder_from_config(decoder_config: Dict[str, Any]):
    from .autoencoders import OobleckDecoder, TAAEDecoder
    from .dac import DACDecoder
    from .seanet import SEANetDecoder

    dec_type = decoder_config.get("type", None)
    assert dec_type is not None, "Decoder type must be specified"
    cfg = decoder_config.get("config", {})
    if dec_type == "oobleck":
        return OobleckDecoder(
            **_filter_kwargs(OobleckDecoder, cfg, {"antialias_activation": "antialias"})
        )
    elif dec_type == "taae":
        return TAAEDecoder(**_filter_kwargs(TAAEDecoder, cfg))
    elif dec_type == "dac":
        # reference DACDecoderWrapper names: latent_dim → input_channel,
        # out_channels → d_out (autoencoders.py:388-399)
        return DACDecoder(**_filter_kwargs(
            DACDecoder, cfg,
            renames={"latent_dim": "input_channel", "out_channels": "d_out"},
        ))
    elif dec_type == "seanet":
        return SEANetDecoder(**_filter_kwargs(SEANetDecoder, cfg))
    elif dec_type == "local_attn":
        from .local_attention import TransformerDecoder1D

        return TransformerDecoder1D(**_filter_kwargs(TransformerDecoder1D, cfg))
    else:
        raise ValueError(f"Unknown decoder type {dec_type}")


def create_bottleneck_from_config(bottleneck_config: Dict[str, Any]):
    from . import bottleneck as B

    b_type = bottleneck_config.get("type", None)
    assert b_type is not None, "type must be specified in bottleneck config"
    cfg = bottleneck_config.get("config", {})

    if b_type == "tanh":
        return B.TanhBottleneck(**_filter_kwargs(B.TanhBottleneck, cfg))
    elif b_type == "vae":
        return B.VAEBottleneck()
    elif b_type == "rvq":
        return B.RVQBottleneck(**_filter_kwargs(B.RVQBottleneck, cfg))
    elif b_type == "rvq_vae":
        return B.RVQVAEBottleneck(**_filter_kwargs(B.RVQVAEBottleneck, cfg))
    elif b_type == "dac_rvq":
        return B.DACRVQBottleneck(**_filter_kwargs(B.DACRVQBottleneck, cfg))
    elif b_type == "dac_rvq_vae":
        return B.DACRVQVAEBottleneck(**_filter_kwargs(B.DACRVQVAEBottleneck, cfg))
    elif b_type == "l2_norm":
        return B.L2Bottleneck()
    elif b_type == "wasserstein":
        return B.WassersteinBottleneck(**_filter_kwargs(B.WassersteinBottleneck, cfg))
    elif b_type == "fsq":
        return B.FSQBottleneck(**_filter_kwargs(B.FSQBottleneck, cfg))
    elif b_type == "dithered_fsq":
        return B.DitheredFSQBottleneck(**_filter_kwargs(B.DitheredFSQBottleneck, cfg))
    elif b_type == "softnorm":
        return B.SoftNormBottleneck(**_filter_kwargs(B.SoftNormBottleneck, cfg))
    else:
        raise NotImplementedError(f"Unknown bottleneck type: {b_type}")


def create_pretransform_from_config(pretransform_config: Dict[str, Any], sample_rate: int):
    from . import pretransforms as P

    p_type = pretransform_config.get("type", None)
    assert p_type is not None, "type must be specified in pretransform config"
    enable_grad = pretransform_config.get("enable_grad", False)

    if p_type == "autoencoder":
        autoencoder_config = {
            "sample_rate": sample_rate,
            "model": pretransform_config["config"],
        }
        autoencoder = create_autoencoder_from_config(autoencoder_config)
        return P.AutoencoderPretransform(
            model=autoencoder,
            scale=pretransform_config.get("scale", 1.0),
            model_half=pretransform_config.get("model_half", False),
            chunked=pretransform_config.get("chunked", False),
            enable_grad=enable_grad,
            io_channels=autoencoder.io_channels,
            is_discrete=autoencoder.is_discrete,
            encoded_channels=autoencoder.latent_dim,
            downsampling_ratio=autoencoder.downsampling_ratio,
        )
    elif p_type == "wavelet":
        cfg = pretransform_config["config"]
        return P.WaveletPretransform(
            channels=cfg["channels"],
            levels=cfg["levels"],
            wavelet=cfg["wavelet"],
            enable_grad=enable_grad,
            io_channels=cfg["channels"],
            encoded_channels=cfg["channels"] * (2 ** cfg["levels"]),
            downsampling_ratio=2 ** cfg["levels"],
        )
    elif p_type == "pqmf":
        cfg = pretransform_config["config"]
        num_bands = cfg.get("num_bands", 16)
        return P.PQMFPretransform(
            **_filter_kwargs(P.PQMFPretransform, cfg),
            enable_grad=enable_grad,
            downsampling_ratio=num_bands,
        )
    elif p_type == "dac_pretrained":
        # reference models/pretransforms.py:167 (PretrainedDACPretransform):
        # builds dac.DAC via hub download; here the canonical descript
        # architectures are built in-repo and weights come from ckpt_path.
        cfg = pretransform_config.get("config", {})
        model_type = cfg.get("model_type", "44khz")
        archs = {
            "44khz": dict(strides=[2, 4, 8, 8], dec_rates=[8, 8, 4, 2],
                          n_codebooks=9, ratio=512),
            "24khz": dict(strides=[2, 4, 5, 8], dec_rates=[8, 5, 4, 2],
                          n_codebooks=32, ratio=320),
            "16khz": dict(strides=[2, 4, 5, 8], dec_rates=[8, 5, 4, 2],
                          n_codebooks=12, ratio=320),
        }
        if model_type in archs:
            arch = archs[model_type]
        elif "strides" in cfg:
            # custom DAC variant: architecture straight from the config
            strides = list(cfg["strides"])
            ratio = 1
            for s in strides:
                ratio *= s
            arch = dict(strides=strides,
                        dec_rates=cfg.get("dec_rates", strides[::-1]),
                        n_codebooks=cfg.get("n_codebooks", 9), ratio=ratio)
        else:
            raise ValueError(
                f"dac_pretrained model_type {model_type!r} is not one of "
                f"{sorted(archs)}; for a custom DAC pass strides/dec_rates/"
                "n_codebooks in the config instead"
            )
        latent = cfg.get("latent_dim", 1024)
        n_codebooks = cfg.get("n_codebooks", arch["n_codebooks"])
        codebook_size = cfg.get("codebook_size", 1024)
        ae_config = {
            "sample_rate": sample_rate,
            "model": {
                "encoder": {"type": "dac", "config": {
                    "in_channels": 1, "d_model": cfg.get("d_model", 64),
                    "strides": arch["strides"]}},
                "decoder": {"type": "dac", "config": {
                    "latent_dim": latent, "channels": cfg.get("channels", 1536),
                    "rates": arch["dec_rates"], "out_channels": 1}},
                "bottleneck": {"type": "dac_rvq", "config": {
                    "input_dim": latent, "n_codebooks": n_codebooks,
                    "codebook_size": codebook_size,
                    "codebook_dim": cfg.get("codebook_dim", 8),
                    "quantize_on_decode": cfg.get("quantize_on_decode", True)}},
                "latent_dim": latent,
                "downsampling_ratio": arch["ratio"],
                "io_channels": 1,
            },
        }
        autoencoder = create_autoencoder_from_config(ae_config)
        return P.PretrainedCodecPretransform(
            model=autoencoder,
            scale=cfg.get("scale", 1.0),
            chunked=cfg.get("chunked", True),
            enable_grad=False,
            io_channels=1,
            is_discrete=True,
            encoded_channels=latent,
            downsampling_ratio=arch["ratio"],
            num_quantizers=n_codebooks,
            codebook_size=codebook_size,
            ckpt_path=cfg.get("ckpt_path"),
        )
    elif p_type == "audiocraft_pretrained":
        # reference models/pretransforms.py:228
        # (AudiocraftCompressionPretransform): MusicGen's EnCodec codec.
        # encoder ratios are in *processing order* (audiocraft reverses its
        # descending list internally); decoder upsamples descending.
        cfg = pretransform_config.get("config", {})
        model_type = cfg.get("model_type", "facebook/encodec_32khz")
        arch = {
            "facebook/encodec_32khz": dict(
                ratios=[8, 5, 4, 4], n_filters=64, dimension=128,
                num_quantizers=4, codebook_size=2048, channels=1),
        }.get(model_type, dict(
            ratios=cfg.get("ratios", [8, 5, 4, 4]),
            n_filters=cfg.get("n_filters", 64),
            dimension=cfg.get("dimension", 128),
            num_quantizers=cfg.get("num_quantizers", 4),
            codebook_size=cfg.get("codebook_size", 2048),
            channels=cfg.get("channels", 1)))
        ratios = list(arch["ratios"])
        ratio = 1
        for r in ratios:
            ratio *= r
        seanet_common = {
            "channels": arch["channels"], "dimension": arch["dimension"],
            "n_filters": arch["n_filters"], "n_residual_layers": 1,
            "dilation_base": 2, "lstm": 2, "norm": "weight_norm",
            # audiocraft's SEANet defaults true_skip=True (identity resnet
            # skips, NO 1x1 shortcut convs) — facebook/encodec_32khz etc.
            # have no shortcut weights. pip-encodec layouts set this False.
            "true_skip": cfg.get("true_skip", True),
            # streaming EnCodec models (e.g. encodec_24khz) are causal:
            # left-only pads, not centered — must match the checkpoint
            "causal": cfg.get("causal", False),
        }
        ae_config = {
            "sample_rate": sample_rate,
            "model": {
                "encoder": {"type": "seanet", "config": {
                    **seanet_common, "ratios": list(reversed(ratios))}},
                "decoder": {"type": "seanet", "config": {
                    **seanet_common, "ratios": ratios}},
                "bottleneck": {"type": "rvq", "config": {
                    "dim": arch["dimension"],
                    "num_quantizers": arch["num_quantizers"],
                    "codebook_size": arch["codebook_size"]}},
                "latent_dim": arch["dimension"],
                "downsampling_ratio": ratio,
                "io_channels": arch["channels"],
            },
        }
        autoencoder = create_autoencoder_from_config(ae_config)
        return P.PretrainedCodecPretransform(
            model=autoencoder,
            scale=cfg.get("scale", 1.0),
            enable_grad=False,
            io_channels=arch["channels"],
            is_discrete=True,
            encoded_channels=arch["dimension"],
            downsampling_ratio=ratio,
            num_quantizers=arch["num_quantizers"],
            codebook_size=arch["codebook_size"],
            ckpt_path=cfg.get("ckpt_path"),
        )
    elif p_type == "patched":
        cfg = pretransform_config["config"]
        patch_size = cfg.get("patch_size", 1)
        io_channels = cfg.get("io_channels", 2)
        return P.PatchedPretransform(
            patch_size=patch_size,
            enable_grad=enable_grad,
            io_channels=io_channels,
            encoded_channels=io_channels * patch_size,
            downsampling_ratio=patch_size,
        )
    else:
        raise NotImplementedError(f"Unknown pretransform type: {p_type}")


def create_autoencoder_from_config(config: Dict[str, Any]):
    from .autoencoders import AudioAutoencoder

    ae_config = config["model"]
    encoder = create_encoder_from_config(ae_config["encoder"])
    decoder = create_decoder_from_config(ae_config["decoder"])

    bottleneck_cfg = ae_config.get("bottleneck", None)
    bottleneck = create_bottleneck_from_config(bottleneck_cfg) if bottleneck_cfg else None

    latent_dim = ae_config.get("latent_dim", None)
    assert latent_dim is not None, "latent_dim must be specified in model config"
    downsampling_ratio = ae_config.get("downsampling_ratio", None)
    assert downsampling_ratio is not None, "downsampling_ratio must be specified in model config"
    io_channels = ae_config.get("io_channels", None)
    assert io_channels is not None, "io_channels must be specified in model config"
    sample_rate = config.get("sample_rate", None)
    assert sample_rate is not None, "sample_rate must be specified in model config"

    pretransform_cfg = ae_config.get("pretransform", None)
    pretransform = (
        create_pretransform_from_config(pretransform_cfg, sample_rate)
        if pretransform_cfg
        else None
    )

    return AudioAutoencoder(
        encoder=encoder,
        decoder=decoder,
        latent_dim=latent_dim,
        downsampling_ratio=downsampling_ratio,
        sample_rate=sample_rate,
        io_channels=io_channels,
        bottleneck=bottleneck,
        pretransform=pretransform,
        in_channels=ae_config.get("in_channels", None),
        out_channels=ae_config.get("out_channels", None),
        soft_clip=ae_config.get("soft_clip", False),
    )
