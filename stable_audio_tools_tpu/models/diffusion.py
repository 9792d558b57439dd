"""Diffusion model wrappers + factories.

Capability parity with reference stable_audio_tools/models/diffusion.py:
DiffusionModelWrapper (uncond), ConditionedDiffusionModelWrapper with
cross_attn/global/input_concat/prepend conditioning routing (:137-214),
DiTWrapper/DiTUncondWrapper/DAU1DCondWrapper adapters, and the
create_diffusion_{uncond,cond}_from_config factories (:579-708).

The conditioner is split (see conditioners.py): the flax ConditionerBank is a
submodule here so its learnable params live in this wrapper's param tree; the
host half (MultiConditioner) is attached to the handle (models/handles.py).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .conditioners import (
    ConditionerBank,
    MultiConditioner,
    create_multi_conditioner_from_conditioning_config,
)
from .dance_unet import DiffusionAttnUnet1D
from .dit import DiffusionTransformer
from .factory import create_pretransform_from_config, _filter_kwargs


class DiffusionModelWrapper(nn.Module):
    """Unconditional diffusion wrapper (reference diffusion.py:44-68)."""

    model: nn.Module
    io_channels: int
    sample_size: int
    sample_rate: int
    min_input_length: int
    pretransform: tp.Optional[nn.Module] = None
    diffusion_objective: str = "v"

    def __call__(self, x, t, **kwargs):
        return self.model(x, t, **kwargs)

    def init_full(self, x, t, **kwargs):
        """Init entry that also builds pretransform params (decode+encode)."""
        out = self.model(x, t, **kwargs)
        if self.pretransform is not None:
            audio = self.pretransform.decode(x)
            self.pretransform.encode(audio)
        return out

    def pretransform_encode(self, audio):
        return self.pretransform.encode(audio)

    def pretransform_decode(self, latents, **kwargs):
        return self.pretransform.decode(latents, **kwargs)


class ConditionedDiffusionModelWrapper(nn.Module):
    """Conditioned diffusion wrapper (reference diffusion.py:99-221)."""

    model: nn.Module
    conditioner: tp.Optional[ConditionerBank]
    io_channels: int
    sample_rate: int
    min_input_length: int
    diffusion_objective: str = "v"
    pretransform: tp.Optional[nn.Module] = None
    cross_attn_cond_ids: tp.Tuple[str, ...] = ()
    global_cond_ids: tp.Tuple[str, ...] = ()
    input_concat_ids: tp.Tuple[str, ...] = ()
    prepend_cond_ids: tp.Tuple[str, ...] = ()
    distribution_shift_options: tp.Optional[tp.Mapping[str, tp.Any]] = None

    def get_conditioning_inputs(self, conditioning_tensors, negative=False):
        """Route {key: (tensor, mask)} into model kwargs (reference :137-214)."""
        cross_attention_input = None
        cross_attention_masks = None
        global_cond = None
        input_concat_cond = None
        prepend_cond = None
        prepend_cond_mask = None

        if len(self.cross_attn_cond_ids) > 0:
            ins, masks = [], []
            for key in self.cross_attn_cond_ids:
                cross_attn_in, cross_attn_mask = conditioning_tensors[key]
                if cross_attn_in.ndim == 2:
                    cross_attn_in = cross_attn_in[:, None, :]
                    if cross_attn_mask is not None:
                        cross_attn_mask = cross_attn_mask[:, None]
                if cross_attn_mask is None:
                    cross_attn_mask = jnp.ones(cross_attn_in.shape[:2], dtype=bool)
                ins.append(cross_attn_in)
                masks.append(cross_attn_mask)
            cross_attention_input = jnp.concatenate(ins, axis=1)
            cross_attention_masks = jnp.concatenate(masks, axis=1)

        if len(self.global_cond_ids) > 0:
            global_conds = []
            for key in self.global_cond_ids:
                g = conditioning_tensors[key][0]
                global_conds.append(g)
            global_cond = jnp.concatenate(global_conds, axis=-1)
            if global_cond.ndim == 3:
                global_cond = global_cond.squeeze(1)

        if len(self.input_concat_ids) > 0:
            input_concat_cond = jnp.concatenate(
                [conditioning_tensors[key][0] for key in self.input_concat_ids], axis=1
            )

        if len(self.prepend_cond_ids) > 0:
            conds, masks = [], []
            for key in self.prepend_cond_ids:
                c, m = conditioning_tensors[key]
                if m is None:
                    m = jnp.ones(c.shape[:2], dtype=bool)
                conds.append(c)
                masks.append(m)
            prepend_cond = jnp.concatenate(conds, axis=1)
            prepend_cond_mask = jnp.concatenate(masks, axis=1)

        if negative:
            return {
                "negative_cross_attn_cond": cross_attention_input,
                "negative_cross_attn_mask": cross_attention_masks,
                "negative_global_cond": global_cond,
                "negative_input_concat_cond": input_concat_cond,
            }
        return {
            "cross_attn_cond": cross_attention_input,
            "cross_attn_mask": cross_attention_masks,
            "global_cond": global_cond,
            "input_concat_cond": input_concat_cond,
            "prepend_cond": prepend_cond,
            "prepend_cond_mask": prepend_cond_mask,
        }

    def run_conditioner(self, prepared):
        """Prepared host inputs → {key: (tensor, mask)}."""
        assert self.conditioner is not None, "Model has no conditioner"
        return self.conditioner(prepared)

    def __call__(self, x, t, cond=None, cond_tensors=None, **kwargs):
        """cond: prepared host inputs (dict of dicts of arrays); or pass
        cond_tensors: {key: (tensor, mask)} directly."""
        if cond_tensors is None:
            cond_tensors = self.run_conditioner(cond) if cond is not None else {}
        cond_kwargs = self.get_conditioning_inputs(cond_tensors) if cond_tensors else {}
        # explicit kwargs (e.g. inpainting input_concat_cond) override routing
        merged = {**cond_kwargs, **{k: v for k, v in kwargs.items() if v is not None
                                    or k not in cond_kwargs}}
        return self.model(x, t, **merged)

    def init_full(self, x, t, cond=None, **kwargs):
        """Init entry that also builds pretransform params (decode+encode)."""
        out = self.__call__(x, t, cond=cond, **kwargs)
        if self.pretransform is not None:
            audio = self.pretransform.decode(x)
            self.pretransform.encode(audio)
        return out

    def pretransform_encode(self, audio):
        z = self.pretransform.encode(audio)
        return jax.lax.stop_gradient(z) if not self.pretransform.enable_grad else z

    def pretransform_decode(self, latents, **kwargs):
        return self.pretransform.decode(latents, **kwargs)


class DiTWrapper(nn.Module):
    """Adapter: ConditionedDiffusionModel kwargs → DiffusionTransformer."""

    dit: DiffusionTransformer

    def __call__(self, x, t, cross_attn_cond=None, cross_attn_mask=None,
                 negative_cross_attn_cond=None, negative_cross_attn_mask=None,
                 input_concat_cond=None, negative_input_concat_cond=None,
                 global_cond=None, negative_global_cond=None,
                 prepend_cond=None, prepend_cond_mask=None,
                 cfg_scale=1.0, cfg_dropout_prob=0.0, batch_cfg=True,
                 rescale_cfg=False, scale_phi=0.0, **kwargs):
        return self.dit(
            x, t,
            cross_attn_cond=cross_attn_cond,
            cross_attn_cond_mask=cross_attn_mask,
            negative_cross_attn_cond=negative_cross_attn_cond,
            negative_cross_attn_mask=negative_cross_attn_mask,
            input_concat_cond=input_concat_cond,
            global_embed=global_cond,
            prepend_cond=prepend_cond,
            prepend_cond_mask=prepend_cond_mask,
            cfg_scale=cfg_scale,
            cfg_dropout_prob=cfg_dropout_prob,
            scale_phi=scale_phi,
            **kwargs,
        )

    @property
    def patch_size(self):
        return self.dit.patch_size


class DiTUncondWrapper(nn.Module):
    dit: DiffusionTransformer

    def __call__(self, x, t, **kwargs):
        return self.dit(x, t, **kwargs)


class DAU1DCondWrapper(nn.Module):
    """Dance-diffusion UNet with input-concat conditioning (reference :359)."""

    unet: DiffusionAttnUnet1D

    def __call__(self, x, t, input_concat_cond=None, **kwargs):
        return self.unet(x, t, cond=input_concat_cond)


DIT_FIELDS = {f for f in DiffusionTransformer.__dataclass_fields__}


def _dit_from_config(cfg: tp.Dict[str, tp.Any], diffusion_objective: str):
    kwargs = {k: v for k, v in cfg.items() if k in DIT_FIELDS}
    # tuples for list-valued fields
    kwargs = {k: tuple(v) if isinstance(v, list) else v for k, v in kwargs.items()}
    return DiffusionTransformer(diffusion_objective=diffusion_objective, **kwargs)


def create_diffusion_uncond_from_config(config: tp.Dict[str, tp.Any]):
    ducfg = config["model"]
    model_type = ducfg.get("type", None)
    diffusion_config = ducfg.get("config", {})
    assert model_type is not None, "Must specify model type in config"

    sample_size = config.get("sample_size", None)
    assert sample_size is not None, "Must specify sample size in config"
    sample_rate = config.get("sample_rate", None)
    assert sample_rate is not None, "Must specify sample rate in config"

    pretransform = ducfg.get("pretransform", None)
    if pretransform is not None:
        pretransform = create_pretransform_from_config(pretransform, sample_rate)
        min_input_length = pretransform.downsampling_ratio
    else:
        min_input_length = 1

    if model_type == "DAU1d":
        model = DiffusionAttnUnet1D(
            **_filter_kwargs(DiffusionAttnUnet1D, diffusion_config)
        )
        io_channels = model.io_channels
        min_input_length *= int(np.prod([s for s in model.strides]))
    elif model_type == "adp_uncond_1d":
        # reference diffusion.py:608-613 → UNet1DUncondWrapper(UNet1d)
        from .adp import UNET_FIELDS, UNet1d, UNet1DUncondWrapper

        cfg = {k: tuple(v) if isinstance(v, list) else v
               for k, v in diffusion_config.items() if k in UNET_FIELDS}
        model = UNet1DUncondWrapper(unet=UNet1d(**cfg))
        io_channels = cfg["in_channels"]
        min_input_length *= int(np.prod(cfg["factors"])) * cfg.get("patch_size", 1)
    elif model_type == "dit":
        dit = _dit_from_config(diffusion_config, "v")
        model = DiTUncondWrapper(dit=dit)
        io_channels = dit.io_channels
        min_input_length *= dit.patch_size
    else:
        raise NotImplementedError(f"Unknown model type: {model_type}")

    return DiffusionModelWrapper(
        model=model,
        io_channels=io_channels,
        sample_size=sample_size,
        sample_rate=sample_rate,
        min_input_length=min_input_length,
        pretransform=pretransform,
    )


def create_diffusion_cond_from_config(config: tp.Dict[str, tp.Any]):
    model_config = config["model"]
    model_type = config["model_type"]

    diffusion_config = model_config.get("diffusion", None)
    assert diffusion_config is not None, "Must specify diffusion config"
    diffusion_objective = diffusion_config.get("diffusion_objective", "v")
    diffusion_model_type = diffusion_config.get("type", None)
    assert diffusion_model_type is not None, "Must specify diffusion model type"
    diffusion_model_config = diffusion_config.get("config", None)
    assert diffusion_model_config is not None, "Must specify diffusion model config"

    io_channels = model_config.get("io_channels", None)
    assert io_channels is not None, "Must specify io_channels in model config"
    sample_rate = config.get("sample_rate", None)
    assert sample_rate is not None, "Must specify sample_rate in config"

    cross_attention_ids = tuple(diffusion_config.get("cross_attention_cond_ids", []))
    global_cond_ids = tuple(diffusion_config.get("global_cond_ids", []))
    input_concat_ids = tuple(diffusion_config.get("input_concat_ids", []))
    prepend_cond_ids = tuple(diffusion_config.get("prepend_cond_ids", []))

    pretransform = model_config.get("pretransform", None)
    if pretransform is not None:
        pretransform = create_pretransform_from_config(pretransform, sample_rate)
        min_input_length = pretransform.downsampling_ratio
    else:
        min_input_length = 1

    conditioning_config = model_config.get("conditioning", None)
    multi_conditioner = None
    bank = None
    if conditioning_config is not None:
        multi_conditioner = create_multi_conditioner_from_conditioning_config(
            conditioning_config, pretransform=pretransform
        )
        bank = multi_conditioner.make_bank()

    if diffusion_model_type == "dit":
        dit = _dit_from_config(diffusion_model_config, diffusion_objective)
        diffusion_model = DiTWrapper(dit=dit)
        min_input_length *= dit.patch_size
    elif diffusion_model_type in ("adp_cfg_1d", "adp_1d"):
        from .adp import create_adp_cond_wrapper

        diffusion_model = create_adp_cond_wrapper(
            diffusion_model_type, diffusion_model_config
        )
        min_input_length *= int(np.prod(diffusion_model_config["factors"]))
    else:
        raise NotImplementedError(f"Unknown diffusion model type {diffusion_model_type}")

    wrapper = ConditionedDiffusionModelWrapper(
        model=diffusion_model,
        conditioner=bank,
        io_channels=io_channels,
        sample_rate=sample_rate,
        min_input_length=min_input_length,
        diffusion_objective=diffusion_objective,
        pretransform=pretransform,
        cross_attn_cond_ids=cross_attention_ids,
        global_cond_ids=global_cond_ids,
        input_concat_ids=input_concat_ids,
        prepend_cond_ids=prepend_cond_ids,
        distribution_shift_options=diffusion_config.get("distribution_shift_options"),
    )
    # attach the host half so handles/generation can reach it (not a flax field)
    object.__setattr__(wrapper, "_multi_conditioner", multi_conditioner)
    return wrapper


def create_diffAE_from_config(config: tp.Dict[str, tp.Any]):
    from .diffusion_ae import create_diffAE_from_config as _impl

    return _impl(config)
