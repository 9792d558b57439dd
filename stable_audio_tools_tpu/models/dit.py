"""DiffusionTransformer (DiT) — the flagship denoiser backbone.

Capability parity with reference stable_audio_tools/models/dit.py:12-430:
patchify 1x1 zero-init pre/post convs, Fourier timestep embed → MLP, cond
projections (to_cond/to_global/to_prepend), global cond via prepend token or
adaLN, input-concat interpolation, batch-doubled CFG with negative conds +
rescale (scale_phi) + cfg_interval gating, CFG dropout (training), early exit.

TPU-first: CFG batch-doubling happens inside the jitted forward (so samplers
keep a single fused program); the cfg_interval gate is a jnp.where select on
the already-computed cond/uncond halves instead of a host branch.
"""

from __future__ import annotations

import math
from typing import Literal, Optional, Tuple

tp_Optional_str = Optional[str]

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv import Conv1d
from ..ops.embeddings import FourierFeatures
from ..ops.transformer import ContinuousTransformer


class MLPProj(nn.Module):
    """Linear -> SiLU -> Linear projection used for cond embeds."""

    hidden: int
    out: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, use_bias=self.use_bias, name="0", dtype=x.dtype,
                     param_dtype=jnp.float32)(x)
        x = jax.nn.silu(x)
        return nn.Dense(self.out, use_bias=self.use_bias, name="2", dtype=x.dtype,
                        param_dtype=jnp.float32)(x)


class DiffusionTransformer(nn.Module):
    io_channels: int = 32
    patch_size: int = 1
    embed_dim: int = 768
    cond_token_dim: int = 0
    project_cond_tokens: bool = True
    global_cond_dim: int = 0
    project_global_cond: bool = True
    input_concat_dim: int = 0
    prepend_cond_dim: int = 0
    depth: int = 12
    num_heads: int = 8
    global_cond_type: Literal["prepend", "adaLN"] = "prepend"
    timestep_cond_type: Literal["global", "input_concat"] = "global"
    timestep_embed_dim: Optional[int] = None
    diffusion_objective: Literal["v", "rectified_flow", "rf_denoiser"] = "v"
    # compute dtype: "bfloat16" runs the transformer in bf16 (norms/softmax
    # stay fp32 inside the blocks); params remain fp32. ~3x MXU throughput.
    compute_dtype: tp_Optional_str = None
    # transformer kwargs
    use_checkpointing: bool = True
    layer_scale: bool = False
    qk_norm: Literal["l2", "ln", "dyt", "none"] = "none"
    ff_mult: float = 4
    num_memory_tokens: int = 0
    sliding_window: Optional[Tuple[int, int]] = None

    def _timestep_embed_dim(self):
        if self.timestep_cond_type == "global":
            return self.embed_dim
        assert self.timestep_embed_dim is not None
        return self.timestep_embed_dim

    def _input_concat_total(self):
        extra = self._timestep_embed_dim() if self.timestep_cond_type == "input_concat" else 0
        return self.input_concat_dim + extra

    @nn.compact
    def _forward(
        self,
        x,
        t,
        cross_attn_cond=None,
        cross_attn_cond_mask=None,
        input_concat_cond=None,
        global_embed=None,
        prepend_cond=None,
        prepend_cond_mask=None,
        return_info=False,
        exit_layer_ix=None,
    ):
        """x: [B, C, T] (reference layout); internal transformer runs NLC."""
        in_dtype = x.dtype
        if self.compute_dtype is not None:
            cdt = jnp.dtype(self.compute_dtype)
            x = x.astype(cdt)
            t = t.astype(cdt)
            cross_attn_cond = (cross_attn_cond.astype(cdt)
                               if cross_attn_cond is not None else None)
            input_concat_cond = (input_concat_cond.astype(cdt)
                                 if input_concat_cond is not None else None)
            global_embed = (global_embed.astype(cdt)
                            if global_embed is not None else None)
            prepend_cond = (prepend_cond.astype(cdt)
                            if prepend_cond is not None else None)
        cond_embed_dim = (
            self.cond_token_dim if not self.project_cond_tokens else self.embed_dim
        )
        global_embed_dim = (
            self.global_cond_dim if not self.project_global_cond else self.embed_dim
        )
        timestep_embed_dim = self._timestep_embed_dim()

        if cross_attn_cond is not None:
            cross_attn_cond = MLPProj(cond_embed_dim, cond_embed_dim, name="to_cond_embed")(
                cross_attn_cond
            )
        if global_embed is not None:
            global_embed = MLPProj(
                global_embed_dim, global_embed_dim, name="to_global_embed"
            )(global_embed)

        prepend_inputs = None
        prepend_mask = None
        prepend_length = 0
        if prepend_cond is not None:
            prepend_cond = MLPProj(self.embed_dim, self.embed_dim, name="to_prepend_embed")(
                prepend_cond
            )
            prepend_inputs = prepend_cond
            prepend_mask = prepend_cond_mask
            prepend_length = prepend_cond.shape[1]

        if input_concat_cond is not None:
            if input_concat_cond.shape[2] != x.shape[2]:
                # nearest interpolation along time
                idx = jnp.floor(
                    jnp.arange(x.shape[2]) * (input_concat_cond.shape[2] / x.shape[2])
                ).astype(jnp.int32)
                input_concat_cond = input_concat_cond[:, :, idx]
            x = jnp.concatenate([x, input_concat_cond.astype(x.dtype)], axis=1)

        # timestep embedding: Fourier features -> MLP (bias=True)
        tf = FourierFeatures(1, 256, name="timestep_features")(t[:, None])
        h = nn.Dense(timestep_embed_dim, name="to_timestep_embed_0",
                     dtype=x.dtype, param_dtype=jnp.float32)(tf)
        h = jax.nn.silu(h)
        timestep_embed = nn.Dense(timestep_embed_dim, name="to_timestep_embed_2",
                                  dtype=x.dtype, param_dtype=jnp.float32)(h)

        if self.timestep_cond_type == "global":
            global_embed = (
                timestep_embed if global_embed is None else global_embed + timestep_embed
            )
        elif self.timestep_cond_type == "input_concat":
            x = jnp.concatenate(
                [x, jnp.broadcast_to(timestep_embed[:, :, None],
                                     timestep_embed.shape + (x.shape[2],))],
                axis=1,
            )

        if self.global_cond_type == "prepend" and global_embed is not None:
            if prepend_inputs is None:
                prepend_inputs = global_embed[:, None, :]
                prepend_mask = jnp.ones((x.shape[0], 1), dtype=bool)
            else:
                prepend_inputs = jnp.concatenate(
                    [prepend_inputs, global_embed[:, None, :]], axis=1
                )
                if prepend_mask is None:
                    prepend_mask = jnp.ones(
                        (x.shape[0], prepend_inputs.shape[1] - 1), dtype=bool
                    )
                prepend_mask = jnp.concatenate(
                    [prepend_mask, jnp.ones((x.shape[0], 1), dtype=bool)], axis=1
                )
            prepend_length = prepend_inputs.shape[1]

        dim_in = x.shape[1]
        x = Conv1d(dim_in, 1, zero_init=True, use_bias=False, name="preprocess_conv")(
            jnp.swapaxes(x, 1, 2)
        ).swapaxes(1, 2) + x

        xl = jnp.swapaxes(x, 1, 2)  # NLC
        if self.patch_size > 1:
            B, T, C = xl.shape
            p = self.patch_size
            xl = xl.reshape(B, T // p, p, C).transpose(0, 1, 3, 2).reshape(B, T // p, C * p)

        transformer = ContinuousTransformer(
            dim=self.embed_dim,
            depth=self.depth,
            dim_heads=self.embed_dim // self.num_heads,
            dim_in=dim_in * self.patch_size,
            dim_out=self.io_channels * self.patch_size,
            cross_attend=self.cond_token_dim > 0,
            cond_token_dim=cond_embed_dim if self.cond_token_dim > 0 else None,
            global_cond_dim=self.embed_dim if self.global_cond_type == "adaLN" else None,
            use_checkpointing=self.use_checkpointing,
            layer_scale=self.layer_scale,
            qk_norm=self.qk_norm,
            ff_mult=self.ff_mult,
            num_memory_tokens=self.num_memory_tokens,
            sliding_window=self.sliding_window,
            name="transformer",
        )
        out = transformer(
            xl,
            prepend_embeds=prepend_inputs,
            prepend_mask=prepend_mask,
            context=cross_attn_cond,
            context_mask=cross_attn_cond_mask,
            global_cond=global_embed if self.global_cond_type == "adaLN" else None,
            return_info=return_info,
            exit_layer_ix=exit_layer_ix,
        )
        info = None
        if return_info:
            out, info = out
        if exit_layer_ix is not None:
            return (out, info) if return_info else out

        out = jnp.swapaxes(out, 1, 2)[:, :, prepend_length:]  # NCT, strip prepend
        if self.patch_size > 1:
            B, CP, S = out.shape
            p = self.patch_size
            out = out.reshape(B, CP // p, p, S).transpose(0, 1, 3, 2).reshape(
                B, CP // p, S * p
            )
        out = Conv1d(self.io_channels, 1, zero_init=True, use_bias=False,
                     name="postprocess_conv")(jnp.swapaxes(out, 1, 2)).swapaxes(1, 2) + out
        if self.compute_dtype is not None:
            out = out.astype(in_dtype)
        if return_info:
            return out, info
        return out

    def __call__(
        self,
        x,
        t,
        cross_attn_cond=None,
        cross_attn_cond_mask=None,
        negative_cross_attn_cond=None,
        negative_cross_attn_mask=None,
        input_concat_cond=None,
        global_embed=None,
        negative_global_embed=None,
        prepend_cond=None,
        prepend_cond_mask=None,
        cfg_scale: float = 1.0,
        cfg_dropout_prob: float = 0.0,
        cfg_interval: Tuple[float, float] = (0.0, 1.0),
        scale_phi: float = 0.0,
        mask=None,
        return_info: bool = False,
        exit_layer_ix: Optional[int] = None,
        train: bool = False,
    ):
        # conditioning masks for cross-attn are disabled to match reference
        # behavior (dit.py:281-283); prepend masks are honored.
        cross_attn_cond_mask = None

        if exit_layer_ix is not None:
            return self._forward(
                x, t,
                cross_attn_cond=cross_attn_cond,
                cross_attn_cond_mask=cross_attn_cond_mask,
                input_concat_cond=input_concat_cond,
                global_embed=global_embed,
                prepend_cond=prepend_cond,
                prepend_cond_mask=prepend_cond_mask,
                return_info=return_info,
                exit_layer_ix=exit_layer_ix,
            )

        # CFG dropout (training-time): whole-sample null-embedding replacement
        if cfg_dropout_prob > 0.0 and cfg_scale == 1.0 and train:
            if cross_attn_cond is not None:
                keep = jax.random.bernoulli(
                    self.make_rng("cfg"), cfg_dropout_prob,
                    (cross_attn_cond.shape[0], 1, 1),
                )
                cross_attn_cond = jnp.where(
                    keep, jnp.zeros_like(cross_attn_cond), cross_attn_cond
                )
            if prepend_cond is not None:
                keep = jax.random.bernoulli(
                    self.make_rng("cfg"), cfg_dropout_prob,
                    (prepend_cond.shape[0], 1, 1),
                )
                prepend_cond = jnp.where(keep, jnp.zeros_like(prepend_cond), prepend_cond)

        if self.diffusion_objective == "v":
            sigma = jnp.sin(t * math.pi / 2)
        else:
            sigma = t

        use_cfg = cfg_scale != 1.0 and (
            cross_attn_cond is not None or prepend_cond is not None
        )
        if not use_cfg:
            return self._forward(
                x, t,
                cross_attn_cond=cross_attn_cond,
                cross_attn_cond_mask=cross_attn_cond_mask,
                input_concat_cond=input_concat_cond,
                global_embed=global_embed,
                prepend_cond=prepend_cond,
                prepend_cond_mask=prepend_cond_mask,
                return_info=return_info,
            )

        # batch-doubled CFG (runs 2B through the stack; returns cfg-combined B)
        def _run_cfg(mod):
            batch_inputs = jnp.concatenate([x, x], axis=0)
            batch_timestep = jnp.concatenate([t, t], axis=0)
            batch_global = (
                jnp.concatenate([global_embed, global_embed], axis=0)
                if global_embed is not None else None
            )
            batch_input_concat = (
                jnp.concatenate([input_concat_cond, input_concat_cond], axis=0)
                if input_concat_cond is not None else None
            )
            batch_cond = None
            if cross_attn_cond is not None:
                null_embed = jnp.zeros_like(cross_attn_cond)
                neg = negative_cross_attn_cond
                if neg is not None:
                    if negative_cross_attn_mask is not None:
                        m = negative_cross_attn_mask.astype(bool)[:, :, None]
                        neg = jnp.where(m, neg, null_embed)
                    batch_cond = jnp.concatenate([cross_attn_cond, neg], axis=0)
                else:
                    batch_cond = jnp.concatenate([cross_attn_cond, null_embed], axis=0)
            batch_prepend_cond = None
            batch_prepend_mask = None
            if prepend_cond is not None:
                batch_prepend_cond = jnp.concatenate(
                    [prepend_cond, jnp.zeros_like(prepend_cond)], axis=0
                )
                if prepend_cond_mask is not None:
                    batch_prepend_mask = jnp.concatenate(
                        [prepend_cond_mask, prepend_cond_mask], axis=0
                    )

            batch_output = mod._forward(
                batch_inputs, batch_timestep,
                cross_attn_cond=batch_cond,
                cross_attn_cond_mask=None,
                input_concat_cond=batch_input_concat,
                global_embed=batch_global,
                prepend_cond=batch_prepend_cond,
                prepend_cond_mask=batch_prepend_mask,
                return_info=return_info,
            )
            info = None
            if return_info:
                batch_output, info = batch_output

            cond_output, uncond_output = jnp.split(batch_output, 2, axis=0)
            cfg_output = uncond_output + (cond_output - uncond_output) * cfg_scale

            if scale_phi != 0.0:
                cond_out_std = jnp.std(cond_output, axis=1, keepdims=True)
                out_cfg_std = jnp.std(cfg_output, axis=1, keepdims=True)
                output = scale_phi * (
                    cfg_output * (cond_out_std / (out_cfg_std + 1e-12))
                ) + (1 - scale_phi) * cfg_output
            else:
                output = cfg_output
            return output, cond_output, uncond_output, info

        lo, hi = cfg_interval
        if (lo, hi) != (0.0, 1.0) and not return_info:
            # Compute splitting: outside [lo, hi] only the single cond forward
            # runs (lax.cond picks one branch at runtime), halving the FLOPs of
            # gated steps vs. the reference's always-doubled batch.
            in_interval = jnp.logical_and(sigma[0] >= lo, sigma[0] <= hi)
            return nn.cond(
                in_interval,
                lambda mod: _run_cfg(mod)[0],
                lambda mod: mod._forward(
                    x, t,
                    cross_attn_cond=cross_attn_cond,
                    cross_attn_cond_mask=None,
                    input_concat_cond=input_concat_cond,
                    global_embed=global_embed,
                    prepend_cond=prepend_cond,
                    prepend_cond_mask=prepend_cond_mask,
                ),
                self,
            )

        output, cond_output, uncond_output, info = _run_cfg(self)
        if (lo, hi) != (0.0, 1.0):
            in_interval = jnp.logical_and(sigma[0] >= lo, sigma[0] <= hi)
            output = jnp.where(in_interval, output, cond_output)

        if return_info:
            info = dict(info) if info else {}
            info["uncond_output"] = uncond_output
            return output, info
        return output
