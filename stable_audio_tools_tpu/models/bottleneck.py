"""Latent bottlenecks (NLC layout: [batch, time, channels]).

Capability parity with reference stable_audio_tools/models/bottleneck.py:
tanh, softnorm, vae, wasserstein(+MMD), l2, rvq, rvq_vae, dac_rvq,
dac_rvq_vae, fsq, dithered_fsq. All expose:
    encode(x, return_info=...) -> (z, info)   decode(z) -> z'
Discrete ones additionally decode_tokens(codes).

The torch deps the reference leans on (vector-quantize-pytorch ResidualVQ with
EMA codebooks, dac ResidualVectorQuantize, vq-pytorch FSQ) are re-implemented
in JAX: EMA codebook updates live in a mutable 'quantizer_state' collection so
they stay explicit under jit; FSQ is pure jnp with straight-through rounding.

Stochastic paths (VAE sampling, dither, noise augmentation) draw from the
'sample' RNG collection.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class Bottleneck(nn.Module):
    is_discrete: bool = False

    def encode(self, x, return_info=False, train=False):
        raise NotImplementedError

    def decode(self, x, train=False):
        raise NotImplementedError

    def decode_quantized(self, z_q, train=False):
        """Decode-side post-processing for a latent that encode ALREADY
        quantized (its info["z"]). quantize_on_decode bottlenecks override
        this to skip the second quantizer pass the plain decode() would run
        (encode populates codes/losses, decode would re-quantize the same
        tensor — reference pretransforms.py:186-219 semantics, one pass)."""
        return self.decode(z_q, train=train)

    def __call__(self, x, return_info=True, train=False):
        # default apply path: encode (used for init)
        return self.encode(x, return_info=return_info, train=train)


class TanhBottleneck(Bottleneck):
    scale: float = 1.0

    def encode(self, x, return_info=False, train=False):
        x = jnp.tanh(x / self.scale) * self.scale
        if return_info:
            return x, {}
        return x

    def decode(self, x, train=False):
        return x


class SoftNormBottleneck(Bottleneck):
    dim: int = 32
    noise_augment_dim: int = 0
    noise_regularize: bool = False

    @nn.compact
    def encode(self, x, return_info=False, train=False):
        scaling = self.param("scaling_factor", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        x = x * scaling.astype(x.dtype) + bias.astype(x.dtype)
        info = {}
        if train and return_info:
            var = jnp.clip(jnp.var(x, axis=1), 1e-4, None)  # over time
            mean = jnp.mean(x, axis=1)
            loss = jnp.mean(mean * mean + var - jnp.log(var) - 1)
            var2 = jnp.clip(jnp.var(x, axis=2), 1e-4, None)  # over channels
            mean2 = jnp.mean(x, axis=2)
            loss = loss + 0.4 * jnp.mean(mean2 * mean2 + var2 - jnp.log(var2) - 1)
            info["softnorm_loss"] = loss
        if return_info:
            return x, info
        return x

    @nn.compact
    def decode(self, x, train=False):
        if self.noise_regularize and train:
            scaling = jnp.std(x, axis=1, keepdims=True)
            x = x + jax.random.normal(self.make_rng("sample"), x.shape, x.dtype) * scaling * 1e-2
        if self.noise_augment_dim > 0:
            nsf = self.param(
                "noise_scaling_factor", nn.initializers.ones, (self.noise_augment_dim,), jnp.float32
            )
            noise = nsf.astype(x.dtype) * jax.random.normal(
                self.make_rng("sample"), (x.shape[0], x.shape[1], self.noise_augment_dim), x.dtype
            )
            x = jnp.concatenate([x, noise], axis=-1)
        return x


def vae_sample(mean: jax.Array, scale: jax.Array, rng) -> Tuple[jax.Array, jax.Array]:
    """Reference bottleneck.py:105-113. KL summed over channels, mean over rest."""
    stdev = jax.nn.softplus(scale) + 1e-4
    var = stdev * stdev
    logvar = jnp.log(var)
    latents = jax.random.normal(rng, mean.shape, mean.dtype) * stdev + mean
    kl = jnp.mean(jnp.sum(mean * mean + var - logvar - 1, axis=-1))
    return latents, kl


class VAEBottleneck(Bottleneck):
    def encode(self, x, return_info=False, train=False):
        mean, scale = jnp.split(x, 2, axis=-1)
        z, kl = vae_sample(mean, scale, self.make_rng("sample"))
        if return_info:
            return z, {"kl": kl}
        return z

    def decode(self, x, train=False):
        return x


def compute_mmd(latents: jax.Array, rng) -> jax.Array:
    """RBF-kernel MMD(latents, N(0,I)); reference bottleneck.py:136-149."""
    B, T, C = latents.shape
    z = latents.reshape(-1, C)
    noise = jax.random.normal(rng, z.shape, z.dtype)

    def mean_kernel(a, b):
        d = jnp.mean((a[:, None] - b[None]) ** 2, axis=2) / a.shape[-1]
        return jnp.mean(jnp.exp(-d))

    return mean_kernel(z, z) + mean_kernel(noise, noise) - 2 * mean_kernel(z, noise)


class WassersteinBottleneck(Bottleneck):
    noise_augment_dim: int = 0
    bypass_mmd: bool = False
    use_tanh: bool = False
    tanh_scale: float = 5.0

    def encode(self, x, return_info=False, train=False):
        info = {}
        if train and return_info:
            if self.bypass_mmd:
                info["mmd"] = jnp.zeros((), x.dtype)
            else:
                info["mmd"] = compute_mmd(x, self.make_rng("sample"))
        if self.use_tanh:
            x = jnp.tanh(x / self.tanh_scale) * self.tanh_scale
        if return_info:
            return x, info
        return x

    def decode(self, x, train=False):
        if self.noise_augment_dim > 0:
            noise = jax.random.normal(
                self.make_rng("sample"),
                (x.shape[0], x.shape[1], self.noise_augment_dim),
                x.dtype,
            )
            x = jnp.concatenate([x, noise], axis=-1)
        return x


class L2Bottleneck(Bottleneck):
    def encode(self, x, return_info=False, train=False):
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        if return_info:
            return x, {}
        return x

    def decode(self, x, train=False):
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)


# ---------------------------------------------------------------------------
# Residual vector quantization (vector-quantize-pytorch ResidualVQ equivalent)
# ---------------------------------------------------------------------------


def _kmeans(data, k, iters):
    """Lloyd k-means over data [N, C] → [k, C] centers (jit-safe, static iters).

    Centers seeded by an even stride over the (already shuffled) batch; empty
    clusters keep their previous center.
    """
    n = data.shape[0]
    sel = jnp.round(jnp.linspace(0, n - 1, k)).astype(jnp.int32)
    centers0 = data[sel]

    def body(_, centers):
        d = (
            jnp.sum(data ** 2, axis=1, keepdims=True)
            - 2 * data @ centers.T
            + jnp.sum(centers ** 2, axis=1)[None]
        )
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=data.dtype)
        counts = jnp.sum(onehot, axis=0)
        sums = onehot.T @ data
        return jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], centers
        )

    return jax.lax.fori_loop(0, iters, body, centers0)


class ResidualVQ(nn.Module):
    """Residual VQ with EMA codebook updates as explicit jit-safe state.

    vector-quantize-pytorch semantics: per-stage nearest-neighbor lookup,
    EMA codebook update (decay 0.99 default), commitment loss per stage, and
    optional lazy k-means init from the first training batch (an `initted`
    flag in the state gates a lax.cond, so the k-means cost is paid once).
    Codebook state lives in the 'quantizer_state' variable collection and is
    updated only when that collection is mutable (i.e. during training).
    """

    dim: int
    codebook_size: int
    num_quantizers: int
    decay: float = 0.99
    commitment_weight: float = 1.0
    eps: float = 1e-5
    kmeans_init: bool = False
    kmeans_iters: int = 10
    # dead-code revival (vector-quantize-pytorch `threshold_ema_dead_code`):
    # codes whose EMA usage falls below the threshold are re-seeded from
    # random batch vectors on the next training step. 0 disables.
    threshold_ema_dead_code: float = 0.0

    def setup(self):
        # declared in setup so EVERY entry method (encode __call__ and the
        # decode-tokens path) creates/reads the quantizer_state collection
        self._codebooks = self.variable(
            "quantizer_state",
            "codebooks",
            lambda: jax.random.normal(
                jax.random.PRNGKey(0), (self.num_quantizers, self.codebook_size, self.dim)
            ),
        )
        self._ema_counts = self.variable(
            "quantizer_state",
            "ema_counts",
            lambda: jnp.ones((self.num_quantizers, self.codebook_size)),
        )
        self._ema_sums = self.variable(
            "quantizer_state",
            "ema_sums",
            lambda: self._codebooks.value.copy(),
        )
        self._initted = self.variable(
            "quantizer_state",
            "initted",
            lambda: jnp.asarray(not self.kmeans_init),
        )

    def __call__(self, x, train=False, n_quantizers: Optional[int] = None):
        """x: [B, T, C] → (quantized, indices [B, T, Q], loss [Q])."""
        codebooks = self._codebooks
        ema_counts = self._ema_counts
        ema_sums = self._ema_sums
        initted = self._initted
        is_mutable = self.is_mutable_collection("quantizer_state")
        was_initted = initted.value

        B, T, C = x.shape
        flat = x.reshape(-1, C)
        residual = flat
        quantized_out = jnp.zeros_like(flat)
        indices_list = []
        losses = []
        new_codebooks, new_counts, new_sums = [], [], []
        for q in range(self.num_quantizers):
            cb = codebooks.value[q]
            if self.kmeans_init and train and is_mutable:
                cb = jax.lax.cond(
                    was_initted,
                    lambda r, c: c,
                    lambda r, c: _kmeans(
                        jax.lax.stop_gradient(r), self.codebook_size, self.kmeans_iters
                    ),
                    residual,
                    cb,
                )
            d = (
                jnp.sum(residual ** 2, axis=1, keepdims=True)
                - 2 * residual @ cb.T
                + jnp.sum(cb ** 2, axis=1)[None]
            )
            idx = jnp.argmin(d, axis=1)
            quant = cb[idx]
            if train and is_mutable:
                onehot = jax.nn.one_hot(idx, self.codebook_size, dtype=flat.dtype)
                counts = jnp.sum(onehot, axis=0)
                sums = onehot.T @ residual
                # on the init step the EMA trackers restart from the fresh codebook
                prev_counts = jnp.where(
                    was_initted, ema_counts.value[q], jnp.ones(self.codebook_size)
                )
                prev_sums = jnp.where(was_initted, ema_sums.value[q], cb)
                c_new = prev_counts * self.decay + counts * (1 - self.decay)
                s_new = prev_sums * self.decay + sums * (1 - self.decay)
                n = jnp.sum(c_new)
                c_smoothed = (c_new + self.eps) / (n + self.codebook_size * self.eps) * n
                cb_new = s_new / c_smoothed[:, None]
                if self.threshold_ema_dead_code > 0:
                    # re-seed expired codes from random batch vectors
                    if self.has_rng("sample"):
                        rk = self.make_rng("sample")
                    else:
                        rk = jax.random.fold_in(
                            jax.random.PRNGKey(17), jnp.sum(idx).astype(jnp.int32)
                        )
                    sel = jax.random.randint(
                        rk, (self.codebook_size,), 0, residual.shape[0]
                    )
                    samples = jax.lax.stop_gradient(residual)[sel]
                    dead = c_new < self.threshold_ema_dead_code
                    cb_new = jnp.where(dead[:, None], samples, cb_new)
                    c_new = jnp.where(
                        dead, jnp.full_like(c_new, self.threshold_ema_dead_code),
                        c_new,
                    )
                    s_new = jnp.where(
                        dead[:, None], samples * self.threshold_ema_dead_code, s_new
                    )
                new_codebooks.append(cb_new)
                new_counts.append(c_new)
                new_sums.append(s_new)
            commit = jnp.mean((residual - jax.lax.stop_gradient(quant)) ** 2)
            losses.append(commit * self.commitment_weight)
            # straight-through
            quant_st = residual + jax.lax.stop_gradient(quant - residual)
            if n_quantizers is not None:
                use = q < n_quantizers
                quant_st = jnp.where(use, quant_st, jnp.zeros_like(quant_st))
            quantized_out = quantized_out + quant_st
            residual = residual - jax.lax.stop_gradient(quant)
            indices_list.append(idx)

        if train and is_mutable:
            codebooks.value = jnp.stack(new_codebooks)
            ema_counts.value = jnp.stack(new_counts)
            ema_sums.value = jnp.stack(new_sums)
            initted.value = jnp.asarray(True)

        quantized = quantized_out.reshape(B, T, C)
        indices = jnp.stack(indices_list, axis=-1).reshape(B, T, self.num_quantizers)
        return quantized, indices, jnp.stack(losses)

    def get_outputs_from_indices(self, indices):
        """indices: [B, T, Q] → summed codebook vectors [B, T, C]."""
        codebooks = self._codebooks.value
        out = 0
        for q in range(self.num_quantizers):
            out = out + codebooks[q][indices[..., q]]
        return out


class RVQBottleneck(Bottleneck):
    dim: int = 32
    codebook_size: int = 1024
    num_quantizers: int = 8
    is_discrete: bool = True
    tokens_id: str = "quantizer_indices"
    kmeans_init: bool = True
    kmeans_iters: int = 50
    decay: float = 0.99
    threshold_ema_dead_code: float = 0.0

    def setup(self):
        self.quantizer = ResidualVQ(
            dim=self.dim,
            codebook_size=self.codebook_size,
            num_quantizers=self.num_quantizers,
            kmeans_init=self.kmeans_init,
            kmeans_iters=self.kmeans_iters,
            decay=self.decay,
            threshold_ema_dead_code=self.threshold_ema_dead_code,
        )

    def encode(self, x, return_info=False, train=False):
        z, indices, loss = self.quantizer(x, train=train)
        info = {"quantizer_indices": jnp.swapaxes(indices, 1, 2),  # [B, Q, T]
                "quantizer_loss": jnp.mean(loss)}
        if return_info:
            return z, info
        return z

    def decode(self, x, train=False):
        return x

    def decode_tokens(self, codes, train=False):
        """codes: [B, Q, T] reference layout (or [B, T, Q])."""
        if codes.shape[1] == self.num_quantizers:
            # axis 1 == Q: documented [B, Q, T] layout (wins when ambiguous)
            codes = jnp.swapaxes(codes, 1, 2)
        return self.decode(self.quantizer.get_outputs_from_indices(codes))


class RVQVAEBottleneck(Bottleneck):
    dim: int = 32
    codebook_size: int = 1024
    num_quantizers: int = 8
    is_discrete: bool = True
    tokens_id: str = "quantizer_indices"
    kmeans_init: bool = True
    kmeans_iters: int = 50
    decay: float = 0.99
    threshold_ema_dead_code: float = 0.0

    def setup(self):
        self.quantizer = ResidualVQ(
            dim=self.dim,
            codebook_size=self.codebook_size,
            num_quantizers=self.num_quantizers,
            kmeans_init=self.kmeans_init,
            kmeans_iters=self.kmeans_iters,
            decay=self.decay,
            threshold_ema_dead_code=self.threshold_ema_dead_code,
        )

    def encode(self, x, return_info=False, train=False):
        mean, scale = jnp.split(x, 2, axis=-1)
        z, kl = vae_sample(mean, scale, self.make_rng("sample"))
        z, indices, loss = self.quantizer(z, train=train)
        info = {"kl": kl, "quantizer_indices": jnp.swapaxes(indices, 1, 2),
                "quantizer_loss": jnp.mean(loss)}
        if return_info:
            return z, info
        return z

    def decode(self, x, train=False):
        return x

    def decode_tokens(self, codes, train=False):
        if codes.shape[1] == self.num_quantizers:
            # axis 1 == Q: documented [B, Q, T] layout (wins when ambiguous)
            codes = jnp.swapaxes(codes, 1, 2)
        return self.decode(self.quantizer.get_outputs_from_indices(codes))


# ---------------------------------------------------------------------------
# DAC-style residual VQ (projected, fully differentiable; dac.nn.quantize)
# ---------------------------------------------------------------------------


class DACVectorQuantize(nn.Module):
    input_dim: int
    codebook_size: int
    codebook_dim: int

    @nn.compact
    def __call__(self, z):
        """z: [B, T, C]. Returns (z_q, commitment, codebook_loss, idx, z_e)."""
        z_e = nn.Dense(self.codebook_dim, name="in_proj", param_dtype=jnp.float32)(z)
        codebook = self.param(
            "codebook",
            nn.initializers.normal(stddev=1.0),
            (self.codebook_size, self.codebook_dim),
            jnp.float32,
        )
        # L2-normalized lookup (dac semantics)
        e = z_e / (jnp.linalg.norm(z_e, axis=-1, keepdims=True) + 1e-12)
        c = codebook / (jnp.linalg.norm(codebook, axis=-1, keepdims=True) + 1e-12)
        d = -(e @ c.T)
        idx = jnp.argmin(d, axis=-1)
        z_q = codebook[idx]
        commitment = jnp.mean((z_e - jax.lax.stop_gradient(z_q)) ** 2)
        codebook_loss = jnp.mean((jax.lax.stop_gradient(z_e) - z_q) ** 2)
        z_q = z_e + jax.lax.stop_gradient(z_q - z_e)
        z_q_out = nn.Dense(self.input_dim, name="out_proj", param_dtype=jnp.float32)(z_q)
        return z_q_out, commitment, codebook_loss, idx, z_e

    def from_codes(self, codes):
        codebook = self.get_variable("params", "codebook")
        z_q = codebook[codes]
        kernel = self.get_variable("params", "out_proj")["kernel"]
        bias = self.get_variable("params", "out_proj")["bias"]
        return z_q @ kernel + bias


class DACResidualVQ(nn.Module):
    input_dim: int
    n_codebooks: int
    codebook_size: int
    codebook_dim: int = 8
    quantizer_dropout: float = 0.0

    def setup(self):
        self.quantizers = [
            DACVectorQuantize(
                input_dim=self.input_dim,
                codebook_size=self.codebook_size,
                codebook_dim=self.codebook_dim,
                name=f"quantizers_{i}",
            )
            for i in range(self.n_codebooks)
        ]

    def __call__(self, z, n_quantizers: Optional[int] = None):
        z_q = jnp.zeros_like(z)
        residual = z
        commitment = 0.0
        codebook_loss = 0.0
        codes, latents = [], []
        for i, quantizer in enumerate(self.quantizers):
            z_q_i, commit_i, cb_i, idx_i, z_e_i = quantizer(residual)
            if n_quantizers is not None:
                use = jnp.asarray(i < n_quantizers, z.dtype)
                z_q_i = z_q_i * use
            z_q = z_q + z_q_i
            residual = residual - z_q_i
            commitment = commitment + commit_i
            codebook_loss = codebook_loss + cb_i
            codes.append(idx_i)
            latents.append(z_e_i)
        codes = jnp.stack(codes, axis=-1)  # [B, T, Q]
        latents = jnp.concatenate(latents, axis=-1)
        return z_q, codes, latents, commitment, codebook_loss

    def from_codes(self, codes):
        """codes: [B, T, Q] → summed projected latents."""
        z_q = 0.0
        for i, quantizer in enumerate(self.quantizers):
            z_q = z_q + quantizer.from_codes(codes[..., i])
        return z_q


class DACRVQBottleneck(Bottleneck):
    input_dim: int = 32
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    quantize_on_decode: bool = False
    noise_augment_dim: int = 0
    is_discrete: bool = True
    tokens_id: str = "codes"

    def setup(self):
        self.quantizer = DACResidualVQ(
            input_dim=self.input_dim,
            n_codebooks=self.n_codebooks,
            codebook_size=self.codebook_size,
            codebook_dim=self.codebook_dim,
        )

    def encode(self, x, return_info=False, train=False, n_quantizers=None):
        info = {"pre_quantizer": x}
        if self.quantize_on_decode and not return_info:
            return x
        z, codes, latents, commitment, codebook_loss = self.quantizer(x, n_quantizers)
        info.update(
            {
                "z": z,
                "codes": jnp.swapaxes(codes, 1, 2),  # [B, Q, T] (dac layout)
                "latents": latents,
                "vq/commitment_loss": commitment / self.n_codebooks,
                "vq/codebook_loss": codebook_loss / self.n_codebooks,
            }
        )
        if return_info:
            # quantize_on_decode: latents pass through, codes still reported
            return (x if self.quantize_on_decode else z), info
        return z

    def _augment(self, x):
        if self.noise_augment_dim > 0:
            noise = jax.random.normal(
                self.make_rng("sample"),
                (x.shape[0], x.shape[1], self.noise_augment_dim),
                x.dtype,
            )
            x = jnp.concatenate([x, noise], axis=-1)
        return x

    def decode(self, x, train=False):
        if self.quantize_on_decode:
            x = self.quantizer(x)[0]
        return self._augment(x)

    def decode_quantized(self, z_q, train=False):
        # z_q is encode's info["z"] — already quantized; only augment.
        return self._augment(z_q)

    def decode_tokens(self, codes, train=False):
        """codes: [B, Q, T] reference/dac layout (or [B, T, Q]).

        from_codes already yields quantized latents — never re-quantize, even
        with quantize_on_decode (reference pretransforms.py:224-226)."""
        if codes.shape[1] == self.n_codebooks:
            # axis 1 == Q: documented [B, Q, T] layout (wins when ambiguous)
            codes = jnp.swapaxes(codes, 1, 2)
        return self._augment(self.quantizer.from_codes(codes))


class DACRVQVAEBottleneck(Bottleneck):
    input_dim: int = 32
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    quantize_on_decode: bool = False
    is_discrete: bool = True
    tokens_id: str = "codes"

    def setup(self):
        self.quantizer = DACResidualVQ(
            input_dim=self.input_dim,
            n_codebooks=self.n_codebooks,
            codebook_size=self.codebook_size,
            codebook_dim=self.codebook_dim,
        )

    def encode(self, x, return_info=False, train=False, n_quantizers=None):
        mean, scale = jnp.split(x, 2, axis=-1)
        z, kl = vae_sample(mean, scale, self.make_rng("sample"))
        info = {"pre_quantizer": z, "kl": kl}
        if self.quantize_on_decode:
            return (z, info) if return_info else z
        z, codes, latents, commitment, codebook_loss = self.quantizer(z, n_quantizers)
        info.update(
            {
                "z": z,
                "codes": jnp.swapaxes(codes, 1, 2),  # [B, Q, T] (dac layout)
                "latents": latents,
                "vq/commitment_loss": commitment / self.n_codebooks,
                "vq/codebook_loss": codebook_loss / self.n_codebooks,
            }
        )
        if return_info:
            return z, info
        return z

    def decode(self, x, train=False):
        if self.quantize_on_decode:
            x = self.quantizer(x)[0]
        return x

    def decode_quantized(self, z_q, train=False):
        # already quantized by encode; nothing left to do
        return z_q

    def decode_tokens(self, codes, train=False):
        if codes.shape[1] == self.n_codebooks:
            # axis 1 == Q: documented [B, Q, T] layout (wins when ambiguous)
            codes = jnp.swapaxes(codes, 1, 2)
        # from_codes yields quantized latents; skip quantize_on_decode
        return self.quantizer.from_codes(codes)


# ---------------------------------------------------------------------------
# Finite scalar quantization
# ---------------------------------------------------------------------------


def _round_ste(z):
    return z + jax.lax.stop_gradient(jnp.round(z) - z)


class FSQCore:
    """Shared FSQ math (reference models/fsq.py semantics, scale=1)."""

    def __init__(self, levels: Sequence[int], num_codebooks: int = 1, scale: float = 1.0):
        self.levels = list(levels)
        self.num_codebooks = num_codebooks
        self.scale = scale
        self._levels = np.asarray(self.levels, dtype=np.int64)
        self._basis = np.cumprod(np.asarray([1] + self.levels[:-1], dtype=np.int64))
        self.codebook_dim = len(self.levels)
        self.codebook_size = int(np.prod(self._levels))
        self.half_l = self.scale * 2.0 / (self._levels - 1)
        self.dim = self.codebook_dim * num_codebooks

    def scale_and_shift(self, z):
        return (z + self.scale) / jnp.asarray(self.half_l, z.dtype)

    def scale_and_shift_inverse(self, li):
        return li * jnp.asarray(self.half_l, li.dtype) - self.scale

    def quantize_det(self, z):
        return self.scale_and_shift_inverse(_round_ste(self.scale_and_shift(z)))

    def codes_to_indices(self, zhat):
        li = jnp.round(self.scale_and_shift(zhat)).astype(jnp.int64)
        return jnp.sum(li * jnp.asarray(self._basis), axis=-1)

    def indices_to_codes(self, indices):
        li = (indices[..., None] // jnp.asarray(self._basis)) % jnp.asarray(self._levels)
        return self.scale_and_shift_inverse(li.astype(jnp.float32))


class FSQBottleneck(Bottleneck):
    """FSQ bottleneck (vq-pytorch FSQ semantics: tanh-free bound via ste)."""

    levels: Sequence[int] = (8, 5, 5, 5)
    num_codebooks: int = 1
    noise_augment_dim: int = 0
    is_discrete: bool = True
    tokens_id: str = "quantizer_indices"

    @property
    def num_quantizers(self):
        return self.num_codebooks

    @property
    def codebook_size(self):
        return int(np.prod(self.levels))

    def _core(self):
        return FSQCore(self.levels, self.num_codebooks)

    def encode(self, x, return_info=False, train=False):
        core = self._core()
        orig_dtype = x.dtype
        B, T, C = x.shape
        z = x.astype(jnp.float32).reshape(B, T, self.num_codebooks, core.codebook_dim)
        # vq-pytorch FSQ bounds with tanh-like saturation; use tanh
        z = jnp.tanh(z)
        codes = core.quantize_det(z)
        indices = core.codes_to_indices(codes)  # [B, T, Q]
        codes = codes.reshape(B, T, C).astype(orig_dtype)
        indices = jnp.swapaxes(indices, 1, 2)  # [B, Q, T] (reference format)
        info = {"quantizer_indices": indices}
        if return_info:
            return codes, info
        return codes

    def decode(self, x, train=False):
        if self.noise_augment_dim > 0:
            noise = jax.random.normal(
                self.make_rng("sample"),
                (x.shape[0], x.shape[1], self.noise_augment_dim),
                x.dtype,
            )
            x = jnp.concatenate([x, noise], axis=-1)
        return x

    def decode_tokens(self, tokens, train=False):
        """tokens: [B, T, Q] or [B, Q, T] reference layout."""
        core = self._core()
        if tokens.shape[1] == self.num_codebooks:
            # axis 1 == Q: documented [B, Q, T] layout (wins when ambiguous)
            tokens = jnp.swapaxes(tokens, 1, 2)
        codes = core.indices_to_codes(tokens)
        B, T = codes.shape[:2]
        return self.decode(codes.reshape(B, T, -1))


class DitheredFSQBottleneck(Bottleneck):
    """Dithered FSQ: train-time quantization dropout + uniform dither noise."""

    dim: int = 32
    levels: Union[int, Sequence[int]] = 5
    num_codebooks: int = 1
    dither_inference: bool = True
    noise_dropout: float = 0.05
    is_discrete: bool = True
    tokens_id: str = "quantizer_indices"

    def _levels_list(self) -> List[int]:
        if isinstance(self.levels, int):
            return [self.levels] * self.dim
        return list(self.levels)

    @property
    def num_quantizers(self):
        return self.num_codebooks

    @property
    def codebook_size(self):
        return int(np.prod(self._levels_list()))

    def _core(self):
        return FSQCore(self._levels_list(), self.num_codebooks)

    def encode(self, x, return_info=False, train=False):
        core = self._core()
        orig_dtype = x.dtype
        B, T, C = x.shape
        z = x.astype(jnp.float32).reshape(B, T, self.num_codebooks, core.codebook_dim)
        z = jnp.tanh(z)
        if train:
            rng = self.make_rng("sample")
            r1, r2, r3 = jax.random.split(rng, 3)
            quant = core.quantize_det(z)
            keep_unquantized = (
                jax.random.bernoulli(r1, self.noise_dropout, (B, 1, 1, 1))
            )
            q = jnp.where(keep_unquantized, z, quant)
            dither = (jax.random.uniform(r2, z.shape) - 0.5) * jnp.asarray(
                core.half_l, z.dtype
            )
            apply_dither = jax.random.bernoulli(r3, self.noise_dropout, (B, 1, 1, 1))
            q = jnp.where(apply_dither, z + dither, q)
        else:
            q = core.quantize_det(z)
        indices = core.codes_to_indices(core.quantize_det(z))
        codes = q.reshape(B, T, C).astype(orig_dtype)
        info = {"quantizer_indices": indices}
        if return_info:
            return codes, info
        return codes

    def decode(self, x, train=False):
        return x

    def decode_tokens(self, tokens, train=False):
        core = self._core()
        codes = core.indices_to_codes(tokens)
        B, T = codes.shape[:2]
        return self.decode(codes.reshape(B, T, -1))
