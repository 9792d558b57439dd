"""ModelHandle: ergonomic (module, variables) bundle for inference.

Gives the reference's object-style API (`model.encode(audio)`,
`model.generate(...)`) on top of the functional flax core, with jit caching
per method.
"""

from __future__ import annotations

import json
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np


def deep_merge(a, b):
    """Recursive dict merge preferring a's leaves, adding b's new subtrees."""
    if isinstance(a, dict) and isinstance(b, dict):
        out = dict(a)
        for k, v in b.items():
            out[k] = deep_merge(a[k], v) if k in a else v
        return out
    return a


def init_variables_from_config(model, model_config: dict, seed: int = 0):
    """Template-init a model's variables for any model_type — the ONE shared
    implementation behind ModelHandle.from_config, interface.load_model, and
    train.py (three divergent copies previously; the LM copies dropped the
    quantizer_state collection and/or never initialized the codec decoder).

    Also imports the pretransform's configured pretrained-codec checkpoint
    (dac_pretrained / audiocraft_pretrained ckpt_path) so the frozen codec
    never silently runs at random init."""
    import jax
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(seed)
    rngs = {"params": rng, "sample": jax.random.fold_in(rng, 1),
            "cfg": jax.random.fold_in(rng, 2)}
    model_type = model_config["model_type"]
    if model_type == "autoencoder":
        io_ch = model_config["model"].get("in_channels") or \
            model_config["model"]["io_channels"]
        audio = jnp.zeros((1, io_ch, model.downsampling_ratio * 4))
        variables = jax.jit(model.init)(rngs, audio)
    elif model_type == "lm":
        mc = getattr(model, "_multi_conditioner", None)
        codes = jnp.zeros((1, model.num_quantizers, 16), jnp.int32)
        kwargs = {}
        if mc is not None:
            meta = [_neutral_metadata(model_config)]
            kwargs["cond"] = jax.tree_util.tree_map(
                jnp.asarray, mc.gather_inputs(meta)
            )
        variables = model.init(rngs, codes, **kwargs)
        if model.pretransform is not None:
            # tokenize inits encoder+bottleneck (incl. the quantizer_state
            # collection); decode_tokens inits the decoder — merge ALL
            # collections of all three inits
            audio = jnp.zeros((1, model.pretransform.io_channels,
                               model.min_input_length * 4))
            pt_enc = jax.jit(lambda a: model.init(
                rngs, a, method=model.pretransform_tokenize))(audio)
            tokens = jnp.zeros((1, model.num_quantizers, 4), jnp.int32)
            pt_dec = jax.jit(lambda t: model.init(
                rngs, t, method=model.pretransform_decode_tokens))(tokens)
            variables = deep_merge(deep_merge(dict(variables), pt_enc), pt_dec)
    else:
        mc = getattr(model, "_multi_conditioner", None)
        kwargs = {}
        if mc is not None:
            meta = [_neutral_metadata(model_config)]
            kwargs["cond"] = jax.tree_util.tree_map(
                jnp.asarray, mc.gather_inputs(meta)
            )
        ratio = (model.pretransform.downsampling_ratio
                 if model.pretransform is not None else 1)
        x = jnp.zeros((1, model.io_channels,
                       max(model_config["sample_size"] // ratio, 8)))
        t = jnp.ones((1,))
        variables = jax.jit(
            lambda x, t: model.init(rngs, x, t, method=model.init_full, **kwargs)
        )(x, t)
    pt = getattr(model, "pretransform", None)
    if pt is not None and getattr(pt, "ckpt_path", None):
        variables = inject_pretransform_ckpt(model, variables, pt.ckpt_path)
    return variables


def inject_pretransform_ckpt(model, variables, ckpt_path: str):
    """Import a pretrained-codec torch checkpoint into the pretransform
    subtree of a variables dict (dac_pretrained / audiocraft_pretrained)."""
    from ..io.checkpoints import import_codec_variables, load_ckpt_state_dict

    sd = load_ckpt_state_dict(ckpt_path)
    imported = import_codec_variables(model.pretransform.model, sd)
    variables = dict(variables)
    for col, sub in imported.items():
        tree = dict(variables.get(col, {}))
        pre = dict(tree.get("pretransform", {}))
        pre["model"] = sub
        tree["pretransform"] = pre
        variables[col] = tree
    return variables


class ModelHandle:
    def __init__(self, model, variables, model_config: tp.Optional[dict] = None,
                 seed: int = 0):
        self.model = model
        self.variables = variables
        self.model_config = model_config or {}
        self._rng = jax.random.PRNGKey(seed)
        self._jits: dict = {}

    # -- construction -------------------------------------------------------

    @classmethod
    def from_config(cls, model_config: tp.Union[str, dict],
                    ckpt_path: tp.Optional[str] = None, seed: int = 0):
        from .factory import create_model_from_config

        if isinstance(model_config, str):
            with open(model_config) as f:
                model_config = json.load(f)
        model = create_model_from_config(model_config)
        variables = init_variables_from_config(model, model_config, seed)
        handle = cls(model, variables, model_config, seed)
        if ckpt_path:
            handle.load(ckpt_path)
        return handle

    def load_pretransform_ckpt(self, ckpt_path: str):
        """Load a pretrained codec torch checkpoint into the pretransform
        subtree (dac_pretrained / audiocraft_pretrained pretransforms)."""
        self.variables = inject_pretransform_ckpt(
            self.model, self.variables, ckpt_path
        )
        return self

    def load(self, ckpt_path: str):
        from ..io.checkpoints import (
            copy_state_dict,
            load_checkpoint,
            load_ckpt_state_dict,
        )

        if ckpt_path.endswith(".safetensors") or ckpt_path.endswith(".pt") or \
                ckpt_path.endswith(".pth"):
            sd = load_ckpt_state_dict(ckpt_path)
            params, loaded, skipped = copy_state_dict(self.variables["params"], sd)
            self.variables = {**self.variables, "params": params}
            print(f"Loaded {loaded} tensors ({len(skipped)} skipped)")
        else:
            ckpt = load_checkpoint(ckpt_path, None)
            if isinstance(ckpt, dict) and "params" in ckpt:
                self.variables = {**self.variables, "params": ckpt["params"]}
        return self

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    # -- autoencoder API ------------------------------------------------------

    def encode(self, audio):
        if "encode" not in self._jits:
            self._jits["encode"] = jax.jit(
                lambda v, a, r: self.model.apply(
                    v, a, rngs={"sample": r}, method=self.model.encode
                )
            )
        return self._jits["encode"](self.variables, jnp.asarray(audio),
                                    self._next_rng())

    def decode(self, latents):
        if "decode" not in self._jits:
            self._jits["decode"] = jax.jit(
                lambda v, z, r: self.model.apply(
                    v, z, rngs={"sample": r}, method=self.model.decode
                )
            )
        return self._jits["decode"](self.variables, jnp.asarray(latents),
                                    self._next_rng())

    def decode_tokens(self, tokens):
        return self.model.apply(
            self.variables, jnp.asarray(tokens),
            rngs={"sample": self._next_rng()}, method=self.model.decode_tokens,
        )

    def encode_audio(self, audio, **kwargs):
        return self.model.apply(
            self.variables, jnp.asarray(audio), rngs={"sample": self._next_rng()},
            method=self.model.encode_audio, **kwargs,
        )

    def decode_audio(self, latents, **kwargs):
        return self.model.apply(
            self.variables, jnp.asarray(latents),
            rngs={"sample": self._next_rng()},
            method=self.model.decode_audio, **kwargs,
        )

    # -- diffusion API ----------------------------------------------------------

    def generate(self, **kwargs):
        from ..inference.generation import generate_diffusion_cond

        kwargs.setdefault("sample_size", self.model_config.get("sample_size",
                                                               2097152))
        return generate_diffusion_cond(self.model, self.variables, **kwargs)

    def generate_uncond(self, **kwargs):
        from ..inference.generation import generate_diffusion_uncond

        kwargs.setdefault("sample_size", self.model_config.get("sample_size",
                                                               2097152))
        return generate_diffusion_uncond(self.model, self.variables, **kwargs)

    # -- LM API -------------------------------------------------------------------

    def generate_audio(self, conditioning=None, **kwargs):
        from .lm import lm_generate_audio

        cond_tensors = None
        if conditioning is not None:
            mc = self.model._multi_conditioner
            prepared = jax.tree_util.tree_map(
                jnp.asarray, mc.gather_inputs(conditioning)
            )
            cond_tensors = self.model.apply(
                self.variables, prepared, method=self.model.run_conditioner
            )
        return lm_generate_audio(
            self.model, self.variables, conditioning_tensors=cond_tensors,
            rng=self._next_rng(), **kwargs,
        )


def _neutral_metadata(model_config: dict) -> dict:
    meta = {}
    for c in model_config.get("model", {}).get("conditioning", {}).get(
        "configs", []
    ):
        if c["type"] in ("int", "number"):
            meta[c["id"]] = 0
        elif c["type"] in ("t5", "clap_text", "lut", "phoneme", "list"):
            meta[c["id"]] = ""
        else:
            meta[c["id"]] = 0
    return meta
