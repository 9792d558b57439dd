"""Pretrained model loading from the HF Hub (reference models/pretrained.py).

Downloads model_config.json + model.safetensors (fallback model.ckpt) and
imports the weights through the torch→JAX conversion layer.
"""

from __future__ import annotations

import json


def get_pretrained_model(name: str):
    import jax
    import jax.numpy as jnp
    from huggingface_hub import hf_hub_download

    from ..io.checkpoints import copy_state_dict, load_ckpt_state_dict
    from .factory import create_model_from_config

    config_path = hf_hub_download(name, filename="model_config.json",
                                  repo_type="model")
    with open(config_path) as f:
        model_config = json.load(f)

    model = create_model_from_config(model_config)

    try:
        ckpt_path = hf_hub_download(name, filename="model.safetensors",
                                    repo_type="model")
    except Exception:
        ckpt_path = hf_hub_download(name, filename="model.ckpt", repo_type="model")

    sd = load_ckpt_state_dict(ckpt_path)

    # template-init then import weights
    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "sample": jax.random.fold_in(rng, 1),
            "cfg": jax.random.fold_in(rng, 2)}
    model_type = model_config["model_type"]
    if model_type == "autoencoder":
        audio = jnp.zeros((1, model_config["model"]["io_channels"],
                           model.downsampling_ratio * 4))
        variables = jax.jit(model.init)(rngs, audio)
        from ..io.checkpoints import import_autoencoder_state_dict

        try:
            variables = import_autoencoder_state_dict(model, sd)
        except Exception:
            params, loaded, _ = copy_state_dict(variables["params"], sd)
            variables = {"params": params}
    else:
        ratio = (model.pretransform.downsampling_ratio
                 if model.pretransform is not None else 1)
        x = jnp.zeros((1, model.io_channels,
                       max(model_config["sample_size"] // ratio, 8)))
        t = jnp.ones((1,))
        variables = jax.jit(
            lambda x, t: model.init(rngs, x, t, method=model.init_full)
        )(x, t)
        params, loaded, _ = copy_state_dict(variables["params"], sd)
        variables = {"params": params}

    return model, model_config, variables
