"""Training factory: model_type → trainer (reference training/factory.py:5-245)."""

from __future__ import annotations

import typing as tp


def create_training_wrapper_from_config(model_config: tp.Dict[str, tp.Any], model):
    model_type = model_config.get("model_type", None)
    assert model_type is not None, "model_type must be specified in model config"
    training_config = model_config.get("training", None)
    assert training_config is not None, "training config must be specified in model config"

    def pop(cfg, keys):
        return {k: cfg[k] for k in keys if k in cfg}

    if model_type == "autoencoder":
        from .autoencoders import AutoencoderTrainer

        return AutoencoderTrainer(
            model,
            lr=training_config.get("learning_rate", None),
            warmup_steps=training_config.get("warmup_steps", 0),
            warmup_mode=training_config.get("warmup_mode", "adv"),
            encoder_freeze_on_warmup=training_config.get("encoder_freeze_on_warmup", False),
            sample_rate=model_config["sample_rate"],
            loss_config=training_config.get("loss_configs", None),
            optimizer_configs=training_config.get("optimizer_configs", None),
            use_ema=training_config.get("use_ema", True),
            latent_mask_ratio=training_config.get("latent_mask_ratio", 0.0),
            compute_dtype=training_config.get("compute_dtype", None),
        )
    elif model_type == "diffusion_uncond":
        from .diffusion import DiffusionUncondTrainer

        return DiffusionUncondTrainer(
            model,
            lr=training_config.get("learning_rate", 1e-4),
            pre_encoded=training_config.get("pre_encoded", False),
            use_ema=training_config.get("use_ema", True),
            optimizer_configs=training_config.get("optimizer_configs", None),
        )
    elif model_type in ("diffusion_cond", "diffusion_cond_inpaint"):
        if "arc" in training_config:
            # ARC post-training (reference training/factory.py:66-113)
            from ..models.factory import create_model_from_config
            from .arc import ARCTrainer

            arc_config = training_config["arc"]
            teacher_model_config = arc_config.get("teacher_model", None)
            if teacher_model_config is None and arc_config.get(
                "use_model_as_teacher", False
            ):
                teacher_model_config = model_config
            teacher_model = (
                create_model_from_config(teacher_model_config)
                if teacher_model_config is not None else None
            )
            disc_config = arc_config.get("discriminator_base_model", None)
            if disc_config is None and arc_config.get(
                "use_model_as_discriminator", True
            ):
                disc_config = model_config
            discriminator = create_model_from_config(disc_config)
            return ARCTrainer(
                model=model,
                discriminator=discriminator,
                arc_config=arc_config,
                optimizer_configs=training_config.get("optimizer_configs", {
                    "diffusion": {"optimizer": {"type": "AdamW", "config": {
                        "lr": training_config.get("learning_rate", 1e-5)}}},
                    "discriminator": {"optimizer": {"type": "AdamW", "config": {
                        "lr": training_config.get("learning_rate", 1e-5)}}},
                }),
                teacher_model=teacher_model,
                use_ema=training_config.get("use_ema", True),
                pre_encoded=training_config.get("pre_encoded", False),
                cfg_dropout_prob=training_config.get("cfg_dropout_prob", 0.1),
                clip_grad_norm=training_config.get("clip_grad_norm", 0.0),
                trim_config=training_config.get("trim_config", None),
            )

        from .diffusion import DiffusionCondTrainer

        return DiffusionCondTrainer(
            model,
            lr=training_config.get("learning_rate", None),
            mask_padding=training_config.get("mask_padding", False),
            mask_padding_dropout=training_config.get("mask_padding_dropout", 0.0),
            use_ema=training_config.get("use_ema", True),
            log_loss_info=training_config.get("log_loss_info", False),
            optimizer_configs=training_config.get("optimizer_configs", None),
            pre_encoded=training_config.get("pre_encoded", False),
            cfg_dropout_prob=training_config.get("cfg_dropout_prob", 0.1),
            timestep_sampler=training_config.get("timestep_sampler", "uniform"),
            timestep_sampler_options=training_config.get("timestep_sampler_options", None),
            p_one_shot=training_config.get("p_one_shot", 0.0),
            inpainting_config=training_config.get(
                "inpainting_config",
                {} if model_type == "diffusion_cond_inpaint" else None,
            ) if model_type == "diffusion_cond_inpaint"
            else training_config.get("inpainting_config", None),
        )
    elif model_type == "diffusion_autoencoder":
        from .diffusion import DiffusionAutoencoderTrainer

        return DiffusionAutoencoderTrainer(
            model,
            lr=training_config.get("learning_rate", 1e-4),
            use_ema=training_config.get("use_ema", True),
            optimizer_configs=training_config.get("optimizer_configs", None),
            use_reconstruction_loss=training_config.get(
                "use_reconstruction_loss", False
            ),
        )
    elif model_type == "lm":
        from .lm import AudioLanguageModelTrainer

        return AudioLanguageModelTrainer(
            model,
            lr=training_config.get("learning_rate", None),
            use_ema=training_config.get("use_ema", False),
            optimizer_configs=training_config.get("optimizer_configs", None),
        )
    else:
        raise NotImplementedError(f"Unknown model type: {model_type}")
