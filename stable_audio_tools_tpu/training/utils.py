"""Training utilities: LR schedules, optimizer factory, logging shims.

Capability parity with reference stable_audio_tools/training/utils.py:
InverseLR (:21-58), create_optimizer_from_config (:60-79),
create_scheduler_from_config (:81), logger-agnostic log_* shims (:104-129).
"""

from __future__ import annotations

import json
import os
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import optax


def get_rank() -> int:
    """SLURM-aware process rank (reference :8-19)."""
    if "SLURM_PROCID" in os.environ:
        return int(os.environ["SLURM_PROCID"])
    try:
        return jax.process_index()
    except Exception:
        return 0


def inverse_lr_schedule(
    base_lr: float,
    inv_gamma: float = 1.0e6,
    power: float = 1.0,
    warmup: float = 0.0,
    final_lr: float = 0.0,
):
    """k-diffusion InverseLR: lr * (1+step/inv_gamma)^-power with warmup."""

    def schedule(step):
        lr_mult = (1 + step / inv_gamma) ** -power
        lr = base_lr * jnp.maximum(lr_mult, final_lr / base_lr)
        if warmup > 0:
            lr = lr * (1 - warmup ** (step + 1.0))
        return lr

    return schedule


def exponential_lr_schedule(base_lr: float, gamma: float):
    def schedule(step):
        return base_lr * gamma ** step

    return schedule


def create_optimizer_from_config(optimizer_config: tp.Dict[str, tp.Any],
                                 schedule=None) -> optax.GradientTransformation:
    """Torch-optimizer-name → optax (reference :60-79). FusedAdam≡adamw."""
    opt_type = optimizer_config["type"]
    cfg = dict(optimizer_config.get("config", {}))
    lr = cfg.pop("lr", 1e-4)
    if schedule is not None:
        lr = schedule
    betas = tuple(cfg.pop("betas", (0.9, 0.999)))
    weight_decay = cfg.pop("weight_decay", 0.0)
    eps = cfg.pop("eps", 1e-8)
    name = opt_type.lower()
    if name in ("adam",):
        return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    if name in ("adamw", "fusedadam"):
        return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                           weight_decay=weight_decay)
    if name == "sgd":
        momentum = cfg.pop("momentum", 0.0)
        return optax.sgd(lr, momentum=momentum)
    if name == "lion":
        return optax.lion(lr, b1=betas[0], b2=betas[1], weight_decay=weight_decay)
    raise ValueError(f"Unknown optimizer type {opt_type}")


def create_schedule_from_config(scheduler_config: tp.Dict[str, tp.Any], base_lr: float):
    """Scheduler config → optax schedule fn (reference :81-102)."""
    s_type = scheduler_config["type"]
    cfg = scheduler_config.get("config", {})
    if s_type == "InverseLR":
        return inverse_lr_schedule(base_lr, **cfg)
    if s_type == "ExponentialLR":
        return exponential_lr_schedule(base_lr, cfg.get("gamma", 1.0))
    if s_type == "CosineAnnealingLR":
        return optax.cosine_decay_schedule(base_lr, cfg.get("T_max", 1000000),
                                           alpha=cfg.get("eta_min", 0.0) / base_lr)
    raise ValueError(f"Unknown scheduler type {s_type}")


def build_optimizer(optimizer_configs_entry: tp.Dict[str, tp.Any]):
    """'{optimizer: {...}, scheduler: {...}}' → optax transformation."""
    opt_cfg = optimizer_configs_entry["optimizer"]
    base_lr = opt_cfg.get("config", {}).get("lr", 1e-4)
    schedule = None
    if "scheduler" in optimizer_configs_entry:
        schedule = create_schedule_from_config(
            optimizer_configs_entry["scheduler"], base_lr
        )
    return create_optimizer_from_config(opt_cfg, schedule)


# ---------------------------------------------------------------------------
# logging shims (reference :104-129): wandb if available, else JSONL
# ---------------------------------------------------------------------------


class JSONLLogger:
    def __init__(self, path="train_log.jsonl"):
        self.path = path

    def log_metrics(self, metrics: dict, step: int = None):
        def ser(v):
            try:
                return float(v)
            except (TypeError, ValueError):
                return v  # strings / path lists (demo artifacts)

        rec = {k: ser(v) for k, v in metrics.items()}
        if step is not None:
            rec["step"] = step
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def log_image(self, key, image, step=None):
        # JSONL backend: images are already on disk (demo dir); record the key
        self.log_metrics({key: "image"}, step=step)

    def log_audio(self, key, audio, sample_rate, caption=None, step=None):
        self.log_metrics({key: caption or "audio"}, step=step)


class WandbLogger:
    """wandb logger (reference logger shims training/utils.py:104-129)."""

    def __init__(self, project=None, name=None, config=None):
        import wandb

        self._wandb = wandb
        self.run = wandb.init(project=project, name=name, config=config)

    def log_metrics(self, metrics: dict, step: int = None):
        self._wandb.log(metrics, step=step)

    def log_audio(self, key, audio, sample_rate, caption=None, step=None):
        import numpy as np

        # callers pass [C, T]; wandb.Audio expects (frames,) or (frames, C)
        audio = np.asarray(audio)
        if audio.ndim == 2:
            audio = audio.T
        self._wandb.log(
            {key: self._wandb.Audio(audio, sample_rate=sample_rate,
                                    caption=caption)},
            step=step,
        )

    def log_image(self, key, image, step=None):
        self._wandb.log({key: self._wandb.Image(image)}, step=step)


class CometLogger:
    """Comet logger (reference supports WandbLogger and CometLogger through
    the same shims, training/utils.py:104-129). Gated on comet_ml."""

    def __init__(self, project=None, name=None, config=None):
        import comet_ml

        self.experiment = comet_ml.Experiment(project_name=project)
        if name:
            self.experiment.set_name(name)
        if config:
            self.experiment.log_parameters(config)

    def log_metrics(self, metrics: dict, step: int = None):
        self.experiment.log_metrics(
            {k: v for k, v in metrics.items()
             if isinstance(v, (int, float))}, step=step)

    def log_audio(self, key, audio, sample_rate, caption=None, step=None):
        import io
        import wave

        import numpy as np

        buf = io.BytesIO()
        pcm = (np.clip(np.asarray(audio).T, -1, 1) * 32767).astype("<i2")
        with wave.open(buf, "wb") as w:
            w.setnchannels(pcm.shape[1] if pcm.ndim > 1 else 1)
            w.setsampwidth(2)
            w.setframerate(sample_rate)
            w.writeframes(pcm.tobytes())
        self.experiment.log_audio(buf.getvalue(), file_name=f"{key}.wav",
                                  step=step)

    def log_image(self, key, image, step=None):
        self.experiment.log_image(image, name=key, step=step)


def create_logger(logger_type: str, save_dir: str, project=None, name=None,
                  config=None):
    if logger_type == "wandb":
        try:
            return WandbLogger(project=project, name=name, config=config)
        except ImportError:
            print("wandb not installed; falling back to JSONL logging")
    elif logger_type == "comet":
        try:
            return CometLogger(project=project, name=name, config=config)
        except ImportError:
            print("comet_ml not installed; falling back to JSONL logging")
    return JSONLLogger(os.path.join(save_dir, "train_log.jsonl"))


def log_metric(logger, key, value, step=None):
    if logger is None:
        return
    if hasattr(logger, "log_metrics"):
        logger.log_metrics({key: value}, step=step)
    elif hasattr(logger, "log"):
        logger.log({key: value}, step=step)


def log_audio(logger, key, audio, sample_rate, caption=None, step=None):
    if logger is None:
        return
    if hasattr(logger, "log_audio"):
        logger.log_audio(key, audio, sample_rate, caption=caption, step=step)


def log_image(logger, key, image, step=None):
    if logger is None:
        return
    if hasattr(logger, "log_image"):
        logger.log_image(key, image, step=step)
