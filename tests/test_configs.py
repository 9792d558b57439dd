"""Every shipped model config must build through the factory (schema parity)."""

import glob
import json
import os

import pytest

from stable_audio_tools_tpu.models.factory import create_model_from_config

CONFIG_DIR = os.path.join(
    os.path.dirname(__file__), "..", "stable_audio_tools_tpu", "configs",
    "model_configs",
)
CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "**", "*.json"), recursive=True))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds(path):
    with open(path) as f:
        config = json.load(f)
    model = create_model_from_config(config)
    assert model is not None

    from stable_audio_tools_tpu.training.factory import (
        create_training_wrapper_from_config,
    )

    if "training" in config:
        wrapper = create_training_wrapper_from_config(config, model)
        assert wrapper is not None


def test_reference_dataset_config_schema():
    from stable_audio_tools_tpu.data.dataset import create_dataloader_from_config

    ds_dir = os.path.join(CONFIG_DIR, "..", "dataset_configs")
    for path in glob.glob(os.path.join(ds_dir, "*.json")):
        with open(path) as f:
            cfg = json.load(f)
        assert "dataset_type" in cfg
