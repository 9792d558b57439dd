"""stable-audio-tools-tpu: a TPU-native (JAX/XLA/Pallas/pjit) generative-audio framework.

Re-implements the full capability surface of Stability-AI/stable-audio-tools
(training + inference for audio VAEs, latent diffusion text-to-audio, diffusion
autoencoders, multi-codebook token LMs, and ARC few-step distillation), designed
TPU-first: functional flax models, lax.scan sampler loops, Pallas attention
kernels, XLA-FFT STFT losses, and pjit/shard_map data-parallel training with
ZeRO-style sharded optimizer state.

Public API mirrors the reference (see SURVEY.md):
  - create_model_from_config (models/factory.py)
  - AudioAutoencoder.encode/decode (models/autoencoders.py)
  - generate_diffusion_cond / generate_diffusion_uncond (inference/generation.py)
  - create_training_wrapper_from_config (training/factory.py)
  - create_dataloader_from_config (data/dataset.py)
"""

__version__ = "0.1.0"
