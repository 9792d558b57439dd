"""Published-checkpoint rehearsal kit (scripts/import_reference_ckpt.py).

CI stand-in for a real stable-audio-open bundle (no network here): builds a
tiny reference-layout bundle — DiT weights in the torch wrapped layout
('model.model.*', via export_dit_state_dict) plus NumberConditioner keys —
records denoiser activations from the source model, and asserts the one
rehearsal command imports the bundle, passes the activation fixtures, and
generates audio. Reference workflow: models/pretrained.py:8-25.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_rehearsal_bundle_import_and_generate(tmp_path):
    from safetensors.numpy import save_file

    from stable_audio_tools_tpu.io import torch_mapping as tm
    from stable_audio_tools_tpu.models.factory import create_model_from_config
    from stable_audio_tools_tpu.models.handle import init_variables_from_config
    from tests.test_diffusion_cond import TINY_DIT_CONFIG

    cfg = json.loads(json.dumps(TINY_DIT_CONFIG))
    model = create_model_from_config(cfg)
    variables = init_variables_from_config(model, cfg, 0)

    # the DiT zero-inits its output projections, making an init-time model
    # insensitive to most transformer weights — jitter every DiT param so
    # the recorded activations genuinely pin the imported layout
    rs_j = np.random.RandomState(7)

    def jitter(a):
        a = np.asarray(a)
        return jnp.asarray(a + rs_j.standard_normal(a.shape).astype(a.dtype)
                           * 0.02)

    params = dict(variables["params"])
    params["model"] = jax.tree_util.tree_map(jitter, params["model"])
    variables = {**variables, "params": params}

    # --- build the reference-layout bundle -------------------------------
    dit = model.model.dit
    sd = tm.export_dit_state_dict(
        variables["params"]["model"]["dit"], prefix="model.model.",
        dim_heads=dit.embed_dim // dit.num_heads)
    # NumberConditioner weights in the reference layout (adp NumberEmbedder)
    for cid in ("seconds_start", "seconds_total"):
        emb = variables["params"]["conditioner"][f"modules_{cid}"]["embedder"]
        pfx = f"conditioner.conditioners.{cid}."
        sd[f"{pfx}embedder.embedding.0.weights"] = np.asarray(emb["weights"])
        sd[f"{pfx}embedder.embedding.1.weight"] = np.asarray(
            emb["to_out"]["kernel"]).T
        sd[f"{pfx}embedder.embedding.1.bias"] = np.asarray(
            emb["to_out"]["bias"])

    bundle = tmp_path / "bundle"
    bundle.mkdir()
    save_file({k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in sd.items()}, str(bundle / "model.safetensors"))
    (bundle / "model_config.json").write_text(json.dumps(cfg))

    # --- record activation fixtures from the SOURCE model ----------------
    from stable_audio_tools_tpu.inference.generation import (
        compute_conditioning_tensors,
    )

    cond_tensors = compute_conditioning_tensors(
        model, variables, [{"seconds_start": 0, "seconds_total": 1.0}])
    rs = np.random.RandomState(0)
    x = rs.randn(1, 4, 64).astype(np.float32)
    t = np.full((1,), 0.5, np.float32)
    expected = np.asarray(model.apply(
        variables, jnp.asarray(x), jnp.asarray(t),
        cond_tensors={k: (jnp.asarray(a), None if m is None else jnp.asarray(m))
                      for k, (a, m) in cond_tensors.items()},
    ))
    arrays = {"x": x, "t": t, "expected_output": expected,
              "rtol": 1e-4, "atol": 1e-5}
    for key, (ten, mask) in cond_tensors.items():
        arrays[f"cond_tensor:{key}"] = np.asarray(ten)
        if mask is not None:
            arrays[f"cond_mask:{key}"] = np.asarray(mask)
    np.savez(str(bundle / "activation_fixtures.npz"), **arrays)

    # --- one rehearsal command -------------------------------------------
    out_wav = tmp_path / "rehearsal.wav"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, "scripts/import_reference_ckpt.py",
         "--dir", str(bundle), "--cpu", "--steps", "2",
         "--seconds", "0.064", "--out", str(out_wav)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, f"stdout:{r.stdout}\nstderr:{r.stderr}"
    assert "activation fixtures OK" in r.stdout, r.stdout
    assert out_wav.exists()
    # the pretransform is not in the bundle → loud warning, init values kept
    assert "MISSING from bundle" in r.stdout

    # corrupt one DiT tensor → the activation assert must FAIL
    sd_bad = dict(sd)
    key = "model.model.transformer.layers.0.self_attn.to_qkv.weight"
    sd_bad[key] = sd_bad[key] + 0.05
    save_file({k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in sd_bad.items()}, str(bundle / "model.safetensors"))
    r2 = subprocess.run(
        [sys.executable, "scripts/import_reference_ckpt.py",
         "--dir", str(bundle), "--cpu", "--steps", "2",
         "--seconds", "0.064", "--out", str(out_wav)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert r2.returncode != 0, "corrupted bundle must fail the fixtures"
    assert "Mismatched elements" in r2.stderr or "Not equal" in r2.stderr
