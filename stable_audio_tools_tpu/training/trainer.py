"""Training run loop — the PyTorch-Lightning replacement.

Owns what the reference delegates to pl.Trainer (train.py:148-164): the step
loop, host-side conditioning, checkpoint-every-N (with model config embedded
alongside, reference ModelConfigEmbedderCallback train.py:17-22), demo
callbacks, metric logging, resume, and the DP mesh placement (batch sharded on
'data', params replicated, optimizer state ZeRO-sharded).
"""

from __future__ import annotations

import json
import os
import time
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..io.checkpoints import load_checkpoint, save_checkpoint
from ..parallel.mesh import create_mesh, shard_batch, zero_shard_opt_state, replicate_tree
from .utils import JSONLLogger, get_rank


class Trainer:
    def __init__(
        self,
        training_wrapper,
        model,
        model_config: dict,
        save_dir: str = "checkpoints",
        checkpoint_every: int = 10000,
        log_every: int = 1,
        demo_every: int = 0,
        demo_callback: tp.Optional[tp.Callable] = None,
        max_steps: tp.Optional[int] = None,
        logger=None,
        use_mesh: bool = True,
        mesh_model: int = 1,
        tp_rules=None,
        accum_batches: int = 1,
        seed: int = 42,
        val_every: int = 0,
        profile_dir: tp.Optional[str] = None,
        save_top_k: int = -1,
    ):
        self.save_top_k = save_top_k
        self.val_every = val_every
        self.profile_dir = profile_dir
        self.wrapper = training_wrapper
        self.model = model
        self.model_config = model_config
        self.save_dir = save_dir
        self.checkpoint_every = checkpoint_every
        self.log_every = log_every
        self.demo_every = demo_every
        self.demo_callback = demo_callback
        self.max_steps = max_steps
        self.logger = logger or JSONLLogger(os.path.join(save_dir, "train_log.jsonl"))
        self.accum_batches = accum_batches
        self.seed = seed
        self.mesh = None
        if use_mesh and len(jax.devices()) > 1:
            self.mesh = create_mesh(model=mesh_model)
        # tensor-parallel param sharding rules for the 'model' axis; default
        # to the DiT qkv/ff rules when a model axis is requested
        self.tp_rules = tp_rules
        if self.tp_rules is None and mesh_model > 1:
            from ..parallel.mesh import DIT_TP_RULES

            self.tp_rules = DIT_TP_RULES
        self.rank = get_rank()

    # -- batch assembly ----------------------------------------------------

    def _prepare_batch(self, audio: np.ndarray, metadata: tp.List[dict]):
        batch = {"audio": jnp.asarray(audio)}
        if metadata and "padding_mask" in metadata[0]:
            pm = np.stack([
                np.asarray(
                    md["padding_mask"][0]
                    if isinstance(md["padding_mask"], list) and len(md["padding_mask"]) == 1
                    else md["padding_mask"]
                )
                for md in metadata
            ])
            batch["padding_mask"] = jnp.asarray(pm)
        mc = getattr(self.model, "_multi_conditioner", None)
        if mc is not None:
            prepared = mc.gather_inputs(metadata)
            batch["prepared_cond"] = jax.tree_util.tree_map(jnp.asarray, prepared)
        if self.mesh is not None:
            batch = shard_batch(batch, self.mesh)
        return batch

    def _place_state(self, state):
        if self.mesh is None:
            return state
        tp_active = (self.tp_rules is not None
                     and dict(self.mesh.shape).get("model", 1) > 1)
        if tp_active:
            # TP training: params/ema/optimizer moments sharded over the
            # 'model' axis by the same path rules (optimizer-state paths
            # embed the param paths, so the rules match mu/nu too; scalars
            # fall back to replicated)
            from ..parallel.mesh import tp_param_sharding

            place = lambda tree: jax.device_put(
                tree, tp_param_sharding(tree, self.mesh, self.tp_rules)
            )
        else:
            place = lambda tree: replicate_tree(tree, self.mesh)
        placed = state
        # param/opt pairs: diffusion/LM states use (params, opt_state); the
        # GAN state uses (gen_params, gen_opt_state) + (disc_params,
        # disc_opt_state). Params replicate (or TP-shard); optimizer moments
        # ZeRO-shard over the data axis.
        for pn, on in (("params", "opt_state"),
                       ("gen_params", "gen_opt_state"),
                       ("disc_params", "disc_opt_state")):
            p = getattr(state, pn, None)
            if p is None:
                continue
            placed = placed.replace(**{pn: place(p)})
            o = getattr(state, on, None)
            if o is not None:
                if tp_active:
                    # TP-matched moments keep the TP spec (plus a 'data'
                    # ZeRO split on a free axis); the rest ZeRO-shard
                    from ..parallel.mesh import tp_zero_opt_sharding

                    spec = tp_zero_opt_sharding(o, self.mesh, self.tp_rules)
                else:
                    spec = zero_shard_opt_state(o, self.mesh)
                placed = placed.replace(**{on: jax.device_put(o, spec)})
        if getattr(state, "ema_params", None) is not None:
            placed = placed.replace(ema_params=place(state.ema_params))
        if getattr(state, "head_params", None) is not None:  # ARC disc heads
            placed = placed.replace(head_params=place(state.head_params))
        if getattr(state, "quantizer_state", None) is not None:
            placed = placed.replace(
                quantizer_state=replicate_tree(state.quantizer_state, self.mesh)
            )
        return placed

    # -- checkpointing -------------------------------------------------------

    def save(self, state, step: int):
        if self.rank != 0:
            return
        path = os.path.join(self.save_dir, f"step={step}.ckpt")
        save_checkpoint(path, state, metadata={"step": step,
                                               "model_config": self.model_config})
        # embed the model config next to the ckpt (ModelConfigEmbedderCallback)
        with open(os.path.join(self.save_dir, "model_config.json"), "w") as f:
            json.dump(self.model_config, f)
        if self.save_top_k > 0:
            # keep only the newest K step checkpoints (reference train.py:105
            # ModelCheckpoint save_top_k; -1 keeps all)
            import glob
            import re

            ckpts = []
            for p in glob.glob(os.path.join(self.save_dir, "step=*.ckpt")):
                m = re.search(r"step=(\d+)\.ckpt$", p)
                if m:
                    ckpts.append((int(m.group(1)), p))
            for _, p in sorted(ckpts)[:-self.save_top_k]:
                try:
                    os.remove(p)
                except OSError:
                    pass

    def restore(self, state, ckpt_path: str):
        return load_checkpoint(ckpt_path, state)

    # -- run loop -----------------------------------------------------------

    def fit(self, dataloader, state=None, ckpt_path: tp.Optional[str] = None,
            val_dataloader=None):
        wrapper = self.wrapper
        is_gan = hasattr(wrapper, "train_step") and not hasattr(
            wrapper, "make_train_step"
        )
        if state is None:
            raise ValueError("state must be provided (use wrapper.init_state)")
        if ckpt_path is not None:
            state = self.restore(state, ckpt_path)
        state = self._place_state(state)
        if not is_gan:
            train_step = wrapper.make_train_step(accum_steps=self.accum_batches)
            # donated state: lets XLA update params/moments in place instead
            # of copying them every step
            train_step = jax.jit(train_step, donate_argnums=(0,))
        val_step = None
        if self.val_every and val_dataloader is not None and hasattr(
            wrapper, "make_val_step"
        ):
            val_step = jax.jit(wrapper.make_val_step())

        # mesh-program flag: attention_core picks the XLA path (GSPMD-
        # partitionable) over pallas while tracing any step program (train
        # AND val) under a mesh
        import contextlib

        from ..parallel.mesh import mesh_program_context

        def mesh_ctx():
            return (mesh_program_context(self.mesh) if self.mesh is not None
                    else contextlib.nullcontext())

        rng = jax.random.PRNGKey(self.seed + self.rank)
        step = int(np.asarray(state.step))
        t_last = time.time()
        done = False
        while not done:
            for audio, metadata in dataloader:
                if self.max_steps is not None and step >= self.max_steps:
                    done = True
                    break
                batch = self._prepare_batch(audio, metadata)
                step_rng = jax.random.fold_in(rng, step)
                if self.profile_dir and step == 10:
                    jax.profiler.start_trace(self.profile_dir)
                with mesh_ctx():
                    if is_gan:
                        state, aux = wrapper.train_step(
                            state, batch["audio"], step_rng, step
                        )
                    else:
                        state, aux = train_step(state, batch, step_rng)
                if self.profile_dir and step == 12:
                    jax.block_until_ready(aux)
                    jax.profiler.stop_trace()
                step += 1

                if step % self.log_every == 0 and self.rank == 0:
                    metrics = {f"train/{k}": float(v) for k, v in aux.items()
                               if np.ndim(v) == 0}
                    metrics["train/steps_per_sec"] = self.log_every / max(
                        time.time() - t_last, 1e-9
                    )
                    t_last = time.time()
                    self.logger.log_metrics(metrics, step=step)

                if self.checkpoint_every and step % self.checkpoint_every == 0:
                    self.save(state, step)

                if (self.demo_every and step % self.demo_every == 0
                        and self.demo_callback is not None and self.rank == 0):
                    try:
                        self.demo_callback(self.model, self.wrapper, state, step)
                    except Exception as e:
                        print(f"Demo callback failed at step {step}: {e}")

                if val_step is not None and step % self.val_every == 0:
                    vals = []
                    for v_audio, v_meta in val_dataloader:
                        v_batch = self._prepare_batch(v_audio, v_meta)
                        # the GAN wrapper's val_step takes raw audio, the
                        # diffusion/LM ones take the batch dict
                        v_in = v_batch["audio"] if is_gan else v_batch
                        val_rng = jax.random.fold_in(
                            jax.random.fold_in(rng, 0x76616C), step)
                        with mesh_ctx():
                            vals.append(val_step(state, v_in, val_rng))
                    if vals and self.rank == 0:
                        avg = {
                            k: float(np.mean([float(v[k]) for v in vals]))
                            for k in vals[0]
                        }
                        self.logger.log_metrics(avg, step=step)

            if self.max_steps is None:
                # single-pass datasets keep cycling
                continue
        self.save(state, step)
        return state
