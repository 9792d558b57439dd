"""Device mesh + sharding utilities.

Rebuild target (SURVEY.md §2.10 / §5.8): the reference uses PL DDP/DeepSpeed
ZeRO-2 over NCCL; here distribution is `jax.sharding` over a Mesh — batch
sharded on the 'data' axis, params replicated (DP) or sharded on a 'model'
axis (TP), optimizer state ZeRO-sharded over 'data'. All collectives are
inserted by XLA GSPMD from these sharding annotations and ride ICI.
"""

from __future__ import annotations

import contextlib
import threading
import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MESH_CTX = threading.local()


@contextlib.contextmanager
def mesh_program_context(mesh: tp.Optional[Mesh] = None,
                         sequence_parallel: bool = False):
    """Marks that the current trace targets a multi-chip GSPMD program.

    Pallas kernels lower to custom-calls that GSPMD cannot partition (they
    would force full replication of sharded operands), so attention_core
    consults this flag and uses the XLA path — which partitions cleanly over
    head-sharded inputs — whenever a mesh program is being built.

    sequence_parallel=True (needs the mesh, with a >1 'model' axis)
    additionally enables Megatron-SP residual-stream constraints
    (seq_shard_constraint). OFF by default: at SA-Open scale the measured
    compiled HLO shows GSPMD degenerating to weight-scale all-gathers under
    the naive block-boundary constraint (docs/multichip.md §Sequence
    parallelism) — opt in only after auditing with scripts/audit_tp_hlo.py."""
    prev = getattr(_MESH_CTX, "active", False)
    prev_axes = getattr(_MESH_CTX, "axes", {})
    prev_sp = getattr(_MESH_CTX, "sp", False)
    prev_mesh = getattr(_MESH_CTX, "mesh", None)
    _MESH_CTX.active = True
    _MESH_CTX.axes = dict(mesh.shape) if mesh is not None else {}
    _MESH_CTX.sp = bool(sequence_parallel)
    _MESH_CTX.mesh = mesh
    try:
        yield
    finally:
        _MESH_CTX.active = prev
        _MESH_CTX.axes = prev_axes
        _MESH_CTX.sp = prev_sp
        _MESH_CTX.mesh = prev_mesh


def in_mesh_program() -> bool:
    return getattr(_MESH_CTX, "active", False)


def current_mesh() -> tp.Optional[Mesh]:
    """The Mesh of the active mesh program (None if entered without one).

    Pallas attention kernels use this to shard_map themselves over the
    (data, model) axes instead of falling back to XLA SDPA — GSPMD cannot
    partition a pallas custom-call, but a shard_map region runs the kernel
    per-shard on the head/batch split, which is exact for attention."""
    return getattr(_MESH_CTX, "mesh", None)


def seq_shard_constraint(x):
    """Megatron-style sequence parallelism via GSPMD: constrain a [B, N, D]
    residual-stream activation's sequence axis onto the 'model' mesh axis.

    Applied at transformer-block boundaries (ops/transformer.py) under
    `mesh_program_context(mesh, sequence_parallel=True)`, this makes GSPMD
    (a) run norms/residual-adds/elementwise ops 1/tp-sharded instead of
    replicated on every TP shard, and (b) reshard activations (all-gather /
    all-to-all) instead of all-reducing each block's out-projection.
    Measured trade-off in scripts/audit_tp_hlo.py --small vs --no-sp:
    -3% FLOPs and ~17% fewer wire bytes at 512x2 scale, but at the full
    SA-Open 24x1536 scale GSPMD degenerates (303 all-gathers, 2.4 GB/step
    vs 1.42 GB plain TP) — hence opt-in, not default. No-op outside mesh
    programs or when the mesh has no >1 'model' axis."""
    if not (in_mesh_program() and getattr(_MESH_CTX, "sp", False)):
        return x
    axes = getattr(_MESH_CTX, "axes", {})
    if axes.get("model", 1) <= 1 or x.ndim != 3:
        return x
    from jax.sharding import PartitionSpec
    return jax.lax.with_sharding_constraint(
        x, PartitionSpec(None, "model", None)
    )


def create_mesh(data: tp.Optional[int] = None, model: int = 1,
                devices=None) -> Mesh:
    """Mesh with ('data', 'model') axes. data defaults to n_devices/model."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def replicate_tree(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh):
    """Shard leading (batch) axis over 'data'."""
    cross_process = any(
        d.process_index != jax.process_index() for d in mesh.devices.flat)

    def put(x):
        if cross_process and isinstance(x, jax.Array):
            # a committed single-device array (e.g. T5Conditioner.prepare's
            # device-resident embeddings) can't device_put directly onto a
            # sharding that spans other processes — hop through the host
            x = np.asarray(x)
        spec = P("data", *([None] * (np.ndim(x) - 1))) if np.ndim(x) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def batch_sharding(mesh: Mesh):
    def spec_of(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        return NamedSharding(mesh, P())

    return spec_of


def zero_shard_opt_state(opt_state, mesh: Mesh):
    """ZeRO-style sharding spec tree for optimizer state.

    Arrays whose leading dim divides evenly over the 'data' axis get sharded
    on that axis (adam moments mirror param shapes); scalars and indivisible
    arrays stay replicated. Apply with jax.device_put or use as out_shardings.
    """
    data_size = mesh.shape["data"]

    def spec_of(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % data_size == 0 and x.shape[0] > 0:
            return NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_of, opt_state)


def tp_param_sharding(params, mesh: Mesh, rules: tp.Sequence[tp.Tuple[str, P]] = ()):
    """Tensor-parallel sharding specs by param-path regex rules.

    rules: [(pattern, spec_or_fn)]; first match wins; default replicated.
    A rule's spec may be a callable (shape, mesh) -> PartitionSpec for
    shape-dependent decisions (see gqa_kv_spec). Typical DiT rules shard
    attention qkv/out and FF kernels on 'model'.
    """
    import re

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path, x):
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        for pattern, spec in rules:
            if re.search(pattern, path_str):
                if callable(spec):
                    spec = spec(x.shape, mesh)
                # validate divisibility; fall back to replicated
                try:
                    NamedSharding(mesh, spec).shard_shape(x.shape)
                    return NamedSharding(mesh, spec)
                except Exception:
                    return NamedSharding(mesh, P())
        return NamedSharding(mesh, P())

    specs = {tuple(path): spec_for(path, x) for path, x in flat}
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [specs[tuple(p)] for p, _ in flat]
    )


def tp_zero_opt_sharding(opt_state, mesh: Mesh,
                         rules: tp.Sequence[tp.Tuple[str, P]] = ()):
    """Optimizer-state sharding under tensor parallelism: moment leaves whose
    paths match the TP rules keep the TP spec (with a free axis additionally
    ZeRO-split over 'data' when divisible); unmatched leaves ZeRO-shard over
    'data' like the pure-DP path. Scalars/indivisible arrays replicate."""
    import re

    data_size = mesh.shape["data"]

    def zero_axis(parts, shape):
        parts = list(parts) + [None] * (len(shape) - len(parts))
        for i, (p, s) in enumerate(zip(parts, shape)):
            if p is None and s > 0 and s % data_size == 0:
                parts[i] = "data"
                break
        return P(*parts)

    def spec_for(path, x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return NamedSharding(mesh, P())
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        for pattern, spec in rules:
            if re.search(pattern, path_str):
                if callable(spec):
                    spec = spec(x.shape, mesh)
                try:
                    candidate = zero_axis(tuple(spec), x.shape)
                    NamedSharding(mesh, candidate).shard_shape(x.shape)
                    return NamedSharding(mesh, candidate)
                except Exception:
                    try:
                        NamedSharding(mesh, spec).shard_shape(x.shape)
                        return NamedSharding(mesh, spec)
                    except Exception:
                        break
        candidate = zero_axis((), x.shape)
        try:
            NamedSharding(mesh, candidate).shard_shape(x.shape)
            return NamedSharding(mesh, candidate)
        except Exception:
            return NamedSharding(mesh, P())

    flat = jax.tree_util.tree_flatten_with_path(opt_state)[0]
    specs = {tuple(p): spec_for(p, x) for p, x in flat}
    treedef = jax.tree_util.tree_structure(opt_state)
    return jax.tree_util.tree_unflatten(
        treedef, [specs[tuple(p)] for p, _ in flat]
    )


def gqa_kv_spec(dim_heads: int = 64):
    """GQA-aware sharding for cross-attention `to_kv` kernels.

    The fused to_kv kernel's columns are kv-head groups of 2*dim_heads
    ([h][k|v][dh] interleave). Column-sharding it is only clean when the
    kv-head count divides the 'model' axis — otherwise the GQA
    repeat-to-q-heads (reference transformer.py:406-411) lands mid-group
    on shard boundaries and GSPMD inserts ~1.7 extra all-reduces/layer
    (measured, docs/multichip.md). When it doesn't divide, REPLICATE the
    kernel: the cross-attn context is ~130 tokens, so every shard
    recomputing the full K/V projection costs ~0.3 GFLOP/layer while the
    repeated K/V becomes a local slice under the head-sharded attention —
    restoring the Megatron 3-all-reduce/layer pattern (SA-Open: 24 q
    heads / 12 kv heads over TP=8)."""

    def spec(shape, mesh):
        kv_groups = shape[-1] // (2 * dim_heads)
        model = mesh.shape.get("model", 1)
        if model > 1 and (kv_groups == 0 or kv_groups % model != 0):
            return P()
        return P(None, "model")

    return spec


DIT_TP_RULES = (
    # attention projections: shard output features over 'model'
    (r"to_qkv/kernel", P(None, "model")),
    (r"to_q/kernel", P(None, "model")),
    (r"to_kv/kernel", gqa_kv_spec()),
    (r"to_out/kernel", P("model", None)),
    # feed-forward
    (r"ff/linear_in/proj/kernel", P(None, "model")),
    (r"ff/linear_out/kernel", P("model", None)),
)
