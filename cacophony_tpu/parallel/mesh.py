"""Device mesh + sharding rules: the distribution layer.

The reference's only distribution story is single-host `jax.pmap` data
parallelism with replicated params (eval_caco.py:53-55) and hand-rolled
batch resharding `(d b) → d b` (eval_caco.py:60-64).  Here distribution is
the TPU-native recipe instead: ONE logical program under `jax.jit` over a
`Mesh` with named axes

    dp — data parallel (batch dim; gradients all-reduce over ICI)
    tp — tensor parallel (Megatron-style: column-parallel QKV/MLP-in,
         row-parallel attn-out/MLP-out, vocab-parallel LM head)

Params get PartitionSpecs from tree-path rules; activations follow from
GSPMD propagation; collectives (all-gather for the contrastive gallery,
psum for grads) are inserted by XLA and ride ICI.  No user-level
communication code — this is the replacement for the reference's
NCCL-pinned jaxlib (SURVEY §2.5).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('dp', 'tp') mesh. dp defaults to n_devices // tp.

    On a multi-slice pod, put 'dp' on the outer (DCN-crossing) axis and 'tp'
    inner so tensor-parallel collectives stay on ICI.
    """
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // tp
    if dp * tp > len(devices):
        raise ValueError(f"mesh {dp}×{tp} needs {dp * tp} devices, "
                         f"have {len(devices)}")
    if dp * tp != len(devices):
        import warnings

        warnings.warn(f"mesh {dp}×{tp} uses {dp * tp} of {len(devices)} "
                      "devices; the rest idle")
        devices = devices[: dp * tp]
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


# Tree-path (joined with '/') regex → trailing-dims axes for the weight.
# Leaves not matched are replicated.  A stacked (L, ...) layer axis — any
# leaf under `blocks/` — is left-padded with None automatically.
_TP_RULES = [
    # fused QKV / cross-KV / MLP-in: column-parallel (shard output features)
    (re.compile(r".*/(qkv|kv)/w$|.*/mlp_in/w$|.*/mlp/w1/w$"), (None, "tp")),
    (re.compile(r".*/(qkv|kv)/b$|.*/mlp_in/b$|.*/mlp/w1/b$"), ("tp",)),
    # attention-out / MLP-out: row-parallel (shard input features)
    (re.compile(r".*/o/w$|.*/mlp_out/w$|.*/mlp/w2/w$"), ("tp", None)),
    # vocab head: vocab-parallel
    (re.compile(r".*vocab_proj/w$"), (None, "tp")),
    (re.compile(r".*vocab_proj/b$"), ("tp",)),
]


def _spec_for(path: str, ndim: int):
    for rx, trailing in _TP_RULES:
        if rx.match(path):
            axes = [None] * (ndim - len(trailing)) + list(trailing)
            return P(*axes)
    return P()


def _drop_indivisible(spec: P, shape, mesh: Optional[Mesh]):
    """Replicate any dim whose size doesn't divide its mesh axis.

    device_put requires exact divisibility; the real checkpoint has such
    dims (vocab 50265 is ODD, so neither the vocab-parallel head weight's
    50265 dim nor its bias can shard over any power-of-two tp — found by
    the full-size mesh materialization test; the 64-dim toy dryrun never
    hit it).  Falling back to replication is correct and costs nothing in
    FLOPs (each dp shard computes its own full-vocab logits); true
    vocab-parallel cross-entropy would need Megatron-style vocab padding
    to a tp multiple plus a masked loss — not worth it at this model
    size."""
    if mesh is None:
        return spec
    axes = []
    for dim, ax in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        ok = ax is not None and dim % int(np.prod(
            [mesh.shape[a] for a in ((ax,) if isinstance(ax, str) else ax)])) == 0
        axes.append(ax if ok else None)
    return P(*axes) if any(a is not None for a in axes) else P()


def param_specs(params, mesh: Optional[Mesh] = None):
    """PartitionSpec tree for a param tree (tp rules; everything else
    replicated).  Pass the mesh to drop shardings a dim can't honor
    (non-divisible sizes, e.g. the odd 50265 vocab bias under tp)."""

    def path_str(kp):
        return "/".join(getattr(k, "key", str(k)) for k in kp)

    return jax.tree_util.tree_map_with_path(
        lambda kp, leaf: _drop_indivisible(
            _spec_for(path_str(kp), np.ndim(leaf)), np.shape(leaf), mesh),
        params,
    )


def shard_params(params, mesh: Mesh):
    """Place a param tree on the mesh according to param_specs."""
    specs = param_specs(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_spec() -> P:
    return P("dp")


def shard_batch(batch, mesh: Mesh):
    """Shard every leaf's leading (batch) axis over 'dp'."""
    sh = NamedSharding(mesh, P("dp"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
