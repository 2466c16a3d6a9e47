"""Checkpoint IO: read released Flax-msgpack checkpoints, save/load ours.

Reference loaders: load_caco / load_audiomae (src/caco/load_model.py:12-89);
they restore msgpack with flax and print param counts.  Here the released
layout is converted to our tree on load, param counts are ASSERTED against
the published sizes (85.26M audio / 125.23M text / 76.46M decoder,
reference README.md:59-70) rather than printed, and our own checkpoints are
saved via orbax (TPU-native async-capable checkpointing).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from cacophony_tpu.checkpoints.convert import convert_audiomae_params, convert_caco_params
from cacophony_tpu.configs import AudioMAEConfig, CacoConfig, audiomae_base, caco_base
from cacophony_tpu.models.layers import count_params

# Published parameter counts (reference README.md:59-70), in millions.
PUBLISHED_PARAM_COUNTS_M = {"audio": 85.26, "text": 125.23, "decoder": 76.46}


def _restore_msgpack(path: str):
    from flax.training import checkpoints as flax_checkpoints

    state = flax_checkpoints.restore_checkpoint(path, target=None)
    if state is None:
        raise FileNotFoundError(f"no checkpoint found at {path}")
    return state


def _check_counts(params: dict, strict: bool):
    for key, published in PUBLISHED_PARAM_COUNTS_M.items():
        if key not in params:
            continue
        ours = count_params(params[key]) / 1e6
        if abs(ours - published) > 0.02 and strict:
            raise ValueError(
                f"param count mismatch for {key}: {ours:.2f}M vs published "
                f"{published}M — wrong checkpoint or layout drift"
            )


def load_caco(ckpt_path: str, cfg: Optional[CacoConfig] = None, *,
              strict_counts: bool = True):
    """Released Cacophony checkpoint → (cfg, our params).

    Mirrors reference load_caco (load_model.py:12-63) minus the tokenizer
    (see cacophony_tpu.data.tokenizer)."""
    cfg = cfg or caco_base()
    state = _restore_msgpack(ckpt_path)
    params = convert_caco_params(state["0"]["params"])
    _check_counts(params, strict_counts)
    return cfg, jax.tree_util.tree_map(np.asarray, params)


def load_audiomae(ckpt_path: str, cfg: Optional[AudioMAEConfig] = None, *,
                  strict_counts: bool = True):
    """Released stage-1 AudioMAE checkpoint → (cfg, our params)."""
    cfg = cfg or audiomae_base()
    state = _restore_msgpack(ckpt_path)
    params = convert_audiomae_params(state["0"]["params"])
    if strict_counts:
        enc_m = count_params(params["encoder"]) / 1e6
        if abs(enc_m - PUBLISHED_PARAM_COUNTS_M["audio"]) > 0.01:
            raise ValueError(f"MAE encoder param count {enc_m:.2f}M != 85.26M")
    return cfg, jax.tree_util.tree_map(np.asarray, params)


# ------------------------------------------------------- our own checkpoints

def save_params(params, path: str):
    """Save our param tree with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_params(path: str, like=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(path, like)
        return ckptr.restore(path)


# ---------------------------------------------------- training state resume

def save_train_state(state, path: str, *, keep: int = 3):
    """Checkpoint a TrainState (params + optimizer state + step) with orbax,
    under path/step_N; prunes old steps beyond `keep`.

    The reference has no training and therefore no resume (SURVEY §5); this
    plus `load_train_state` is the crash-recovery story for long runs.
    """
    import re
    import shutil

    step = int(jax.device_get(state.step))
    save_params(tuple(state), os.path.join(path, f"step_{step:08d}"))
    if keep:
        steps = sorted(
            int(m.group(1))
            for m in (re.match(r"step_(\d+)", d) for d in os.listdir(path))
            if m
        )
        for old in steps[:-keep]:
            shutil.rmtree(os.path.join(path, f"step_{old:08d}"),
                          ignore_errors=True)


def latest_step(path: str) -> Optional[int]:
    import re

    if not os.path.isdir(path):
        return None
    steps = sorted(
        int(m.group(1))
        for m in (re.match(r"step_(\d+)", d) for d in os.listdir(path))
        if m
    )
    return steps[-1] if steps else None


def load_train_state(path: str, like, step: Optional[int] = None):
    """Restore a TrainState saved by save_train_state. `like` provides the
    tree structure/shardings (an abstract or concrete TrainState)."""
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no train-state checkpoints under {path}")
    restored = load_params(os.path.join(path, f"step_{step:08d}"), tuple(like))

    # Restore placement: mesh-sharded leaves go back onto their
    # NamedSharding; everything else becomes an UNCOMMITTED array (orbax
    # restores committed single-device arrays, which jit refuses to mix
    # with mesh-placed arguments).
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    def replace(x, l):
        sh = getattr(l, "sharding", None)
        if isinstance(sh, NamedSharding):
            return jax.device_put(x, sh)
        return jnp.asarray(jax.device_get(x))

    restored = jax.tree_util.tree_map(replace, restored, tuple(like))
    return type(like)(*restored)
