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
from cacophony_tpu.configs import (
    AudioDecoderConfig,
    AudioEncoderConfig,
    AudioMAEConfig,
    CacoConfig,
    TextConfig,
    audiomae_base,
    caco_base,
)
from cacophony_tpu.models.layers import count_params

# Published parameter counts (reference README.md:59-70), in millions.
PUBLISHED_PARAM_COUNTS_M = {"audio": 85.26, "text": 125.23, "decoder": 76.46}
# Stage-1 MAE reconstruction decoder (reference README.md:60). 85.85M =
# 768-d/12L/3072-ffn exactly (85,850,368 params incl. in/out proj, mask
# token, freq table) — NOT the AudioMAE-paper 512/8 default.
PUBLISHED_MAE_DECODER_M = 85.85


# ----------------------------------------- shape-driven config inference
#
# The reference hardcodes model dims at load time (load_model.py:28-49)
# and dodges the stage-1 decoder entirely by loading encoder-only
# (load_model.py:65-89).  Here every dimension that IS recoverable from
# checkpoint shapes is inferred from the raw msgpack tree, so a released
# stage-1 checkpoint (85.85M decoder) loads and runs without a hand-built
# config.  Not recoverable from shapes (kept from `base`): attention-pool
# head count (query stored flat (h,), caco.py:34-36), text-tower head
# count (2D fused kernels), dropout rates, logit-scale init.

import dataclasses as _dc


def infer_audio_encoder_config(ref_audio: dict, base: Optional[AudioEncoderConfig] = None,
                               ) -> AudioEncoderConfig:
    """Raw reference audio-tower tree → config. Head count comes from the
    flax per-head MHA kernel (D, H, Dh)."""
    base = base or AudioEncoderConfig()
    patch_size, hidden = np.shape(ref_audio["Dense_0"]["kernel"])
    layer0 = ref_audio["AudioEncoderLayer_0"]
    _, heads, _ = np.shape(layer0["MultiHeadDotProductAttention_0"]["query"]["kernel"])
    return _dc.replace(
        base,
        hidden_size=int(hidden),
        patch_size=int(patch_size),
        num_layers=sum(1 for k in ref_audio if k.startswith("AudioEncoderLayer_")),
        num_heads=int(heads),
        intermediate_size=int(np.shape(layer0["MLP_0"]["Dense_0"]["kernel"])[1]),
        num_freq_patches=int(np.shape(ref_audio["freq_positional_embedding"])[0]),
    )


def infer_audio_decoder_config(ref_dec: dict, base: Optional[AudioDecoderConfig] = None,
                               ) -> AudioDecoderConfig:
    base = base or AudioDecoderConfig()
    hidden = int(np.shape(ref_dec["Dense_0"]["kernel"])[1])
    layer0 = ref_dec["AudioEncoderLayer_0"]
    _, heads, _ = np.shape(layer0["MultiHeadDotProductAttention_0"]["query"]["kernel"])
    return _dc.replace(
        base,
        hidden_size=hidden,
        num_layers=sum(1 for k in ref_dec if k.startswith("AudioEncoderLayer_")),
        num_heads=int(heads),
        intermediate_size=int(np.shape(layer0["MLP_0"]["Dense_0"]["kernel"])[1]),
        patch_size=int(np.shape(ref_dec["Dense_1"]["kernel"])[1]),
        num_freq_patches=int(np.shape(ref_dec["freq_positional_embedding"])[0]),
    )


def infer_text_config(ref_text: dict, base: Optional[TextConfig] = None, *,
                      cross_attention: bool = False) -> TextConfig:
    """Raw reference RoBERTa tree (scan-stacked or numbered layers) →
    config. Text head count is not in the shapes (2D kernels); RoBERTa's
    64-d heads are assumed when the hidden size differs from `base`."""
    base = base or TextConfig()
    layer = ref_text["encoder"]["layer"]
    if "ScanFlaxRobertaLayer_0" in layer:
        stacked = layer["ScanFlaxRobertaLayer_0"]
        q_kernel = stacked["attention"]["self"]["query"]["kernel"]
        num_layers = int(np.shape(q_kernel)[0])
        hidden = int(np.shape(q_kernel)[1])
        inter = int(np.shape(stacked["intermediate"]["dense"]["kernel"])[2])
        has_cross = "crossattention" in stacked
    else:
        num_layers = len(layer)
        layer0 = layer[sorted(layer, key=int)[0]]
        hidden = int(np.shape(layer0["attention"]["self"]["query"]["kernel"])[0])
        inter = int(np.shape(layer0["intermediate"]["dense"]["kernel"])[1])
        has_cross = "crossattention" in layer0
    # the caption decoder has no embedding table (it consumes text-encoder
    # hidden states, roberta_text_model.py:585-627): vocab comes from its
    # decoder_proj head; max_position stays at base
    emb = ref_text.get("embeddings")
    if emb is not None:
        vocab = int(np.shape(emb["word_embeddings"]["embedding"])[0])
        max_pos = int(np.shape(emb["position_embeddings"]["embedding"])[0])
    else:
        vocab = (int(np.shape(ref_text["decoder_proj"]["kernel"])[1])
                 if "decoder_proj" in ref_text else base.vocab_size)
        max_pos = base.max_position_embeddings
    heads = base.num_heads if hidden == base.hidden_size else max(1, hidden // 64)
    return _dc.replace(
        base,
        vocab_size=vocab,
        hidden_size=hidden,
        num_layers=num_layers,
        num_heads=heads,
        intermediate_size=inter,
        max_position_embeddings=max_pos,
        cross_attention=cross_attention or has_cross,
    )


def infer_caco_config(ref_params: dict, base: Optional[CacoConfig] = None) -> CacoConfig:
    """Raw released-CACO tree (`state['0']['params']`) → config.

    The attention-pool head count stays at `base` (default 8, the JAX
    loader's value, load_model.py:46) — the checkpoint stores the pool
    query flat, so 8-vs-2 (torch mirror, caco_torch/caco.py:294) is only
    resolvable empirically; see scripts/resolve_pooler_heads.py."""
    base = base or caco_base()
    dec_tree = ref_params.get("decoder_module")
    return _dc.replace(
        base,
        audio=infer_audio_encoder_config(ref_params["audio_module"], base.audio),
        text=infer_text_config(ref_params["text_module"], base.text),
        decoder=(infer_text_config(dec_tree, base.decoder, cross_attention=True)
                 if dec_tree is not None else base.decoder),
        use_decoder=dec_tree is not None,
        projection_size=int(np.shape(ref_params["text_proj"]["kernel"])[1]),
    )


def infer_audiomae_config(ref_params: dict, base: Optional[AudioMAEConfig] = None,
                          ) -> AudioMAEConfig:
    """Raw stage-1 tree (`AudioEncoder_0`/`AudioDecoder_0`) → config, so the
    released 85.85M decoder loads without guessing dims (the reference
    cannot: its loader is encoder-only, load_model.py:65-89, and
    audiomae_apply takes decoder dims from the config)."""
    base = base or audiomae_base()
    out = _dc.replace(
        base, encoder=infer_audio_encoder_config(ref_params["AudioEncoder_0"],
                                                 base.encoder))
    if "AudioDecoder_0" in ref_params:
        out = _dc.replace(out, decoder=infer_audio_decoder_config(
            ref_params["AudioDecoder_0"], base.decoder))
    return out


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
    (see cacophony_tpu.data.tokenizer).  When `cfg` is None, every
    shape-recoverable dimension is inferred from the checkpoint itself."""
    state = _restore_msgpack(ckpt_path)
    cfg = cfg or infer_caco_config(state["0"]["params"])
    params = convert_caco_params(state["0"]["params"])
    _check_counts(params, strict_counts)
    return cfg, jax.tree_util.tree_map(np.asarray, params)


def load_audiomae(ckpt_path: str, cfg: Optional[AudioMAEConfig] = None, *,
                  strict_counts: bool = True):
    """Released stage-1 AudioMAE checkpoint → (cfg, our params).

    When `cfg` is None the encoder AND the 85.85M reconstruction decoder
    configs are inferred from checkpoint shapes (reference README.md:60;
    its own loader is encoder-only, load_model.py:65-89)."""
    state = _restore_msgpack(ckpt_path)
    cfg = cfg or infer_audiomae_config(state["0"]["params"])
    params = convert_audiomae_params(state["0"]["params"])
    if strict_counts:
        enc_m = count_params(params["encoder"]) / 1e6
        if abs(enc_m - PUBLISHED_PARAM_COUNTS_M["audio"]) > 0.01:
            raise ValueError(f"MAE encoder param count {enc_m:.2f}M != 85.26M")
        if "decoder" in params:
            dec_m = count_params(params["decoder"]) / 1e6
            if abs(dec_m - PUBLISHED_MAE_DECODER_M) > 0.01:
                raise ValueError(
                    f"MAE decoder param count {dec_m:.2f}M != "
                    f"{PUBLISHED_MAE_DECODER_M}M (reference README.md:60)")
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
