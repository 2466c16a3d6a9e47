"""Released-checkpoint layout → cacophony_tpu param trees.

The released Cacophony/AudioMAE checkpoints are Flax msgpack pytrees with
layout `state['0']['params']` (reference src/caco/load_model.py:15-20):

- top level: `audio_module`, `text_module`, `decoder_module`, `logit_scale`,
  `text_proj`, `audio_attention_pool` (param names from caco.py:63-70)
- audio encoder: flax auto-names — `Dense_0` patch proj,
  `freq_positional_embedding`, `AudioEncoderLayer_{i}` × L each with
  `LayerNorm_0/1`, `MultiHeadDotProductAttention_0` (per-head split kernels
  (D, H, Dh)), `MLP_0/{Dense_0,Dense_1}`, final `LayerNorm_0` (mae.py:107-139)
- text towers: HF-style names under `encoder/layer`, scan-STACKED along a
  leading layer axis under `ScanFlaxRobertaLayer_0`
  (roberta_text_model.py:449-462; detection logic mirrored from :699) or
  numbered `'0'..'L-1'` in the non-scan layout (:464-472)
- AudioMAE checkpoint nests under `['0']['params']['AudioEncoder_0']` /
  `AudioDecoder_0` (load_model.py:69)

Our layout: fused QKV, merged-head 2D kernels, leaves stacked (L, ...) for
`lax.scan`.  Every function here is a pure tree→tree map; shapes are
asserted so a layout drift fails loudly.
"""

from __future__ import annotations

import numpy as np


def _np(x):
    return np.asarray(x)


def _dense(t):
    return {"w": _np(t["kernel"]), "b": _np(t["bias"])}


def _ln(t):
    return {"scale": _np(t["scale"]), "bias": _np(t["bias"])}


def _merge_heads_kernel(k):
    """flax MHA per-head kernel (D, H, Dh) → (D, H*Dh); bias (H, Dh) → (H*Dh,)."""
    return k.reshape(k.shape[0], -1)


def _stack(trees):
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *trees)


# ------------------------------------------------------------- audio tower

def _audio_block(layer):
    mha = layer["MultiHeadDotProductAttention_0"]
    wq = _merge_heads_kernel(_np(mha["query"]["kernel"]))
    wk = _merge_heads_kernel(_np(mha["key"]["kernel"]))
    wv = _merge_heads_kernel(_np(mha["value"]["kernel"]))
    bq = _np(mha["query"]["bias"]).reshape(-1)
    bk = _np(mha["key"]["bias"]).reshape(-1)
    bv = _np(mha["value"]["bias"]).reshape(-1)
    d = wq.shape[0]
    wo = _np(mha["out"]["kernel"]).reshape(-1, d)  # (H, Dh, D) → (H*Dh, D)
    return {
        "ln1": _ln(layer["LayerNorm_0"]),
        "attn": {
            "qkv": {"w": np.concatenate([wq, wk, wv], axis=-1),
                    "b": np.concatenate([bq, bk, bv])},
            "o": {"w": wo, "b": _np(mha["out"]["bias"])},
        },
        "ln2": _ln(layer["LayerNorm_1"]),
        "mlp": {"w1": _dense(layer["MLP_0"]["Dense_0"]),
                "w2": _dense(layer["MLP_0"]["Dense_1"])},
    }


def convert_audio_encoder(ref: dict) -> dict:
    num_layers = sum(1 for k in ref if k.startswith("AudioEncoderLayer_"))
    return {
        "patch_proj": _dense(ref["Dense_0"]),
        "freq_pos_embed": _np(ref["freq_positional_embedding"]),
        "blocks": _stack([_audio_block(ref[f"AudioEncoderLayer_{i}"])
                          for i in range(num_layers)]),
        "ln_f": _ln(ref["LayerNorm_0"]),
    }


def convert_audio_decoder(ref: dict) -> dict:
    num_layers = sum(1 for k in ref if k.startswith("AudioEncoderLayer_"))
    return {
        "in_proj": _dense(ref["Dense_0"]),
        "freq_pos_embed": _np(ref["freq_positional_embedding"]),
        "mask_token": _np(ref["restore_patch"]),
        "blocks": _stack([_audio_block(ref[f"AudioEncoderLayer_{i}"])
                          for i in range(num_layers)]),
        "ln_f": _ln(ref["LayerNorm_0"]),
        "out_proj": _dense(ref["Dense_1"]),
    }


# -------------------------------------------------------------- text towers

def _roberta_layers(encoder_tree: dict) -> dict:
    """Return the layer tree with leaves stacked (L, ...), whichever layout
    the checkpoint uses (scan-stacked or numbered)."""
    layer = encoder_tree["layer"]
    if "ScanFlaxRobertaLayer_0" in layer:
        return layer["ScanFlaxRobertaLayer_0"]
    indices = sorted(int(k) for k in layer.keys())
    return _stack([layer[str(i)] for i in indices])


def _text_blocks(stacked: dict) -> dict:
    sa = stacked["attention"]["self"]
    blocks = {
        "attn": {
            "qkv": {"w": np.concatenate([_np(sa["query"]["kernel"]),
                                         _np(sa["key"]["kernel"]),
                                         _np(sa["value"]["kernel"])], axis=-1),
                    "b": np.concatenate([_np(sa["query"]["bias"]),
                                         _np(sa["key"]["bias"]),
                                         _np(sa["value"]["bias"])], axis=-1)},
            "o": _dense(stacked["attention"]["output"]["dense"]),
        },
        "ln_attn": _ln(stacked["attention"]["output"]["LayerNorm"]),
        "mlp_in": _dense(stacked["intermediate"]["dense"]),
        "mlp_out": _dense(stacked["output"]["dense"]),
        "ln_mlp": _ln(stacked["output"]["LayerNorm"]),
    }
    if "crossattention" in stacked:
        ca = stacked["crossattention"]["self"]
        blocks["cross"] = {
            "q": _dense(ca["query"]),
            "kv": {"w": np.concatenate([_np(ca["key"]["kernel"]),
                                        _np(ca["value"]["kernel"])], axis=-1),
                   "b": np.concatenate([_np(ca["key"]["bias"]),
                                        _np(ca["value"]["bias"])], axis=-1)},
            "o": _dense(stacked["crossattention"]["output"]["dense"]),
        }
        blocks["ln_cross"] = _ln(stacked["crossattention"]["output"]["LayerNorm"])
    return blocks


def convert_text_encoder(ref: dict) -> dict:
    emb = ref["embeddings"]
    return {
        "embeddings": {
            "word": _np(emb["word_embeddings"]["embedding"]),
            "position": _np(emb["position_embeddings"]["embedding"]),
            "token_type": _np(emb["token_type_embeddings"]["embedding"]),
            "ln": _ln(emb["LayerNorm"]),
        },
        "blocks": _text_blocks(_roberta_layers(ref["encoder"])),
        "pooler": {
            "key": _dense(ref["pooler"]["key_proj"]),
            "value": _dense(ref["pooler"]["value_proj"]),
            "query": _np(ref["pooler"]["attention_pool_query"]),
        },
    }


def convert_caption_decoder(ref: dict) -> dict:
    return {
        "blocks": _text_blocks(_roberta_layers(ref["encoder"])),
        "vocab_proj": _dense(ref["decoder_proj"]),
    }


# ------------------------------------------------------------------- models

def convert_caco_params(ref_params: dict) -> dict:
    """Full released-CACO tree (`state['0']['params']`) → our param tree."""
    pool = ref_params["audio_attention_pool"]
    out = {
        "audio": convert_audio_encoder(ref_params["audio_module"]),
        "text": convert_text_encoder(ref_params["text_module"]),
        "audio_pool": {
            "kv": _dense(pool["Dense_0"]),
            "query": _np(pool["query"]),
            "out": _dense(pool["Dense_1"]),
        },
        "text_proj": _dense(ref_params["text_proj"]),
        "logit_scale": _np(ref_params["logit_scale"]),
    }
    if "decoder_module" in ref_params:
        out["decoder"] = convert_caption_decoder(ref_params["decoder_module"])
    return out


def convert_audiomae_params(ref_params: dict) -> dict:
    """AudioMAE tree (`state['0']['params']`) → {'encoder','decoder'} tree."""
    out = {"encoder": convert_audio_encoder(ref_params["AudioEncoder_0"])}
    if "AudioDecoder_0" in ref_params:
        out["decoder"] = convert_audio_decoder(ref_params["AudioDecoder_0"])
    return out
