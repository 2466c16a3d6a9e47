"""Sharded training steps for stage-1 (AudioMAE) and stage-2 (CACO).

One logical program under `jit` over a ('dp','tp') Mesh.  Sharding is
placement-driven: callers put params on the mesh with
`parallel.shard_params` (tp rules) and batches with `parallel.shard_batch`
(dp); `opt.init` and the step run under `jit`, so optimizer moments and all
activations inherit shardings via GSPMD propagation — gradient all-reduce
and the contrastive-gallery all-gather are inserted by XLA over ICI.
`jax.checkpoint` (remat) on the audio encoder trades FLOPs for HBM on long
patch sequences.

The reference ships no training code (SURVEY §0); objectives follow its
paper and the in-repo scoring rule (see train/losses.py).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from cacophony_tpu.configs import AudioMAEConfig, CacoConfig
from cacophony_tpu.models.audio import audiomae_apply
from cacophony_tpu.models.caco import get_audio_embedding, get_text_embedding
from cacophony_tpu.models.text import caption_decoder_apply
from cacophony_tpu.train.losses import (
    caption_cross_entropy,
    clip_contrastive_loss,
    mae_reconstruction_loss,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    warmup_steps: int = 1000
    total_steps: int = 100_000
    max_grad_norm: float = 1.0
    caption_loss_weight: float = 1.0
    # Remat trades an extra audio-encoder forward (~12 ms of an 87 ms step
    # at B=16/seq-500 on v5e) for activation memory; at the bench shapes the
    # activations fit HBM comfortably, so it's OFF by default — enable for
    # long-patch (30 s) or large-batch configs that would otherwise OOM.
    remat_encoder: bool = False
    # Adam first-moment dtype: "bfloat16" halves the m-buffer's HBM traffic
    # and residency (v, the second moment, stays fp32).  Measured r3
    # (same-session interleaved, B=16 bf16 stage-2): 84.0 vs 86.2 ms/step
    # (+2.6%), losses tracking within ~0.3% after 37 steps.  Re-measured r4
    # on top of the backward-lean custom VJPs: 78.1-79.8 vs 79.8-81.9 ms
    # (-2.3 ms).  r5: 74.6 vs 75.5-75.7 ms under the rbg default, and the
    # VERDICT-prescribed 200-step loss-tracking run (8-batch cycle, fresh
    # inits) stayed clean: rel |Δloss| mean 0.16% / max 0.29% (last-50 mean
    # 0.26%), grad-norm mean drift 0.70%, all finite, loss decreasing —
    # now the DEFAULT.  Set None for fp32 moments (bitwise-conservative
    # runs); the AdamW update's remaining ~10.9 ms/step is the fp32
    # 24 B/param read-modify-write floor (xplane r5), not dispatch.
    adam_mu_dtype: str | None = "bfloat16"
    # In-step PRNG implementation for dropout masks.  "rbg" rewraps the
    # incoming key so bulk bit generation runs on XLA's hardware-backed
    # RngBitGenerator (threefry then only hashes the 4-word key in
    # split/fold_in) — the text/decoder towers draw ~100M Bernoulli bits per
    # step (every attention-probs and hidden dropout mask), and threefry
    # evaluates a >30-op hash per 32-bit word on the VPU.  Masks remain exact
    # seeded Bernoulli(rate); only the (arbitrary) random stream differs, as
    # it would under a different seed.  Measured r5 (1× v5e, B=16 bf16
    # stage-2, same-session interleaved, 3 trials/variant): 75.5 vs 80.3
    # ms/step (−5.9%) — now the DEFAULT.  Caveat (per JAX docs): rbg bits
    # are only reproducible within one JAX/XLA version, backend, and
    # sharding; set "threefry" for cross-version-stable dropout streams.
    rng_impl: str = "rbg"


def _rewrap_rng(rng, impl: str):
    """Rewrap a PRNG key under a different generator implementation.

    Accepts both typed keys and raw (2,) uint32 PRNGKey arrays.  For "rbg"
    the 2-word threefry key data is tiled to the 4-word rbg key shape —
    deterministic in the caller's seed.
    """
    if impl == "threefry":
        return rng
    kd = (jax.random.key_data(rng)
          if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key) else rng)
    if impl == "rbg":
        if kd.shape[-1] == 4:   # already an rbg-shaped key: pass through
            return jax.random.wrap_key_data(kd, impl=impl)
        kd = jnp.concatenate([kd, kd])
    return jax.random.wrap_key_data(kd, impl=impl)


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    warmup = min(tc.warmup_steps, max(0, tc.total_steps - 1))
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=tc.learning_rate,
        warmup_steps=warmup, decay_steps=tc.total_steps,
    )

    def decay_mask(params):
        # decay matrices/embeddings only — never biases, LayerNorm
        # scales/biases, or logit_scale (standard CLIP/transformer practice;
        # decaying logit_scale would drag the learned temperature to 0)
        return jax.tree_util.tree_map(lambda x: jnp.ndim(x) >= 2, params)

    return optax.chain(
        optax.clip_by_global_norm(tc.max_grad_norm),
        optax.adamw(schedule, weight_decay=tc.weight_decay, mask=decay_mask,
                    mu_dtype=tc.adam_mu_dtype),
    )


def init_train_state(params, tc: TrainConfig) -> TrainState:
    """Build TrainState; run AFTER sharding params so the jitted opt.init
    gives the moments the params' shardings."""
    opt = make_optimizer(tc)
    opt_state = jax.jit(opt.init)(params)
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32))


# --------------------------------------------------------------- stage 2

def make_caco_train_step(cfg: CacoConfig, tc: TrainConfig):
    """Returns jitted step(state, batch, rng) → (state, metrics).

    batch: audio_patches/time_inds/freq_inds/mask + text_input_ids/text_mask
    (same Batch contract as the reference pipeline, dataset.py:45-53).
    Loss = symmetric contrastive + weighted captioning CE (teacher-forced
    next-token targets).
    """
    opt = make_optimizer(tc)

    def loss_fn(params, batch, rng):
        rng = _rewrap_rng(rng, tc.rng_impl)
        r_audio, r_text, r_cap = jax.random.split(rng, 3)

        def audio_fwd(p, patches, ti, fi, mask, r):
            return get_audio_embedding(p, cfg, patches, ti, fi, mask,
                                       normalize=True, train=True, rngs=r)

        if tc.remat_encoder:
            audio_fwd = jax.checkpoint(audio_fwd)
        a_emb, a_hidden = audio_fwd(
            params, batch["audio_patches"], batch["audio_time_inds"],
            batch["audio_freq_inds"], batch["audio_mask"], r_audio,
        )
        t_emb, t_hidden = get_text_embedding(
            params, cfg, batch["text_input_ids"], batch["text_mask"],
            normalize=True, train=True, rngs=r_text,
        )
        l_con = clip_contrastive_loss(a_emb, t_emb, params["logit_scale"])

        # teacher forcing: predict token t+1 from prefix ≤ t.  The caption
        # branch REUSES the contrastive tower's hidden states: the text
        # encoder is causal, so hidden[:, :S-1] over the full sequence is
        # exactly the encoder output over ids[:, :-1] (position t never sees
        # t+1) — running caption_logits' own 12-layer pass was a second
        # full fwd+bwd of the text tower per step (xplane r3: ~14 ms of a
        # 117 ms step at B=16).
        ids, tmask = batch["text_input_ids"], batch["text_mask"]
        logits, _ = caption_decoder_apply(
            params["decoder"], cfg.decoder, t_hidden[:, :-1], tmask[:, :-1],
            a_hidden, batch["audio_mask"], train=True, rngs=r_cap,
            dtype=cfg.dtype,
        )
        l_cap = caption_cross_entropy(
            logits.astype(jnp.float32), ids[:, 1:], tmask[:, 1:])

        loss = l_con + tc.caption_loss_weight * l_cap
        return loss, {"loss": loss, "contrastive": l_con, "caption": l_cap}

    def step(state: TrainState, batch, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,))


# --------------------------------------------------------------- stage 1

def mae_random_masking(rng, patch_batch: dict, mask_ratio: float):
    """Split a full patch grid into visible/masked sets via argsorted noise
    (standard MAE recipe; the reference ships only the pretrained result).

    Returns inputs for audiomae_apply: visible patches keep their
    (time, freq) indices; masked positions go to the decoder's restore set.
    Static shapes: n_keep = round(S·(1-ratio)).
    """
    x = patch_batch["audio_patches"]
    b, s, _ = x.shape
    n_keep = max(1, int(round(s * (1.0 - mask_ratio))))

    noise = jax.random.uniform(rng, (b, s))
    # push padding to the masked end so the visible set is real patches
    noise = jnp.where(patch_batch["audio_mask"] > 0, noise, noise + 1.0)
    order = jnp.argsort(noise, axis=1)
    keep, drop = order[:, :n_keep], order[:, n_keep:]

    take = jax.vmap(lambda a, i: a[i])
    return {
        "patches": take(x, keep),
        "time_inds": take(patch_batch["audio_time_inds"], keep),
        "freq_inds": take(patch_batch["audio_freq_inds"], keep),
        "mask": take(patch_batch["audio_mask"], keep),
        "restore_time_inds": take(patch_batch["audio_time_inds"], drop),
        "restore_freq_inds": take(patch_batch["audio_freq_inds"], drop),
        "restore_mask": take(patch_batch["audio_mask"], drop),
        "target_patches": jnp.concatenate([take(x, keep), take(x, drop)], axis=1),
        "loss_mask": jnp.concatenate(
            [jnp.zeros((b, n_keep), jnp.int32),
             take(patch_batch["audio_mask"], drop)], axis=1),
    }


def make_mae_train_step(cfg: AudioMAEConfig, tc: TrainConfig):
    """Stage-1 masked-reconstruction step (jitted; shard inputs first)."""
    opt = make_optimizer(tc)

    def loss_fn(params, batch, rng):
        rng = _rewrap_rng(rng, tc.rng_impl)
        r_mask, r_model = jax.random.split(rng)
        m = mae_random_masking(r_mask, batch, cfg.mask_ratio)
        pred = audiomae_apply(
            params, cfg.encoder, cfg.decoder, m["patches"], m["mask"],
            m["time_inds"], m["freq_inds"], m["restore_time_inds"],
            m["restore_freq_inds"], m["restore_mask"],
            dtype=cfg.dtype, train=True, rngs=r_model,
        )
        loss = mae_reconstruction_loss(pred, m["target_patches"], m["loss_mask"])
        return loss, {"loss": loss}

    def step(state: TrainState, batch, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,))
