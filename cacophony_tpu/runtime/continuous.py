"""Continuous-batching captioning: a slotted AR decode server.

The reference decodes one pmap batch at a time, so a batch waits for its
slowest caption (caco.py:154-230).  Here B decode slots advance in lockstep
hardware-wise but each slot carries its OWN cache index and token stream;
finished slots are refilled from a request queue without stopping the
others — the standard continuous-batching construction, built on the
per-sample KV-cache indices in ops/attention.py.

All device work is two compiled programs: `prefill(slot)` (audio encoder +
cross-KV for one new clip, scattered into the batch state) and `step()`
(one token for every active slot).
"""

from __future__ import annotations

from typing import Iterable, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cacophony_tpu.configs import CacoConfig
from cacophony_tpu.models.caco import get_audio_embedding
from cacophony_tpu.models.text import (
    caption_decoder_apply,
    make_kv_cache,
    precompute_cross_kv,
    text_encoder_apply,
)


class SlotState(NamedTuple):
    text_cache: dict          # leaves (L, B, T, H, Dh); index (B,)
    dec_cache: dict
    cross_kv: dict            # (L, B, S_audio, H, Dh)
    audio_mask: jnp.ndarray   # (B, S_audio)
    input_ids: jnp.ndarray    # (B, max_len)
    index: jnp.ndarray        # (B,) per-slot decode position
    active: jnp.ndarray       # (B,) 1 = generating


class ContinuousCaptioner:
    def __init__(self, cfg: CacoConfig, params, tokenizer, *,
                 num_slots: int = 8, max_length: int = 100,
                 temperature: float = 0.1, seed: int = 42):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.num_slots = num_slots
        self.max_length = max_length
        self.temperature = temperature
        self.rng = jax.random.PRNGKey(seed)
        self._step_count = 0
        self._compiled_step = self._build_step()
        self._compiled_prefill = self._build_prefill()

    # ------------------------------------------------------------- builders

    def init_state(self, audio_seq_len: int) -> SlotState:
        b, t = self.num_slots, self.max_length
        cfg = self.cfg
        text_cache = make_kv_cache(cfg.text, b, t)
        dec_cache = make_kv_cache(cfg.decoder, b, t)
        # per-sample indices
        text_cache["index"] = jnp.zeros((b,), jnp.int32)
        dec_cache["index"] = jnp.zeros((b,), jnp.int32)
        ld = cfg.decoder
        cross = {
            "k": jnp.zeros((ld.num_layers, b, audio_seq_len, ld.num_heads, ld.head_dim)),
            "v": jnp.zeros((ld.num_layers, b, audio_seq_len, ld.num_heads, ld.head_dim)),
        }
        return SlotState(
            text_cache=text_cache, dec_cache=dec_cache, cross_kv=cross,
            audio_mask=jnp.zeros((b, audio_seq_len), jnp.int32),
            input_ids=jnp.zeros((b, t), jnp.int32),
            index=jnp.zeros((b,), jnp.int32),
            active=jnp.zeros((b,), jnp.int32),
        )

    def _build_prefill(self):
        cfg = self.cfg
        bos = self.tokenizer.bos_token_id

        @jax.jit
        def prefill(params, state: SlotState, slot, patch_batch_1):
            """Encode ONE clip (leading dim 1) and install it in `slot`."""
            _, hidden = get_audio_embedding(
                params, cfg, patch_batch_1["audio_patches"],
                patch_batch_1["audio_time_inds"], patch_batch_1["audio_freq_inds"],
                patch_batch_1["audio_mask"], normalize=False,
            )
            ckv = precompute_cross_kv(params["decoder"]["blocks"], cfg.decoder, hidden)

            def put_axis1(buf, new):  # scatter (L, 1, ...) into slot
                return jax.lax.dynamic_update_slice_in_dim(buf, new.astype(buf.dtype),
                                                           slot, axis=1)

            def put_axis0(buf, new):
                return jax.lax.dynamic_update_slice_in_dim(buf, new.astype(buf.dtype),
                                                           slot, axis=0)

            zero_t = jnp.zeros_like(state.text_cache["k"][:, :1])
            zero_d = jnp.zeros_like(state.dec_cache["k"][:, :1])
            new_ids = jnp.zeros((1, self.max_length), jnp.int32).at[0, 0].set(bos)
            return SlotState(
                text_cache={"k": put_axis1(state.text_cache["k"], zero_t),
                            "v": put_axis1(state.text_cache["v"], zero_t),
                            "index": state.text_cache["index"].at[slot].set(0)},
                dec_cache={"k": put_axis1(state.dec_cache["k"], zero_d),
                           "v": put_axis1(state.dec_cache["v"], zero_d),
                           "index": state.dec_cache["index"].at[slot].set(0)},
                cross_kv={"k": put_axis1(state.cross_kv["k"], ckv["k"]),
                          "v": put_axis1(state.cross_kv["v"], ckv["v"])},
                audio_mask=put_axis0(state.audio_mask, patch_batch_1["audio_mask"]),
                input_ids=put_axis0(state.input_ids, new_ids),
                index=state.index.at[slot].set(0),
                active=state.active.at[slot].set(1),
            )

        return prefill

    def _build_step(self):
        cfg = self.cfg
        eos = self.tokenizer.eos_token_id
        pad = self.tokenizer.pad_token_id
        temp = self.temperature

        @jax.jit
        def step(params, state: SlotState, rng):
            b = state.input_ids.shape[0]
            g = state.active
            current = jnp.take_along_axis(state.input_ids, state.index[:, None], 1)[:, 0]
            current = current * g + (1 - g) * pad

            _, th, text_cache = text_encoder_apply(
                params["text"], cfg.text, current[:, None], jnp.ones((b, 1)),
                position_ids=state.index[:, None], cache=state.text_cache,
                pool=False,
            )
            logits, dec_cache = caption_decoder_apply(
                params["decoder"], cfg.decoder, th, jnp.ones((b, 1)), None,
                state.audio_mask, cache=state.dec_cache, cross_kv=state.cross_kv,
            )
            sampled = jax.random.categorical(rng, logits[:, 0] / temp, -1).astype(jnp.int32)
            new_index = state.index + g  # inactive slots don't advance
            new_ids = jax.vmap(
                lambda row, i, tok: row.at[i].set(tok)
            )(state.input_ids, jnp.minimum(new_index, self.max_length - 1), sampled * g)
            still = (sampled != eos).astype(jnp.int32) * \
                    (new_index < self.max_length - 1).astype(jnp.int32)
            return SlotState(
                text_cache=text_cache, dec_cache=dec_cache,
                cross_kv=state.cross_kv, audio_mask=state.audio_mask,
                input_ids=new_ids, index=new_index, active=g * still,
            )

        return step

    # --------------------------------------------------------------- serve

    def run(self, patch_batches: Iterable[dict]) -> List[str]:
        """Caption a stream of single-clip patch dicts (leading dim 1 each,
        e.g. from CacoEngine.audio_patch_batch slices). Returns captions in
        arrival order."""
        requests = list(patch_batches)
        n = len(requests)
        results: List[Optional[str]] = [None] * n
        slot_owner = [-1] * self.num_slots
        state = None
        next_req = 0

        def drain_finished(state):
            nonlocal results
            active = np.asarray(state.active)
            ids = np.asarray(state.input_ids)
            for s in range(self.num_slots):
                if slot_owner[s] >= 0 and active[s] == 0:
                    results[slot_owner[s]] = self.tokenizer.batch_decode(
                        ids[s:s + 1], skip_special_tokens=True)[0].strip()
                    slot_owner[s] = -1
            return state

        while next_req < n or any(o >= 0 for o in slot_owner):
            if state is None:
                seq = requests[0]["audio_patches"].shape[1]
                state = self.init_state(seq)
            # refill free slots
            for s in range(self.num_slots):
                if slot_owner[s] < 0 and next_req < n:
                    state = self._compiled_prefill(self.params, state,
                                                   jnp.int32(s), requests[next_req])
                    slot_owner[s] = next_req
                    next_req += 1
            # advance every active slot one token
            self._step_count += 1
            state = self._compiled_step(self.params, state,
                                        jax.random.fold_in(self.rng, self._step_count))
            state = drain_finished(state)
        return results  # type: ignore[return-value]
