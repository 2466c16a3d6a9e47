"""Continuous-batching captioning: a slotted AR decode server.

The reference decodes one pmap batch at a time, so a batch waits for its
slowest caption (caco.py:154-230).  Here B decode slots advance in lockstep
hardware-wise but each slot carries its OWN cache index and token stream;
finished slots are refilled from a request queue without stopping the
others — the standard continuous-batching construction, built on the
per-sample KV-cache indices in ops/attention.py.

Device work is two compiled programs: `prefill_many` (audio encoder +
cross-KV for a BATCH of new clips, scattered into their slots in one
program) and `multi_step()` — a `lax.while_loop` advancing every active
slot up to `drain_every` tokens with on-device early exit.  The host syncs
once per WINDOW, not per token: it fetches the (B,) `active` vector, and
pulls `input_ids` once per window only when some slot finished.  (Round-1
dispatched one B=1 encoder forward per request and converted the full
`input_ids` to numpy per token; measured on the v5e relay, per-token
sync at 16 slots ran 336 tok/s vs 873 at window 8 — dispatch/fetch
round-trips were the first-order decode cost.)

Batched prefill uses a trash-slot trick for partial batches: the state
carries num_slots+1 rows, and padding entries scatter into the extra row
(never stepped, never drained), so ONE compiled prefill shape serves any
refill count without corrupting live slots.

Mixed audio lengths: requests shorter than the server's audio budget are
zero-padded with a zero mask (exactly how the engine pads within a bucket);
longer requests fail loudly instead of being silently mis-scattered.
"""

from __future__ import annotations

import functools
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
    text_cache: dict          # leaves (L, B, T, E) merged; index (B,)
    dec_cache: dict
    cross_kv: dict            # (L, B, S_audio, E) merged rows
    audio_mask: jnp.ndarray   # (B, S_audio)
    input_ids: jnp.ndarray    # (B, max_len)
    index: jnp.ndarray        # (B,) per-slot decode position
    active: jnp.ndarray       # (B,) 1 = generating


# Compiled programs live at module level, keyed by their STATIC config args,
# so every server instance with the same shapes shares one trace+compile
# (per-instance closures would retrace on every construction — measured
# ~1s+ of host tracing per run on the 16-layer scan while_loop).

@functools.partial(jax.jit, static_argnums=(0,))
def _encode_many(cfg: CacoConfig, params, patch_batch):
    """Audio encoder + cross-KV for a batch of P clips — the expensive half
    of prefill, INDEPENDENT of slot state.  Dispatched as soon as requests
    arrive, so the device runs it back-to-back with the in-flight decode
    window instead of idling through a host round-trip (round-2 serialized
    encode → scatter → step, leaving the device idle for the ~26 ms relay
    sync + host batch assembly between windows)."""
    _, hidden = get_audio_embedding(
        params, cfg, patch_batch["audio_patches"],
        patch_batch["audio_time_inds"], patch_batch["audio_freq_inds"],
        patch_batch["audio_mask"], normalize=False,
    )
    ckv = precompute_cross_kv(params["decoder"]["blocks"], cfg.decoder,
                              hidden, dtype=cfg.dtype)
    return {"k": ckv["k"], "v": ckv["v"],
            "audio_mask": patch_batch["audio_mask"]}


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _scatter_many(cfg: CacoConfig, bos: int, max_length: int,
                  params, state: SlotState, slots, valid, enc):
    """Scatter P pre-encoded requests into their slots (cheap; O(state)).

    slots: (P,) int32 target rows — padding/unplaced entries point at the
    trash row (num_slots) so one compiled shape serves any count.
    valid: (P,) int32, 0 for padding/unplaced (its slot is untouched
    except the trash row, which is never stepped or drained).
    enc: _encode_many output with leading dim P (axis 1 for k/v)."""
    p = slots.shape[0]
    # route invalid entries to the trash row so a subset of an encoded
    # group can be placed now and the rest later
    slots = jnp.where(valid > 0, slots, state.active.shape[0] - 1)

    def put_axis1(buf, new):  # (L, P, ...) rows → axis-1 scatter
        return buf.at[:, slots].set(new.astype(buf.dtype))

    def zero_axis1(buf):
        return buf.at[:, slots].set(0.0)

    new_ids = jnp.zeros((p, max_length), jnp.int32).at[:, 0].set(bos)
    zeros_p = jnp.zeros((p,), jnp.int32)
    return SlotState(
        text_cache={"k": zero_axis1(state.text_cache["k"]),
                    "v": zero_axis1(state.text_cache["v"]),
                    "index": state.text_cache["index"].at[slots].set(zeros_p)},
        dec_cache={"k": zero_axis1(state.dec_cache["k"]),
                   "v": zero_axis1(state.dec_cache["v"]),
                   "index": state.dec_cache["index"].at[slots].set(zeros_p)},
        cross_kv={"k": put_axis1(state.cross_kv["k"], enc["k"]),
                  "v": put_axis1(state.cross_kv["v"], enc["v"])},
        audio_mask=state.audio_mask.at[slots].set(
            enc["audio_mask"].astype(state.audio_mask.dtype)),
        input_ids=state.input_ids.at[slots].set(new_ids),
        index=state.index.at[slots].set(zeros_p),
        active=state.active.at[slots].set(valid.astype(jnp.int32)),
    )


def _step_body(cfg: CacoConfig, eos: int, pad: int, temperature: float,
               max_length: int, params, state: SlotState, rng) -> SlotState:
    """One token for every active slot (pure function)."""
    b = state.input_ids.shape[0]
    g = state.active
    current = jnp.take_along_axis(state.input_ids, state.index[:, None], 1)[:, 0]
    current = current * g + (1 - g) * pad

    _, th, text_cache = text_encoder_apply(
        params["text"], cfg.text, current[:, None], jnp.ones((b, 1)),
        position_ids=state.index[:, None], cache=state.text_cache,
        pool=False, dtype=cfg.dtype,
    )
    logits, dec_cache = caption_decoder_apply(
        params["decoder"], cfg.decoder, th, jnp.ones((b, 1)), None,
        state.audio_mask, cache=state.dec_cache, cross_kv=state.cross_kv,
        dtype=cfg.dtype,
    )
    logits = logits.astype(jnp.float32)
    sampled = jax.random.categorical(
        rng, logits[:, 0] / temperature, -1).astype(jnp.int32)
    new_index = state.index + g  # inactive slots don't advance
    # Guarded write: finished rows are immutable regardless of tokenizer id
    # layout (an unguarded `sampled*g` kept overwriting the EOS position of
    # drained slots with id 0, working only because 0 is skip-decoded).
    new_ids = jax.vmap(
        lambda row, i, tok, gg: row.at[i].set(jnp.where(gg > 0, tok, row[i]))
    )(state.input_ids, jnp.minimum(new_index, max_length - 1), sampled, g)
    still = (sampled != eos).astype(jnp.int32) * \
            (new_index < max_length - 1).astype(jnp.int32)
    return SlotState(
        text_cache=text_cache, dec_cache=dec_cache,
        cross_kv=state.cross_kv, audio_mask=state.audio_mask,
        input_ids=new_ids, index=new_index, active=g * still,
    )


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _multi_step(cfg: CacoConfig, eos: int, pad: int, temperature: float,
                max_length: int, k: int, params, state: SlotState, rng):
    """Up to k tokens for every slot, early-exiting on-device when nothing
    is active — ONE dispatch and ZERO host syncs per window."""

    def cond(carry):
        i, s = carry
        return (i < k) & (jnp.sum(s.active) > 0)

    def body(carry):
        i, s = carry
        return i + 1, _step_body(cfg, eos, pad, temperature, max_length,
                                 params, s, jax.random.fold_in(rng, i))

    _, end = jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), state))
    return end


class ContinuousCaptioner:
    def __init__(self, cfg: CacoConfig, params, tokenizer, *,
                 num_slots: int = 16, max_length: int = 100,
                 temperature: float = 0.1, seed: int = 42,
                 drain_every: int = 8, audio_seq_len: Optional[int] = None):
        """drain_every: tokens decoded per host sync (1 = the round-1
        per-token behavior; 8 amortizes the host round-trip over a window
        while a finished slot idles at most 7 steps before refill).
        audio_seq_len: fixed audio patch budget; None = taken from the
        first request (shorter later requests are padded, longer rejected)."""
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.num_slots = num_slots
        self.max_length = max_length
        self.temperature = temperature
        self.drain_every = drain_every
        self.audio_seq_len = audio_seq_len
        self.rng = jax.random.PRNGKey(seed)
        self._step_count = 0
        self._compiled_multi_step = self._build_multi_step()
        self._compiled_encode = self._build_encode()
        self._compiled_scatter = self._build_scatter()

    # ------------------------------------------------------------- builders

    def init_state(self, audio_seq_len: int) -> SlotState:
        # +1 trash row: partial prefill batches scatter their padding there
        b, t = self.num_slots + 1, self.max_length
        cfg = self.cfg
        text_cache = make_kv_cache(cfg.text, b, t, dtype=cfg.dtype)
        dec_cache = make_kv_cache(cfg.decoder, b, t, dtype=cfg.dtype)
        # per-sample indices
        text_cache["index"] = jnp.zeros((b,), jnp.int32)
        dec_cache["index"] = jnp.zeros((b,), jnp.int32)
        ld = cfg.decoder
        from cacophony_tpu.models import text as _text
        if _text.CACHE_LAYOUT == "legacy":
            cross_shape = (ld.num_layers, b, audio_seq_len,
                           ld.num_heads, ld.head_dim)
        else:  # merged rows (see models/text.py CACHE_LAYOUT)
            cross_shape = (ld.num_layers, b, audio_seq_len, ld.hidden_size)
        cross = {
            "k": jnp.zeros(cross_shape, cfg.dtype),
            "v": jnp.zeros(cross_shape, cfg.dtype),
        }
        return SlotState(
            text_cache=text_cache, dec_cache=dec_cache, cross_kv=cross,
            audio_mask=jnp.zeros((b, audio_seq_len), jnp.int32),
            input_ids=jnp.zeros((b, t), jnp.int32),
            index=jnp.zeros((b,), jnp.int32),
            active=jnp.zeros((b,), jnp.int32),
        )

    def _pad_request(self, req: dict, seq: int) -> dict:
        """Zero-pad a (1, S, ...) patch dict to the server's audio budget.
        Padding carries mask 0, identical to engine bucket padding."""
        s = req["audio_patches"].shape[1]
        if s == seq:
            return req
        if s > seq:
            raise ValueError(
                f"request audio seq {s} exceeds the server budget {seq}; "
                f"construct the server with audio_seq_len>={s}")
        pad = seq - s
        return {
            "audio_patches": jnp.pad(req["audio_patches"], ((0, 0), (0, pad), (0, 0))),
            "audio_time_inds": jnp.pad(req["audio_time_inds"], ((0, 0), (0, pad))),
            "audio_freq_inds": jnp.pad(req["audio_freq_inds"], ((0, 0), (0, pad))),
            "audio_mask": jnp.pad(req["audio_mask"], ((0, 0), (0, pad))),
        }

    def _build_encode(self):
        return functools.partial(_encode_many, self.cfg)

    def _build_scatter(self):
        return functools.partial(_scatter_many, self.cfg,
                                 self.tokenizer.bos_token_id, self.max_length)

    def _build_multi_step(self):
        return functools.partial(
            _multi_step, self.cfg, self.tokenizer.eos_token_id,
            self.tokenizer.pad_token_id, self.temperature, self.max_length,
            self.drain_every)

    # --------------------------------------------------------------- serve

    def _prefill_sizes(self):
        """Compiled prefill batch shapes: full fills (startup / deep queue)
        and a small size for steady-state trickle refills."""
        small = max(1, self.num_slots // 8)
        return sorted({small, self.num_slots})

    def _stack_requests(self, reqs: List[dict], p: int, seq: int):
        """Stack n<=p padded requests into one (p, ...) batch; padding rows
        repeat request 0 (they scatter into the trash slot)."""
        reqs = [self._pad_request(r, seq) for r in reqs]
        n = len(reqs)
        if n < p:
            reqs = reqs + [reqs[0]] * (p - n)
        if all(isinstance(r[k], np.ndarray) for r in reqs for k in r):
            # Host-resident requests: stack on host and ship ONE buffer per
            # field.  jnp.concatenate over P numpy items does P separate
            # small transfers — on the axon relay each costs a ~26 ms round
            # trip, which measured ~2x the whole-stream throughput cost
            # (128 reqs s64_d32: 4.8k tok/s per-item vs 9.0k device-resident).
            return {k: jnp.asarray(np.concatenate([r[k] for r in reqs], axis=0))
                    for k in reqs[0]}
        return {k: jnp.concatenate([jnp.asarray(r[k]) for r in reqs], axis=0)
                for k in reqs[0]}

    def run(self, patch_batches: Iterable[dict]) -> List[str]:
        """Caption a stream of single-clip patch dicts (leading dim 1 each,
        e.g. from CacoEngine.audio_patch_batch slices). Accepts any
        iterable — requests are pulled lazily as slots free up. Returns
        captions in arrival order.

        Prefill/decode overlap: requests are pulled ahead (one full fill
        deep) and their encoder forwards DISPATCHED immediately — async,
        so they queue on the device behind the in-flight decode window.
        At each window boundary only the cheap scatter program binds
        pre-encoded requests to freed slots.  An encoded group whose slot
        demand exceeds the free count is placed incrementally (unplaced
        entries route to the trash row and scatter again later)."""
        it = iter(patch_batches)
        results: List[str] = []
        slot_owner = [-1] * self.num_slots
        state = None
        queue: List[dict] = []   # pulled-but-not-yet-encoded (arrival order)
        queue_idx: List[int] = []
        # encoded-but-not-fully-placed groups: [enc, gidx list, placed flags]
        pending: List[List] = []
        exhausted = False
        n_seen = 0
        sizes = self._prefill_sizes()
        trash = self.num_slots

        def pull(target: int):
            nonlocal exhausted, n_seen
            while not exhausted and len(queue) < target:
                try:
                    req = next(it)
                except StopIteration:
                    exhausted = True
                    return
                queue.append(req)
                queue_idx.append(n_seen)
                results.append(None)  # placeholder in arrival order
                n_seen += 1

        def encode_ahead(seq: int):
            """Dispatch encoder forwards for everything pulled (async)."""
            nonlocal queue, queue_idx
            while queue:
                n = min(len(queue), sizes[-1])
                p = next(sz for sz in sizes if sz >= n)
                if p > n and not exhausted and len(pending) > 0:
                    break  # wait for a fuller group unless the stream ended
                group, queue = queue[:n], queue[n:]
                gidx, queue_idx = queue_idx[:n], queue_idx[n:]
                enc = self._compiled_encode(
                    self.params, self._stack_requests(group, p, seq))
                pending.append([enc, gidx, [False] * len(gidx)])

        def scatter_pending(free: List[int]):
            nonlocal state
            for entry in pending:
                if not free:
                    break
                enc, gidx, placed = entry
                p = enc["audio_mask"].shape[0]
                slots = [trash] * p
                valid = [0] * p
                for i in range(len(gidx)):
                    if not placed[i] and free:
                        s = free.pop(0)
                        slots[i], valid[i] = s, 1
                        placed[i] = True
                        slot_owner[s] = gidx[i]
                if any(valid):
                    state = self._compiled_scatter(
                        self.params, state,
                        jnp.asarray(slots, jnp.int32),
                        jnp.asarray(valid, jnp.int32), enc)
            pending[:] = [e for e in pending if not all(e[2])]

        pull(self.num_slots)
        while queue or pending or not exhausted \
                or any(o >= 0 for o in slot_owner):
            free = [s for s in range(self.num_slots) if slot_owner[s] < 0]
            # keep one full fill of lookahead encoded ahead of need
            pull(max(1, self.num_slots - sum(len(e[1]) for e in pending)))
            if not queue and not pending and exhausted \
                    and all(o < 0 for o in slot_owner):
                break
            if state is None:
                first = queue[0] if queue else None
                seq = self.audio_seq_len or first["audio_patches"].shape[1]
                state = self.init_state(seq)
            seq = state.audio_mask.shape[1]
            encode_ahead(seq)
            scatter_pending(free)
            # advance every active slot up to drain_every tokens, then one
            # host sync: the (B,) active vector
            self._step_count += 1
            state = self._compiled_multi_step(
                self.params, state,
                jax.random.fold_in(self.rng, self._step_count))
            active = np.asarray(state.active)
            finished = [s for s in range(self.num_slots)
                        if slot_owner[s] >= 0 and active[s] == 0]
            if finished:
                # one ids fetch per window, shared by every finisher in it
                ids = np.asarray(state.input_ids)
                caps = self.tokenizer.batch_decode(ids[finished],
                                                   skip_special_tokens=True)
                for s, cap in zip(finished, caps):
                    results[slot_owner[s]] = cap.strip()
                    slot_owner[s] = -1
        return results
