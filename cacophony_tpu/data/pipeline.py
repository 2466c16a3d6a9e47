"""Training data pipeline: host decode → device frontend → Batch.

Reference semantics (src/caco/dataset.py:55-140) re-designed for TPU:
- the reference runs mel+patchify in host tf.data per clip; here the host
  only decodes/resamples/pads (native C++ thread pool) and the log-mel +
  patchify run inside the jitted train step on device
- random patch subsampling for over-long clips keeps a SORTED random subset
  (dataset.py:78-87) — implemented device-side and SEEDED (the reference's
  unseeded random.shuffle is a documented bug, SURVEY §4.6)
- caption selection: uniform random pick from the clip's captions, swapped
  for a synthetic caption with prob `synthetic_prob` when one exists
  (dataset.py:95-112)
- tokenization pads to max_text_len (dataset.py:128-140)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cacophony_tpu.configs import FrontendConfig, PatchConfig
from cacophony_tpu.frontend import wav_to_patches


@dataclasses.dataclass(frozen=True)
class TrainDataConfig:
    batch_size: int = 32
    buffer_seconds: float = 10.0
    patches_seq_len: int = 500
    max_text_len: int = 100
    synthetic_prob: float = 0.8
    seed: int = 0
    sample_rate: int = 16_000


def subsample_patches(rng: jax.Array, batch: Dict[str, jnp.ndarray],
                      seq_len: int) -> Dict[str, jnp.ndarray]:
    """Device-side random patch subsampling (sorted subset), batched.

    Input batch leaves (B, S_full, ...); output (B, seq_len, ...).  For
    clips with ≤ seq_len valid patches this reduces to first-N + padding
    (identical to the eval path); for longer clips it keeps a uniformly
    random sorted subset like the reference training pipeline.
    """
    x = batch["audio_patches"]
    b, s_full, _ = x.shape
    mask = batch["audio_mask"]

    noise = jax.random.uniform(rng, (b, s_full))
    noise = jnp.where(mask > 0, noise, 2.0)  # invalid patches sort last
    chosen = jnp.sort(jnp.argsort(noise, axis=1)[:, :seq_len], axis=1)

    take = jax.vmap(lambda a, i: a[i])
    new_mask = take(mask, chosen)
    return {
        "audio_patches": take(x, chosen) * new_mask[:, :, None].astype(x.dtype),
        "audio_time_inds": take(batch["audio_time_inds"], chosen) * new_mask,
        "audio_freq_inds": take(batch["audio_freq_inds"], chosen) * new_mask,
        "audio_mask": new_mask,
    }


def device_train_frontend(front: FrontendConfig, full_patch: PatchConfig,
                          seq_len: int):
    """Returns a jittable fn: (rng, bufs, lens) → training patch batch with
    random subsampling. Compose inside the train step so the whole frontend
    fuses with the encoder."""

    def fn(rng, bufs, lens):
        batch = jax.vmap(lambda b, n: wav_to_patches(b, n, front, full_patch))(bufs, lens)
        return subsample_patches(rng, batch, seq_len)

    return fn


class CacoTrainLoader:
    """Host-side iterator: (filepaths, captions) → numpy batches of padded
    waveform buffers + tokenized text, ready for the device frontend.

    Decoding uses the native C++ thread pool when available.  Yields dicts:
    audio_bufs (B, buffer), audio_lens (B,), text_input_ids, text_mask.
    """

    def __init__(
        self,
        filepaths: Sequence[str],
        captions: Dict[str, List[str]],           # audio_name → caption list
        tokenizer,
        cfg: TrainDataConfig = TrainDataConfig(),
        synthetic_captions: Optional[Dict[str, List[str]]] = None,
        shuffle: bool = True,
    ):
        self.filepaths = list(filepaths)
        self.captions = captions
        self.synthetic = synthetic_captions or {}
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.shuffle = shuffle
        self.start_batch = 0  # set before iterating to resume a stream
        self.buffer_samples = int(round(cfg.buffer_seconds * cfg.sample_rate))

    @staticmethod
    def _name(path: str) -> str:
        import os

        return os.path.basename(path).split(".wav")[0]

    # Native decode happens at the file's SOURCE rate; size that buffer for
    # the highest rate we expect (48 kHz vs the 16 kHz model rate) so a
    # non-16k clip isn't truncated before resampling.
    MAX_SOURCE_RATE_RATIO = 3

    def _decode(self, paths: Sequence[str]):
        bufs = np.zeros((len(paths), self.buffer_samples), np.float32)
        lens = np.zeros((len(paths),), np.int32)
        try:  # native fast path available? (import may build the .so)
            from cacophony_tpu.native import wavio

            wavio._load()
        except Exception:
            from cacophony_tpu.data.audio_io import load_audio, pad_to_buffer

            for i, p in enumerate(paths):
                wav = load_audio(p, target_sr=self.cfg.sample_rate)
                bufs[i], lens[i] = pad_to_buffer(wav, self.buffer_samples)
            return bufs, lens

        from cacophony_tpu.frontend.dsp import resample_fft_host

        native_buffer = self.buffer_samples * self.MAX_SOURCE_RATE_RATIO
        raw, raw_lens, rates = wavio.decode_batch(list(paths), native_buffer)
        for i, r in enumerate(rates):
            if r == 0 or r > self.cfg.sample_rate * self.MAX_SOURCE_RATE_RATIO:
                # Fall back per file: r==0 = format wavio can't decode
                # (A-law, exotic chunks); rates above
                # MAX_SOURCE_RATE_RATIO×target (>48 kHz) would be silently
                # truncated by the sized native buffer — never train on
                # truncated/silent rows.
                from cacophony_tpu.data.audio_io import load_audio, pad_to_buffer

                wav = load_audio(paths[i], target_sr=self.cfg.sample_rate)
                bufs[i], lens[i] = pad_to_buffer(wav, self.buffer_samples)
                continue
            n = int(raw_lens[i])
            wav = raw[i, :n]
            if r != self.cfg.sample_rate:
                wav = resample_fft_host(wav, round(n * self.cfg.sample_rate / r))
            k = min(len(wav), self.buffer_samples)
            bufs[i, :k] = wav[:k]
            lens[i] = k
        return bufs, lens

    def _pick_text(self, rng: np.random.RandomState, name: str) -> str:
        caps = self.captions[name]
        text = caps[rng.randint(len(caps))]
        syn = self.synthetic.get(name)
        if syn and rng.rand() < self.cfg.synthetic_prob:
            text = syn[rng.randint(len(syn))]
        return text

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        bs = self.cfg.batch_size
        if len(self.filepaths) < bs:
            raise ValueError(
                f"{len(self.filepaths)} usable files < batch_size {bs} — "
                "check that captions.csv file_name values match the wavs")
        batches_per_epoch = len(self.filepaths) // bs
        # Resume support: skip `start_batch` batches WITHOUT decoding them
        # (epoch shuffles and caption draws are deterministic in the batch
        # index, so a resumed stream continues exactly where it left off).
        start = self.start_batch
        epoch = start // batches_per_epoch

        while True:
            # fresh permutation per epoch (a cumulative in-place shuffle
            # would make epoch k's order depend on having replayed 0..k-1,
            # breaking resume)
            order = np.arange(len(self.filepaths))
            if self.shuffle:
                np.random.RandomState(self.cfg.seed + epoch).shuffle(order)
            for b in range(batches_per_epoch):
                if epoch * batches_per_epoch + b < start:
                    continue
                idx = order[b * bs:(b + 1) * bs]
                paths = [self.filepaths[j] for j in idx]
                bufs, lens = self._decode(paths)
                # caption choice seeded by global batch index → reproducible
                # across resumes
                rng = np.random.RandomState(
                    self.cfg.seed * 1_000_003 + epoch * batches_per_epoch + b)
                texts = [self._pick_text(rng, self._name(p)) for p in paths]
                tok = self.tokenizer(texts, padding="max_length", truncation=True,
                                     max_length=self.cfg.max_text_len,
                                     return_tensors="np")
                yield {
                    "audio_bufs": bufs,
                    "audio_lens": lens,
                    "text_input_ids": np.asarray(tok["input_ids"], np.int32),
                    "text_mask": np.asarray(tok["attention_mask"], np.int32),
                }
            epoch += 1


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Double-buffered host→device prefetch: keeps `size` batches in flight
    so host decode overlaps device compute (the reference's per-file host
    loop serializes them — SURVEY §3.2)."""
    import collections
    import itertools

    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            queue.append(jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch))
        else:
            queue.append(jax.tree_util.tree_map(jnp.asarray, batch))

    it = iter(iterator)
    for batch in itertools.islice(it, size):
        put(batch)
    while queue:
        yield queue.popleft()
        try:
            put(next(it))
        except StopIteration:
            pass
