"""Training runner CLI: end-to-end stage-2 (CACO) / stage-1 (MAE) training.

`python -m cacophony_tpu.train.runner --stage caco --data-dir DIR ...`

Data layout: DIR contains wavs plus `captions.csv` with columns
(file_name, caption) — multiple rows per file allowed — and optionally
`synthetic_captions.csv` in the same format.  The reference ships no
training code (SURVEY §0); this runner composes the framework's pieces:
host loader (native decode, seeded caption pick) → device frontend with
random patch subsampling → sharded train step → orbax checkpoints +
JSONL metrics, with resume.
"""

from __future__ import annotations

import argparse
import csv
import glob
import os
from typing import Dict, List

import jax
import numpy as np

from cacophony_tpu import configs
from cacophony_tpu.checkpoints.io import (
    latest_step,
    load_train_state,
    save_train_state,
)
from cacophony_tpu.data.pipeline import (
    CacoTrainLoader,
    TrainDataConfig,
    device_train_frontend,
    prefetch_to_device,
)
from cacophony_tpu.data.tokenizer import load_tokenizer
from cacophony_tpu.configs import FrontendConfig, PatchConfig
from cacophony_tpu.models.audio import audiomae_init
from cacophony_tpu.models.caco import caco_init
from cacophony_tpu.parallel import make_mesh, shard_batch, shard_params
from cacophony_tpu.train import TrainConfig, make_caco_train_step, make_mae_train_step
from cacophony_tpu.train.train import init_train_state
from cacophony_tpu.utils import MetricsLogger


def _read_captions(path: str) -> Dict[str, List[str]]:
    out: Dict[str, List[str]] = {}
    if not os.path.exists(path):
        return out
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            name = row["file_name"].split(".wav")[0]
            out.setdefault(name, []).append(row["caption"])
    return out


def build_parser():
    p = argparse.ArgumentParser("cacophony_tpu.train.runner")
    p.add_argument("--stage", choices=["caco", "mae"], default="caco")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--workdir", required=True, help="checkpoints + metrics")
    p.add_argument("--tokenizer", default="roberta-base")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--buffer-seconds", type=float, default=10.0)
    p.add_argument("--patches-seq-len", type=int, default=500)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup-steps", type=int, default=1000)
    p.add_argument("--dp", type=int, default=None)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint-every", type=int, default=500)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--tiny-model", action="store_true",
                   help="tiny config (smoke tests)")
    p.add_argument("--init-audio-from-mae", default=None,
                   help="AudioMAE checkpoint to transplant the audio tower from")
    p.add_argument("--init-text-from-hf", default=None,
                   help="HF roberta name/path to initialize the text tower")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    os.makedirs(args.workdir, exist_ok=True)

    mesh = make_mesh(dp=args.dp, tp=args.tp)
    tc = TrainConfig(learning_rate=args.lr, warmup_steps=args.warmup_steps,
                     total_steps=args.steps)
    rng = jax.random.PRNGKey(args.seed)

    # ---- data
    wavs = sorted(glob.glob(os.path.join(args.data_dir, "**", "*.wav"),
                            recursive=True))
    if not wavs:
        raise FileNotFoundError(f"no wavs under {args.data_dir}")
    captions = _read_captions(os.path.join(args.data_dir, "captions.csv"))
    synthetic = _read_captions(os.path.join(args.data_dir, "synthetic_captions.csv"))
    if args.stage == "caco" and not captions:
        raise FileNotFoundError("stage caco needs captions.csv")
    tokenizer = (load_tokenizer(args.tokenizer) if args.stage == "caco"
                 else _DummyTok())

    dcfg = TrainDataConfig(batch_size=args.batch_size,
                           buffer_seconds=args.buffer_seconds,
                           seed=args.seed)
    if args.stage == "caco":
        loader_wavs = [w for w in wavs
                       if os.path.basename(w).split(".wav")[0] in captions]
        loader_caps = captions
    else:  # MAE needs no captions: dummy entries for every wav
        loader_wavs = wavs
        loader_caps = {os.path.basename(w).split(".wav")[0]: ["-"] for w in wavs}
    loader = CacoTrainLoader(loader_wavs, loader_caps, tokenizer, dcfg,
                             synthetic_captions=synthetic)

    # ---- model / frontend
    front = FrontendConfig()
    buffer_samples = int(round(args.buffer_seconds * front.sample_rate))
    from cacophony_tpu.frontend import num_patches_for_samples

    full_seq = num_patches_for_samples(buffer_samples, front, PatchConfig())
    full_patch = PatchConfig(patches_seq_len=max(full_seq, args.patches_seq_len))
    frontend = device_train_frontend(front, full_patch, args.patches_seq_len)

    if args.stage == "caco":
        cfg = configs.caco_tiny(vocab_size=max(300, getattr(tokenizer, "vocab_size", 0) or 0)) \
            if args.tiny_model else configs.caco_base()
        params = caco_init(rng, cfg)
        if args.init_audio_from_mae:
            from cacophony_tpu.checkpoints.convert import transplant_audiomae_encoder
            from cacophony_tpu.checkpoints.io import load_audiomae

            _, mae_params = load_audiomae(args.init_audio_from_mae,
                                          strict_counts=not args.tiny_model)
            params = transplant_audiomae_encoder(params, mae_params)
        if args.init_text_from_hf:
            from transformers import FlaxRobertaModel
            from cacophony_tpu.checkpoints.convert import convert_hf_roberta

            hf = FlaxRobertaModel.from_pretrained(args.init_text_from_hf)
            imported = convert_hf_roberta(jax.device_get(hf.params))
            params["text"] = {**params["text"], **imported}
        step_fn = make_caco_train_step(cfg, tc)

        def make_batch(host_batch, step_rng):
            patches = frontend(step_rng, host_batch["audio_bufs"],
                               host_batch["audio_lens"])
            return {**patches,
                    "text_input_ids": host_batch["text_input_ids"],
                    "text_mask": host_batch["text_mask"]}
    else:
        if args.tiny_model:
            enc = configs.AudioEncoderConfig(hidden_size=32, num_layers=2,
                                             num_heads=2, intermediate_size=64)
            dec = configs.AudioDecoderConfig(hidden_size=32, num_layers=2,
                                             num_heads=2, intermediate_size=64)
            cfg = configs.AudioMAEConfig(encoder=enc, decoder=dec)
        else:
            cfg = configs.audiomae_base()
        params = audiomae_init(rng, cfg.encoder, cfg.decoder)
        step_fn = make_mae_train_step(cfg, tc)

        def make_batch(host_batch, step_rng):
            return frontend(step_rng, host_batch["audio_bufs"],
                            host_batch["audio_lens"])

    make_batch = jax.jit(make_batch)

    # ---- state (+ resume)
    with mesh:
        params = shard_params(params, mesh)
        state = init_train_state(params, tc)
        ck_dir = os.path.join(args.workdir, "checkpoints")
        if latest_step(ck_dir) is not None:
            state = load_train_state(ck_dir, state)
            print(f"resumed from step {int(state.step)}")

        metrics_log = MetricsLogger(os.path.join(args.workdir, "metrics.jsonl"))
        start = int(state.step)
        loader.start_batch = start  # resume the data stream, don't replay it
        it = prefetch_to_device(loader, size=2)
        for i, host_batch in enumerate(it):
            step_i = start + i
            if step_i >= args.steps:
                break
            step_rng = jax.random.fold_in(rng, step_i)
            batch = shard_batch(make_batch(host_batch, step_rng), mesh)
            state, metrics = step_fn(state, batch, step_rng)
            if step_i % args.log_every == 0:
                metrics_log.log(step=step_i,
                                **{k: float(v) for k, v in metrics.items()})
            if args.checkpoint_every and (step_i + 1) % args.checkpoint_every == 0:
                save_train_state(state, ck_dir)
        save_train_state(state, ck_dir)
        print(f"done at step {int(state.step)}")


class _DummyTok:
    bos_token_id, eos_token_id, pad_token_id = 0, 2, 1

    def __call__(self, texts, **kw):
        n = len(texts)
        m = kw.get("max_length", 8)
        return {"input_ids": np.ones((n, m), np.int32),
                "attention_mask": np.ones((n, m), np.int32)}


if __name__ == "__main__":
    main()
