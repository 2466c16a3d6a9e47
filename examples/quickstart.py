"""Quickstart: load a released checkpoint, embed audio + text, score,
caption.  Runs on whatever backend jax finds (TPU under the driver).

    python examples/quickstart.py --ckpt_path CKPT --tokenizer TOKDIR \
        audio1.wav audio2.wav --texts "a dog barking" "rain on a window"
"""

import argparse

import numpy as np

from cacophony_tpu import CacoEngine, load_caco, load_tokenizer
from cacophony_tpu.data.audio_io import load_audio


def main():
    p = argparse.ArgumentParser()
    p.add_argument("wavs", nargs="+")
    p.add_argument("--ckpt_path", required=True)
    p.add_argument("--tokenizer", default="roberta-base")
    p.add_argument("--texts", nargs="*", default=["a dog barking", "music"])
    p.add_argument("--caption", action="store_true")
    args = p.parse_args()

    cfg, params = load_caco(args.ckpt_path)
    engine = CacoEngine(cfg, params, tokenizer=load_tokenizer(args.tokenizer))

    wavs = [load_audio(path) for path in args.wavs]
    audio_emb = engine.embed_audio(wavs)
    text_emb = engine.embed_texts(args.texts)
    logits = engine.score(audio_emb, text_emb)

    for i, path in enumerate(args.wavs):
        best = int(np.argmax(logits[i]))
        print(f"{path}: best match = {args.texts[best]!r} "
              f"(logits {np.round(logits[i], 3).tolist()})")

    if args.caption:
        for path, cap in zip(args.wavs, engine.caption(wavs)):
            print(f"{path}: {cap!r}")


if __name__ == "__main__":
    main()
