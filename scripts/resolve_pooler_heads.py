"""Empirically resolve the pooler-head ambiguity on a real checkpoint.

The reference disagrees with itself about the audio attention pooler's head
count: the JAX checkpoint loader builds it with 8 heads
(reference src/caco/load_model.py:46) while the torch mirror hardcodes 2
(src/caco_torch/caco.py:294).  The head count changes how the single fused
KV projection is partitioned into per-head softmaxes, so the SAME weights
give DIFFERENT embeddings — and only one setting reproduces the published
eval table (src/eval/README.md:40, ESC-50 0.934).

This repo follows the JAX loader (8 heads, configs.py CacoConfig).  When the
released Cacophony.ckpt and ESC-50 are available, this script settles it
empirically: it runs zero-shot ESC-50 with BOTH head counts and prints the
two accuracies next to the published 0.934.

Usage:
    python scripts/resolve_pooler_heads.py --ckpt_path Cacophony.ckpt
"""

from __future__ import annotations

import argparse
import dataclasses


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_path", required=True)
    p.add_argument("--tokenizer", default="roberta-base")
    p.add_argument("--dataset", default="esc50")
    p.add_argument("--batch_size", type=int, default=32)
    args = p.parse_args(argv)

    from cacophony_tpu.checkpoints.io import load_caco
    from cacophony_tpu.data.tokenizer import load_tokenizer
    from cacophony_tpu.eval.processors import PROCESSORS
    from cacophony_tpu.eval.tasks import zs_classification
    from cacophony_tpu.runtime.engine import CacoEngine

    tokenizer = load_tokenizer(args.tokenizer)
    cfg, params = load_caco(args.ckpt_path)
    proc = PROCESSORS[args.dataset]()

    results = {}
    for heads in (8, 2):
        cfg_h = dataclasses.replace(cfg, num_attention_pool_heads=heads)
        engine = CacoEngine(cfg_h, params, tokenizer=tokenizer,
                            buffer_seconds=10.0, batch_size=args.batch_size)
        acc = zs_classification(engine, proc, verbose=False)
        results[heads] = acc
        print(f"pool heads={heads}: {args.dataset} top-1 = {acc:.4f}")

    print(f"published (JAX checkpoint, src/eval/README.md:40): 0.934")
    winner = max(results, key=lambda h: -abs(results[h] - 0.934))
    print(f"closest to published: heads={winner} -> keep "
          f"CacoConfig(num_attention_pool_heads={winner})")


if __name__ == "__main__":
    main()
