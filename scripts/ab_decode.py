"""Same-session interleaved A/B harness for the batched decode path.

Compares KV-cache/cross-KV storage layouts (models/text.py CACHE_LAYOUT)
and stream counts in ONE process, with the measurement discipline
CLAUDE.md prescribes: fresh jitted closure per trace-time flag value,
>=3 interleaved trials, async dispatch with a single tail fetch, and the
persistent compile cache enabled explicitly.

Usage (real TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_decode.py \
      --layouts merged,legacy --streams 64,128,256

Measured r5 verdicts produced with this harness (1x v5e, ml=64):
  merged vs legacy: 64 streams 23,956 vs 15,982 tok/s (+50%);
  128: 27,429 vs 17,030 (+61%); 256: 29,746 vs 17,938 (+66%);
  token mismatch 0.06-0.10% (summation-order only).
  A time-last (L,B,H,Dh,T) layout lost 2.5x (lane-sparse column writes).
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cacophony_tpu.configs import FrontendConfig, PatchConfig, caco_base
from cacophony_tpu.frontend.patchify import wav_to_patches
from cacophony_tpu.models.caco import caco_init, decode
import cacophony_tpu.models.text as text_mod


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--layouts", default="merged,legacy")
    ap.add_argument("--streams", default="64,128,256")
    ap.add_argument("--max-length", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()
    layouts = args.layouts.split(",")
    streams = [int(s) for s in args.streams.split(",")]
    ml = args.max_length

    cfg = dataclasses.replace(caco_base(), dtype=jnp.bfloat16)
    front, patch = FrontendConfig(), PatchConfig(patches_seq_len=500)
    dev = jax.devices()[0]
    print("backend:", jax.default_backend(), dev, flush=True)
    last = jax.jit(lambda t: t[-1, -1])

    params = jax.jit(lambda: caco_init(jax.random.PRNGKey(0), cfg))()
    batches = {}
    for n in streams:
        rng = np.random.RandomState(0)
        bufs = jnp.asarray(rng.randn(n, 160_000).astype(np.float32) * 0.1)
        lens = jnp.full((n,), 160_000, jnp.int32)
        batches[n] = jax.jit(lambda b, l: jax.vmap(
            lambda bb, nn: wav_to_patches(bb, nn, front, patch))(b, l))(bufs, lens)

    saved_layout = text_mod.CACHE_LAYOUT
    runs, toks = {}, {}
    try:
        for layout in layouts:
            text_mod.CACHE_LAYOUT = layout
            for n in streams:
                fn = jax.jit(lambda p, b, r: decode(
                    p, cfg, b, max_length=ml, temperature=1.0,
                    bos_id=0, eos_id=2, pad_id=1, rng=r))
                t0 = time.perf_counter()
                out = fn(params, batches[n], jax.random.PRNGKey(0))
                toks[(layout, n)] = np.asarray(out)
                print(f"compile {layout} n={n}: "
                      f"{time.perf_counter()-t0:.1f}s", flush=True)
                runs[(layout, n)] = fn
    finally:
        text_mod.CACHE_LAYOUT = saved_layout

    if len(layouts) > 1:
        ref = layouts[0]
        for layout in layouts[1:]:
            for n in streams:
                mm = float((toks[(ref, n)] != toks[(layout, n)]).mean())
                print(f"token mismatch {ref} vs {layout} n={n}: {mm:.4%}",
                      flush=True)

    results = {k: [] for k in runs}
    for rd in range(args.rounds):
        for key, fn in runs.items():
            _, n = key
            t0 = time.perf_counter()
            outs = [fn(params, batches[n], jax.random.PRNGKey(i + 1))
                    for i in range(args.trials)]
            int(last(outs[-1]))
            tps = n * (ml - 1) * args.trials / (time.perf_counter() - t0)
            results[key].append(tps)
            print(f"round {rd} {key[0]:7s} n={n:<4d} {tps:9.0f} tok/s",
                  flush=True)

    print("\n=== summary (tok/s, mean) ===")
    for key in sorted(results):
        v = results[key]
        print(f"{key[0]:7s} n={key[1]:<4d} {np.mean(v):9.0f}  "
              f"trials {['%.0f' % x for x in v]}")


if __name__ == "__main__":
    main()
