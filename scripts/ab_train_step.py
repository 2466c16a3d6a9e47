"""Same-session interleaved A/B harness for stage-2 train-step variants.

Measurement discipline (CLAUDE.md): relay throughput varies ±50% across
sessions, so variants are only comparable when interleaved in ONE process
with >=3 trials each.  This harness encodes the r5 gotchas:

- every variant gets a FRESH `make_caco_train_step` closure (jax.jit
  caches on function identity — reusing one fn object would silently
  measure the base trace for every "variant");
- trace-time module flags (e.g. layers.DROPOUT_RECOMPUTE) are set before
  the variant's first call, which is when the trace happens;
- fp32-moment variants share ONE rolling TrainState, but each distinct
  opt-state structure needs its own chain whose params are DEEP-COPIED
  (`TrainState(params=p)` aliases: with donate_argnums the first donated
  step deletes the other chain's buffers);
- timing dispatches all iters async and fetches ONCE (a host fetch costs
  ~26 ms of relay latency; per-iter fetches under-report by ~20%);
- the persistent compile cache is enabled explicitly (env vars are eaten
  by the axon sitecustomize).

Usage (real TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_train_step.py \
      --variants base,rbg,bf16mu --rounds 3 --iters 10

Variant syntax: comma-separated names from VARIANTS below.

Measured r5 verdicts produced with this harness: rng_impl="rbg" 75.5 vs
80.3 ms/step (now default), DROPOUT_RECOMPUTE under threefry 83.4 ms
(rejected), adam mu bf16 74.6 ms.
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
from cacophony_tpu.models.caco import caco_init
from cacophony_tpu.train import TrainConfig, make_caco_train_step
from cacophony_tpu.train.train import init_train_state
import cacophony_tpu.models.layers as layers


def _tc(**kw) -> TrainConfig:
    return TrainConfig(warmup_steps=1, total_steps=100, **kw)


# name -> (DROPOUT_RECOMPUTE, TrainConfig).  Variants whose opt-state
# structure differs from the first listed variant get their own state
# chain automatically (detected via tree structure).
VARIANTS = {
    "base": (False, _tc()),                       # current shipped defaults
    "threefry": (False, _tc(rng_impl="threefry")),
    "recompute": (True, _tc()),
    "threefry_recompute": (True, _tc(rng_impl="threefry")),
    "bf16mu": (False, _tc(adam_mu_dtype="bfloat16")),
    "remat": (False, _tc(remat_encoder=True)),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,threefry,bf16mu")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    names = args.variants.split(",")
    for n in names:
        if n not in VARIANTS:
            ap.error(f"unknown variant {n!r}; have {sorted(VARIANTS)}")

    cfg = dataclasses.replace(caco_base(), dtype=jnp.bfloat16)
    front, patch = FrontendConfig(), PatchConfig(patches_seq_len=500)
    dev = jax.devices()[0]
    print("backend:", jax.default_backend(), dev, flush=True)

    B = args.batch
    rng = np.random.RandomState(0)
    bufs = jnp.asarray(rng.randn(B, 160_000).astype(np.float32) * 0.1)
    lens = jnp.full((B,), 160_000, jnp.int32)
    batch = jax.jit(lambda b, n: jax.vmap(
        lambda bb, nn: wav_to_patches(bb, nn, front, patch))(b, n))(bufs, lens)
    batch["text_input_ids"] = jnp.asarray(
        rng.randint(0, cfg.text.vocab_size, (B, 100)), jnp.int32)
    batch["text_mask"] = jnp.ones((B, 100), jnp.int32)

    params = jax.jit(lambda: caco_init(jax.random.PRNGKey(0), cfg))()
    copy = jax.jit(lambda t: jax.tree_util.tree_map(lambda x: x + 0, t))

    # group variants by opt-state structure+dtypes (dtype matters: bf16-mu
    # has the same TREE structure as fp32-mu); one rolling state per group
    struct_of = {}
    for n in names:
        st = jax.eval_shape(lambda p, tc=VARIANTS[n][1]:
                            init_train_state(p, tc), params)
        struct_of[n] = str(jax.tree_util.tree_map(
            lambda x: (tuple(x.shape), str(x.dtype)), st))
    chains: dict = {}          # structure -> state
    chain_key: dict = {}       # variant -> structure
    steps: dict = {}

    for n in names:
        s = struct_of[n]
        chain_key[n] = s
        if s not in chains:
            p = params if not chains else copy(params)
            chains[s] = init_train_state(p, VARIANTS[n][1])
    del params

    for n in names:
        recomp, tc = VARIANTS[n]
        layers.DROPOUT_RECOMPUTE = recomp
        step = make_caco_train_step(cfg, tc)
        t0 = time.perf_counter()
        st, m = step(chains[chain_key[n]], batch, jax.random.PRNGKey(1))
        print(f"compile {n}: {time.perf_counter()-t0:.1f}s "
              f"loss {float(m['loss']):.5f}", flush=True)
        chains[chain_key[n]] = st
        steps[n] = step
    layers.DROPOUT_RECOMPUTE = False

    results = {n: [] for n in names}
    for rd in range(args.rounds):
        for n in names:
            step, key = steps[n], chain_key[n]
            st = chains[key]
            t0 = time.perf_counter()
            for i in range(args.iters):
                st, m = step(st, batch,
                             jax.random.PRNGKey(100 + rd * args.iters + i))
            lv = float(m["loss"])     # single fetch syncs the chain
            dt = (time.perf_counter() - t0) / args.iters * 1000.0
            chains[key] = st
            results[n].append(dt)
            print(f"round {rd} {n:18s} {dt:7.2f} ms/step  loss {lv:.5f}",
                  flush=True)

    print("\n=== summary (ms/step) ===")
    for n in names:
        v = results[n]
        print(f"{n:18s} mean {np.mean(v):7.2f}  "
              f"trials {['%.1f' % x for x in v]}")


if __name__ == "__main__":
    main()
