"""Fast real-TPU smoke of every DEFAULT kernel path at serving shapes.

`bash scripts/presnapshot.sh --smoke` — compiles and runs each bespoke
Pallas kernel the default dispatch can reach, at the shapes the serving
paths use, and checks numerics against the plain-XLA reference.  This is
the gate the r4 decode-kernel crash proved missing: CPU tests cannot see
Mosaic lowering errors (interpret mode bypasses block-mapping checks),
so any default-path kernel change must pass this on the chip before a
snapshot.  Runtime ~2-4 min uncached, seconds warm (.jax_cache).
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

FAILURES = []


def check(name, ok, detail=""):
    status = "ok" if ok else "FAIL"
    print(f"[smoke] {name}: {status} {detail}", flush=True)
    if not ok:
        FAILURES.append(name)


def _audio_batch(cfg, b, npatch, seed=1):
    return {
        "audio_patches": jax.random.normal(
            jax.random.PRNGKey(seed), (b, npatch, cfg.audio.patch_size),
        ).astype(jnp.float32),
        "audio_time_inds": jnp.tile(
            jnp.arange(npatch)[None] // cfg.audio.num_freq_patches, (b, 1)),
        "audio_freq_inds": jnp.tile(
            jnp.arange(npatch)[None] % cfg.audio.num_freq_patches, (b, 1)),
        "audio_mask": jnp.ones((b, npatch), jnp.float32),
    }


def smoke_encoder_kernels():
    """The embed pipeline's default kernels (one-shot seq 500, blocked 1536)."""
    from cacophony_tpu import configs
    from cacophony_tpu.models.caco import caco_init, get_audio_embedding

    cfg = configs.caco_base()
    params = caco_init(jax.random.PRNGKey(0), cfg)
    for b, npatch, tag in [(8, 500, "one-shot"), (4, 1500, "blocked")]:
        batch = _audio_batch(cfg, b, npatch)
        # params must be an ARGUMENT: a captured tree becomes HLO constants
        # and blows the remote-compile request size (HTTP 413)
        fn = jax.jit(lambda p, bt: get_audio_embedding(
            p, cfg, bt["audio_patches"], bt["audio_time_inds"],
            bt["audio_freq_inds"], bt["audio_mask"])[0])
        try:
            emb = np.asarray(fn(params, batch), np.float32)
            norms = np.linalg.norm(emb, axis=-1)
            check(f"audio embed {tag} seq={npatch}",
                  np.isfinite(emb).all() and np.allclose(norms, 1.0, atol=1e-2),
                  f"norm={norms.mean():.4f}")
        except Exception as e:
            check(f"audio embed {tag} seq={npatch}", False, repr(e)[:200])


def smoke_decode_loop():
    """Short end-to-end caption decode at the BENCH's stream count (256 —
    the shape the r4 default-kernel crash hit) plus a mid-size config."""
    from cacophony_tpu import configs
    from cacophony_tpu.models.caco import caco_init, decode

    cfg = configs.caco_base()
    params = caco_init(jax.random.PRNGKey(0), cfg)
    for b in (64, 256):
        batch = _audio_batch(cfg, b, 500, seed=2)
        try:
            ids = decode(params, cfg, batch, max_length=8, temperature=1.0,
                         bos_id=0, eos_id=2, pad_id=1,
                         rng=jax.random.PRNGKey(3))
            ids = np.asarray(ids)
            check(f"decode loop B={b}", ids.shape == (b, 8),
                  f"shape={ids.shape}")
        except Exception as e:
            check(f"decode loop B={b}", False, repr(e)[:200])


def main():
    t0 = time.time()
    print(f"[smoke] backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    if jax.default_backend() != "tpu":
        print("[smoke] NOT on TPU — this gate must run on the real chip")
        sys.exit(2)
    smoke_encoder_kernels()
    smoke_decode_loop()
    dt = time.time() - t0
    if FAILURES:
        print(f"[smoke] FAILED ({len(FAILURES)}): {FAILURES}  [{dt:.0f}s]")
        sys.exit(1)
    print(f"[smoke] ALL OK [{dt:.0f}s]")


if __name__ == "__main__":
    main()
