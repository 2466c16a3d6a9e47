"""cacophony_tpu — a TPU-native contrastive audio-text framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
gzhu06/Cacophony (CLAP-style contrastive audio-text model + AudioMAE +
captioning decoder + evaluation/HEAR harness), built TPU-first:

- device-side DSP frontend (STFT / log-mel / patchify) with exact
  tfio frame semantics (reference: src/caco/caco_eval_utils.py:12-24)
- pure-functional model core with scan-stacked layers (no framework magic)
- sharded inference/training over a `jax.sharding.Mesh`
- KV-cached autoregressive captioning decode under `jit`
"""

__version__ = "0.1.0"

from cacophony_tpu import configs  # noqa: F401


def __getattr__(name):
    """Lazy top-level API (keeps `import cacophony_tpu` light)."""
    if name == "CacoEngine":
        from cacophony_tpu.runtime import CacoEngine

        return CacoEngine
    if name == "load_caco":
        from cacophony_tpu.checkpoints import load_caco

        return load_caco
    if name == "load_audiomae":
        from cacophony_tpu.checkpoints import load_audiomae

        return load_audiomae
    if name == "load_tokenizer":
        from cacophony_tpu.data import load_tokenizer

        return load_tokenizer
    raise AttributeError(name)
