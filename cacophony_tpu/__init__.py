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
