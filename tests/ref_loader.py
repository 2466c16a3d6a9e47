"""Test-only loader for the read-only reference implementation.

Used exclusively by parity tests: we instantiate the reference Flax modules
with random weights, convert those weights through our checkpoint converter,
and assert our functional model reproduces the reference outputs.  This
pins the semantics of the released checkpoints without shipping any
reference code.

The reference was written against an older flax; two shims adapt it to the
flax in this environment:
- MultiHeadDotProductAttention's old positional (q, kv, mask) call signature
  (the class name is preserved so flax auto-naming — and thus the checkpoint
  parameter layout — is identical)
- jax.random.KeyArray alias (removed in modern jax, referenced lazily by the
  reference decode loop)
"""

import importlib.util
import pathlib
import sys

import pytest

REF = pathlib.Path("/root/reference/src/caco")

if not REF.exists():  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)


def _load(name: str, path: pathlib.Path):
    spec = importlib.util.spec_from_file_location(name, str(path))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _install_shims():
    import flax.linen as real_nn
    import jax

    if not hasattr(jax.random, "KeyArray"):
        jax.random.KeyArray = jax.Array

    class MultiHeadDotProductAttention(real_nn.MultiHeadDotProductAttention):
        """Old flax call signature: (inputs_q, inputs_kv, mask) positional."""

        def __call__(self, inputs_q, inputs_kv=None, mask=None, deterministic=None):
            return super().__call__(
                inputs_q, inputs_kv, inputs_kv, mask=mask, deterministic=deterministic
            )

    class _NnProxy:
        def __getattr__(self, item):
            if item == "MultiHeadDotProductAttention":
                return MultiHeadDotProductAttention
            return getattr(real_nn, item)

    return _NnProxy()


_nn_proxy = _install_shims()


def load_reference():
    """Returns (mae, roberta, caco) reference modules, shimmed."""
    mae = _load("ref_mae", REF / "audio_models" / "mae.py")
    mae.nn = _nn_proxy
    roberta = _load("ref_roberta", REF / "text_models" / "roberta_text_model.py")
    caco = _load("ref_caco", REF / "caco.py")
    return mae, roberta, caco
