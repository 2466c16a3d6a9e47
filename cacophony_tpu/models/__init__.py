"""Model core: import submodules directly (kept lazy to avoid import cycles
with cacophony_tpu.ops, which uses models.layers)."""
