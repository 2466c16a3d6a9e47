"""Bespoke Pallas attention for the audio encoder's exact shapes.

Profile of the B=128/seq-500 pipeline (v5e, xplane trace): the QKV and MLP
matmuls run at ~91% of peak, but XLA's attention core costs ~2.5 ms/layer
(QK^T+softmax+AV fusions at ~25-30% efficiency) plus ~1 ms/layer of pure
{2,0,1}↔{1,2,0} layout copies it inserts around the head transposes —
~42 ms of the 132 ms batch.  The generic Pallas flash kernel loses even
harder here (538 vs 969 clips/s end-to-end): its streaming machinery is
built for long sequences, and seq 500 / head_dim 96 fits entirely in VMEM.

So: ONE kernel invocation per batch row does all heads, one-shot —
fused-QKV block (S, 3·H·Dh) in, per-head Q@K^T into an fp32 (S, S) VMEM
tile, key-masked softmax in registers, P@V back into the (S, H·Dh) output
block.  No HBM logits, no head transposes, no layout copies.  Numerics
match the XLA path: bf16 matmul inputs, fp32 logits/softmax accumulation.

Reference parity: this computes exactly the encoder attention of
src/caco/audio_models/mae.py:88 (flax MultiHeadDotProductAttention with a
key-side padding bias); pinned by tests/test_encoder_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# VMEM budget per grid step.  Pallas DOUBLE-BUFFERS every pipelined block
# (next grid row prefetches while the current computes), so block bytes
# count twice; the fp32 logits tile and softmax temporaries count once.
VMEM_BUDGET_BYTES = 15 * 1024 * 1024

# Softmax numerics mode (kernels are VPU-bound at long seq, so every pass
# over the (Q, S) logits tile is material; measured at 30 s / B=32 on v5e,
# same-session interleaved):
#   "max":   exp(l − rowmax) — overflow-proof for ANY logit magnitude but
#            pays a full per-row max reduction over the tile.  342 clips/s.
#   "clamp": exp(min(l, 80)) — skips the max pass; bit-equivalent to exact
#            softmax (up to fp32 reassociation) whenever logits ≤ 80, and
#            degrades to equal weights among >80 entries instead of NaN
#            beyond (e^80·S < fp32 max keeps every downstream term finite
#            with in-place normalization).  ~+6% end-to-end.
#   "nomax": exp(l) straight — fastest but produces inf/NaN the moment any
#            logit exceeds 88; opt-in for checkpoints with known range.
# Trained attention logits beyond 80 are rare but real (attention-sink
# heads in large ViTs), hence "clamp" as the shipped default.
SOFTMAX_MODE = "clamp"
SOFTMAX_CLAMP = 80.0

# Normalization placement.  Deferring the 1/rowsum divide from the (Q, S)
# probabilities to the (Q, Dh) output is one fewer big-tile VPU op, but
# the P@V accumulator then sees UNNORMALIZED p̃.  Safety per mode:
#   "max":   p̃ ≤ 1 — always safe (but at seq 1536 the plain blocked
#            kernel's defer form busts the default 16M scoped VMEM,
#            19.2M measured — so blocked defer is clamp-only).
#   "clamp": p̃ ≤ e^80 could overflow the fp32 accumulator against large
#            V, so V is pre-scaled by 2^-24 (an exact power of two: zero
#            precision loss in bf16/fp32) and the output rescaled by
#            (o / rowsum) · 2^24 on the small (Q, Dh) tile — two steps,
#            NOT 2^24/rowsum, which infs against the 1e-37 rowsum floor
#            of fully-masked rows (0 · inf = NaN).  Bounds: accumulator
#            ≤ S · e^80 · 2^-24 · |v| ≈ 5e30 · |v| — safe to |v| ~ 6e7;
#            accumulation underflow only when every effective logit in a
#            row is ≲ −71 (the in-place form's own floor is −87).
#   "nomax": p̃ = exp(l) is unbounded in fp32 itself — never deferred.
ONE_SHOT_DEFER_NORM = True
BLOCKED_DEFER_NORM = True

# exact power-of-two V pre-scale for deferred clamp mode
VSCALE = 2.0 ** -24


def _defer_ok(defer: bool, blocked: bool = False) -> bool:
    if not defer:
        return False
    if SOFTMAX_MODE == "clamp":
        return True            # V-scaled accumulation, overflow-proof
    if SOFTMAX_MODE == "max":
        return not blocked     # p̃ ≤ 1; blocked form VMEM-limited
    return False               # nomax: p̃ unbounded in fp32


def kernel_plan(seq: int, d_model: int, dtype):
    """→ execution plan for the kernel, or None → XLA einsum path.

    ("one_shot", seq, seq): fused-QKV block in, whole (S, S) logits tile
    in VMEM — the 10 s / seq-500 budget (whole-array blocks also bypass
    Mosaic's divisible-by-8 block rule, so no padding).

    ("blocked", padded_seq, q_block): longer budgets (30 s / seq-1500)
    stream 8-divisible q-blocks over a padded sequence with the row's K|V
    block resident across its q-blocks; Q and KV arrive as SEPARATE
    operands (the fused-QKV block double-buffered would alone bust VMEM —
    measured 19.7M > 16M at seq 1536).  Padded keys are masked out, padded
    query rows sliced away."""
    esize = jnp.dtype(dtype).itemsize

    def one_shot_fits(s):
        blocks = s * 3 * d_model * esize + s * d_model * esize
        return 2 * blocks + s * s * 4 + s * s * esize <= VMEM_BUDGET_BYTES

    def blocked_fits(s_pad, qb):
        blocks = (s_pad * 2 * d_model * esize     # K|V row block
                  + 2 * qb * d_model * esize)     # Q block + out block
        return 2 * blocks + qb * s_pad * 4 + qb * s_pad * esize \
            <= VMEM_BUDGET_BYTES

    if one_shot_fits(seq):
        return "one_shot", seq, seq
    for qb in (512, 256, 128):
        s_pad = -(-seq // qb) * qb
        if blocked_fits(s_pad, qb):
            return "blocked", s_pad, qb
    return None


def preferred_seq_len(seq: int, d_model: int, dtype) -> int:
    """Round a patch budget UP to the blocked kernel's padded length.

    A blocked plan pads q/kv/mask to a q-block multiple per layer inside
    the scan — measured 8.2 ms/batch of pure XLA pad ops at B=32 seq-1500
    on v5e (r3 xplane).  Sizing the patch budget to the padded length
    instead makes the whole pipeline run at that length with the extra
    slots mask=0 — numerically identical, zero pad/slice traffic.
    One-shot and None plans return seq unchanged."""
    plan = kernel_plan(seq, d_model, dtype)
    if plan is not None and plan[0] == "blocked":
        return plan[1]
    return seq


def _softmax_kbias(kmask_row):
    """Per-key bias folding the padding mask AND the clamp ceiling into
    one (.., S) fp32 vector, computed ONCE per kernel body: valid keys
    carry the clamp ceiling (or effectively +inf for max/nomax modes),
    padded keys -1e30.  Every head's logits then need a single
    `minimum(logits, kbias)` VPU op instead of the two-op
    where(mask)+minimum(clamp) chain — material because the long-seq
    kernels are VPU-bound on the (Q, S) tile."""
    valid = SOFTMAX_CLAMP if SOFTMAX_MODE == "clamp" else -NEG_INF
    return jnp.where(kmask_row, jnp.float32(valid), jnp.float32(NEG_INF))


def _softmax_kbias_causal(kmask_row, q_len: int, s: int):
    """(Q, S) bias: key padding AND the causal triangle AND the clamp
    ceiling merged into ONE tensor built once per kernel body — each head
    still pays a single `minimum(logits, kbias)` (broadcasting handles the
    (1, S) vs (Q, S) shapes transparently in _head_logits).

    Causality is position i attends j ≤ i; built with 2D iotas (TPU needs
    ≥2D iota).  One-shot kernels only (q_len == s, no q-block offset)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (q_len, s), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (q_len, s), 1)
    allowed = (cols <= rows) & (kmask_row > 0)
    valid = SOFTMAX_CLAMP if SOFTMAX_MODE == "clamp" else -NEG_INF
    return jnp.where(allowed, jnp.float32(valid), jnp.float32(NEG_INF))


def _head_logits(q, k, kbias, head_dim):
    """Masked fp32 (Q, S) logits for one head — the MXU phase of the
    softmax, split out so callers can software-pipeline it against the
    previous head's VPU phase (see _attend_heads / HEAD_PIPELINE)."""
    qs = q * jnp.asarray(1.0 / (head_dim ** 0.5), q.dtype)
    logits = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (Q, S)
    return jnp.minimum(logits, kbias)


def _softmax_from_logits(logits):
    """(exp-weights, rowsum) from masked logits — the VPU phase.

    The forward kernels are VPU-bound at long seq (r3 xplane: the blocked
    kernel was 27 ms of a 94 ms 30-s batch, ~12 VPU ops per (Q,S) logit
    element vs 1.4 ms of MXU time), so every full-tile op matters:
    - the 1/√d scale is folded into q (Q×Dh elements, not Q×S),
    - padding mask + clamp ceiling arrive pre-merged in kbias (one
      `minimum`, see _softmax_kbias),
    - normalization is deferred to the OUTPUT tile where safe: callers
      compute (p̃ @ V)/rowsum on (Q, Dh) instead of p̃/rowsum on (Q, S).
    Numerics: identical math reordered."""
    if SOFTMAX_MODE == "max":
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        return p, jnp.sum(p, axis=-1, keepdims=True)
    # max-free forms: masked lanes exp(-1e30) → 0 exactly; fully-masked
    # (padded query) rows get rowsum 0, guarded so they emit 0 not NaN.
    p = jnp.exp(logits)
    return p, jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-37)


def _head_softmax_unnorm(q, k, kbias, head_dim):
    return _softmax_from_logits(_head_logits(q, k, kbias, head_dim))


def _attend_from_logits(logits, v, blocked=False, defer=None):
    """fp32 (Q, Dh) attention output from masked logits — the ONE place
    that decides normalization placement and overflow handling (see the
    DEFER_NORM / VSCALE notes above)."""
    if defer is None:
        defer = BLOCKED_DEFER_NORM if blocked else ONE_SHOT_DEFER_NORM
    defer = _defer_ok(defer, blocked)
    p, rowsum = _softmax_from_logits(logits)
    if not defer:
        p = p / rowsum
        return jnp.dot(p.astype(v.dtype), v,
                       preferred_element_type=jnp.float32)
    if SOFTMAX_MODE == "clamp":
        v = v * jnp.asarray(VSCALE, v.dtype)
        o = jnp.dot(p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
        # divide FIRST: fully-masked rows are 0/(1e-37 floor) = 0, while
        # the fused (2^24/rowsum) factor would inf and make 0·inf = NaN
        return (o / rowsum) * jnp.float32(1.0 / VSCALE)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return o / rowsum


def _head_attend(q, k, v, kbias, head_dim, blocked=False, defer=None):
    return _attend_from_logits(_head_logits(q, k, kbias, head_dim), v,
                               blocked=blocked, defer=defer)


def _head_softmax(q, k, kbias, head_dim):
    """Normalized probabilities (backward recompute path)."""
    p, s = _head_softmax_unnorm(q, k, kbias, head_dim)
    return p / s


# Software-pipelined head loop: issue head h+1's Q@K^T (an MXU op with no
# dependency on head h's output) BEFORE head h's exp/sum/PV in program
# order, so the in-order instruction stream always has independent MXU
# work adjacent to the VPU softmax.  Costs one extra live (Q, S) fp32
# logits tile of VMEM.  Measured NEUTRAL at 30 s / B=32 on v5e (379.9 vs
# 381.1 clips/s, 4 interleaved trials, outputs bit-identical) — Mosaic's
# scheduler evidently already extracts this overlap — so the simpler
# in-order loop stays the default; the variant is kept for retuning on
# other device generations.
HEAD_PIPELINE = False


def _attend_heads_loop(get_q, get_k, get_v, kbias, num_heads, head_dim,
                       emit, blocked=False):
    """Shared all-heads attention loop over accessor callables; emit(h, o)
    consumes each head's fp32 (Q, Dh) output."""
    if not HEAD_PIPELINE:
        for h in range(num_heads):
            emit(h, _head_attend(get_q(h), get_k(h), get_v(h), kbias,
                                 head_dim, blocked=blocked))
        return
    logits = _head_logits(get_q(0), get_k(0), kbias, head_dim)
    for h in range(num_heads):
        nxt = (_head_logits(get_q(h + 1), get_k(h + 1), kbias, head_dim)
               if h + 1 < num_heads else None)
        emit(h, _attend_from_logits(logits, get_v(h), blocked=blocked))
        logits = nxt


def _attend_heads(xq, k_src, v_src, kbias, num_heads, head_dim, out_ref):
    """Shared all-heads attention loop: q from xq columns, k/v from the
    given sources, outputs written per head into out_ref's row block."""
    def sl(h):
        return slice(h * head_dim, (h + 1) * head_dim)

    _attend_heads_loop(
        lambda h: xq[:, sl(h)], lambda h: k_src[:, sl(h)],
        lambda h: v_src[:, sl(h)], kbias, num_heads, head_dim,
        lambda h, o: out_ref.__setitem__((0, slice(None), sl(h)),
                                         o.astype(out_ref.dtype)))


def _kernel(num_heads: int, head_dim: int, q_block: int, causal: bool,
            qkv_ref, mask_ref, out_ref):
    d = num_heads * head_dim
    x = qkv_ref[0]  # (S, 3·H·Dh) — full row, resident across q-blocks
    s = x.shape[0]
    qb = pl.program_id(1)
    # slice the q rows from the REF (Mosaic lowers pl.ds on refs, not
    # dynamic_slice on values)
    xq = qkv_ref[0, pl.ds(pl.multiple_of(qb * q_block, 8), q_block), :]
    if causal:
        # (S, S) mask+causal+clamp merged (one-shot: q_block == s)
        kbias = _softmax_kbias_causal(mask_ref[0], s, s)
    else:
        kbias = _softmax_kbias(mask_ref[0] > 0)  # (1, S) mask+clamp merged
    _attend_heads(xq, x[:, d:2 * d], x[:, 2 * d:], kbias,
                  num_heads, head_dim, out_ref)


def _kernel_blocked(num_heads: int, head_dim: int,
                    q_ref, kv_ref, mask_ref, out_ref):
    """Blocked variant: Q arrives per-q-block, K|V per-row (resident across
    the row's q-blocks).  Same math as the one-shot kernel.

    Head slices are taken on the REFS (pl.ds), not on loaded values:
    value slicing at 96-column offsets is lane-unaligned (head_dim 96 <
    the 128-lane tile) and made Mosaic retile every matmul operand —
    ref slicing measured +15% end-to-end at 30 s, bit-identical (v5e r3)."""
    d = num_heads * head_dim
    kbias = _softmax_kbias(mask_ref[0] > 0)  # (1, S)
    _attend_heads_loop(
        lambda h: q_ref[0, :, pl.ds(h * head_dim, head_dim)],
        lambda h: kv_ref[0, :, pl.ds(h * head_dim, head_dim)],
        lambda h: kv_ref[0, :, pl.ds(d + h * head_dim, head_dim)],
        kbias, num_heads, head_dim,
        lambda h, o: out_ref.__setitem__(
            (0, slice(None), pl.ds(h * head_dim, head_dim)),
            o.astype(out_ref.dtype)),
        blocked=True)


def _pallas_forward(qkv, mask, num_heads, interpret, causal=False):
    """One-shot kernel over the fused-QKV block (plan must be one_shot)."""
    b, s, three_d = qkv.shape
    d = three_d // 3
    head_dim = d // num_heads
    plan = kernel_plan(s, d, qkv.dtype)
    assert plan is not None and plan[0] == "one_shot", (
        f"one-shot kernel_plan rejected seq {s}: {plan}")

    # Under shard_map (manual mesh axes) the out_shape must declare how the
    # output varies across mesh axes; mirror the input's vma.
    vma = getattr(jax.typeof(qkv), "vma", None)
    out_shape = (jax.ShapeDtypeStruct((b, s, d), qkv.dtype, vma=vma)
                 if vma else jax.ShapeDtypeStruct((b, s, d), qkv.dtype))

    kern = functools.partial(_kernel, num_heads, head_dim, s, causal)
    return pl.pallas_call(
        kern,
        grid=(b, 1),
        in_specs=[
            pl.BlockSpec((1, s, three_d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # (B, 1, S) so the trailing block dims equal the array dims
            # (Mosaic block-shape divisibility rule)
            pl.BlockSpec((1, 1, s), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        interpret=interpret,
    )(qkv, mask.astype(jnp.int32)[:, None, :])


def _pallas_forward_blocked(q, kv, mask, num_heads, interpret):
    """Padded q-blocked kernel over separate Q / K|V operands."""
    b, s, d = q.shape
    head_dim = d // num_heads
    plan = kernel_plan(s, d, q.dtype)
    assert plan is not None and plan[0] == "blocked", (
        f"blocked kernel_plan rejected seq {s}: {plan}")
    _, s_pad, q_block = plan
    if s_pad != s:
        q = jnp.pad(q, ((0, 0), (0, s_pad - s), (0, 0)))
        kv = jnp.pad(kv, ((0, 0), (0, s_pad - s), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, s_pad - s)))
    n_qb = s_pad // q_block

    vma = getattr(jax.typeof(q), "vma", None)
    out_shape = (jax.ShapeDtypeStruct((b, s_pad, d), q.dtype, vma=vma)
                 if vma else jax.ShapeDtypeStruct((b, s_pad, d), q.dtype))

    kern = functools.partial(_kernel_blocked, num_heads, head_dim)
    out = pl.pallas_call(
        kern,
        grid=(b, n_qb),
        in_specs=[
            pl.BlockSpec((1, q_block, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # q-block index ignored → the row's K|V stays resident in VMEM
            # across its q-blocks (no re-DMA)
            pl.BlockSpec((1, s_pad, 2 * d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        interpret=interpret,
    )(q, kv, mask.astype(jnp.int32)[:, None, :])
    return out[:, :s]


def _fused_ln_kernel(num_heads: int, head_dim: int, eps: float,
                     x_ref, w_ref, b_ref, ls_ref, lb_ref, mask_ref, out_ref):
    """Pre-LN + fused-QKV projection + one-shot attention in ONE kernel:
    x block in, attention output block out — the LN'd activations and the
    (S, 3·H·Dh) QKV tensor never touch HBM."""
    d = num_heads * head_dim
    xb = x_ref[0].astype(jnp.float32)        # (S, D)
    mu = jnp.mean(xb, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xb - mu), axis=-1, keepdims=True)
    xn = (xb - mu) * jax.lax.rsqrt(var + eps)
    xn = (xn * ls_ref[0] + lb_ref[0]).astype(out_ref.dtype)

    x = jnp.dot(xn, w_ref[:], preferred_element_type=jnp.float32)
    x = (x + b_ref[0]).astype(out_ref.dtype)  # (S, 3·H·Dh)

    kbias = _softmax_kbias(mask_ref[0] > 0)
    _attend_heads(x[:, :d], x[:, d:2 * d], x[:, 2 * d:], kbias,
                  num_heads, head_dim, out_ref)


def _pallas_fused_ln(ln_p, qkv_p, x, mask, num_heads, eps,
                     interpret: bool = False):
    """LayerNorm(x) → QKV → attention, one kernel.  Capacity must be
    gated by the caller (fused_ln_fits); weights must be the plain
    fp32/bf16 {'w','b'} form."""
    b, s, d = x.shape
    head_dim = d // num_heads
    w = qkv_p["w"].astype(x.dtype)

    # mirror shard_map manual axes into the output type (see _pallas_forward)
    vma = getattr(jax.typeof(x), "vma", None)
    out_shape = (jax.ShapeDtypeStruct((b, s, d), x.dtype, vma=vma)
                 if vma else jax.ShapeDtypeStruct((b, s, d), x.dtype))

    kern = functools.partial(_fused_ln_kernel, num_heads, head_dim, eps)
    return pl.pallas_call(
        kern,
        grid=(b, 1),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        interpret=interpret,
    )(x, w, qkv_p["b"].astype(jnp.float32)[None],
      ln_p["scale"].astype(jnp.float32)[None],
      ln_p["bias"].astype(jnp.float32)[None],
      mask.astype(jnp.int32)[:, None, :])


# o-projection strategy inside the whole-block kernels:
#   "per_head": o_h @ Wo[h·Dh:(h+1)·Dh, :] accumulated in fp32 — row slices
#               of the weight ref are sublane-aligned, but each matmul has
#               K = Dh (96 < the 128 MXU tile).
#   "concat":   concatenate head outputs to (S, D) and do ONE K = D matmul.
# Measured at 10 s / B=128 (v5e, same-session interleaved, 4 trials):
# base (no block kernel) 1484.4, per_head 1458.9, concat 1498.6 clips/s —
# the K=96 per-head matmuls underfill the MXU; one K=768 matmul wins.
FUSED_BLOCK_OPROJ = "concat"


def _attend_oproj(xq, k_src, v_src, kbias, num_heads, head_dim, wo_ref,
                  dtype):
    """All-heads attention + o-projection → fp32 (S, D) accumulator."""
    acc_outs = {"acc": None, "outs": []}

    def sl(h):
        return slice(h * head_dim, (h + 1) * head_dim)

    def emit(h, o):
        if FUSED_BLOCK_OPROJ == "concat":
            acc_outs["outs"].append(o.astype(dtype))
        else:
            contrib = jnp.dot(o.astype(dtype),
                              wo_ref[pl.ds(h * head_dim, head_dim), :],
                              preferred_element_type=jnp.float32)  # (S, D)
            acc = acc_outs["acc"]
            acc_outs["acc"] = contrib if acc is None else acc + contrib

    _attend_heads_loop(
        lambda h: xq[:, sl(h)], lambda h: k_src[:, sl(h)],
        lambda h: v_src[:, sl(h)], kbias, num_heads, head_dim, emit)
    if FUSED_BLOCK_OPROJ == "concat":
        return jnp.dot(jnp.concatenate(acc_outs["outs"], axis=-1), wo_ref[:],
                       preferred_element_type=jnp.float32)
    return acc_outs["acc"]


def _ln_rows(v32, s_ref, b_ref, eps, out_dtype):
    """Row LayerNorm on an fp32 tile with broadcast scale/bias refs."""
    mu = jnp.mean(v32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(v32 - mu), axis=-1, keepdims=True)
    vn = (v32 - mu) * jax.lax.rsqrt(var + eps)
    return (vn * s_ref[0] + b_ref[0]).astype(out_dtype)


def _mlp_tail(yb, yn, w1_ref, b1_ref, w2_ref, b2_ref):
    """out = y + Dense2(silu(Dense1(ln2y))) — the (S, intermediate)
    activation lives only in VMEM/registers.  Numerics mirror the XLA
    path: bf16 matmul operands with fp32 accumulation, bias add + cast
    to the compute dtype between stages.  silu runs in fp32 before the
    cast (Mosaic mis-lowers `logistic` on bf16 vectors — fp32 scalar
    broadcast into a bf16 vector fails MLIR verification)."""
    h1 = jnp.dot(yn, w1_ref[:], preferred_element_type=jnp.float32)
    h1 = h1 + b1_ref[0]
    h1 = (h1 * jax.nn.sigmoid(h1)).astype(yb.dtype)   # silu, fp32 → cast
    h2 = jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32)
    h2 = (h2 + b2_ref[0]).astype(yb.dtype)
    return yb + h2


def _fused_block_kernel(num_heads: int, head_dim: int, eps: float,
                        with_mlp: bool,
                        x_ref, w_ref, b_ref, ls_ref, lb_ref,
                        wo_ref, bo_ref, ls2_ref, lb2_ref, mask_ref,
                        *rest):
    """Whole pre-MLP half of a ViT block in ONE kernel:

        y   = x + (Attention(LN1(x)·Wqkv) @ Wo + bo)
        ln2 = LayerNorm2(y)

    emitted as TWO outputs so the surrounding XLA program is reduced to
    pure MLP matmuls (w1·silu·w2 + residual add) between kernel calls.
    Motivation (v5e xplane, B=128 seq-500): with LN1+QKV+attention fused,
    the remaining per-layer residue was the separate o-proj dispatch, the
    attention residual add and the MLP pre-LN (`convert_reduce_fusion`,
    0.42 ms/layer ≈ 5 ms/batch) — all HBM round-trips over (B,S,D) that
    this epilogue computes from tiles already resident in VMEM.

    With `with_mlp` the MLP runs in-kernel too (w1·silu·w2 + residual)
    and the kernel emits ONE output — the next layer's x.  The (S, 4·D)
    MLP activation then never touches HBM and the whole encoder layer is
    a single pallas_call.

    The o-projection concatenates head outputs and runs ONE K=D matmul
    (FUSED_BLOCK_OPROJ="concat", the measured winner — per-head K=Dh
    accumulation underfills the MXU; see the constant's A/B note).
    LN2 recomputes statistics from the bf16-cast y so its numerics match
    the unfused `layer_norm(y)` path bit-for-bit up to the cast."""
    d = num_heads * head_dim
    if with_mlp:
        w1_ref, b1_ref, w2_ref, b2_ref, out_ref = rest
    else:
        out_ref, ln2_ref = rest
    xb = x_ref[0].astype(jnp.float32)        # (S, D)
    xn = _ln_rows(xb, ls_ref, lb_ref, eps, out_ref.dtype)

    x = jnp.dot(xn, w_ref[:], preferred_element_type=jnp.float32)
    x = (x + b_ref[0]).astype(out_ref.dtype)  # (S, 3·H·Dh)

    kbias = _softmax_kbias(mask_ref[0] > 0)
    acc = _attend_oproj(x[:, :d], x[:, d:2 * d], x[:, 2 * d:], kbias,
                        num_heads, head_dim, wo_ref, out_ref.dtype)

    y = acc + bo_ref[0] + xb                 # fp32 residual
    yb = y.astype(out_ref.dtype)
    yn = _ln_rows(yb.astype(jnp.float32), ls2_ref, lb2_ref, eps,
                  out_ref.dtype)             # LN2 from the cast value
    if with_mlp:
        out_ref[0] = _mlp_tail(yb, yn, w1_ref, b1_ref, w2_ref, b2_ref)
    else:
        out_ref[0] = yb
        ln2_ref[0] = yn


# The block kernel holds x, qkv, logits, probs, the o-proj accumulator and
# two outputs at once — beyond Mosaic's conservative 16M default scoped
# budget but far under the chip's physical VMEM (v5e: 128M).  The kernel
# manages its own residency, so the pipelining headroom the default
# protects is not load-bearing here.
BLOCK_KERNEL_VMEM_LIMIT = 100 * 1024 * 1024
BLOCK_KERNEL_BUDGET = 60 * 1024 * 1024


def fused_block_fits(seq: int, d_model: int, dtype,
                     intermediate: int = 0) -> bool:
    """Static working-set model for the block kernel (double-buffered
    in/out blocks + resident weights + fp32 scratch) vs the raised limit.
    `intermediate` > 0 adds the in-kernel MLP (weights + activation)."""
    esize = jnp.dtype(dtype).itemsize
    blocks = (3 * seq * d_model * esize           # x in + y/ln2 out
              + d_model * 3 * d_model * esize     # w_qkv
              + d_model * d_model * esize         # w_o
              + 2 * d_model * intermediate * esize)  # w1 + w2
    scratch = (seq * 3 * d_model * esize          # qkv value
               + seq * seq * 4 + seq * seq * esize  # logits + probs
               + 2 * seq * d_model * 4            # o-proj acc + y fp32
               + seq * intermediate * (4 + esize))  # mlp activation
    return 2 * blocks + scratch <= BLOCK_KERNEL_BUDGET


def _pallas_fused_block(blk_p, x, mask, num_heads, eps, interpret=False,
                        with_mlp=False):
    """(y, ln2y) — or the full next-layer x when `with_mlp` — via the
    whole-block kernel.  blk_p carries ln1/attn/ln2 (+ mlp)."""
    b, s, d = x.shape
    head_dim = d // num_heads
    qkv_p, o_p = blk_p["attn"]["qkv"], blk_p["attn"]["o"]

    vma = getattr(jax.typeof(x), "vma", None)
    sds = (lambda shape: jax.ShapeDtypeStruct(shape, x.dtype, vma=vma)
           if vma else jax.ShapeDtypeStruct(shape, x.dtype))

    def vec(width):
        return pl.BlockSpec((1, width), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, 3 * d), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        vec(3 * d), vec(d), vec(d),
        pl.BlockSpec((d, d), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        vec(d), vec(d), vec(d),
        pl.BlockSpec((1, 1, s), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [
        x, qkv_p["w"].astype(x.dtype),
        qkv_p["b"].astype(jnp.float32)[None],
        blk_p["ln1"]["scale"].astype(jnp.float32)[None],
        blk_p["ln1"]["bias"].astype(jnp.float32)[None],
        o_p["w"].astype(x.dtype),
        o_p["b"].astype(jnp.float32)[None],
        blk_p["ln2"]["scale"].astype(jnp.float32)[None],
        blk_p["ln2"]["bias"].astype(jnp.float32)[None],
        mask.astype(jnp.int32)[:, None, :],
    ]
    if with_mlp:
        w1, w2 = blk_p["mlp"]["w1"], blk_p["mlp"]["w2"]
        inter = w1["w"].shape[1]
        in_specs += [
            pl.BlockSpec((d, inter), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(inter),
            pl.BlockSpec((inter, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(d),
        ]
        operands += [
            w1["w"].astype(x.dtype), w1["b"].astype(jnp.float32)[None],
            w2["w"].astype(x.dtype), w2["b"].astype(jnp.float32)[None],
        ]
        out_specs = pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = sds((b, s, d))
    else:
        out_specs = [
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [sds((b, s, d)), sds((b, s, d))]

    kern = functools.partial(_fused_block_kernel, num_heads, head_dim, eps,
                             with_mlp)
    return pl.pallas_call(
        kern,
        grid=(b, 1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=BLOCK_KERNEL_VMEM_LIMIT),
        interpret=interpret,
    )(*operands)


def _fused_block_kernel_blocked(num_heads: int, head_dim: int, eps: float,
                                q_block: int, with_mlp: bool,
                                x_row_ref, w_ref, b_ref, ls_ref,
                                lb_ref, wo_ref, bo_ref, ls2_ref, lb2_ref,
                                mask_ref, *rest):
    """Long-sequence variant of the whole-block kernel: at q-block 0 of each
    batch row, LN1 + the full-row QKV projection run ONCE into a VMEM
    scratch (TPU grids execute sequentially, so the scratch stays valid
    across the row's q-blocks); every q-block then streams attention +
    o-proj + residual + LN2 from that scratch.  This is the "stream K|V,
    single-buffered" form the 16M default scoped budget rejected — the
    kernel runs under a raised vmem_limit_bytes (v5e has 128M physical;
    working set ≈ 28M at seq 1536 / q-block 256).  The residual rows are
    sliced from the RESIDENT x row (index map ignores j), not a second
    per-q-block operand — one x fetch per row, not two.

    With `with_mlp` the q-block's MLP also runs in-kernel on its (qb, D)
    LN2 rows and the kernel emits the next layer's x for those rows."""
    d = num_heads * head_dim
    if with_mlp:
        w1_ref, b1_ref, w2_ref, b2_ref, out_ref, qkv_scratch = rest
    else:
        out_ref, ln2_ref, qkv_scratch = rest
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xb = x_row_ref[0].astype(jnp.float32)        # (S_pad, D)
        xn = _ln_rows(xb, ls_ref, lb_ref, eps, qkv_scratch.dtype)
        qkv = jnp.dot(xn, w_ref[:], preferred_element_type=jnp.float32)
        qkv_scratch[:, :] = (qkv + b_ref[0]).astype(qkv_scratch.dtype)

    kbias = _softmax_kbias(mask_ref[0] > 0)
    q_rows = pl.ds(pl.multiple_of(j * q_block, 8), q_block)
    acc_outs = {"acc": None, "outs": []}

    def emit(h, o):
        if FUSED_BLOCK_OPROJ == "concat":
            acc_outs["outs"].append(o.astype(out_ref.dtype))
        else:
            contrib = jnp.dot(o.astype(out_ref.dtype),
                              wo_ref[pl.ds(h * head_dim, head_dim), :],
                              preferred_element_type=jnp.float32)
            acc = acc_outs["acc"]
            acc_outs["acc"] = contrib if acc is None else acc + contrib

    # head slices on the scratch REF (pl.ds): value slicing at 96-col
    # offsets made Mosaic retile every matmul operand (+15% when fixed)
    _attend_heads_loop(
        lambda h: qkv_scratch[q_rows, pl.ds(h * head_dim, head_dim)],
        lambda h: qkv_scratch[:, pl.ds(d + h * head_dim, head_dim)],
        lambda h: qkv_scratch[:, pl.ds(2 * d + h * head_dim, head_dim)],
        kbias, num_heads, head_dim, emit, blocked=True)
    if FUSED_BLOCK_OPROJ == "concat":
        acc = jnp.dot(jnp.concatenate(acc_outs["outs"], axis=-1), wo_ref[:],
                      preferred_element_type=jnp.float32)
    else:
        acc = acc_outs["acc"]

    y = acc + bo_ref[0] + x_row_ref[0, q_rows, :].astype(jnp.float32)
    yb = y.astype(out_ref.dtype)
    yn = _ln_rows(yb.astype(jnp.float32), ls2_ref, lb2_ref, eps,
                  out_ref.dtype)
    if with_mlp:
        out_ref[0] = _mlp_tail(yb, yn, w1_ref, b1_ref, w2_ref, b2_ref)
    else:
        out_ref[0] = yb
        ln2_ref[0] = yn


# q-block for the fused blocked kernel.  The conservative 16M plan forced
# 256; under the raised limit 512 also fits — sweep on hardware.
FUSED_BLOCKED_Q_BLOCK = 256


def fused_block_blocked_fits(s_pad: int, qb: int, d: int, dtype,
                             intermediate: int = 0) -> bool:
    esize = jnp.dtype(dtype).itemsize
    blocks = (s_pad * d                     # x row (residual sliced from it)
              + d * 3 * d + d * d           # w_qkv + w_o
              + 2 * d * intermediate        # w1 + w2 (with_mlp)
              + 2 * qb * d) * esize         # y + ln2 out
    scratch = (s_pad * 3 * d * esize        # qkv scratch
               + qb * s_pad * (4 + esize)   # logits + probs
               + 2 * qb * d * 4             # o-proj acc + y fp32
               + qb * intermediate * (4 + esize))  # mlp activation
    return 2 * blocks + scratch <= BLOCK_KERNEL_BUDGET


def _pallas_fused_block_blocked(blk_p, x, mask, num_heads, eps,
                                q_block, interpret=False, with_mlp=False):
    b, s, d = x.shape
    head_dim = d // num_heads
    s_pad = -(-s // q_block) * q_block
    if s_pad != s:
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, s_pad - s)))
    n_qb = s_pad // q_block
    qkv_p, o_p = blk_p["attn"]["qkv"], blk_p["attn"]["o"]

    vma = getattr(jax.typeof(x), "vma", None)
    sds = (lambda shape: jax.ShapeDtypeStruct(shape, x.dtype, vma=vma)
           if vma else jax.ShapeDtypeStruct(shape, x.dtype))

    def vec(width):
        return pl.BlockSpec((1, width), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, 3 * d), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        vec(3 * d), vec(d), vec(d),
        pl.BlockSpec((d, d), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        vec(d), vec(d), vec(d),
        pl.BlockSpec((1, 1, s_pad), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [
        x, qkv_p["w"].astype(x.dtype),
        qkv_p["b"].astype(jnp.float32)[None],
        blk_p["ln1"]["scale"].astype(jnp.float32)[None],
        blk_p["ln1"]["bias"].astype(jnp.float32)[None],
        o_p["w"].astype(x.dtype),
        o_p["b"].astype(jnp.float32)[None],
        blk_p["ln2"]["scale"].astype(jnp.float32)[None],
        blk_p["ln2"]["bias"].astype(jnp.float32)[None],
        mask.astype(jnp.int32)[:, None, :],
    ]
    qb_spec = pl.BlockSpec((1, q_block, d), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    if with_mlp:
        w1, w2 = blk_p["mlp"]["w1"], blk_p["mlp"]["w2"]
        inter = w1["w"].shape[1]
        in_specs += [
            pl.BlockSpec((d, inter), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(inter),
            pl.BlockSpec((inter, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(d),
        ]
        operands += [
            w1["w"].astype(x.dtype), w1["b"].astype(jnp.float32)[None],
            w2["w"].astype(x.dtype), w2["b"].astype(jnp.float32)[None],
        ]
        out_specs, out_shape = qb_spec, sds((b, s_pad, d))
    else:
        out_specs = [qb_spec, qb_spec]
        out_shape = [sds((b, s_pad, d)), sds((b, s_pad, d))]

    kern = functools.partial(_fused_block_kernel_blocked, num_heads,
                             head_dim, eps, q_block, with_mlp)
    out = pl.pallas_call(
        kern,
        grid=(b, n_qb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((s_pad, 3 * d), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=BLOCK_KERNEL_VMEM_LIMIT),
        interpret=interpret,
    )(*operands)
    if with_mlp:
        return out[:, :s]
    return out[0][:, :s], out[1][:, :s]


def _xla_block(blk_p, x, mask, num_heads, eps):
    """XLA reference of the whole-block kernels (backward remat)."""
    out = _xla_ln_attention(blk_p["ln1"], blk_p["attn"]["qkv"], x, mask,
                            num_heads, eps)
    o_p = blk_p["attn"]["o"]
    y = x + (jnp.dot(out, o_p["w"].astype(x.dtype),
                     preferred_element_type=jnp.float32)
             + o_p["b"]).astype(x.dtype)
    yf = y.astype(jnp.float32)
    mu = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mu), axis=-1, keepdims=True)
    yn = (yf - mu) * jax.lax.rsqrt(var + eps)
    ln2 = (yn * blk_p["ln2"]["scale"] + blk_p["ln2"]["bias"]).astype(x.dtype)
    return y, ln2


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_block_attention(blk_p, x, mask, num_heads, eps, variant, interpret):
    """(y, ln2y) = whole pre-MLP block half.  variant: ("one_shot",) or
    ("blocked", q_block).  Differentiable via XLA-remat backward (training
    call sites keep the unfused route for dropout/droppath RNG)."""
    if variant[0] == "one_shot":
        y, ln2y = _pallas_fused_block(blk_p, x, mask, num_heads, eps,
                                      interpret)
        return y, ln2y
    return _pallas_fused_block_blocked(blk_p, x, mask, num_heads, eps,
                                       variant[1], interpret)


def _fused_block_fwd(blk_p, x, mask, num_heads, eps, variant, interpret):
    out = fused_block_attention(blk_p, x, mask, num_heads, eps, variant,
                                interpret)
    return out, (blk_p, x, mask)


def _fused_block_bwd(num_heads, eps, variant, interpret, residuals, g):
    import numpy as np

    blk_p, x, mask = residuals
    _, vjp = jax.vjp(
        lambda bp, xx: _xla_block(bp, xx, mask, num_heads, eps), blk_p, x)
    d_p, d_x = vjp(tuple(gg.astype(x.dtype) for gg in g))
    if jnp.issubdtype(mask.dtype, jnp.integer):
        d_mask = np.zeros(mask.shape, jax.dtypes.float0)
    else:
        d_mask = jnp.zeros_like(mask)
    return d_p, d_x, d_mask


fused_block_attention.defvjp(_fused_block_fwd, _fused_block_bwd)


def try_fused_block_attention(blk_p, x, mask, num_heads, eps, dtype):
    """→ (y, ln2y) for the whole pre-MLP half of a ViT block, or None when
    ineligible (no kernel plan, capacity, vma-checked interpret mode).
    Dispatches one-shot (short seq) or scratch-QKV blocked (long seq).
    Differentiable (XLA-remat backward); training call sites keep the
    unfused route for dropout/droppath RNG."""
    interp = jax.default_backend() != "tpu"
    if interp and bool(getattr(jax.typeof(x), "vma", None)):
        return None
    b, s, d = x.shape
    compute_dtype = dtype if dtype is not None else x.dtype
    plan = kernel_plan(s, d, compute_dtype)
    if plan is None:
        return None
    sub = {"ln1": blk_p["ln1"], "attn": blk_p["attn"], "ln2": blk_p["ln2"]}
    if plan[0] == "one_shot":
        if not fused_block_fits(s, d, compute_dtype):
            return None
        variant = ("one_shot",)
    else:
        qb = FUSED_BLOCKED_Q_BLOCK
        s_pad = -(-s // qb) * qb
        if not fused_block_blocked_fits(s_pad, qb, d, compute_dtype):
            return None
        variant = ("blocked", qb)
    return fused_block_attention(sub, x.astype(compute_dtype), mask,
                                 num_heads, eps, variant, interp)


# Whole-layer mode: run the MLP inside the block kernel too, so each
# encoder layer is ONE pallas_call and the (S, intermediate) activation
# never round-trips HBM.  A/B'd on hardware against the block+XLA-MLP
# split (see CLAUDE.md perf log).
FUSED_BLOCK_MLP = True


def _xla_layer(blk_p, x, mask, num_heads, eps):
    """XLA reference of the whole-layer kernel (backward remat)."""
    y, ln2 = _xla_block(blk_p, x, mask, num_heads, eps)
    w1, w2 = blk_p["mlp"]["w1"], blk_p["mlp"]["w2"]
    h = (jnp.dot(ln2, w1["w"].astype(x.dtype),
                 preferred_element_type=jnp.float32) + w1["b"]).astype(x.dtype)
    h = jax.nn.silu(h)
    h = (jnp.dot(h, w2["w"].astype(x.dtype),
                 preferred_element_type=jnp.float32) + w2["b"]).astype(x.dtype)
    return y + h


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_layer(blk_p, x, mask, num_heads, eps, variant, interpret):
    """x_next = full ViT encoder layer (both halves) in one pallas_call.
    variant: ("one_shot",) or ("blocked", q_block)."""
    if variant[0] == "one_shot":
        return _pallas_fused_block(blk_p, x, mask, num_heads, eps,
                                   interpret, with_mlp=True)
    return _pallas_fused_block_blocked(blk_p, x, mask, num_heads, eps,
                                       variant[1], interpret, with_mlp=True)


def _fused_layer_fwd(blk_p, x, mask, num_heads, eps, variant, interpret):
    out = fused_layer(blk_p, x, mask, num_heads, eps, variant, interpret)
    return out, (blk_p, x, mask)


def _fused_layer_bwd(num_heads, eps, variant, interpret, residuals, g):
    import numpy as np

    blk_p, x, mask = residuals
    _, vjp = jax.vjp(
        lambda bp, xx: _xla_layer(bp, xx, mask, num_heads, eps), blk_p, x)
    d_p, d_x = vjp(g.astype(x.dtype))
    if jnp.issubdtype(mask.dtype, jnp.integer):
        d_mask = np.zeros(mask.shape, jax.dtypes.float0)
    else:
        d_mask = jnp.zeros_like(mask)
    return d_p, d_x, d_mask


fused_layer.defvjp(_fused_layer_fwd, _fused_layer_bwd)


def try_fused_layer(blk_p, x, mask, num_heads, eps, dtype,
                    allow_blocked: bool = False):
    """→ next-layer x via the whole-layer kernel, or None when disabled or
    ineligible.  Same dispatch/capacity rules as the block kernel plus the
    in-kernel MLP working set.

    ONE-SHOT plans only by default: the blocked form (per-q-block MLP)
    measured 35% SLOWER at 30 s / seq-1536 on v5e (248 vs 380 clips/s,
    same-session interleaved) — each q-block's 256-row MLP serializes
    against its attention inside the sequential grid, while the XLA MLP
    runs the full 1536-row matmul with full pipelining.  At seq 500 the
    one-shot form is +0.6% (1537 vs 1529, 4 trials) and shrinks the XLA
    program to pure scan glue."""
    if not FUSED_BLOCK_MLP:
        return None
    interp = jax.default_backend() != "tpu"
    if interp and bool(getattr(jax.typeof(x), "vma", None)):
        return None
    b, s, d = x.shape
    compute_dtype = dtype if dtype is not None else x.dtype
    plan = kernel_plan(s, d, compute_dtype)
    if plan is None:
        return None
    inter = blk_p["mlp"]["w1"]["w"].shape[1]
    if plan[0] == "one_shot":
        if not fused_block_fits(s, d, compute_dtype, intermediate=inter):
            return None
        variant = ("one_shot",)
    else:
        if not allow_blocked:
            return None
        qb = FUSED_BLOCKED_Q_BLOCK
        s_pad = -(-s // qb) * qb
        if not fused_block_blocked_fits(s_pad, qb, d, compute_dtype,
                                        intermediate=inter):
            return None
        variant = ("blocked", qb)
    sub = {"ln1": blk_p["ln1"], "attn": blk_p["attn"], "ln2": blk_p["ln2"],
           "mlp": blk_p["mlp"]}
    return fused_layer(sub, x.astype(compute_dtype), mask, num_heads, eps,
                       variant, interp)


def _xla_ln_attention(ln_p, qkv_p, x, mask, num_heads, eps):
    """XLA reference of the fused-LN kernel's math (backward remat)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = (xn * ln_p["scale"] + ln_p["bias"]).astype(x.dtype)
    qkv = (jnp.dot(xn, qkv_p["w"].astype(x.dtype),
                   preferred_element_type=jnp.float32)
           + qkv_p["b"]).astype(x.dtype)
    return _xla_attention(qkv, mask, num_heads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_ln_attention(ln_p, qkv_p, x, mask, num_heads, eps,
                       interpret: bool = False):
    """LN + QKV + all-heads attention in one kernel (pre out-proj output).
    Differentiable: the backward remats LN+QKV+attention in XLA (grads for
    ln/qkv params and x; float0 for the integer mask)."""
    return _pallas_fused_ln(ln_p, qkv_p, x, mask, num_heads, eps, interpret)


def _fused_ln_fwd(ln_p, qkv_p, x, mask, num_heads, eps, interpret):
    out = _pallas_fused_ln(ln_p, qkv_p, x, mask, num_heads, eps, interpret)
    return out, (ln_p, qkv_p, x, mask)


def _fused_ln_bwd(num_heads, eps, interpret, residuals, g):
    import numpy as np

    ln_p, qkv_p, x, mask = residuals
    _, vjp = jax.vjp(
        lambda lp, qp, xx: _xla_ln_attention(lp, qp, xx, mask, num_heads, eps),
        ln_p, qkv_p, x)
    d_ln, d_qkv, d_x = vjp(g.astype(x.dtype))
    if jnp.issubdtype(mask.dtype, jnp.integer):
        d_mask = np.zeros(mask.shape, jax.dtypes.float0)
    else:
        d_mask = jnp.zeros_like(mask)
    return d_ln, d_qkv, d_x, d_mask


fused_ln_attention.defvjp(_fused_ln_fwd, _fused_ln_bwd)


def fused_ln_fits(seq: int, d_model: int, dtype) -> bool:
    """Capacity: x in + out blocks + resident weights (all double-buffered)
    + in-register QKV + fp32 logits + probs.  The model intentionally
    omits the transient fp32 dot accumulator / LN temporaries — Mosaic
    reuses those buffers; empirically validated on v5e at the edge cases
    this admits: fp32 500/768 and bf16 600/768 both compile and run."""
    esize = jnp.dtype(dtype).itemsize
    blocks = (2 * seq * d_model * esize            # x + out
              + d_model * 3 * d_model * esize)     # w_qkv (revisited)
    scratch = seq * 3 * d_model * esize + seq * seq * 4 + seq * seq * esize
    return 2 * blocks + scratch <= VMEM_BUDGET_BYTES


def try_fused_ln_attention(ln_p, attn_p, x, mask, num_heads, eps, dtype):
    """→ attention output (pre out-proj) via the LN+QKV+attention kernel,
    or None when ineligible (shard_map interpret mode, capacity,
    or a plan that isn't one-shot).  Differentiable (XLA-remat backward),
    but training paths keep the unfused route for dropout support."""
    interp = jax.default_backend() != "tpu"
    if interp and bool(getattr(jax.typeof(x), "vma", None)):
        # vma-checked interpret mode can't run pallas (see ops/attention.py);
        # compiled per-shard under shard_map is fine
        return None
    b, s, d = x.shape
    compute_dtype = dtype if dtype is not None else x.dtype
    plan = kernel_plan(s, d, compute_dtype)
    if plan is None or plan[0] != "one_shot":
        return None
    if not fused_ln_fits(s, d, compute_dtype):
        return None
    return fused_ln_attention(ln_p, attn_p["qkv"], x.astype(compute_dtype),
                              mask, num_heads, eps, interp)


def _bwd_kernel(num_heads: int, head_dim: int, causal: bool,
                qkv_ref, mask_ref, g_ref, dqkv_ref):
    """One-shot attention backward per batch row, all heads in VMEM.

    Flash-style: P is recomputed from the saved QKV (no residuals in HBM);
    the five S²·Dh matmuls per head (P recompute, dV, dP, dQ, dK) all run
    on the MXU against VMEM tiles — XLA's unfused backward materialized
    the (B,H,S,S) logits twice plus layout copies."""
    d = num_heads * head_dim
    x = qkv_ref[0]    # (S, 3·H·Dh)
    g = g_ref[0]      # (S, H·Dh)
    kmask = mask_ref[0] > 0  # (1, S)
    if causal:
        # masked entries have p == 0 so their ds is already 0; the merged
        # (S, S) kbias only shapes the P recompute
        kbias = _softmax_kbias_causal(mask_ref[0], x.shape[0], x.shape[0])
    else:
        kbias = _softmax_kbias(kmask)
    scale = 1.0 / (head_dim ** 0.5)

    for h in range(num_heads):
        q = x[:, h * head_dim:(h + 1) * head_dim]
        k = x[:, d + h * head_dim:d + (h + 1) * head_dim]
        v = x[:, 2 * d + h * head_dim:2 * d + (h + 1) * head_dim]
        go = g[:, h * head_dim:(h + 1) * head_dim]

        p = _head_softmax(q, k, kbias, head_dim)             # (S, S) fp32

        pb = p.astype(x.dtype)
        dv = jax.lax.dot_general(pb, go, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (S, Dh)
        dp = jax.lax.dot_general(go, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (S, S)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = jnp.where(kmask, ds, 0.0) * scale               # masked cols: 0
        dsb = ds.astype(x.dtype)
        dq = jnp.dot(dsb, k, preferred_element_type=jnp.float32)      # (S, Dh)
        dk = jax.lax.dot_general(dsb, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (S, Dh)

        dt = dqkv_ref.dtype
        dqkv_ref[0, :, h * head_dim:(h + 1) * head_dim] = dq.astype(dt)
        dqkv_ref[0, :, d + h * head_dim:d + (h + 1) * head_dim] = dk.astype(dt)
        dqkv_ref[0, :, 2 * d + h * head_dim:2 * d + (h + 1) * head_dim] = \
            dv.astype(dt)


def _pallas_backward(qkv, mask, g, num_heads, interpret, causal=False):
    """d_qkv for the one-shot forward (same VMEM-capacity regime)."""
    b, s, three_d = qkv.shape
    d = three_d // 3
    head_dim = d // num_heads

    kern = functools.partial(_bwd_kernel, num_heads, head_dim, causal)
    return pl.pallas_call(
        kern,
        grid=(b, 1),
        in_specs=[
            pl.BlockSpec((1, s, three_d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, three_d), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, three_d), qkv.dtype),
        interpret=interpret,
    )(qkv, mask.astype(jnp.int32)[:, None, :], g.astype(qkv.dtype))


def bwd_fits_vmem(seq: int, d_model: int, dtype) -> bool:
    """Backward working set: qkv + g blocks + d_qkv out (double-buffered)
    + two fp32 (S,S) tiles (P and dP/dS) + dO/V temporaries."""
    esize = jnp.dtype(dtype).itemsize
    blocks = (seq * 3 * d_model * esize * 2   # qkv in + d_qkv out
              + seq * d_model * esize)        # g in
    return 2 * blocks + 2 * seq * seq * 4 + seq * seq * esize \
        <= VMEM_BUDGET_BYTES


def _xla_attention(qkv, mask, num_heads, causal=False):
    """Same math as the kernel, in XLA ops — used only to derive the
    backward pass (flash-style rematerialization: no residual activations
    are saved; the backward recomputes attention and differentiates it)."""
    b, s, three_d = qkv.shape
    d = three_d // 3
    head_dim = d // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, s, num_heads, head_dim) * (1.0 / head_dim ** 0.5)
    k = k.reshape(b, s, num_heads, head_dim)
    v = v.reshape(b, s, num_heads, head_dim)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    allowed = mask[:, None, None, :] > 0
    if causal:
        allowed = allowed & jnp.tril(jnp.ones((s, s), jnp.bool_))
    logits = jnp.where(allowed, logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, s, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def encoder_attention(
    qkv: jnp.ndarray,    # (B, S, 3·H·Dh) fused projection output
    mask: jnp.ndarray,   # (B, S) 1 = valid key
    num_heads: int,
    interpret: bool = False,
    causal: bool = False,
) -> jnp.ndarray:
    """→ attention output (B, S, H·Dh), heads concatenated (pre out-proj).

    causal=True masks keys j > i on top of the padding mask (the text
    towers' self-attention, reference roberta_text_model.py:210-218) —
    one-shot plans only."""
    return _pallas_forward(qkv, mask, num_heads, interpret, causal)


def _fwd(qkv, mask, num_heads, interpret, causal):
    return _pallas_forward(qkv, mask, num_heads, interpret, causal), (qkv, mask)


def _bwd(num_heads, interpret, causal, residuals, g):
    import numpy as np

    qkv, mask = residuals
    b, s, three_d = qkv.shape
    if bwd_fits_vmem(s, three_d // 3, qkv.dtype):
        d_qkv = _pallas_backward(qkv, mask, g, num_heads, interpret, causal)
    else:
        _, vjp = jax.vjp(
            lambda x: _xla_attention(x, mask, num_heads, causal), qkv)
        (d_qkv,) = vjp(g.astype(qkv.dtype))
    if jnp.issubdtype(mask.dtype, jnp.integer):
        d_mask = np.zeros(mask.shape, jax.dtypes.float0)
    else:
        d_mask = jnp.zeros_like(mask)
    return d_qkv, d_mask


encoder_attention.defvjp(_fwd, _bwd)


def _xla_attention_split(q, kv, mask, num_heads):
    """XLA reference of the blocked kernel's math (backward remat)."""
    b, s, d = q.shape
    head_dim = d // num_heads
    k, v = jnp.split(kv, 2, axis=-1)
    q = q.reshape(b, s, num_heads, head_dim) * (1.0 / head_dim ** 0.5)
    k = k.reshape(b, s, num_heads, head_dim)
    v = v.reshape(b, s, num_heads, head_dim)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = jnp.where(mask[:, None, None, :] > 0, logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1).astype(kv.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, s, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def encoder_attention_blocked(
    q: jnp.ndarray,      # (B, S, H·Dh) query projection
    kv: jnp.ndarray,     # (B, S, 2·H·Dh) fused key|value projection
    mask: jnp.ndarray,   # (B, S) 1 = valid key
    num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Long-sequence variant → (B, S, H·Dh); see kernel_plan."""
    return _pallas_forward_blocked(q, kv, mask, num_heads, interpret)


def _fwd_blocked(q, kv, mask, num_heads, interpret):
    out = _pallas_forward_blocked(q, kv, mask, num_heads, interpret)
    return out, (q, kv, mask)


def _bwd_blocked(num_heads, interpret, residuals, g):
    import numpy as np

    q, kv, mask = residuals
    _, vjp = jax.vjp(
        lambda qq, kk: _xla_attention_split(qq, kk, mask, num_heads), q, kv)
    d_q, d_kv = vjp(g.astype(q.dtype))
    if jnp.issubdtype(mask.dtype, jnp.integer):
        d_mask = np.zeros(mask.shape, jax.dtypes.float0)
    else:
        d_mask = jnp.zeros_like(mask)
    return d_q, d_kv, d_mask


encoder_attention_blocked.defvjp(_fwd_blocked, _bwd_blocked)
