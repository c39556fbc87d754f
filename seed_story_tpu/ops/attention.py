"""Fused multi-head attention for TPU.

One kernel family replaces every native attention dependency of the
reference (see /root/reference SURVEY: xformers ``memory_efficient_attention``
in src/models_clm/modeling_llama_xformer.py:281-295, flash-attn-2 in
modeling_llama_4_35.py:423-618, torch SDPA in
src/models_ipa/attention_processor.py):

  * training causal mask        -> ``causal=True`` (q_start = Skv - Sq)
  * bottom-right decode mask    -> ``causal=True`` + per-row ``q_start``
    (the reference's LowerTriangularFromBottomRightMask: new queries align
    bottom-right against a longer KV)
  * full (ViT / perceiver / UNet cross-attn) -> ``causal=False``
  * padded KV caches            -> per-row ``kv_len``

Masking rule for query row ``i`` (0-based within this call) and key ``j``:

  visible(b, i, j) = (j < kv_len[b]) and (not causal or j <= q_start[b] + i)

Defaults ``q_start = Skv - Sq`` and ``kv_len = Skv`` make ``causal=True``
the standard causal mask when Sq == Skv.

Implementation: Pallas flash-attention kernels on TPU for BOTH the forward
(online softmax) and the backward pass (dq and dkv kernels re-using the
forward LSE — see ``_mha_bwd_*`` below); ``mha_reference`` is the jnp
ground truth and the CPU fallback. GQA is supported by indexing KV heads
inside the BlockSpec index map — KV is never materialised repeated.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _normalize_lens(b, sq, skv, q_start, kv_len):
    if q_start is None:
        q_start = jnp.full((b,), skv - sq, dtype=jnp.int32)
    else:
        q_start = jnp.broadcast_to(jnp.asarray(q_start, jnp.int32), (b,))
    if kv_len is None:
        kv_len = jnp.full((b,), skv, dtype=jnp.int32)
    else:
        kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))
    return q_start, kv_len


# ---------------------------------------------------------------------------
# Reference (XLA) implementation — ground truth + backward + CPU path.
# ---------------------------------------------------------------------------


def mha_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    q_start: Optional[jax.Array] = None,
    kv_len: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """O(S^2)-memory attention in plain XLA. Shapes:

    q: (B, Hq, Sq, D); k, v: (B, Hkv, Skv, D) with Hq % Hkv == 0.
    Returns (B, Hq, Sq, D) in q.dtype.
    """
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    assert hq % hkv == 0, (hq, hkv)
    group = hq // hkv
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))
    q_start, kv_len = _normalize_lens(b, sq, skv, q_start, kv_len)

    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if group > 1:
        kf = jnp.repeat(kf, group, axis=1)
        vf = jnp.repeat(vf, group, axis=1)

    logits = jnp.einsum("bhqd,bhkd->bhqk", qf, kf)
    jpos = jnp.arange(skv)[None, None, None, :]
    mask = jpos < kv_len[:, None, None, None]
    if causal:
        ipos = jnp.arange(sq)[None, None, :, None]
        mask = mask & (jpos <= q_start[:, None, None, None] + ipos)
    logits = jnp.where(mask, logits, DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1)
    # Rows with no visible key are defined to output exactly 0.
    probs = jnp.where(mask.any(axis=-1, keepdims=True), probs, 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vf)
    return out.astype(q.dtype)


def decode_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    kv_len: jax.Array,
    q_start: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    k_scale: Optional[jax.Array] = None,  # (B, Hkv, C) int8-KV dequant scales
    v_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Small-query attention tuned for the decode hot path (single-token
    decode and short speculative-verify blocks).

    K/V are read in their STORED dtype with fp32 MXU accumulation
    (preferred_element_type) — unlike ``mha_reference`` there is no
    ``astype(float32)`` on the cache, which XLA can materialize as a copy:
    at 7B story shapes the cache is ~3GB/token of reads, and doubling that
    to fp32 costs ~4 ms/token. GQA is handled by folding the group into
    the query rows (no repeated K/V). Softmax stays fp32; probabilities
    are cast to the value dtype for the PV matvec (the same compromise
    the flash kernel makes). Int8 cache mode folds the per-token dequant
    scales into the score/probability vectors AFTER the contractions, so
    no bf16 cache copy ever materializes (the s>1 mha path would).

    q: (B, Hq, S, D) with small S; k/v: (B, Hkv, C, D); kv_len: (B,)
    valid prefix. For S > 1, ``q_start`` (B,) gives the cache position of
    query 0 — query i attends keys < q_start + i + 1, so rows whose
    per-row valid count is below S stay causally correct (their garbage
    tail queries produce ignored outputs). Returns (B, Hq, S, D).
    """
    b, hq, sq, d = q.shape
    _, hkv, c, _ = k.shape
    assert hq % hkv == 0, (q.shape, k.shape)
    assert sq == 1 or q_start is not None, "q_start required for multi-query"
    group = hq // hkv
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))
    qg = q.reshape(b, hkv, group * sq, d)
    # int8-KV mode: the dot reads the int8 bytes (convert fuses into the
    # matmul operand load); scales apply to the (C,) vectors post-dot.
    kd = k if k.dtype == qg.dtype else k.astype(qg.dtype)
    logits = jnp.einsum(
        "bhgd,bhcd->bhgc", qg, kd, preferred_element_type=jnp.float32
    ) * scale  # (B, Hkv, group*S, C)
    if k_scale is not None:
        logits = logits * k_scale[:, :, None, :].astype(jnp.float32)
    pos = jnp.arange(c)[None, None, None, :]
    if sq == 1:
        mask = pos < kv_len[:, None, None, None]
    else:
        # per-query causal limit, tiled to the (group*S) row layout of qg
        limit = q_start[:, None] + jnp.arange(sq)[None, :] + 1  # (B, S)
        limit = jnp.minimum(limit, kv_len[:, None])
        limit = jnp.tile(limit, (1, group))  # (B, group*S) rows g-major
        mask = pos < limit[:, None, :, None]
    logits = jnp.where(mask, logits, DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(mask.any(axis=-1, keepdims=True), probs, 0.0)
    if v_scale is not None:
        probs = probs * v_scale[:, :, None, :].astype(jnp.float32)
    pv_dtype = q.dtype
    vd = v if v.dtype == pv_dtype else v.astype(pv_dtype)
    out = jnp.einsum(
        "bhgc,bhcd->bhgd", probs.astype(pv_dtype), vd,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, hq, sq, d).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas TPU kernel (forward).
# ---------------------------------------------------------------------------


def _flash_fwd_kernel(
    # scalar prefetch
    q_start_ref,
    kv_len_ref,
    # inputs
    q_ref,
    k_ref,
    v_ref,
    # outputs
    o_ref,
    lse_ref,
    # scratch
    m_ref,
    l_ref,
    acc_ref,
    *,
    scale: float,
    causal: bool,
    block_q: int,
    block_kv: int,
    sq: int,
    skv: int,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q_start = q_start_ref[b]
    kv_len = kv_len_ref[b]

    # Global positions of this tile.
    q_pos = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
    k_pos = ik * block_kv + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)

    # Whole-block skip: block fully masked out?
    block_k_min = ik * block_kv
    block_visible = block_k_min < kv_len
    if causal:
        # max query position in tile attends at most q_start + q_max
        q_max = iq * block_q + block_q - 1
        block_visible = jnp.logical_and(block_visible, block_k_min <= q_start + q_max)

    @pl.when(block_visible)
    def _compute():
        # MXU dots take the NATIVE dtype (bf16 in, f32 accumulate): f32
        # matmul inputs run at 1/4 the bf16 MXU rate on v5e — casting up
        # front pinned the whole kernel to the f32 roofline (~49 TF/s).
        # Scale is applied to the f32 scores instead of bf16 q (better
        # precision than pre-scaling in bf16).
        qb = q_ref[0, 0]
        kb = k_ref[0, 0]
        s = scale * jax.lax.dot_general(
            qb,
            kb,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_kv)

        mask = k_pos < kv_len
        if causal:
            mask = jnp.logical_and(mask, k_pos <= q_start + q_pos)
        # Padded query rows (q_pos >= sq) produce garbage; harmless, sliced off.
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_ref[:]  # (block_q, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)  # fully-masked rows stay exactly 0
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_ref[:] + jnp.sum(p, axis=-1, keepdims=True)

        vb = v_ref[0, 0]
        pv = jax.lax.dot_general(
            p.astype(vb.dtype),  # bf16 probs on the MXU (flash-attn v2 style)
            vb,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new
        l_ref[:] = l_new

    @pl.when(ik == nk - 1)
    def _finalize():
        # Guard against fully-masked rows (l == 0).
        l = l_ref[:]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / safe_l).astype(o_ref.dtype)
        lse = jnp.where(l > 0.0, m_ref[:] + jnp.log(safe_l), -jnp.inf)
        lse_ref[0, 0] = lse  # (block_q, 1)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_head_dim(d: int) -> int:
    """Head-dim padding for kernel blocks. d<=64 stays at 64: Mosaic
    handles 64-lane blocks natively, and padding to 128 doubles the HBM
    traffic and MXU work of every matmul — SDXL UNet attention is d=64
    (the reference runs it through xformers, train_sdxl_img2img_llm.py:230).
    Larger dims round to 128 (LLaMA d=128, ViT-bigG d=104 -> 128)."""
    return 64 if d <= 64 else _round_up(d, 128)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_kv", "interpret"),
)
def _flash_fwd(
    q,
    k,
    v,
    q_start,
    kv_len,
    *,
    causal: bool,
    scale: float,
    block_q: int,
    block_kv: int,
    interpret: bool,
):
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    group = hq // hkv

    sq_p = _round_up(sq, block_q)
    skv_p = _round_up(skv, block_kv)
    d_p = _pad_head_dim(d)
    if sq_p != sq or d_p != d:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, d_p - d)))
    if skv_p != skv or d_p != d:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, d_p - d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, d_p - d)))

    grid = (b, hq, sq_p // block_q, skv_p // block_kv)

    kernel = functools.partial(
        _flash_fwd_kernel,
        scale=scale,
        causal=causal,
        block_q=block_q,
        block_kv=block_kv,
        sq=sq,
        skv=skv,
    )

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, block_q, d_p), lambda b, h, iq, ik, *_: (b, h, iq, 0)
                ),
                pl.BlockSpec(
                    (1, 1, block_kv, d_p),
                    lambda b, h, iq, ik, *_, g=group: (b, h // g, ik, 0),
                ),
                pl.BlockSpec(
                    (1, 1, block_kv, d_p),
                    lambda b, h, iq, ik, *_, g=group: (b, h // g, ik, 0),
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (1, 1, block_q, d_p), lambda b, h, iq, ik, *_: (b, h, iq, 0)
                ),
                pl.BlockSpec(
                    (1, 1, block_q, 1), lambda b, h, iq, ik, *_: (b, h, iq, 0)
                ),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, d_p), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hq, sq_p, d_p), q.dtype),
            jax.ShapeDtypeStruct((b, hq, sq_p, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * sq_p * skv_p * d_p,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * hq * sq_p * skv_p,
        ),
        interpret=interpret,
    )(q_start, kv_len, q, k, v)

    if sq_p != sq or d_p != d:
        out = out[:, :, :sq, :d]
    return out, lse  # lse stays padded (sq_p) for the backward kernels


# ---------------------------------------------------------------------------
# Pallas TPU kernels (backward): standard flash-attention two-pass scheme.
#
#   D_i  = rowsum(do_i * o_i)
#   P_ij = exp(s_ij - lse_i), s_ij = scale * q_i.k_j (masked)
#   dv_j = sum_i P_ij do_i
#   ds   = P * (do V^T - D)
#   dq_i = scale * sum_j ds_ij k_j ;  dk_j = scale * sum_i ds_ij q_i
# ---------------------------------------------------------------------------


def _flash_bwd_dq_kernel(
    q_start_ref, kv_len_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_acc,
    *, scale, causal, block_q, block_kv, sq,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q_start = q_start_ref[b]
    kv_len = kv_len_ref[b]
    q_pos = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
    k_pos = ik * block_kv + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)

    block_k_min = ik * block_kv
    visible = block_k_min < kv_len
    if causal:
        q_max = iq * block_q + block_q - 1
        visible = jnp.logical_and(visible, block_k_min <= q_start + q_max)

    @pl.when(visible)
    def _compute():
        # native-dtype MXU inputs, f32 accumulation (see _flash_fwd_kernel)
        qb = q_ref[0, 0]
        kb = k_ref[0, 0]
        s = scale * jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        mask = k_pos < kv_len
        if causal:
            mask = jnp.logical_and(mask, k_pos <= q_start + q_pos)
        lse = lse_ref[0, 0]  # (block_q, 1)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dob = do_ref[0, 0]
        vb = v_ref[0, 0]
        dp = jax.lax.dot_general(
            dob, vb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta_ref[0, 0])).astype(kb.dtype)
        dq_acc[:] += scale * jax.lax.dot_general(
            ds, kb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_start_ref, kv_len_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, scale, causal, block_q, block_kv, sq,
):
    b = pl.program_id(0)
    ik = pl.program_id(2)
    iq = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q_start = q_start_ref[b]
    kv_len = kv_len_ref[b]
    q_pos = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
    k_pos = ik * block_kv + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)

    block_k_min = ik * block_kv
    visible = block_k_min < kv_len
    if causal:
        # this kv block only receives grads from q rows with
        # q_start + q >= k_min; the max q row in this tile is:
        q_max = iq * block_q + block_q - 1
        visible = jnp.logical_and(visible, block_k_min <= q_start + q_max)

    @pl.when(visible)
    def _compute():
        # native-dtype MXU inputs, f32 accumulation (see _flash_fwd_kernel)
        qb = q_ref[0, 0]
        kb = k_ref[0, 0]
        s = scale * jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        mask = k_pos < kv_len
        if causal:
            mask = jnp.logical_and(mask, k_pos <= q_start + q_pos)
        # padded q rows must contribute nothing
        mask = jnp.logical_and(mask, q_pos < sq)
        lse = lse_ref[0, 0]  # (block_q, 1)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dob = do_ref[0, 0]
        vb = v_ref[0, 0]
        # dv += P^T do
        dv_acc[:] += jax.lax.dot_general(
            p.astype(dob.dtype), dob, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            dob, vb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta_ref[0, 0])).astype(qb.dtype)
        # dk += ds^T q
        dk_acc[:] += scale * jax.lax.dot_general(
            ds, qb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_kv", "interpret"),
)
def _flash_bwd(
    q, k, v, out, lse, g, q_start, kv_len,
    *, causal, scale, block_q, block_kv, interpret,
):
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    group = hq // hkv

    sq_p = _round_up(sq, block_q)
    skv_p = _round_up(skv, block_kv)
    d_p = _pad_head_dim(d)

    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
    )  # (b, hq, sq, 1)

    def pad_q(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, sq_p - sq), (0, d_p - d)))

    def pad_kv(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, skv_p - skv), (0, d_p - d)))

    qp, gp = pad_q(q), pad_q(g)
    kp, vp = pad_kv(k), pad_kv(v)
    delta_p = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    # lse comes padded from the forward

    qspec = pl.BlockSpec((1, 1, block_q, d_p), lambda b, h, i, j, *_: (b, h, i, 0))
    qrow = pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j, *_: (b, h, i, 0))
    kspec = pl.BlockSpec(
        (1, 1, block_kv, d_p), lambda b, h, i, j, *_, gr=group: (b, h // gr, j, 0)
    )

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, scale=scale, causal=causal,
            block_q=block_q, block_kv=block_kv, sq=sq,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, hq, sq_p // block_q, skv_p // block_kv),
            in_specs=[qspec, kspec, kspec, qspec, qrow, qrow],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, d_p), lambda b, h, i, j, *_: (b, h, i, 0)
            ),
            scratch_shapes=[pltpu.VMEM((block_q, d_p), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, sq_p, d_p), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_start, kv_len, qp, kp, vp, gp, lse, delta_p)

    # dk/dv computed per q-head then reduced over the GQA group
    qspec2 = pl.BlockSpec((1, 1, block_q, d_p), lambda b, h, j, i, *_: (b, h, i, 0))
    qrow2 = pl.BlockSpec((1, 1, block_q, 1), lambda b, h, j, i, *_: (b, h, i, 0))
    kspec2 = pl.BlockSpec(
        (1, 1, block_kv, d_p), lambda b, h, j, i, *_, gr=group: (b, h // gr, j, 0)
    )
    kout2 = pl.BlockSpec((1, 1, block_kv, d_p), lambda b, h, j, i, *_: (b, h, j, 0))

    dk_full, dv_full = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=scale, causal=causal,
            block_q=block_q, block_kv=block_kv, sq=sq,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, hq, skv_p // block_kv, sq_p // block_q),
            in_specs=[qspec2, kspec2, kspec2, qspec2, qrow2, qrow2],
            out_specs=(kout2, kout2),
            scratch_shapes=[
                pltpu.VMEM((block_kv, d_p), jnp.float32),
                pltpu.VMEM((block_kv, d_p), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hq, skv_p, d_p), k.dtype),
            jax.ShapeDtypeStruct((b, hq, skv_p, d_p), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_start, kv_len, qp, kp, vp, gp, lse, delta_p)

    dq = dq[:, :, :sq, :d]
    dk_full = dk_full[:, :, :skv, :d]
    dv_full = dv_full[:, :, :skv, :d]
    if group > 1:
        dk_full = dk_full.reshape(b, hkv, group, skv, d).sum(axis=2)
        dv_full = dv_full.reshape(b, hkv, group, skv, d).sum(axis=2)
    return dq, dk_full.astype(k.dtype), dv_full.astype(v.dtype)


# ---------------------------------------------------------------------------
# Public API with custom VJP.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9)
)
def _flash_attention(q, k, v, q_start, kv_len, causal, scale, block_q, block_kv, interpret):
    out, _ = _flash_fwd(
        q, k, v, q_start, kv_len,
        causal=causal, scale=scale, block_q=block_q, block_kv=block_kv,
        interpret=interpret,
    )
    return out


def _flash_attention_fwd(q, k, v, q_start, kv_len, causal, scale, block_q, block_kv, interpret):
    out, lse = _flash_fwd(
        q, k, v, q_start, kv_len,
        causal=causal, scale=scale, block_q=block_q, block_kv=block_kv,
        interpret=interpret,
    )
    return out, (q, k, v, out, lse, q_start, kv_len)


def _flash_attention_bwd(causal, scale, block_q, block_kv, interpret, res, g):
    q, k, v, out, lse, q_start, kv_len = res
    dq, dk, dv = _flash_bwd(
        q, k, v, out, lse, g, q_start, kv_len,
        causal=causal, scale=scale, block_q=block_q, block_kv=block_kv,
        interpret=interpret,
    )
    return dq, dk, dv, None, None


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    q_start: Optional[jax.Array] = None,
    kv_len: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    # Defaults from on-chip sweeps (v5e). d=128 (seq 1280): 256x512 runs
    # 2.1x faster than 128x128 and 2.8x faster than the XLA path; 512x512
    # exceeds the 16MB VMEM scoped limit. d<=64 (SDXL UNet shapes): blocks
    # are half the VMEM, so 1024x1024 fits and lifts seq-4096 attention
    # from 21 to 31 TF/s (~2x the XLA path). None -> resolved per d below.
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    implementation: str = "auto",
) -> jax.Array:
    """Multi-head attention. See module docstring for the mask rule.

    implementation: 'auto' (Pallas on TPU, XLA elsewhere), 'pallas',
    'pallas_interpret', or 'xla'.
    """
    b, hq, sq, d = q.shape
    _, hkv, skv, _ = k.shape
    if hq % hkv != 0:
        raise ValueError(f"q heads {hq} not a multiple of kv heads {hkv}")
    if k.shape != v.shape:
        raise ValueError(f"k/v shape mismatch: {k.shape} vs {v.shape}")
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))
    if block_q is None:
        block_q = 1024 if d <= 64 else 256
    if block_kv is None:
        block_kv = 1024 if d <= 64 else 512

    if implementation == "auto":
        # NB: must not inspect q.devices() — this runs under tracing.
        # SEED_STORY_ATTN_IMPL overrides (escape hatch for debugging).
        import os

        implementation = os.environ.get("SEED_STORY_ATTN_IMPL") or (
            "pallas" if jax.default_backend() == "tpu" else "xla"
        )

    if implementation == "xla":
        return mha_reference(
            q, k, v, causal=causal, q_start=q_start, kv_len=kv_len, scale=scale
        )

    q_start_a, kv_len_a = _normalize_lens(b, sq, skv, q_start, kv_len)
    interpret = implementation == "pallas_interpret"
    return _flash_attention(
        q, k, v, q_start_a, kv_len_a, causal, float(scale),
        min(block_q, _round_up(sq, 128)), min(block_kv, _round_up(skv, 128)),
        interpret,
    )
