"""Pallas TPU kernel for the batched bit-parallel (Myers) edit distance.

Same semantics as tpu/bpm.py (the exact re-expression of the
reference's blocked 64-bit kernel, lib/src/bpm.c:356-580) with the
kernel-language advantages XLA cannot express:

  * problems live on the (sublane, lane) axes as [8, B/8] tiles, so
    every 64-bit-block operation is one fully-packed vector register
    op; the 16-block carry chain is a STATIC python unroll whose
    intermediates never leave registers (the XLA version's lax.scan
    materialises every [NBLK, B] temp);
  * the per-character Eq lookup is 13 masked selects against the
    VMEM-resident Peq table (no gather);
  * R text characters advance per grid step, amortising pipeline
    bookkeeping; text codes stream HBM->VMEM.

Bit-identical to tpu/bpm.py / the native kernel (differential-tested).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kalign_tpu.tpu.bpm import SIGMA, WORD, MAX_PATTERN, NBLK

_u32 = jnp.uint32
# numpy scalars: python/numpy literals avoid captured-constant tracing
# inside pallas kernels
_ONE = np.uint32(1)
_ZERO = np.uint32(0)
_ONES = np.uint32(0xFFFFFFFF)
_HIGH = np.uint32(0x80000000)

SL = 8  # sublane tile height; problems are [SL, bt // SL]


def _add64(a_lo, a_hi, b_lo, b_hi):
    lo = a_lo + b_lo
    carry = (lo < a_lo).astype(_u32)
    hi = a_hi + b_hi + carry
    return lo, hi


def _shl1(lo, hi):
    return lo << 1, (hi << 1) | (lo >> 31)


def _advance(eq_lo, eq_hi, p_lo, p_hi, mv_lo, mv_hi, h_in):
    """One 64-bit Myers block advance; h_in in {-1,0,1} int32."""
    xv_lo = eq_lo | mv_lo
    xv_hi = eq_hi | mv_hi
    eq_lo = jnp.where(h_in < 0, eq_lo | _ONE, eq_lo)
    t_lo = eq_lo & p_lo
    t_hi = eq_hi & p_hi
    s_lo, s_hi = _add64(t_lo, t_hi, p_lo, p_hi)
    xh_lo = (s_lo ^ p_lo) | eq_lo
    xh_hi = (s_hi ^ p_hi) | eq_hi
    ph_lo = mv_lo | ~(xh_lo | p_lo)
    ph_hi = mv_hi | ~(xh_hi | p_hi)
    mh_lo = p_lo & xh_lo
    mh_hi = p_hi & xh_hi
    h_out = ((ph_hi & _HIGH) != 0).astype(jnp.int32) - \
        ((mh_hi & _HIGH) != 0).astype(jnp.int32)
    ph_lo, ph_hi = _shl1(ph_lo, ph_hi)
    mh_lo, mh_hi = _shl1(mh_lo, mh_hi)
    mh_lo = jnp.where(h_in < 0, mh_lo | _ONE, mh_lo)
    ph_lo = jnp.where(h_in > 0, ph_lo | _ONE, ph_lo)
    new_p_lo = mh_lo | ~(xv_lo | ph_lo)
    new_p_hi = mh_hi | ~(xv_hi | ph_hi)
    new_m_lo = ph_lo & xv_lo
    new_m_hi = ph_hi & xv_hi
    return new_p_lo, new_p_hi, new_m_lo, new_m_hi, h_out


def _kernel(meta_ref, text_ref, peq_ref,
            out_ref,
            P_ref, M_ref, SC_ref, Y_ref, K_ref,
            *, R, T_steps, LN, nblk):
    """meta_ref [4, SL, LN] i32: n, steps_needed, maxd, b_max.
    text_ref streams [R, SL, LN] i32 text codes (one char per step per
    problem, -1 beyond n).  peq_ref [SIGMA, 2 * nblk, SL, LN] u32
    (lo at block b -> row 2b, hi -> row 2b+1).
    Scratch: P_ref/M_ref [2 * nblk, SL, LN] u32 (lo/hi interleaved),
    SC_ref [nblk, SL, LN] i32, Y_ref [1, SL, LN], K_ref [1, SL, LN].

    nblk is STATIC — the caller sizes it to the batch's longest pattern
    (ceil(max m / 64)); a 150-nt DNA anchor run unrolls 3 blocks
    instead of MAX_PATTERN's 16.  Within a grid step the whole block
    state lives in registers: scratch is read once and written once
    per R text characters."""
    i = pl.program_id(1)

    steps_needed = meta_ref[0, 1]
    maxd = meta_ref[0, 2]
    b_max = meta_ref[0, 3]

    @pl.when(i == 0)
    def _init():
        y0 = b_max - 1
        for b in range(nblk):
            act = b <= y0
            P_ref[2 * b] = jnp.where(act, _ONES, _ZERO)
            P_ref[2 * b + 1] = jnp.where(act, _ONES, _ZERO)
            M_ref[2 * b] = jnp.zeros_like(y0, _u32)
            M_ref[2 * b + 1] = jnp.zeros_like(y0, _u32)
            SC_ref[b] = jnp.where(act, (b + 1) * WORD, 0).astype(jnp.int32)
        Y_ref[0] = y0
        K_ref[0] = maxd

    # hoist block state into registers for the whole R-char step
    P = [(P_ref[2 * b], P_ref[2 * b + 1]) for b in range(nblk)]
    M = [(M_ref[2 * b], M_ref[2 * b + 1]) for b in range(nblk)]
    SC = [SC_ref[b] for b in range(nblk)]
    y = Y_ref[0]
    k = K_ref[0]

    for r in range(R):
        step = i * R + r
        valid = step < steps_needed
        c = text_ref[0, r, 0]                # [SL, LN] i32 (0 beyond n)
        hits = [c == s for s in range(SIGMA)]  # shared across blocks

        h = jnp.zeros_like(y)
        sc_y = jnp.zeros_like(y)             # score at block y (tracked)
        carry_at_y = jnp.zeros_like(y)       # h entering block y+1
        eq_lo_next = jnp.zeros_like(y, _u32)  # Eq of block y+1
        eq_hi_next = jnp.zeros_like(y, _u32)
        for b in range(nblk):
            # Eq for this block via SIGMA masked selects (no gather)
            eq_lo = jnp.zeros_like(y, _u32)
            eq_hi = jnp.zeros_like(y, _u32)
            for s in range(SIGMA):
                eq_lo = jnp.where(hits[s], peq_ref[0, s, 2 * b], eq_lo)
                eq_hi = jnp.where(hits[s], peq_ref[0, s, 2 * b + 1], eq_hi)
            active = (b <= y) & valid
            pl_, ph_, ml_, mh_, h_out = _advance(
                eq_lo, eq_hi, P[b][0], P[b][1], M[b][0], M[b][1], h)
            P[b] = (jnp.where(active, pl_, P[b][0]),
                    jnp.where(active, ph_, P[b][1]))
            M[b] = (jnp.where(active, ml_, M[b][0]),
                    jnp.where(active, mh_, M[b][1]))
            sc_b = jnp.where(active, SC[b] + h_out, SC[b])
            SC[b] = sc_b
            is_y = b == y
            sc_y = jnp.where(is_y, sc_b, sc_y)
            carry_at_y = jnp.where(is_y, jnp.where(active, h_out, h),
                                   carry_at_y)
            if b > 0:
                was_next = b == (y + 1)
                eq_lo_next = jnp.where(was_next, eq_lo, eq_lo_next)
                eq_hi_next = jnp.where(was_next, eq_hi, eq_hi_next)
            h = jnp.where(active, h_out, h)

        # adaptive window grow (bpm.c:510-567); block y (== nblk-1 cap)
        # reuses its own Eq when y cannot grow — masked out anyway
        yb = jnp.minimum(y + 1, nblk - 1)
        at_cap = y >= nblk - 1
        eq_lo_next = jnp.where(at_cap, _ZERO, eq_lo_next)
        eq_hi_next = jnp.where(at_cap, _ZERO, eq_hi_next)
        grow = valid & (sc_y - carry_at_y <= maxd) & (y < b_max - 1) & \
            (((eq_lo_next & _ONE) != 0) | (carry_at_y < 0))
        gpl, gph, gml, gmh, g_hout = _advance(
            eq_lo_next, eq_hi_next,
            jnp.full_like(eq_lo_next, _ONES), jnp.full_like(eq_lo_next, _ONES),
            jnp.zeros_like(eq_lo_next), jnp.zeros_like(eq_lo_next),
            carry_at_y)
        g_score = sc_y + WORD - carry_at_y + g_hout
        for b in range(1, nblk):
            gmask = (b == yb) & grow
            P[b] = (jnp.where(gmask, gpl, P[b][0]),
                    jnp.where(gmask, gph, P[b][1]))
            M[b] = (jnp.where(gmask, gml, M[b][0]),
                    jnp.where(gmask, gmh, M[b][1]))
            SC[b] = jnp.where(gmask, g_score, SC[b])
        y_after = jnp.where(grow, yb, y)

        # retract: while score[y] >= maxd + WORD and y > 0.  The walk
        # stops at the FIRST b (descending from y) with score < thresh,
        # i.e. the LARGEST such b <= y, else 0 — one ascending pass
        # instead of the O(nblk^2) emulated while loop
        thresh = maxd + WORD
        y_ng = jnp.zeros_like(y)
        for b in range(nblk):
            ok = (b <= y_after) & (SC[b] < thresh)
            y_ng = jnp.where(ok, b, y_ng)
        y_after = jnp.where((~grow) & valid, y_ng, y_after)

        sc_final = SC[0]
        for b in range(1, nblk):
            sc_final = jnp.where(b == y_after, SC[b], sc_final)
        k = jnp.where(valid & (sc_final < k), sc_final, k)
        y = y_after

    for b in range(nblk):
        P_ref[2 * b], P_ref[2 * b + 1] = P[b]
        M_ref[2 * b], M_ref[2 * b + 1] = M[b]
        SC_ref[b] = SC[b]
    Y_ref[0] = y
    K_ref[0] = k

    @pl.when(i == T_steps - 1)
    def _finish():
        out_ref[0, 0] = k


@functools.partial(jax.jit, static_argnames=("max_steps", "bt", "interpret",
                                              "nblk"))
def bpm_batch_pallas(texts, n, patterns_peq, m, max_steps, bt=1024,
                     interpret=False, nblk=NBLK):
    """Drop-in for tpu/bpm.py::bpm_batch: texts [B, T] uint8; n [B];
    patterns_peq [B, SIGMA, NBLK, 2] u32; m [B].  Returns [B] i32.

    B must be a multiple of bt (callers pad); bt a multiple of 8.
    nblk: static block count — every m must satisfy m <= nblk * 64.
    Callers that know the batch's longest pattern (the distance stage
    does: pat_w is static) should pass ceil(max_m / 64); at 150-nt
    anchors that is a >4x cut in per-character block work."""
    B, T = texts.shape
    assert B % bt == 0 and bt % SL == 0, (B, bt)
    assert 1 <= nblk <= NBLK, nblk
    if patterns_peq.shape[2] > nblk:
        patterns_peq = patterns_peq[:, :, :nblk]
    LN = bt // SL
    n_tiles = B // bt
    R = 8
    T_steps = (max_steps + R - 1) // R
    T_pad = T_steps * R

    n = n.astype(jnp.int32)
    m = jnp.minimum(m.astype(jnp.int32), nblk * WORD)
    b_max = jnp.maximum((m + WORD - 1) // WORD, 1).astype(jnp.int32)
    W = WORD * b_max - m
    maxd = m
    steps_needed = n + W

    def tile(x):
        return x.reshape(n_tiles, SL, LN) if x.ndim == 1 else x

    meta = jnp.stack([tile(n), tile(steps_needed), tile(maxd), tile(b_max)],
                     axis=1)                        # [n_tiles, 4, SL, LN]

    # text stream [T_steps, R, n_tiles, SL, LN] i32; symbol 0 beyond n
    # (matches bpm_batch's tail semantics: the final W window steps run
    # with c=0, whose Peq row carries the beyond-m all-match bits)
    idx = jnp.arange(T_pad)
    tcodes = jnp.pad(texts.astype(jnp.int32), ((0, 0), (0, T_pad - T)),
                     constant_values=0)[:, :T_pad]
    tcodes = jnp.where(idx[None, :] < n[:, None], tcodes, 0)
    tcodes = tcodes.reshape(n_tiles, SL, LN, T_steps, R)
    tcodes = jnp.transpose(tcodes, (3, 4, 0, 1, 2))  # [T_steps, R, nt, SL, LN]

    # Peq [B, SIGMA, nblk, 2] -> [n_tiles, SIGMA, 2*nblk, SL, LN]
    peq = jnp.transpose(patterns_peq, (1, 2, 3, 0))  # [SIGMA, nblk, 2, B]
    peq = peq.reshape(SIGMA, 2 * nblk, n_tiles, SL, LN)
    peq = jnp.transpose(peq, (2, 0, 1, 3, 4))

    kernel = functools.partial(_kernel, R=R, T_steps=T_steps, LN=LN,
                               nblk=nblk)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles, T_steps),
        in_specs=[
            pl.BlockSpec((1, 4, SL, LN), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 1, SL, LN), lambda b, i: (i, 0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SIGMA, 2 * nblk, SL, LN),
                         lambda b, i: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, SL, LN), lambda b, i: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 1, SL, LN), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2 * nblk, SL, LN), _u32),   # P lo/hi
            pltpu.VMEM((2 * nblk, SL, LN), _u32),   # M lo/hi
            pltpu.VMEM((nblk, SL, LN), jnp.int32),  # score
            pltpu.VMEM((1, SL, LN), jnp.int32),     # y
            pltpu.VMEM((1, SL, LN), jnp.int32),     # k
        ],
        interpret=interpret,
    )(meta, tcodes, peq)
    return out.reshape(B)
