"""Batched bit-parallel (Myers) edit distance on device.

Exact re-expression of the reference's blocked 64-bit kernel
(lib/src/bpm.c:356-580) for the TPU:

  * TPU vector units have no 64-bit integer lanes, so each 64-bit word
    is a (lo, hi) pair of uint32 with explicit carry chaining through
    the `(Eq & P) + P` add and the <<1 shifts.
  * the adaptive active-block window (Ukkonen band) is data-dependent
    per problem; in a batched kernel every block is computed anyway, so
    the window is emulated with per-lane masks — bit-identical results
    at full vector utilization.
  * state is kept block-major [NBLK, B]; the inter-block carry chain is
    a lax.scan over the (at most 16) blocks, text positions are the
    outer fori_loop.

`bpm_batch` is vmap/jit/shard_map-friendly; the distance-matrix stage
shards the sequence axis across devices (parallel/mesh.py).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

SIGMA = 13
WORD = 64
MAX_PATTERN = 1024
NBLK = MAX_PATTERN // WORD  # 16

_u32 = jnp.uint32
_ONE = jnp.uint32(1)
_ZERO = jnp.uint32(0)
_ONES = jnp.uint32(0xFFFFFFFF)
_HIGH = jnp.uint32(0x80000000)


def _add64(a_lo, a_hi, b_lo, b_hi):
    lo = a_lo + b_lo
    carry = (lo < a_lo).astype(_u32)
    hi = a_hi + b_hi + carry
    return lo, hi


def _shl1(lo, hi):
    return lo << 1, (hi << 1) | (lo >> 31)


def build_peq(patterns: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """patterns: [B, MAX_PATTERN] uint8 codes (content beyond m ignored);
    m: [B] lengths.  Returns Peq [B, SIGMA, NBLK, 2] uint32 where
    positions >= m match every symbol (bpm.c:428-440)."""
    B = patterns.shape[0]
    idx = jnp.arange(MAX_PATTERN)
    beyond = idx[None, :] >= m[:, None]  # [B, L]
    sym = jnp.arange(SIGMA, dtype=jnp.uint8)
    hit = (patterns[:, None, :] == sym[None, :, None]) | beyond[:, None, :]
    hit = hit.reshape(B, SIGMA, NBLK, 2, 32).astype(_u32)
    weights = (_ONE << jnp.arange(32, dtype=_u32))
    return jnp.sum(hit * weights[None, None, None, None, :], axis=-1,
                   dtype=_u32)


def _advance(eq_lo, eq_hi, p_lo, p_hi, mv_lo, mv_hi, h_in):
    """One 64-bit Myers block advance (vector over lanes);
    h_in in {-1,0,1} int32."""
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


@partial(jax.jit, static_argnames=("max_steps",))
def bpm_batch(texts, n, patterns_peq, m, max_steps):
    """texts: [B, T] uint8; n: [B]; patterns_peq: [B, SIGMA, NBLK, 2];
    m: [B] (<= MAX_PATTERN).  Returns [B] int32 distances identical to
    the reference bpm_block."""
    B = texts.shape[0]
    T = texts.shape[1]

    b_max = jnp.maximum((m + WORD - 1) // WORD, 1).astype(jnp.int32)
    W = WORD * b_max - m
    maxd = m.astype(jnp.int32)
    steps_needed = n + W

    blk = jnp.arange(NBLK, dtype=jnp.int32)
    blk_col = blk[:, None]  # [NBLK, 1]

    # block-major Peq: [SIGMA, NBLK, 2, B] -> split lo/hi [SIGMA, NBLK, B]
    peq = jnp.transpose(patterns_peq, (1, 2, 3, 0))
    peq_lo = peq[:, :, 0, :]
    peq_hi = peq[:, :, 1, :]

    y0 = b_max - 1
    act0 = blk_col <= y0[None, :]
    P_lo0 = jnp.where(act0, _ONES, _ZERO)
    P_hi0 = jnp.where(act0, _ONES, _ZERO)
    M_lo0 = jnp.zeros((NBLK, B), _u32)
    M_hi0 = jnp.zeros((NBLK, B), _u32)
    score0 = jnp.where(act0, (blk_col + 1) * WORD, 0).astype(jnp.int32)

    def gather_blk(arr, idx):
        """arr [NBLK, B], idx [B] -> [B] (one-hot contraction; NBLK small)"""
        oh = blk_col == idx[None, :]
        return jnp.sum(jnp.where(oh, arr, 0), axis=0)

    def step(i, state):
        P_lo, P_hi, M_lo, M_hi, score, y, k = state
        valid = i < steps_needed
        c = jnp.where(i < n, texts[:, jnp.minimum(i, T - 1)], 0).astype(jnp.int32)
        c = jnp.where(i < n, c, 0)
        # Eq for this character: [NBLK, B]
        eq_lo = jnp.take_along_axis(
            peq_lo, c[None, None, :], axis=0)[0]
        eq_hi = jnp.take_along_axis(
            peq_hi, c[None, None, :], axis=0)[0]

        def blk_step(h_in, xs):
            b, q_lo, q_hi, p_lo, p_hi, mv_lo, mv_hi, sc = xs
            active = (b <= y) & valid
            pl, ph, ml, mh, h_out = _advance(q_lo, q_hi, p_lo, p_hi,
                                             mv_lo, mv_hi, h_in)
            out = (jnp.where(active, pl, p_lo),
                   jnp.where(active, ph, p_hi),
                   jnp.where(active, ml, mv_lo),
                   jnp.where(active, mh, mv_hi),
                   jnp.where(active, sc + h_out, sc))
            h_next = jnp.where(active, h_out, h_in)
            return h_next, out

        carry, (nP_lo, nP_hi, nM_lo, nM_hi, nscore) = jax.lax.scan(
            blk_step, jnp.zeros(B, jnp.int32),
            (blk, eq_lo, eq_hi, P_lo, P_hi, M_lo, M_hi, score))

        # adaptive window (bpm.c:510-567)
        sc_y = gather_blk(nscore, y)
        yb = jnp.minimum(y + 1, NBLK - 1)
        eq_next_lo = gather_blk(eq_lo, yb)
        grow = valid & (sc_y - carry <= maxd) & (y < b_max - 1) & \
            (((eq_next_lo & _ONE) != 0) | (carry < 0))
        g_eq_lo = eq_next_lo
        g_eq_hi = gather_blk(eq_hi, yb)
        gpl, gph, gml, gmh, g_hout = _advance(
            g_eq_lo, g_eq_hi, jnp.full(B, _ONES), jnp.full(B, _ONES),
            jnp.zeros(B, _u32), jnp.zeros(B, _u32), carry)
        gmask = (blk_col == yb[None, :]) & grow[None, :]
        nP_lo = jnp.where(gmask, gpl[None, :], nP_lo)
        nP_hi = jnp.where(gmask, gph[None, :], nP_hi)
        nM_lo = jnp.where(gmask, gml[None, :], nM_lo)
        nM_hi = jnp.where(gmask, gmh[None, :], nM_hi)
        g_score = sc_y + WORD - carry + g_hout
        nscore = jnp.where(gmask, g_score[None, :], nscore)
        y_after = jnp.where(grow, yb, y)

        # retract: while score[y] >= maxd + WORD and y > 0
        def retract(j, y_cur):
            sc = gather_blk(nscore, y_cur)
            down = (~grow) & valid & (sc >= maxd + WORD) & (y_cur > 0)
            return jnp.where(down, y_cur - 1, y_cur)
        y_after = jax.lax.fori_loop(0, NBLK, retract, y_after)

        sc_final = gather_blk(nscore, y_after)
        k = jnp.where(valid & (sc_final < k), sc_final, k)
        return nP_lo, nP_hi, nM_lo, nM_hi, nscore, y_after, k

    state = (P_lo0, P_hi0, M_lo0, M_hi0, score0, y0, maxd)
    state = jax.lax.fori_loop(0, max_steps, step, state)
    return state[-1]


def bpm_distances(texts: np.ndarray, text_lens: np.ndarray,
                  patterns: np.ndarray, pat_lens: np.ndarray) -> np.ndarray:
    """Convenience host wrapper: [B] problems -> [B] int32 distances."""
    m = jnp.minimum(jnp.asarray(pat_lens, jnp.int32), MAX_PATTERN)
    peq = build_peq(jnp.asarray(patterns), m)
    n = jnp.asarray(text_lens, jnp.int32)
    max_steps = int(np.max(text_lens) + WORD)
    out = bpm_batch(jnp.asarray(texts), n, peq, m, max_steps)
    return np.asarray(out)
