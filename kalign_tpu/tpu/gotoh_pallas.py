"""Pallas TPU kernel for the batched Gotoh forward DP.

Layout strategy (the speed-of-light shape for this recurrence):

  * a grid step processes ONE DP row of a TILE of BT problems at once:
    the working set is [BT, L2p+1] f32 — BT=8..32 fills the 8x128 VPU
    tiles; per-step compute is pure elementwise work plus one in-row
    max-plus prefix scan done as log2(L) masked rolls.
  * DP state (A/GA/GB rows) lives in VMEM scratch and persists across
    the sequential grid; match rows stream HBM->VMEM via the implicit
    pipeline; the packed decision rows stream back out.
  * per-problem lengths (la, lb) ride along as VMEM int32; terminal-gap
    handling is fully masked (no data-dependent control flow).

The math matches tpu/gotoh.py (same recurrences, same tie preferences);
see that module for the derivation and reference citations.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38  # python literal: avoids captured-constant tracing in kernels


def _cummax_axis1(x, n):
    """In-row prefix max via log-step masked rolls."""
    k = 1
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    while k < n:
        rolled = pltpu.roll(x, k, axis=1)
        x = jnp.maximum(x, jnp.where(idx >= k, rolled, NEG))
        k *= 2
    return x


def _cumsum_axis1(x, n):
    """In-row prefix sum via log-step masked rolls (Mosaic-friendly)."""
    k = 1
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    while k < n:
        rolled = pltpu.roll(x, k, axis=1)
        x = x + jnp.where(idx >= k, rolled, 0.0)
        k *= 2
    return x


def _kernel(lab_ref, match_ref, pc_ref, pr_ref,
            dec_ref, score_ref, state_ref,
            A_ref, GA_ref, GB_ref, *, L2p, L1p, with_dec=True):
    i = pl.program_id(1)  # DP row - 1 (grid row index 0 -> DP row 1)
    BT = A_ref.shape[0]
    W = L2p + 1

    la = lab_ref[:, 0:1].astype(jnp.int32)       # [BT, 1]
    lb = lab_ref[:, 1:2].astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BT, W), 1)
    col_valid = cols <= lb
    col_pos = cols >= 1

    goB = pc_ref[:, 0, :]
    geB = pc_ref[:, 1, :]
    tgeB = pc_ref[:, 2, :]

    @pl.when(i == 0)
    def _init():
        # row 0: A[0]=0 at col 0; GA leading terminal run; GB = -inf
        tge0 = jnp.where(cols == 0, 0.0, tgeB)
        csum = _cumsum_axis1(tge0, W)
        GA_ref[:, :] = jnp.where(col_pos & col_valid, csum, NEG)
        A_ref[:, :] = jnp.where(cols == 0, 0.0, NEG)
        GB_ref[:, :] = jnp.full((BT, W), NEG)

    row = i + 1  # DP row index (1-based)
    row_valid = row <= la                        # [BT, 1]
    is_last_row = row == la

    # per-row penalties of the row side: pr_ref [BT, 3, L1p+1].
    # Dynamic lane indexing is not allowed in Mosaic; use one-hot
    # contractions over the row axis instead.
    rws = jax.lax.broadcasted_iota(jnp.int32, (BT, L1p + 1), 1)
    at_row = rws == row
    at_prev = rws == i

    def row_pick(chan, mask):
        return jnp.sum(jnp.where(mask, pr_ref[:, chan, :], 0.0), axis=1,
                       keepdims=True)

    goA_i = row_pick(0, at_row)
    geA_i = row_pick(1, at_row)
    tgeA_i = row_pick(2, at_row)
    goA_prev = row_pick(0, at_prev)

    A_prev = A_ref[:, :]
    GA_prev = GA_ref[:, :]
    GB_prev = GB_ref[:, :]

    m_row = match_ref[0]                         # [BT, L2p]

    # --- A row ---
    # shifted (j-1) views of the previous row
    idx_pos = cols >= 1
    A_prev_s = jnp.where(idx_pos, pltpu.roll(A_prev, 1, axis=1), NEG)
    GA_prev_s = jnp.where(idx_pos, pltpu.roll(GA_prev, 1, axis=1), NEG)
    GB_prev_s = jnp.where(idx_pos, pltpu.roll(GB_prev, 1, axis=1), NEG)
    goB_s = jnp.where(idx_pos, pltpu.roll(goB, 1, axis=1), 0.0)
    m_s = jnp.concatenate([jnp.zeros((BT, 1), jnp.float32), m_row], axis=1)

    diagA = A_prev_s
    diagGA = GA_prev_s + goB_s
    diagGB = GB_prev_s + goA_prev
    best01 = jnp.maximum(diagA, diagGA)
    dec_a = jnp.where(diagGA >= diagA, 1, 0)
    dec_a = jnp.where(diagGB >= best01, 2, dec_a)
    A_row = jnp.maximum(best01, diagGB) + m_s
    A_row = jnp.where(col_valid & col_pos, A_row, NEG)

    # --- GB row (prev-row only) ---
    is_term_col = (cols == 0) | (cols == lb)
    ge_eff = jnp.where(is_term_col, tgeA_i, geA_i)
    go_eff = jnp.where(is_term_col, tgeA_i, goA_i)
    gb_e = GB_prev + ge_eff
    gb_o = A_prev + go_eff
    GB_row = jnp.where(col_valid, jnp.maximum(gb_e, gb_o), NEG)
    dec_gb = (gb_e > gb_o).astype(jnp.int32)

    # --- GA row (in-row scan) ---
    ge_row = jnp.where(is_last_row, tgeB, geB)
    go_row = jnp.where(is_last_row, tgeB, goB)
    C = _cumsum_axis1(jnp.where(cols == 0, 0.0, ge_row), W)
    # u[k] = A_row[k] + go[k+1] - C[k+1]; align u at position k
    go_next = pltpu.roll(go_row, W - 1, axis=1)  # circular left-by-1
    C_next = pltpu.roll(C, W - 1, axis=1)
    u = A_row + go_next - C_next
    u = jnp.where(cols < lb, u, NEG)  # only k < lb can open
    cm = _cummax_axis1(u, W)
    cm_s = jnp.where(idx_pos, pltpu.roll(cm, 1, axis=1), NEG)
    GA_row = jnp.where(col_valid & col_pos, cm_s + C, NEG)
    ga_ext = pltpu.roll(GA_row, 1, axis=1) + ge_row
    ga_open = pltpu.roll(A_row, 1, axis=1) + go_row
    dec_ga = jnp.where(idx_pos & (ga_ext > ga_open), 1, 0)

    if with_dec:
        dec = jnp.where(col_pos, dec_a, 0) | (dec_ga << 2) | (dec_gb << 3)
        dec_ref[0] = dec.astype(jnp.int32)

    A_new = jnp.where(row_valid, A_row, A_prev)
    GA_new = jnp.where(row_valid, GA_row, GA_prev)
    GB_new = jnp.where(row_valid, GB_row, GB_prev)
    A_ref[:, :] = A_new
    GA_ref[:, :] = GA_new
    GB_ref[:, :] = GB_new

    @pl.when(i == L1p - 1)
    def _finish():
        at_end = cols == lb
        pick = lambda r: jnp.max(jnp.where(at_end, r, NEG), axis=1)
        end_a = pick(A_new)
        end_ga = pick(GA_new)
        end_gb = pick(GB_new)
        score = jnp.maximum(jnp.maximum(end_a, end_ga), end_gb)
        st = jnp.where(end_ga > end_a,
                       jnp.where(end_gb > end_ga, 2, 1),
                       jnp.where(end_gb > end_a, 2, 0))
        score_ref[:, 0] = score
        state_ref[:, 0] = st.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("bt", "interpret", "with_dec"))
def gotoh_forward_pallas(match, pens_cols, pens_rows, la, lb, bt=8,
                         interpret=False, with_dec=True):
    """match [B, L1p, L2p] f32; pens_cols [B, 3, L2p+1];
    pens_rows [B, 3, L1p+1]; la, lb [B] int32.
    Returns dec [B, L1p, L2p+1] int32, score [B], end_state [B]."""
    B, L1p, L2p = match.shape
    assert B % bt == 0, (B, bt)
    lab = jnp.stack([la, lb], axis=1).astype(jnp.int32)
    # row-major streaming layout: grid steps read [1, bt, L2p] blocks whose
    # trailing dims satisfy the TPU (8, 128) tiling rule
    match_t = jnp.transpose(match, (1, 0, 2))

    grid = (B // bt, L1p)
    kernel = functools.partial(_kernel, L2p=L2p, L1p=L1p, with_dec=with_dec)
    dec_rows = L1p if with_dec else 1
    dec_map = (lambda b, i: (i, b, 0)) if with_dec else (lambda b, i: (0, b, 0))
    dec, score, state = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, 2), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, L2p), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 3, L2p + 1), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 3, L1p + 1), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bt, L2p + 1), dec_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((dec_rows, B, L2p + 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, L2p + 1), jnp.float32),
            pltpu.VMEM((bt, L2p + 1), jnp.float32),
            pltpu.VMEM((bt, L2p + 1), jnp.float32),
        ],
        interpret=interpret,
    )(lab, match_t, pens_cols, pens_rows)
    return jnp.transpose(dec, (1, 0, 2)), score[:, 0], state[:, 0]
