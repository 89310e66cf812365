"""Pallas TPU kernel for the batched Gotoh forward DP.

Layout strategy (the speed-of-light shape for this recurrence):

  * a grid step processes ONE DP row of a TILE of BT problems at once:
    the working set is [BT, L2p+1] f32 — BT=8..32 fills the 8x128 VPU
    tiles; per-step compute is pure elementwise work plus one in-row
    max-plus prefix scan done as log2(L) masked rolls.
  * DP state (A/GA/GB rows) lives in VMEM scratch and persists across
    the sequential grid; match rows and per-row penalty scalars stream
    HBM->VMEM via the implicit pipeline; packed decision rows stream out.
  * everything row-invariant (gap-extension prefix sums for the scan
    transform, shifted penalty vectors, the leading-gap init row) is
    precomputed once outside the kernel — the inner loop's only
    cross-lane operations are one stacked state roll, the cummax scan,
    and the decision shifts.
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

# decision encodings
#   A-cell (bits 0-1): 0 = diagonal from A, 1 = from GA, 2 = from GB
#   GA-cell (bit 2):   set = extend (from GA), clear = open (from A)
#   GB-cell (bit 3):   set = extend (from GB), clear = open (from A)
DEC_A_MASK = 3
DEC_GA_EXT = 4
DEC_GB_EXT = 8


def _cummax_axis1(x, n):
    """In-row prefix max via log-step masked rolls."""
    k = 1
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    while k < n:
        rolled = pltpu.roll(x, k, axis=1)
        x = jnp.maximum(x, jnp.where(idx >= k, rolled, NEG))
        k *= 2
    return x


def _kernel(lab_ref, match_ref, rowpen_ref, colpen_ref, ga0_ref,
            dec_ref, score_ref, state_ref,
            S_ref, *, L2p, L1p, with_dec):
    """colpen_ref packs row-invariant column-side vectors [BT, 8, W]:
    0 goB, 1 geB, 2 tgeB, 3 C_norm, 4 C_term, 5 goB_next, 6 tgeB_next,
    7 unused.  rowpen_ref streams per-row scalars [1, BT, 4]:
    goA_i, geA_i, tgeA_i, goA_prev."""
    i = pl.program_id(1)
    BT = S_ref.shape[1]
    W = L2p + 1

    la = lab_ref[:, 0:1]
    lb = lab_ref[:, 1:2]
    cols = jax.lax.broadcasted_iota(jnp.int32, (BT, W), 1)
    col_valid = cols <= lb
    col_pos = cols >= 1

    goB = colpen_ref[:, 0, :]
    geB = colpen_ref[:, 1, :]
    tgeB = colpen_ref[:, 2, :]
    C_norm = colpen_ref[:, 3, :]
    C_term = colpen_ref[:, 4, :]
    goB_next = colpen_ref[:, 5, :]
    tgeB_next = colpen_ref[:, 6, :]

    @pl.when(i == 0)
    def _init():
        S_ref[0] = jnp.where(cols == 0, 0.0, NEG)   # A row 0
        S_ref[1] = ga0_ref[:, :]                    # GA row 0 (precomputed)
        S_ref[2] = jnp.full((BT, W), NEG)           # GB row 0

    row = i + 1
    row_valid = row <= la
    is_last_row = row == la

    goA_i = rowpen_ref[0, :, 0:1]
    geA_i = rowpen_ref[0, :, 1:2]
    tgeA_i = rowpen_ref[0, :, 2:3]
    goA_prev = rowpen_ref[0, :, 3:4]

    A_prev = S_ref[0]
    GA_prev = S_ref[1]
    GB_prev = S_ref[2]

    m_row = match_ref[0]  # [BT, L2p]

    # one stacked roll produces every j-1 view of the previous row
    stacked = jnp.stack([A_prev, GA_prev, GB_prev, goB], axis=0)
    shifted = pltpu.roll(stacked, 1, axis=2)
    A_prev_s = jnp.where(col_pos, shifted[0], NEG)
    GA_prev_s = jnp.where(col_pos, shifted[1], NEG)
    GB_prev_s = jnp.where(col_pos, shifted[2], NEG)
    goB_s = jnp.where(col_pos, shifted[3], 0.0)

    # --- A row ---
    m_s = jnp.concatenate([jnp.zeros((BT, 1), jnp.float32), m_row], axis=1)
    diagA = A_prev_s
    diagGA = GA_prev_s + goB_s
    diagGB = GB_prev_s + goA_prev
    best01 = jnp.maximum(diagA, diagGA)
    # reference MAX3 keeps the LATER operand on ties (a > b ? a : b)
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

    # --- GA row (in-row scan); row-invariant prefix sums / shifted
    # vectors are precomputed, terminal-row variant selected by mask ---
    ge_row = jnp.where(is_last_row, tgeB, geB)
    go_row = jnp.where(is_last_row, tgeB, goB)
    C = jnp.where(is_last_row, C_term, C_norm)
    go_next = jnp.where(is_last_row, tgeB_next, goB_next)
    C_next = pltpu.roll(C, W - 1, axis=1)
    u = A_row + go_next - C_next
    u = jnp.where(cols < lb, u, NEG)  # only k < lb can open
    cm = _cummax_axis1(u, W)
    cm_s = jnp.where(col_pos, pltpu.roll(cm, 1, axis=1), NEG)
    GA_row = jnp.where(col_valid & col_pos, cm_s + C, NEG)

    if with_dec:
        ga_ext = pltpu.roll(GA_row, 1, axis=1) + ge_row
        ga_open = pltpu.roll(A_row, 1, axis=1) + go_row
        dec_ga = jnp.where(col_pos & (ga_ext > ga_open), 1, 0)
        dec = jnp.where(col_pos, dec_a, 0) | (dec_ga << 2) | (dec_gb << 3)
        dec_ref[0] = dec.astype(jnp.int32)

    A_new = jnp.where(row_valid, A_row, A_prev)
    GA_new = jnp.where(row_valid, GA_row, GA_prev)
    GB_new = jnp.where(row_valid, GB_row, GB_prev)
    S_ref[0] = A_new
    S_ref[1] = GA_new
    S_ref[2] = GB_new

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
    Returns dec [B, L1p, L2p+1] int32 (row r = DP row r+1), score [B],
    end_state [B]."""
    B, L1p, L2p = match.shape
    assert B % bt == 0, (B, bt)
    W = L2p + 1
    lab = jnp.stack([la, lb], axis=1).astype(jnp.int32)

    cols = jnp.arange(W)[None, :]
    goB = pens_cols[:, 0, :]
    geB = pens_cols[:, 1, :]
    tgeB = pens_cols[:, 2, :]

    # row-invariant precomputations (on device, once per call)
    zero0 = cols == 0
    C_norm = jnp.cumsum(jnp.where(zero0, 0.0, geB), axis=1)
    C_term = jnp.cumsum(jnp.where(zero0, 0.0, tgeB), axis=1)
    goB_next = jnp.roll(goB, -1, axis=1)
    tgeB_next = jnp.roll(tgeB, -1, axis=1)
    col_valid = cols <= lb[:, None]
    ga0 = jnp.where((cols >= 1) & col_valid, C_term, NEG).astype(jnp.float32)

    colpen = jnp.stack([goB, geB, tgeB, C_norm, C_term, goB_next, tgeB_next,
                        jnp.zeros_like(goB)], axis=1)  # [B, 8, W]

    # per-row scalar stream [L1p, B, 4]: goA_i, geA_i, tgeA_i, goA_prev
    goA = pens_rows[:, 0, :]
    geA = pens_rows[:, 1, :]
    tgeA = pens_rows[:, 2, :]
    rowpen = jnp.stack([goA[:, 1:], geA[:, 1:], tgeA[:, 1:], goA[:, :L1p]],
                       axis=2)  # [B, L1p, 4]
    rowpen = jnp.transpose(rowpen, (1, 0, 2)).astype(jnp.float32)

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
            pl.BlockSpec((1, bt, 4), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 8, W), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, W), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bt, W), dec_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((dec_rows, B, W), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, bt, W), jnp.float32),
        ],
        interpret=interpret,
    )(lab, match_t, rowpen, colpen, ga0)
    if with_dec:
        dec = jnp.transpose(dec, (1, 0, 2))
    return dec, score[:, 0], state[:, 0]
