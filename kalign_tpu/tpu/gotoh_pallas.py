"""Pallas TPU kernel for the batched Gotoh forward DP.

Layout strategy (the speed-of-light shape for this recurrence):

  * a grid step processes ONE DP row of a TILE of BT problems at once:
    the working set is [BT, L2p] f32 — BT=32..128 fills the 8x128 VPU
    tiles; per-step compute is pure elementwise work plus one in-row
    max-plus prefix scan done as log2(L) masked rolls.
  * the working width is exactly L2p (callers bucket-pad L2p to a
    multiple of 128, so every row array is LANE-ALIGNED).  DP column 0
    is never materialised: its values are analytic (A[i,0]=NEG for i>0,
    GA[i,0]=NEG, GB[i,0]=cumsum of terminal row penalties) and are fed
    into the j-1 shifted views as per-row scalars.  Keeping the width
    off-by-one-free is worth ~1.6x on the VPU (a 257-wide row occupies
    three 128-lane groups; 256 occupies two).
  * DP state (A/GA/GB rows) lives in VMEM scratch and persists across
    the sequential grid; match rows and per-row penalty scalars stream
    HBM->VMEM via the implicit pipeline; packed int8 decision rows
    stream out (4 bits used — int8 quarters the HBM write traffic of
    the decision matrix, the kernel's only large output).
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


def _vmem_bytes(bt: int, W: int, R: int) -> int:
    """Exact VMEM footprint of one kernel instance: state scratch,
    resident colpen/ga0, double-buffered match-in (f32) and dec-out
    (int8) windows, and the rowpen stream whose 8-wide lane dim pads to
    128 (the dominant hidden cost for big tiles)."""
    f = 4
    return (3 * bt * W * f          # state scratch
            + 5 * bt * W * f        # colpen (resident)
            + bt * W * f            # ga0 (resident)
            + 2 * R * bt * W * f    # match in, double-buffered
            + 2 * R * bt * W        # dec out (int8), double-buffered
            + 2 * R * bt * 128 * f  # rowpen, lane-padded 8 -> 128
            + 4 * bt * 128 * f)     # lab / bias / score / state pads


def pick_plan(B: int, L2p: int, vmem_budget: int = 9 * 2**20):
    """Choose (bt, rows_per_step, feasible) for the Pallas kernel.

    Prefers big tiles (amortise per-grid-step overhead) and R=16 row
    unrolls (measured +8% over R=8 on chip); under VMEM pressure (very wide problems) shrinks the tile
    first, then the unroll.  feasible=False means even (bt=8, R=1)
    exceeds the budget — callers should use the HBM-resident XLA scan
    implementation instead.

    The 9 MiB budget is EMPIRICAL against the 16 MiB scoped-vmem limit:
    the with_dec=True compile of a (bt=256, W=256, R=8) instance was
    measured at 19.26 MiB against _vmem_bytes' 11 MiB estimate (Mosaic
    adds ~1.75x buffering the model does not see); 9 MiB * 1.75 = 15.8
    stays under the limit while keeping bt=128 at width 384."""
    for R in (16, 8, 4, 2, 1):
        bt = 256
        while bt > 8 and _vmem_bytes(bt, L2p, R) > vmem_budget:
            bt //= 2
        while bt > B and bt > 8:
            bt //= 2
        if _vmem_bytes(bt, L2p, R) <= vmem_budget:
            return bt, R, True
    return 8, 1, False


def _cummax_axis1(x, n):
    """In-row prefix max via log-step masked rolls.

    Wraparound lanes are suppressed by ADDING a precomputed {0, NEG}
    vector to the rolled value instead of compare+where: one op fewer
    per scan step (~9 steps/row), and value-identical — a wrapped lane
    becomes <= NEG and can never win the max against any reachable DP
    value.  (A [BT, W/128, 128] grouped-roll variant measured 2x
    SLOWER on chip — the 3-D reshape relayouts dominate.)"""
    k = 1
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[1]), 1)
    while k < n:
        rolled = pltpu.roll(x, k, axis=1)
        mask = jnp.where(idx >= k, 0.0, NEG)   # constant-folded per k
        x = jnp.maximum(x, rolled + mask)
        k *= 2
    return x


def _kernel(lab_ref, bias_ref, match_ref, rowpen_ref, colpen_ref, ga0_ref,
            dec_ref, score_ref, state_ref,
            S_ref, *, L2p, L1p, R, with_dec, with_bias=True):
    """colpen_ref packs row-invariant column-side vectors [5, BT, L2p]
    for DP columns 1..L2p: 0 C_norm, 1 C_term,
    2 gnC_norm (= goB[j+1] - C_norm[j+1]), 3 gnC_term
    (= tgeB[j+1] - C_term[j+1]), 4 goB_shifted (goB[j-1], 0 at col 1).
    rowpen_ref streams per-row
    scalars [R, BT, 8]: goA_i, geA_i, tgeA_i, goA_prev, gb0_prev.

    Each grid step advances R DP rows (unrolled): the state rows live in
    registers across the unroll and touch VMEM scratch once per step,
    and the per-step pipeline bookkeeping is amortised R-fold."""
    i = pl.program_id(1)
    BT = S_ref.shape[1]
    W = L2p

    la = lab_ref[:, 0:1]
    lb = lab_ref[:, 1:2]
    idx = jax.lax.broadcasted_iota(jnp.int32, (BT, W), 1)
    cols = idx + 1                      # actual DP column numbers 1..L2p
    idx0 = idx == 0                     # DP column 1 (shift-in boundary)
    is_term_col = cols == lb
    if with_bias:
        slope = bias_ref[:, 0:1]        # centering bias: lb / max(la, 1)
        bias_eps = bias_ref[:, 1:2]
        slope_eps = slope * bias_eps
        cols_eps = cols.astype(jnp.float32) * bias_eps

    C_norm = colpen_ref[0]
    C_term = colpen_ref[1]
    gnC_norm = colpen_ref[2]
    gnC_term = colpen_ref[3]
    goB_s = colpen_ref[4]

    @pl.when(i == 0)
    def _init():
        S_ref[0] = jnp.full((BT, W), NEG)           # A row 0, cols >= 1
        S_ref[1] = ga0_ref[:, :]                    # GA row 0 (precomputed)
        S_ref[2] = jnp.full((BT, W), NEG)           # GB row 0

    A_prev = S_ref[0]
    GA_prev = S_ref[1]
    GB_prev = S_ref[2]

    for r in range(R):
        row = i * R + r + 1
        row_valid = row <= la
        is_last_row = row == la

        goA_i = rowpen_ref[r, :, 0:1]
        geA_i = rowpen_ref[r, :, 1:2]
        tgeA_i = rowpen_ref[r, :, 2:3]
        goA_prev = rowpen_ref[r, :, 3:4]
        gb0_prev = rowpen_ref[r, :, 4:5]  # GB[row-1, 0] (terminal col 0)

        # match row + fused centering bias (the flat-DP analogue of the
        # reference's Hirschberg midpoint preference; saves the producer
        # a full elementwise pass over the [B, L1p, L2p] match array)
        m_row = match_ref[r]  # [BT, L2p]; m_row[:, j-1] scores DP col j
        if with_bias:
            # |cols - row*slope| * eps == |cols*eps - row*(slope*eps)|
            # with cols*eps and slope*eps hoisted out of the row loop
            rowf = jax.lax.convert_element_type(row, jnp.float32)
            m_row = m_row - jnp.abs(cols_eps - rowf * slope_eps)

        # one stacked roll produces every j-1 view of the previous row;
        # position 0 (DP col 1) receives the analytic column-0 boundary
        if r == 0:
            a0_prev = jnp.where(i == 0, 0.0, NEG)   # A[row-1, 0]
        else:
            a0_prev = NEG
        stacked = jnp.stack([A_prev, GA_prev, GB_prev], axis=0)
        shifted = pltpu.roll(stacked, 1, axis=2)
        A_prev_s = jnp.where(idx0, a0_prev, shifted[0])
        GA_prev_s = jnp.where(idx0, NEG, shifted[1])
        GB_prev_s = jnp.where(idx0, gb0_prev, shifted[2])

        # --- A row ---
        # Cells beyond col lb are NOT masked off (here or for GB/GA
        # below): garbage there cannot contaminate valid cells — the
        # next row's shifted views at valid cols j <= lb read cols
        # <= lb-1, u is masked to NEG at cols >= lb before the scan,
        # and the final extraction masks on cols == lb.  Dropping the
        # three per-row col_valid selects is a measured win on a kernel
        # that is VPU-op-bound.
        diagA = A_prev_s
        diagGA = GA_prev_s + goB_s
        diagGB = GB_prev_s + goA_prev
        best01 = jnp.maximum(diagA, diagGA)
        A_row = jnp.maximum(best01, diagGB) + m_row

        # --- GB row (prev-row only); col lb is terminal ---
        ge_eff = jnp.where(is_term_col, tgeA_i, geA_i)
        go_eff = jnp.where(is_term_col, tgeA_i, goA_i)
        gb_e = GB_prev + ge_eff
        gb_o = A_prev + go_eff
        GB_row = jnp.maximum(gb_e, gb_o)

        # --- GA row (in-row scan); row-invariant prefix sums / fused
        # (go - C) vectors are precomputed, terminal-row variant
        # masked in ---
        C = jnp.where(is_last_row, C_term, C_norm)
        gnC = jnp.where(is_last_row, gnC_term, gnC_norm)
        u = A_row + gnC
        u = jnp.where(cols < lb, u, NEG)  # only k < lb can open
        cm = _cummax_axis1(u, W)
        if with_dec:
            # one stacked roll serves both the scan shift and the
            # gap-extend decision's u[j-1] view
            rolled2 = pltpu.roll(jnp.stack([cm, u], axis=0), 1, axis=2)
            cm_s = jnp.where(idx0, NEG, rolled2[0])
        else:
            cm_s = jnp.where(idx0, NEG, pltpu.roll(cm, 1, axis=1))
        GA_row = cm_s + C

        if with_dec:
            # reference MAX3 keeps the LATER operand on ties
            dec_a = jnp.where(diagGA >= diagA, 1, 0)
            dec_a = jnp.where(diagGB >= best01, 2, dec_a)
            dec_gb = (gb_e > gb_o).astype(jnp.int32)
            # GA extend-vs-open: the candidates GA[j-1]+ge[j] and
            # A[j-1]+go[j] share the +C[j] term under the scan
            # transform, so the compare reduces to cm[j-2] > u[j-1] =
            # cm[j-1] > u[j-1] (cm[j-1] = max(cm[j-2], u[j-1]));
            # open-on-tie preserved.  The XLA oracle
            # (tpu/gotoh.py:137-146) computes the identical compare so
            # decisions agree bitwise.
            u_s = jnp.where(idx0, NEG, rolled2[1])
            dec_ga = jnp.where(cm_s > u_s, 1, 0)
            dec = dec_a | (dec_ga << 2) | (dec_gb << 3)
            dec_ref[r] = dec.astype(jnp.int8)

        A_prev = jnp.where(row_valid, A_row, A_prev)
        GA_prev = jnp.where(row_valid, GA_row, GA_prev)
        GB_prev = jnp.where(row_valid, GB_row, GB_prev)

    S_ref[0] = A_prev
    S_ref[1] = GA_prev
    S_ref[2] = GB_prev

    @pl.when(i == (L1p // R) - 1)
    def _finish():
        at_end = cols == lb
        pick = lambda rr: jnp.max(jnp.where(at_end, rr, NEG), axis=1)
        end_a = pick(A_prev)
        end_ga = pick(GA_prev)
        end_gb = pick(GB_prev)
        score = jnp.maximum(jnp.maximum(end_a, end_ga), end_gb)
        st = jnp.where(end_ga > end_a,
                       jnp.where(end_gb > end_ga, 2, 1),
                       jnp.where(end_gb > end_a, 2, 0))
        score_ref[:, 0] = score
        state_ref[:, 0] = st.astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("bt", "rows_per_step", "interpret",
                                    "with_dec", "with_bias",
                                    "pre_transposed"))
def gotoh_forward_pallas(match, pens_cols, pens_rows, la, lb, bt=8,
                         rows_per_step=8, interpret=False, with_dec=True,
                         slope=None, bias_eps=None, with_bias=True,
                         pre_transposed=False):
    """match [B, L1p, L2p] f32 (or [L1p, B, L2p] with
    pre_transposed=True — the kernel streams row-major; callers that
    can produce that layout directly skip a full HBM relayout pass);
    pens_cols [B, 3, L2p+1];
    pens_rows [B, 3, L1p+1]; la, lb [B] int32.
    slope/bias_eps [B] f32 (optional): fused centering bias
    match[i,j] -= |(j+1) - (i+1)*slope| * bias_eps applied in-kernel.
    Returns dec [B, L1p, L2p] int8 (row r = DP row r+1, col c = DP
    column c+1), score [B], end_state [B]."""
    if pre_transposed:
        L1p, B, L2p = match.shape
    else:
        B, L1p, L2p = match.shape
    assert B % bt == 0, (B, bt)
    R = rows_per_step
    while L1p % R:
        R //= 2
    W = L2p
    lab = jnp.stack([la, lb], axis=1).astype(jnp.int32)
    if slope is None:
        slope = jnp.zeros(B, jnp.float32)
    if bias_eps is None:
        bias_eps = jnp.zeros(B, jnp.float32)
    biasv = jnp.stack([slope.astype(jnp.float32),
                       bias_eps.astype(jnp.float32)], axis=1)  # [B, 2]

    match_t = match if pre_transposed else jnp.transpose(match, (1, 0, 2))
    # column-side vectors for DP cols 1..L2p (lane-aligned width L2p)
    goB = pens_cols[:, 0, 1:]
    geB = pens_cols[:, 1, 1:]
    tgeB = pens_cols[:, 2, 1:]

    # row-invariant precomputations (on device, once per call)
    C_norm = jnp.cumsum(geB, axis=1)
    C_term = jnp.cumsum(tgeB, axis=1)
    pad1 = jnp.zeros((B, 1), jnp.float32)
    goB_next = jnp.concatenate([goB[:, 1:], pad1], axis=1)   # goB[j+1]
    tgeB_next = jnp.concatenate([tgeB[:, 1:], pad1], axis=1)
    cols = jnp.arange(1, W + 1)[None, :]
    col_valid = cols <= lb[:, None]
    ga0 = jnp.where(col_valid, C_term, NEG).astype(jnp.float32)
    goB_s = jnp.concatenate([pad1, goB[:, :W - 1]], axis=1)  # goB[j-1]
    C_norm_next = jnp.concatenate([C_norm[:, 1:], pad1], axis=1)
    C_term_next = jnp.concatenate([C_term[:, 1:], pad1], axis=1)
    # the scan-transform open candidate u = A + (go[j+1] - C[j+1]) only
    # ever reads go_next and C_next through this difference — fuse it
    # here (one op and two colpen slots fewer per kernel row; the XLA
    # oracle pairs (go - C) the same way so u rounds identically)
    gnC_norm = goB_next - C_norm_next
    gnC_term = tgeB_next - C_term_next

    # slot-major [5, B, W]: stacking along axis 0 writes each slot
    # contiguously (a [B, 5, W] stack interleaves and costs a strided
    # pass over the whole array)
    colpen = jnp.stack([C_norm, C_term, gnC_norm, gnC_term, goB_s],
                       axis=0)  # [5, B, W]

    # per-row scalar stream [B, L1p, 8]:
    # goA_i, geA_i, tgeA_i, goA_prev, gb0_prev (= GB[row-1, 0])
    goA = pens_rows[:, 0, :]
    geA = pens_rows[:, 1, :]
    tgeA = pens_rows[:, 2, :]
    cum_tgeA = jnp.cumsum(tgeA[:, 1:], axis=1)       # [B, L1p]; col r-1 = GB[r,0]
    gb0 = jnp.concatenate(
        [jnp.full((B, 1), NEG, jnp.float32), cum_tgeA[:, :L1p - 1]], axis=1)
    zeros = jnp.zeros((L1p, B), jnp.float32)
    rowpen = jnp.stack([goA[:, 1:].T, geA[:, 1:].T, tgeA[:, 1:].T,
                        goA[:, :L1p].T, gb0.T, zeros, zeros, zeros],
                       axis=2).astype(jnp.float32)   # [L1p, B, 8]

    grid = (B // bt, L1p // R)
    kernel = functools.partial(_kernel, L2p=L2p, L1p=L1p, R=R,
                               with_dec=with_dec, with_bias=with_bias)
    dec_rows = L1p if with_dec else R
    dec_map = (lambda b, i: (i, b, 0)) if with_dec else (lambda b, i: (0, b, 0))
    dec, score, state = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, 2), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 2), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, bt, L2p), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, bt, 8), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, bt, W), lambda b, i: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, W), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, bt, W), dec_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((dec_rows, B, W), jnp.int8),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, bt, W), jnp.float32),
        ],
        interpret=interpret,
    )(lab, biasv, match_t, rowpen, colpen, ga0)
    score = score[:, 0]
    state = state[:, 0]
    # degenerate lb == 0: the whole path is a terminal column-0 gap run;
    # its score is the cumulative terminal row penalty at row la
    lb0_score = jnp.take_along_axis(
        jnp.concatenate([jnp.zeros((B, 1), jnp.float32), cum_tgeA], axis=1),
        la[:, None].astype(jnp.int32), axis=1)[:, 0]
    is_lb0 = lb == 0
    score = jnp.where(is_lb0, lb0_score, score)
    state = jnp.where(is_lb0, 2, state)
    if with_dec:
        dec = jnp.transpose(dec, (1, 0, 2))
    return dec, score, state
