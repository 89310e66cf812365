"""Problem-per-lane Pallas Gotoh kernel for LARGE merge batches.

The row kernel (tpu/gotoh_pallas.py) maps one problem's DP row to the
VPU lanes; the affine gap-in-row state then needs an in-row max-plus
prefix scan — log2(W) masked rolls that are ~45% of its per-cell cost.

This kernel removes the scan by mapping PROBLEMS to the lanes instead
(the classic inter-task SIMD layout, cf. the OpenMP collapse(2) loop
over independent pairwise problems in the reference,
/root/reference/lib/src/sequence_distance.c:107-130):

  * a batch tile is 1024 problems shaped [8, 128] — exactly one native
    VPU tile; every per-cell quantity is an [8, 128] vector across
    problems and every operation is a full-utilization elementwise op.
  * the DP walks rows in the grid and columns in an in-kernel
    fori_loop; the gap-in-row recurrence
        GA[i][j] = max(GA[i][j-1] + ge[j], A[i][j-1] + go[j])
    is computed DIRECTLY — the j-1 values are the loop carry, so there
    is no scan, no roll, and no cross-lane communication at all.
  * per-problem lengths/penalties ride as [8, 128] vectors; terminal
    handling is one compare + selects per cell (no data-dependent
    control flow).
  * decisions pack 4 columns per int32 lane (int8 outputs would tile
    as (32, 128) against an 8-sublane block — int32 nibble packing
    keeps the store shape native and the HBM traffic at 1 B/cell).

Use it when the batch is big and the problems are small: guide-tree
leaf levels and anchor-consistency map batches (N x K pairwise
problems, reference anchor_consistency.c:246-267) run thousands of
~200-residue problems per launch at 16k-100k sequence scale.  Wide
problems and small batches stay on the row kernel.

Float caveat: the direct recurrence rounds GA differently from the row
kernel's scan transform (which factors C[j] out of the max), so paths
can differ on near-score-ties.  Both are score-optimal; the engines
that use this kernel (tpu-fast family) already carry that contract.
The numpy oracle `gotoh_forward_direct_np` reproduces this kernel's
float op order exactly — decisions and scores are asserted BITWISE
against it in tests/test_gotoh_lanewise.py.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38

BT = 1024          # problems per batch tile: [8, 128] == one VPU tile
PACK = 4           # decisions per int32 lane (4-bit nibbles)

DEC_A_MASK = 3
DEC_GA_EXT = 4
DEC_GB_EXT = 8


def lanewise_vmem_bytes(L2p: int) -> int:
    """Resident VMEM of one kernel instance: state scratch, colpen,
    ga0, plus double-buffered match-in and packed dec-out blocks."""
    f = 4
    tile = 8 * 128
    return (3 * L2p * tile * f        # state scratch
            + 4 * L2p * tile * f      # colpen (resident, 4 slots)
            + L2p * tile * f          # ga0 (resident)
            + 2 * L2p * tile * f      # match in, double-buffered
            + 2 * (L2p // PACK) * tile * f   # dec out, double-buffered
            + 2 * 6 * tile * f        # rowpen stream
            + 4 * tile * f)           # lab/bias/score/state pads


def lanewise_feasible(B: int, L1p: int, L2p: int,
                      vmem_budget: int = 13 * 2**20) -> bool:
    """This kernel wants batches >= one full 1024-problem tile and
    narrow-enough problems for the resident column state.

    The budget is looser than the row kernel's 9 MiB because this
    kernel's VMEM is dominated by RESIDENT buffers (state scratch,
    colpen, ga0 — Mosaic does not double-buffer those); the streamed
    match/dec windows it does buffer are ~2.5 MiB at L2p=256.  Verify
    against the scoped-vmem limit on chip before raising further."""
    return (B % BT == 0 and B >= BT and L2p % PACK == 0
            and lanewise_vmem_bytes(L2p) <= vmem_budget)


def _kernel(lab_ref, bias_ref, match_ref, rowpen_ref, colpen_ref, ga0_ref,
            dec_ref, score_ref, state_ref, S_ref,
            *, L1p, L2p, with_dec, with_bias, unroll):
    i = pl.program_id(1)
    row = i + 1

    la_v = lab_ref[0, 0]            # [8, 128] int32
    lb_v = lab_ref[0, 1]

    @pl.when(i == 0)
    def _init():
        S_ref[0] = jnp.full((L2p, 8, 128), NEG)    # A row 0, cols >= 1
        S_ref[1] = ga0_ref[0, 0]                   # GA row 0
        S_ref[2] = jnp.full((L2p, 8, 128), NEG)    # GB row 0

    goA_i = rowpen_ref[0, 0, 0]
    geA_i = rowpen_ref[0, 0, 1]
    tgeA_i = rowpen_ref[0, 0, 2]
    goA_prev = rowpen_ref[0, 0, 3]
    gb0_prev = rowpen_ref[0, 0, 4]   # GB[row-1, 0]

    row_valid = la_v >= row
    is_last_row = la_v == row
    if with_bias:
        # row_term (= row * slope * eps) is a precomputed rowpen slot
        # for the same reason cols_eps is a colpen slot: no in-kernel
        # mul may feed the bias sub, or the compiler can contract it
        # into an FMA and break bitwise parity with the oracle
        row_term = rowpen_ref[0, 0, 5]

    # analytic DP column 0 of the previous row
    a0_prev = jnp.where(row == 1,
                        jnp.zeros((8, 128), jnp.float32),
                        jnp.full((8, 128), NEG))

    def col_block(jb, carry):
        A_pm1, GA_pm1, GB_pm1, A_cur, GA_cur, goB_prev = carry
        dec_acc = jnp.zeros((8, 128), jnp.int32)
        for u in range(unroll):
            j = jb * unroll + u          # 0-based; DP column j+1
            jdp = j + 1
            A_p = S_ref[0, j]
            GA_p = S_ref[1, j]
            GB_p = S_ref[2, j]
            m = match_ref[0, 0, j]
            # goB[j-1] is the previous iteration's goB[j] (carried;
            # the row-entry value goB[0] rides in the bias block) —
            # one VMEM load and one resident colpen slot fewer per cell
            goB_jm1 = goB_prev
            goB_j = colpen_ref[0, 0, j]
            geB_j = colpen_ref[0, 1, j]
            tgeB_j = colpen_ref[0, 2, j]
            if with_bias:
                # cols_eps (= jdp * eps) is a precomputed colpen slot:
                # an in-kernel mul feeding the sub would FMA-contract
                # (observed 1-ulp drift vs the oracle), a sub alone
                # cannot
                m = m - jnp.abs(colpen_ref[0, 3, j] - row_term)

            # --- A ---
            diagA = A_pm1
            diagGA = GA_pm1 + goB_jm1
            diagGB = GB_pm1 + goA_prev
            best01 = jnp.maximum(diagA, diagGA)
            A_new = jnp.maximum(best01, diagGB) + m

            # --- GB (prev row only); cols 0 and lb are terminal ---
            is_term_col = lb_v == jdp
            ge_eff = jnp.where(is_term_col, tgeA_i, geA_i)
            go_eff = jnp.where(is_term_col, tgeA_i, goA_i)
            gb_e = GB_p + ge_eff
            gb_o = A_p + go_eff
            GB_new = jnp.maximum(gb_e, gb_o)

            # --- GA (current row, direct recurrence) ---
            ge_row = jnp.where(is_last_row, tgeB_j, geB_j)
            go_row = jnp.where(is_last_row, tgeB_j, goB_j)
            ga_e = GA_cur + ge_row
            ga_o = A_cur + go_row
            GA_new = jnp.maximum(ga_e, ga_o)

            if with_dec:
                # reference MAX3 keeps the LATER operand on ties;
                # gap decisions open on ties (strict > for extend)
                dec = jnp.where(diagGA >= diagA, 1, 0)
                dec = jnp.where(diagGB >= best01, 2, dec)
                dec = dec | jnp.where(ga_e > ga_o, DEC_GA_EXT, 0)
                dec = dec | jnp.where(gb_e > gb_o, DEC_GB_EXT, 0)
                dec_acc = dec_acc | (dec << (4 * u))

            # freeze state beyond row la (the final extraction reads
            # each problem's row-la values)
            S_ref[0, j] = jnp.where(row_valid, A_new, A_p)
            S_ref[1, j] = jnp.where(row_valid, GA_new, GA_p)
            S_ref[2, j] = jnp.where(row_valid, GB_new, GB_p)

            A_pm1, GA_pm1, GB_pm1 = A_p, GA_p, GB_p
            A_cur = jnp.where(row_valid, A_new, A_p)
            GA_cur = jnp.where(row_valid, GA_new, GA_p)
            goB_prev = goB_j
        if with_dec:
            dec_ref[0, 0, jb] = dec_acc
        return (A_pm1, GA_pm1, GB_pm1, A_cur, GA_cur, goB_prev)

    neg = jnp.full((8, 128), NEG)
    goB0 = bias_ref[0, 1]
    init = (a0_prev, neg, gb0_prev, neg, neg, goB0)
    jax.lax.fori_loop(0, L2p // unroll, col_block, init)

    @pl.when(i == L1p - 1)
    def _finish():
        def extract(j, acc):
            end_a, end_ga, end_gb = acc
            at_end = lb_v == (j + 1)
            end_a = jnp.where(at_end, S_ref[0, j], end_a)
            end_ga = jnp.where(at_end, S_ref[1, j], end_ga)
            end_gb = jnp.where(at_end, S_ref[2, j], end_gb)
            return (end_a, end_ga, end_gb)

        end_a, end_ga, end_gb = jax.lax.fori_loop(
            0, L2p, extract, (neg, neg, neg))
        score_ref[0, 0] = jnp.maximum(jnp.maximum(end_a, end_ga), end_gb)
        st = jnp.where(end_ga > end_a,
                       jnp.where(end_gb > end_ga, 2, 1),
                       jnp.where(end_gb > end_a, 2, 0))
        state_ref[0, 0] = st.astype(jnp.int32)


def _to_lanes(x):
    """[B, ...] -> [NB, ..., 8, 128] with b = nb*1024 + s*128 + l."""
    B = x.shape[0]
    rest = x.shape[1:]
    nb = B // BT
    y = x.reshape((nb, 8, 128) + rest)
    perm = (0,) + tuple(range(3, 3 + len(rest))) + (1, 2)
    return jnp.transpose(y, perm)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "with_dec", "with_bias",
                                    "unroll"))
def gotoh_forward_lanewise(match, pens_cols, pens_rows, la, lb,
                           interpret=False, with_dec=True,
                           slope=None, bias_eps=None, with_bias=True,
                           unroll=PACK):
    """match [B, L1p, L2p] f32; pens_cols [B, 3, L2p+1];
    pens_rows [B, 3, L1p+1]; la, lb [B] int32; B a multiple of 1024.

    Returns (dec, score [B], end_state [B]).  dec is the packed
    [NB, L1p, L2p//4, 8, 128] int32 nibble layout (cell (b, i, j) with
    b = nb*1024 + s*128 + l lives in dec[nb, i, j//4, s, l] at nibble
    j%4); walk it with traceback_lanewise.  Same DP semantics as
    tpu/gotoh.py (row r = DP row r+1, col c = DP column c+1)."""
    B, L1p, L2p = match.shape
    assert B % BT == 0, (B, BT)
    assert L2p % unroll == 0, (L2p, unroll)
    # the nibble-packed decision layout is defined by PACK; the
    # walkers/unpackers decode with PACK, so a different unroll is
    # only legal when decisions are off
    assert unroll == PACK or not with_dec, (unroll, PACK)
    NB = B // BT

    if slope is None:
        slope = jnp.zeros(B, jnp.float32)
    if bias_eps is None:
        bias_eps = jnp.zeros(B, jnp.float32)

    lab = _to_lanes(jnp.stack([la, lb], axis=1).astype(jnp.int32))
    # slot 1 carries goB[0] (the row-entry close-open addend); the
    # in-kernel column loop then needs only goB[j] loads
    slope_eps = slope.astype(jnp.float32) * bias_eps.astype(jnp.float32)
    biasv = _to_lanes(jnp.stack([
        slope_eps, pens_cols[:, 0, 0].astype(jnp.float32)], axis=1))

    m5 = _to_lanes(match)                      # [NB, L1p, L2p, 8, 128]

    goB = pens_cols[:, 0, :]
    geB = pens_cols[:, 1, :]
    tgeB = pens_cols[:, 2, :]
    cols_eps = (jnp.arange(1, L2p + 1, dtype=jnp.float32)[None, :]
                * bias_eps.astype(jnp.float32)[:, None])
    colpen = _to_lanes(jnp.stack([
        goB[:, 1:L2p + 1],
        geB[:, 1:L2p + 1],
        tgeB[:, 1:L2p + 1],
        cols_eps], axis=1))                    # [NB, 4, L2p, 8, 128]

    cols = jnp.arange(1, L2p + 1)[None, :]
    C_term = jnp.cumsum(tgeB[:, 1:], axis=1)
    ga0 = _to_lanes(jnp.where(cols <= lb[:, None], C_term, NEG)
                    .astype(jnp.float32))[:, None]   # [NB, 1, L2p, 8, 128]

    goA = pens_rows[:, 0, :]
    geA = pens_rows[:, 1, :]
    tgeA = pens_rows[:, 2, :]
    cum_tgeA = jnp.cumsum(tgeA[:, 1:], axis=1)       # [B, L1p]
    gb0_prev = jnp.concatenate(
        [jnp.full((B, 1), NEG, jnp.float32), cum_tgeA[:, :L1p - 1]], axis=1)
    rows_f = jnp.arange(1, L1p + 1, dtype=jnp.float32)[None, :]
    row_term = rows_f * slope_eps[:, None]     # exact mul, outside kernel
    rowpen = _to_lanes(jnp.stack([
        goA[:, 1:], geA[:, 1:], tgeA[:, 1:],
        goA[:, :L1p], gb0_prev, row_term], axis=1))  # [NB, 6, L1p, 8, 128]
    rowpen = jnp.transpose(rowpen, (0, 2, 1, 3, 4))  # [NB, L1p, 6, 8, 128]

    grid = (NB, L1p)
    kernel = functools.partial(_kernel, L1p=L1p, L2p=L2p,
                               with_dec=with_dec, with_bias=with_bias,
                               unroll=unroll)
    L2p4 = L2p // unroll
    dec_shape = (NB, L1p, L2p4, 8, 128) if with_dec else (NB, 1, 1, 8, 128)
    dec_map = ((lambda b, i: (b, i, 0, 0, 0)) if with_dec
               else (lambda b, i: (b, 0, 0, 0, 0)))
    dec, score, state = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, 8, 128), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 8, 128), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L2p, 8, 128), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 6, 8, 128), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, L2p, 8, 128), lambda b, i: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L2p, 8, 128), lambda b, i: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, L2p4 if with_dec else 1, 8, 128), dec_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(dec_shape, jnp.int32),
            jax.ShapeDtypeStruct((NB, 1, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((NB, 1, 8, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, L2p, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(lab, biasv, m5, rowpen, colpen, ga0)

    score = score.reshape(NB * BT)
    state = state.reshape(NB * BT)

    # degenerate lb == 0: the whole path is a terminal column-0 gap run
    lb0_score = jnp.take_along_axis(
        jnp.concatenate([jnp.zeros((B, 1), jnp.float32), cum_tgeA], axis=1),
        la[:, None].astype(jnp.int32), axis=1)[:, 0]
    is_lb0 = lb == 0
    score = jnp.where(is_lb0, lb0_score, score)
    state = jnp.where(is_lb0, 2, state)
    return dec, score, state


def gotoh_forward_direct_np(match, pens_cols, pens_rows, la, lb,
                            slope=None, bias_eps=None):
    """Float32 numpy oracle with the lanewise kernel's exact op order
    (direct GA recurrence).  Vectorized over the batch; loops over
    (i, j).  Returns (dec [B, L1p, L2p] uint8, score [B], state [B])."""
    match = np.asarray(match, np.float32)
    B, L1p, L2p = match.shape
    la = np.asarray(la, np.int32)
    lb = np.asarray(lb, np.int32)
    goB = np.asarray(pens_cols[:, 0], np.float32)
    geB = np.asarray(pens_cols[:, 1], np.float32)
    tgeB = np.asarray(pens_cols[:, 2], np.float32)
    goA = np.asarray(pens_rows[:, 0], np.float32)
    geA = np.asarray(pens_rows[:, 1], np.float32)
    tgeA = np.asarray(pens_rows[:, 2], np.float32)
    if slope is None:
        slope = np.zeros(B, np.float32)
    if bias_eps is None:
        bias_eps = np.zeros(B, np.float32)
    slope_eps = (np.asarray(slope, np.float32)
                 * np.asarray(bias_eps, np.float32)).astype(np.float32)
    eps = np.asarray(bias_eps, np.float32)

    neg = np.float32(NEG)
    A = np.full((B, L2p + 1), neg, np.float32)
    GA = np.full((B, L2p + 1), neg, np.float32)
    GB = np.full((B, L2p + 1), neg, np.float32)
    A[:, 0] = 0.0
    cols = np.arange(1, L2p + 1)[None, :]
    C_term = np.cumsum(tgeB[:, 1:], axis=1, dtype=np.float32)
    GA[:, 1:] = np.where(cols <= lb[:, None], C_term, neg)
    cum_tgeA = np.cumsum(tgeA[:, 1:], axis=1, dtype=np.float32)
    gb0 = np.concatenate([np.full((B, 1), neg, np.float32),
                          cum_tgeA], axis=1)      # gb0[:, i] = GB[i, 0]
    gb0[:, 0] = neg

    dec = np.zeros((B, L1p, L2p), np.uint8)
    endA = np.full(B, neg, np.float32)
    endGA = np.full(B, neg, np.float32)
    endGB = np.full(B, neg, np.float32)

    for i in range(1, L1p + 1):
        row_valid = la >= i
        is_last_row = la == i
        goA_i, geA_i, tgeA_i = goA[:, i], geA[:, i], tgeA[:, i]
        goA_prev = goA[:, i - 1]
        A_pm1 = A[:, 0].copy()
        GA_pm1 = GA[:, 0].copy()
        GB_pm1 = gb0[:, i - 1].copy()
        A_cur = np.full(B, neg, np.float32)
        GA_cur = np.full(B, neg, np.float32)
        A[:, 0] = neg   # A[i][0] for the next row's reads
        row_term = (np.float32(i) * slope_eps).astype(np.float32)
        for j in range(1, L2p + 1):
            A_p = A[:, j].copy()
            GA_p = GA[:, j].copy()
            GB_p = GB[:, j].copy()
            m = match[:, i - 1, j - 1]
            m = (m - np.abs(np.float32(j) * eps - row_term)).astype(
                np.float32)
            diagA = A_pm1
            diagGA = (GA_pm1 + goB[:, j - 1]).astype(np.float32)
            diagGB = (GB_pm1 + goA_prev).astype(np.float32)
            best01 = np.maximum(diagA, diagGA)
            A_new = (np.maximum(best01, diagGB) + m).astype(np.float32)

            is_term_col = lb == j
            ge_eff = np.where(is_term_col, tgeA_i, geA_i)
            go_eff = np.where(is_term_col, tgeA_i, goA_i)
            gb_e = (GB_p + ge_eff).astype(np.float32)
            gb_o = (A_p + go_eff).astype(np.float32)
            GB_new = np.maximum(gb_e, gb_o)

            ge_row = np.where(is_last_row, tgeB[:, j], geB[:, j])
            go_row = np.where(is_last_row, tgeB[:, j], goB[:, j])
            ga_e = (GA_cur + ge_row).astype(np.float32)
            ga_o = (A_cur + go_row).astype(np.float32)
            GA_new = np.maximum(ga_e, ga_o)

            d = np.where(diagGA >= diagA, 1, 0)
            d = np.where(diagGB >= best01, 2, d)
            d = d | np.where(ga_e > ga_o, DEC_GA_EXT, 0)
            d = d | np.where(gb_e > gb_o, DEC_GB_EXT, 0)
            dec[:, i - 1, j - 1] = d.astype(np.uint8)

            A[:, j] = np.where(row_valid, A_new, A_p)
            GA[:, j] = np.where(row_valid, GA_new, GA_p)
            GB[:, j] = np.where(row_valid, GB_new, GB_p)
            A_pm1, GA_pm1, GB_pm1 = A_p, GA_p, GB_p
            A_cur = A[:, j]
            GA_cur = GA[:, j]
        at_end_row = is_last_row
        take = np.take_along_axis
        lbi = lb[:, None]
        endA = np.where(at_end_row, take(A, lbi, 1)[:, 0], endA)
        endGA = np.where(at_end_row, take(GA, lbi, 1)[:, 0], endGA)
        endGB = np.where(at_end_row, take(GB, lbi, 1)[:, 0], endGB)

    score = np.maximum(np.maximum(endA, endGA), endGB)
    state = np.where(endGA > endA,
                     np.where(endGB > endGA, 2, 1),
                     np.where(endGB > endA, 2, 0))
    # degenerate lb == 0
    full_cum = np.concatenate([np.zeros((B, 1), np.float32), cum_tgeA],
                              axis=1)
    lb0_score = np.take_along_axis(full_cum, la[:, None], axis=1)[:, 0]
    is_lb0 = lb == 0
    score = np.where(is_lb0, lb0_score, score)
    state = np.where(is_lb0, 2, state)
    return dec, score.astype(np.float32), state.astype(np.int32)


def unpack_dec_lanewise(dec_packed, L2p):
    """[NB, L1p, L2p//4, 8, 128] int32 nibbles -> [B, L1p, L2p] uint8
    (testing/debug helper; production walks the packed layout)."""
    dec_packed = np.asarray(dec_packed)
    NB, L1p, L2p4 = dec_packed.shape[:3]
    out = np.zeros((NB, 8, 128, L1p, L2p), np.uint8)
    for u in range(PACK):
        nib = (dec_packed >> (4 * u)) & 0xF
        out[:, :, :, :, u::PACK] = np.transpose(
            nib, (0, 3, 4, 1, 2)).astype(np.uint8)
    return out.reshape(NB * BT, L1p, L2p)
