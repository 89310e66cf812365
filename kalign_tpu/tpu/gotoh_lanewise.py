"""Problem-per-lane Pallas Gotoh kernel for LARGE merge batches.

The row kernel (tpu/gotoh_pallas.py) maps one problem's DP row to the
VPU lanes; the affine gap-in-row state then needs an in-row max-plus
prefix scan — log2(W) masked rolls that are ~45% of its per-cell cost
(and the pattern the 2026-08 libtpu compiles ~3x worse than its
predecessor — BENCHMARKS.md round-4 session).

This kernel removes the scan by mapping PROBLEMS to the lanes instead
(the classic inter-task SIMD layout, cf. the OpenMP collapse(2) loop
over independent pairwise problems in the reference,
/root/reference/lib/src/sequence_distance.c:107-130):

  * a batch tile is 1024 problems shaped [8, 128] — exactly one native
    VPU tile; every per-cell quantity is an [8, 128] vector across
    problems and every operation is a full-utilization elementwise op.
  * the gap-in-row recurrence
        GA[i][j] = max(GA[i][j-1] + ge[j], A[i][j-1] + go[j])
    is computed DIRECTLY — the j-1 values are loop carries, so there
    is no scan, no roll, and no cross-lane communication at all.
  * ROW BLOCKS (round 5): each grid step advances R rows across an
    in-kernel column loop.  Rows r=1..R-1 read row r-1's freshly
    computed values from REGISTERS, so the per-column VMEM traffic
    (state load/store, column penalties) is amortised R-fold:
    ~(9 + 1.25R)/R VMEM ops per cell vs ~10 at R=1 — the r4 chip
    profile showed the R=1 kernel VMEM-bound at 12% VPU utilisation.
  * COLUMN TILES (round 5): the match / decision / column-penalty
    streams block into CT tiles of L2t columns (grid axis, innermost),
    so wide problems no longer need the whole row's streams resident —
    only the 3-row state scratch spans the full width.  The inter-tile
    boundary (R rows x 3 states + the goB[j-1] carry) passes through a
    small VMEM scratch between consecutive grid steps.  This is what
    lets mid-size merges (the 384x384 steady-state bench shape) take
    this kernel instead of the scan-based row kernel.
  * per-problem lengths/penalties ride as [8, 128] vectors; terminal
    handling is one compare + selects per cell (no data-dependent
    control flow).
  * decisions pack 4 columns per int32 lane (int8 outputs would tile
    as (32, 128) against an 8-sublane block — int32 nibble packing
    keeps the store shape native and the HBM traffic at 1 B/cell).

Use it when the batch is big: guide-tree leaf levels and
anchor-consistency map batches (N x K pairwise problems, reference
anchor_consistency.c:246-267) run thousands of ~200-residue problems
per launch at 16k-100k sequence scale, and mid-tree profile merges
batch 1024+ problems of 256-512 columns.  Very wide problems and
small batches stay on the row kernel.

Float caveat: the direct recurrence rounds GA differently from the row
kernel's scan transform (which factors C[j] out of the max), so paths
can differ on near-score-ties.  Both are score-optimal; the engines
that use this kernel (tpu-fast family) already carry that contract.
The numpy oracle `gotoh_forward_direct_np` reproduces this kernel's
float op order exactly — decisions and scores are asserted BITWISE
against it in tests/test_gotoh_lanewise.py (row blocks and column
tiles do not change the per-cell op order, so one oracle covers every
(R, L2t) plan)."""

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


def lanewise_vmem_bytes(L2p: int, R: int = 1, L2t: int = None,
                        ncp: int = 4) -> int:
    """VMEM of one kernel instance at row-block R and column-tile L2t:
    full-width state scratch + double-buffered match/colpen/ga0/dec/
    rowpen streams over one tile + the boundary scratch."""
    if L2t is None:
        L2t = L2p
    f = 4
    tile = 8 * 128
    return (3 * L2p * tile * f            # state scratch (full width)
            + 2 * R * L2t * tile * f      # match in, double-buffered
            + 2 * ncp * L2t * tile * f    # colpen stream
            + 2 * L2t * tile * f          # ga0 stream
            + 2 * R * (L2t // PACK) * tile * f   # dec out (int32 nibbles)
            + 2 * R * 7 * tile * f        # rowpen stream
            + (3 * (R + 1) + 1) * tile * f  # boundary scratch
            + 8 * tile * f)               # lab/bias/score/state pads


def lanewise_plan(B: int, L1p: int, L2p: int,
                  vmem_budget: int = 11 * 2**20):
    """Choose (R, L2t, feasible) for the kernel.

    Prefers more rows per step first (VMEM ops per cell fall as
    ~(9 + 1.25R)/R), then the widest column tile that fits the budget.
    The 11 MiB budget is against the 16 MiB scoped-vmem limit the
    2026-08 libtpu enforces at AOT compile time, leaving headroom for
    Mosaic's own buffering.  KALIGN_TPU_LANEWISE_PLAN="R,L2t"
    overrides for on-chip tuning."""
    import os
    if B % BT or B < BT or L2p % PACK:
        return 0, 0, False
    ov = os.environ.get("KALIGN_TPU_LANEWISE_PLAN")
    if ov:
        r, l2t = (int(x) for x in ov.split(","))
        return r, l2t, True
    tiles = [L2p // ct for ct in range(1, 9)
             if L2p % ct == 0 and (L2p // ct) % PACK == 0]
    for R in (4, 8, 2, 1):
        if L1p % R:
            continue
        for L2t in tiles:
            if lanewise_vmem_bytes(L2p, R, L2t) <= vmem_budget:
                return R, L2t, True
    return 0, 0, False


def lanewise_feasible(B: int, L1p: int, L2p: int,
                      vmem_budget: int = 11 * 2**20) -> bool:
    """Full-tile batches (multiples of 1024 problems) whose width fits
    a feasible (R, L2t) plan."""
    return lanewise_plan(B, L1p, L2p, vmem_budget)[2]


def _kernel(lab_ref, bias_ref, match_ref, rowpen_ref, colpen_ref, ga0_ref,
            dec_ref, score_ref, state_ref, S_ref, bnd_ref, gpb_ref,
            *, L1p, L2p, L2t, R, CT, with_dec, with_bias, unroll):
    """Grid (NB, L1p//R, CT), CT innermost.  One step advances rows
    [i*R+1, (i+1)*R] over columns [ct*L2t+1, (ct+1)*L2t]; rows chain
    through registers, the column-tile boundary chains through the
    bnd/gpb scratch between consecutive grid steps (ct-1 -> ct), and
    the previous row block's values live in the full-width S scratch.

    bnd_ref layout: slot 0 = row i*R's state at the boundary column
    (the diag entry for block row 0), slots 1..R = block rows' states
    at the boundary column (left entries).  gpb_ref carries goB[j-1]
    across the tile boundary."""
    i = pl.program_id(1)
    ct = pl.program_id(2)
    L1R = L1p // R

    la_v = lab_ref[0, 0]            # [8, 128] int32
    lb_v = lab_ref[0, 1]
    neg = jnp.full((8, 128), NEG)

    @pl.when(i == 0)
    def _init_tile():
        # row-0 state for this tile's columns
        S_ref[0, pl.ds(ct * L2t, L2t)] = jnp.full((L2t, 8, 128), NEG)
        S_ref[1, pl.ds(ct * L2t, L2t)] = ga0_ref[0, 0]
        S_ref[2, pl.ds(ct * L2t, L2t)] = jnp.full((L2t, 8, 128), NEG)

    @pl.when(ct == 0)
    def _init_bnd():
        # analytic DP column 0 (oracle: A[0,0]=0, A[i>0,0]=NEG,
        # GA[:,0]=NEG, GB[row,0]=cum_tgeA[row-1] unfrozen — rows past
        # la only ever feed discarded cells)
        bnd_ref[0, 0] = jnp.where(i == 0, jnp.zeros((8, 128), jnp.float32),
                                  neg)
        bnd_ref[0, 1] = neg
        bnd_ref[0, 2] = rowpen_ref[0, 0, 4]          # GB[i*R, 0]
        for r in range(R):
            bnd_ref[1 + r, 0] = neg
            bnd_ref[1 + r, 1] = neg
            bnd_ref[1 + r, 2] = rowpen_ref[0, r, 6]  # GB[i*R+r+1, 0]
        gpb_ref[0] = bias_ref[0, 1]                  # goB[0]

    # per-row scalars for the R block rows (hoisted out of the column
    # loop; [8, 128] vectors across problems)
    goA_i = [rowpen_ref[0, r, 0] for r in range(R)]
    geA_i = [rowpen_ref[0, r, 1] for r in range(R)]
    tgeA_i = [rowpen_ref[0, r, 2] for r in range(R)]
    goA_prev = [rowpen_ref[0, r, 3] for r in range(R)]
    if with_bias:
        # row_term (= row * slope * eps) is a precomputed rowpen slot:
        # no in-kernel mul may feed the bias sub, or the compiler can
        # contract it into an FMA and break bitwise oracle parity
        row_term = [rowpen_ref[0, r, 5] for r in range(R)]
    row_valid = [la_v >= i * R + r + 1 for r in range(R)]
    is_last_row = [la_v == i * R + r + 1 for r in range(R)]

    UW = unroll // 4                 # decision words per column block
    def col_block(jb, carry):
        Sup, Scur, goB_prev = carry
        dec_accs = [[jnp.zeros((8, 128), jnp.int32) for _ in range(UW)]
                    for _ in range(R)]
        for u in range(unroll):
            j = jb * unroll + u          # tile-local 0-based column
            g = ct * L2t + j             # global 0-based; DP column g+1
            A_sp = S_ref[0, g]           # row i*R state at DP col g+1
            GA_sp = S_ref[1, g]
            GB_sp = S_ref[2, g]
            goB_j = colpen_ref[0, 0, j]
            geB_j = colpen_ref[0, 1, j]
            tgeB_j = colpen_ref[0, 2, j]
            is_term_col = lb_v == g + 1
            if with_bias:
                # cols_eps (= (g+1) * eps) is a precomputed colpen
                # slot: an in-kernel mul feeding the sub would
                # FMA-contract (observed 1-ulp drift vs the oracle)
                cols_eps_j = colpen_ref[0, 3, j]

            diag = Sup                   # row above, DP col g
            up = (A_sp, GA_sp, GB_sp)    # row above, DP col g+1
            new_scur = []
            for r in range(R):
                leftA, leftGA, _ = Scur[r]
                m = match_ref[0, r, j]
                if with_bias:
                    m = m - jnp.abs(cols_eps_j - row_term[r])

                # --- A ---
                diagA, diagGA, diagGB = diag
                dGA = diagGA + goB_prev
                dGB = diagGB + goA_prev[r]
                best01 = jnp.maximum(diagA, dGA)
                A_new = jnp.maximum(best01, dGB) + m

                # --- GB (from the row above at this column) ---
                ge_eff = jnp.where(is_term_col, tgeA_i[r], geA_i[r])
                go_eff = jnp.where(is_term_col, tgeA_i[r], goA_i[r])
                gb_e = up[2] + ge_eff
                gb_o = up[0] + go_eff
                GB_new = jnp.maximum(gb_e, gb_o)

                # --- GA (direct in-row recurrence) ---
                ge_row = jnp.where(is_last_row[r], tgeB_j, geB_j)
                go_row = jnp.where(is_last_row[r], tgeB_j, goB_j)
                ga_e = leftGA + ge_row
                ga_o = leftA + go_row
                GA_new = jnp.maximum(ga_e, ga_o)

                if with_dec:
                    # reference MAX3 keeps the LATER operand on ties;
                    # gap decisions open on ties (strict > for extend)
                    dec = jnp.where(dGA >= diagA, 1, 0)
                    dec = jnp.where(dGB >= best01, 2, dec)
                    dec = dec | jnp.where(ga_e > ga_o, DEC_GA_EXT, 0)
                    dec = dec | jnp.where(gb_e > gb_o, DEC_GB_EXT, 0)
                    dec_accs[r][u // 4] = \
                        dec_accs[r][u // 4] | (dec << (4 * (u % 4)))

                # freeze state beyond row la (the final extraction
                # reads each problem's row-la values)
                eff = (jnp.where(row_valid[r], A_new, up[0]),
                       jnp.where(row_valid[r], GA_new, up[1]),
                       jnp.where(row_valid[r], GB_new, up[2]))
                diag = Scur[r]           # next row's diag: row r @ col g
                up = eff                 # next row's up: row r @ col g+1
                new_scur.append(eff)

            S_ref[0, g] = up[0]          # block's last row -> next block
            S_ref[1, g] = up[1]
            S_ref[2, g] = up[2]
            Sup = (A_sp, GA_sp, GB_sp)
            Scur = tuple(new_scur)
            goB_prev = goB_j
        if with_dec:
            for r in range(R):
                for w in range(UW):
                    dec_ref[0, r, jb * UW + w] = dec_accs[r][w]
        return (Sup, Scur, goB_prev)

    Sup0 = (bnd_ref[0, 0], bnd_ref[0, 1], bnd_ref[0, 2])
    Scur0 = tuple((bnd_ref[1 + r, 0], bnd_ref[1 + r, 1], bnd_ref[1 + r, 2])
                  for r in range(R))
    Sup, Scur, goB_prev = jax.lax.fori_loop(
        0, L2t // unroll, col_block, (Sup0, Scur0, gpb_ref[0]))

    # hand the tile boundary to the next grid step (ct+1); the last
    # tile's write is consumed by no one (the next step re-inits)
    bnd_ref[0, 0], bnd_ref[0, 1], bnd_ref[0, 2] = Sup
    for r in range(R):
        bnd_ref[1 + r, 0], bnd_ref[1 + r, 1], bnd_ref[1 + r, 2] = Scur[r]
    gpb_ref[0] = goB_prev

    @pl.when((i == L1R - 1) & (ct == CT - 1))
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


def _prep_streams(pens_cols, pens_rows, la, lb, slope, bias_eps,
                  with_bias, B, L1p, L2p):
    """Laned penalty/boundary streams shared by the match-stream and
    fused-operand forwards (identical float op order in both)."""
    lab = _to_lanes(jnp.stack([la, lb], axis=1).astype(jnp.int32))
    # slot 1 carries goB[0] (the row-entry close-open addend); the
    # in-kernel column loop then needs only goB[j] loads
    slope_eps = slope.astype(jnp.float32) * bias_eps.astype(jnp.float32)
    biasv = _to_lanes(jnp.stack([
        slope_eps, pens_cols[:, 0, 0].astype(jnp.float32)], axis=1))

    goB = pens_cols[:, 0, :]
    geB = pens_cols[:, 1, :]
    tgeB = pens_cols[:, 2, :]
    cp = [goB[:, 1:L2p + 1], geB[:, 1:L2p + 1], tgeB[:, 1:L2p + 1]]
    if with_bias:
        cp.append(jnp.arange(1, L2p + 1, dtype=jnp.float32)[None, :]
                  * bias_eps.astype(jnp.float32)[:, None])
    colpen = _to_lanes(jnp.stack(cp, axis=1))  # [NB, ncp, L2p, 8, 128]

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
        goA[:, :L1p], gb0_prev, row_term,
        cum_tgeA], axis=1))                          # [NB, 7, L1p, 8, 128]
    rowpen = jnp.transpose(rowpen, (0, 2, 1, 3, 4))  # [NB, L1p, 7, 8, 128]
    return lab, biasv, colpen, ga0, rowpen, cum_tgeA


@functools.partial(jax.jit,
                   static_argnames=("interpret", "with_dec", "with_bias",
                                    "unroll", "plan", "pre_laned"))
def gotoh_forward_lanewise(match, pens_cols, pens_rows, la, lb,
                           interpret=False, with_dec=True,
                           slope=None, bias_eps=None, with_bias=True,
                           unroll=PACK, plan=None, pre_laned=False):
    """match [B, L1p, L2p] f32 (or the laned [NB, L1p, L2p, 8, 128]
    layout directly with pre_laned=True — producers that can emit it
    skip a full [B*L1p*L2p] HBM relayout pass, which at 1024x384x384
    costs as much HBM traffic as the kernel's own match read);
    pens_cols [B, 3, L2p+1]; pens_rows [B, 3, L1p+1]; la, lb [B] int32;
    B a multiple of 1024.

    plan: optional static (R, L2t) row-block / column-tile override;
    defaults to lanewise_plan's choice.

    Returns (dec, score [B], end_state [B]).  dec is the packed
    [NB, L1p, L2p//4, 8, 128] int32 nibble layout (cell (b, i, j) with
    b = nb*1024 + s*128 + l lives in dec[nb, i, j//4, s, l] at nibble
    j%4); walk it with traceback_lanewise.  Same DP semantics as
    tpu/gotoh.py (row r = DP row r+1, col c = DP column c+1)."""
    if pre_laned:
        _, L1p, L2p = match.shape[:3]
        B = match.shape[0] * BT
    else:
        B, L1p, L2p = match.shape
    assert B % BT == 0, (B, BT)
    # the nibble-packed decision layout is defined by PACK; the
    # walkers/unpackers decode with PACK, so the unroll must cover
    # whole decision words when decisions are on
    assert unroll % PACK == 0 or not with_dec, (unroll, PACK)
    if plan is None:
        R, L2t, ok = lanewise_plan(B, L1p, L2p)
        assert ok, ("no feasible lanewise plan", B, L1p, L2p)
    else:
        R, L2t = plan
    assert L1p % R == 0 and L2p % L2t == 0, (L1p, R, L2p, L2t)
    assert L2t % unroll == 0, (L2t, unroll)
    CT = L2p // L2t
    L1R = L1p // R
    NB = B // BT

    if slope is None:
        slope = jnp.zeros(B, jnp.float32)
    if bias_eps is None:
        bias_eps = jnp.zeros(B, jnp.float32)

    ncp = 4 if with_bias else 3
    m5 = match if pre_laned else _to_lanes(match)  # [NB, L1p, L2p, 8, 128]
    lab, biasv, colpen, ga0, rowpen, cum_tgeA = _prep_streams(
        pens_cols, pens_rows, la, lb, slope, bias_eps, with_bias,
        B, L1p, L2p)

    grid = (NB, L1R, CT)
    kernel = functools.partial(_kernel, L1p=L1p, L2p=L2p, L2t=L2t,
                               R=R, CT=CT,
                               with_dec=with_dec, with_bias=with_bias,
                               unroll=unroll)
    L2t4 = L2t // PACK
    dec_shape = ((NB, L1p, L2p // PACK, 8, 128) if with_dec
                 else (NB, 1, 1, 8, 128))
    dec_map = ((lambda b, i, ct: (b, i, ct, 0, 0)) if with_dec
               else (lambda b, i, ct: (b, 0, 0, 0, 0)))
    dec, score, state = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, 8, 128), lambda b, i, ct: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 8, 128), lambda b, i, ct: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, L2t, 8, 128),
                         lambda b, i, ct: (b, i, ct, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 7, 8, 128),
                         lambda b, i, ct: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ncp, L2t, 8, 128),
                         lambda b, i, ct: (b, 0, ct, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L2t, 8, 128),
                         lambda b, i, ct: (b, 0, ct, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, R, L2t4, 8, 128) if with_dec
                         else (1, 1, 1, 8, 128), dec_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda b, i, ct: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda b, i, ct: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(dec_shape, jnp.int32),
            jax.ShapeDtypeStruct((NB, 1, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((NB, 1, 8, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, L2p, 8, 128), jnp.float32),
            pltpu.VMEM((R + 1, 3, 8, 128), jnp.float32),
            pltpu.VMEM((1, 8, 128), jnp.float32),
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


def fused_vmem_bytes(L2p: int, nc: int, R: int = 1, L2t: int = None,
                     ncp: int = 4) -> int:
    """VMEM of one FUSED kernel instance: the double-buffered match
    stream (2*R*L2t) is replaced by the operand streams X (2*R*nc) and
    Y (2*nc*L2t); everything else matches lanewise_vmem_bytes."""
    if L2t is None:
        L2t = L2p
    f = 4
    tile = 8 * 128
    return (3 * L2p * tile * f            # state scratch (full width)
            + 2 * R * nc * tile * f       # X rows in, double-buffered
            + 2 * nc * L2t * tile * f     # Y cols in, double-buffered
            + 2 * ncp * L2t * tile * f    # colpen stream
            + 2 * L2t * tile * f          # ga0 stream
            + 2 * R * (L2t // PACK) * tile * f   # dec out (int32 nibbles)
            + 2 * R * 7 * tile * f        # rowpen stream
            + (3 * (R + 1) + 1) * tile * f  # boundary scratch
            + 8 * tile * f)               # lab/bias/score/state pads


def fused_plan(B: int, L1p: int, L2p: int, nc: int,
               vmem_budget: int = 11 * 2**20):
    """Choose (R, L2t, feasible) for the fused-operand kernel.

    The Y stream reloads once per grid step (HBM cost nc*4/R bytes per
    cell), so prefer LARGE R first — at R=8 a 5-letter DNA problem pays
    ~2.5 B/cell for Y vs ~12 B/cell for a materialised match stream.
    KALIGN_TPU_FUSED_PLAN="R,L2t" overrides for on-chip tuning."""
    import os
    if B % BT or B < BT or L2p % PACK:
        return 0, 0, False
    ov = os.environ.get("KALIGN_TPU_FUSED_PLAN")
    if ov:
        r, l2t = (int(x) for x in ov.split(","))
        return r, l2t, True
    tiles = [L2p // ct for ct in range(1, 9)
             if L2p % ct == 0 and (L2p // ct) % PACK == 0]
    for R in (8, 4, 16, 2, 1):
        if L1p % R:
            continue
        for L2t in tiles:
            if fused_vmem_bytes(L2p, nc, R, L2t) <= vmem_budget:
                return R, L2t, True
    return 0, 0, False


def fused_feasible(B: int, L1p: int, L2p: int, nc: int,
                   vmem_budget: int = 11 * 2**20) -> bool:
    return fused_plan(B, L1p, L2p, nc, vmem_budget)[2]


def _fused_kernel(lab_ref, bias_ref, x_ref, y_ref, rowpen_ref, colpen_ref,
                  ga0_ref, dec_ref, score_ref, state_ref, S_ref, bnd_ref,
                  gpb_ref, *, L1p, L2p, L2t, R, CT, NC, with_dec, with_bias,
                  unroll):
    """_kernel with the match STREAM replaced by in-kernel match
    COMPUTATION: m(i, j) = sum_c X[i, c] * Y[c, j] per problem (an
    ascending-c multiply-add chain; X rows hoisted per block row).
    Everything else — op order, decision encoding, boundary carries —
    is identical to _kernel.

    x_ref [1, R, NC, 8, 128]: the lhs rows of this block (counts or
    substitution rows, aln_run.c operand orientation); y_ref
    [1, NC, L2t, 8, 128]: the rhs columns of this tile.  The dot
    replaces a [B, L1p, L2p] HBM match array (written by the producer
    matmul, re-read by the relayout and the kernel: ~12 B/cell) with
    nc multiply-adds per cell and an nc*4/R B/cell Y reload."""
    i = pl.program_id(1)
    ct = pl.program_id(2)
    L1R = L1p // R

    la_v = lab_ref[0, 0]            # [8, 128] int32
    lb_v = lab_ref[0, 1]
    neg = jnp.full((8, 128), NEG)

    @pl.when(i == 0)
    def _init_tile():
        S_ref[0, pl.ds(ct * L2t, L2t)] = jnp.full((L2t, 8, 128), NEG)
        S_ref[1, pl.ds(ct * L2t, L2t)] = ga0_ref[0, 0]
        S_ref[2, pl.ds(ct * L2t, L2t)] = jnp.full((L2t, 8, 128), NEG)

    @pl.when(ct == 0)
    def _init_bnd():
        bnd_ref[0, 0] = jnp.where(i == 0, jnp.zeros((8, 128), jnp.float32),
                                  neg)
        bnd_ref[0, 1] = neg
        bnd_ref[0, 2] = rowpen_ref[0, 0, 4]          # GB[i*R, 0]
        for r in range(R):
            bnd_ref[1 + r, 0] = neg
            bnd_ref[1 + r, 1] = neg
            bnd_ref[1 + r, 2] = rowpen_ref[0, r, 6]  # GB[i*R+r+1, 0]
        gpb_ref[0] = bias_ref[0, 1]                  # goB[0]

    goA_i = [rowpen_ref[0, r, 0] for r in range(R)]
    geA_i = [rowpen_ref[0, r, 1] for r in range(R)]
    tgeA_i = [rowpen_ref[0, r, 2] for r in range(R)]
    goA_prev = [rowpen_ref[0, r, 3] for r in range(R)]
    if with_bias:
        row_term = [rowpen_ref[0, r, 5] for r in range(R)]
    row_valid = [la_v >= i * R + r + 1 for r in range(R)]
    is_last_row = [la_v == i * R + r + 1 for r in range(R)]
    # lhs rows of this block, hoisted out of the column loop
    X_i = [[x_ref[0, r, c] for c in range(NC)] for r in range(R)]

    UW = unroll // 4
    def col_block(jb, carry):
        Sup, Scur, goB_prev = carry
        dec_accs = [[jnp.zeros((8, 128), jnp.int32) for _ in range(UW)]
                    for _ in range(R)]
        for u in range(unroll):
            j = jb * unroll + u          # tile-local 0-based column
            g = ct * L2t + j             # global 0-based; DP column g+1
            A_sp = S_ref[0, g]
            GA_sp = S_ref[1, g]
            GB_sp = S_ref[2, g]
            goB_j = colpen_ref[0, 0, j]
            geB_j = colpen_ref[0, 1, j]
            tgeB_j = colpen_ref[0, 2, j]
            is_term_col = lb_v == g + 1
            if with_bias:
                cols_eps_j = colpen_ref[0, 3, j]
            Y_j = [y_ref[0, c, j] for c in range(NC)]

            diag = Sup
            up = (A_sp, GA_sp, GB_sp)
            new_scur = []
            for r in range(R):
                leftA, leftGA, _ = Scur[r]
                # in-kernel match: ascending-c multiply-add chain (the
                # numpy oracle replicates this order; see the FMA note
                # on gotoh_forward_fused)
                m = X_i[r][0] * Y_j[0]
                for c in range(1, NC):
                    m = m + X_i[r][c] * Y_j[c]
                if with_bias:
                    m = m - jnp.abs(cols_eps_j - row_term[r])

                # --- A ---
                diagA, diagGA, diagGB = diag
                dGA = diagGA + goB_prev
                dGB = diagGB + goA_prev[r]
                best01 = jnp.maximum(diagA, dGA)
                A_new = jnp.maximum(best01, dGB) + m

                # --- GB (from the row above at this column) ---
                ge_eff = jnp.where(is_term_col, tgeA_i[r], geA_i[r])
                go_eff = jnp.where(is_term_col, tgeA_i[r], goA_i[r])
                gb_e = up[2] + ge_eff
                gb_o = up[0] + go_eff
                GB_new = jnp.maximum(gb_e, gb_o)

                # --- GA (direct in-row recurrence) ---
                ge_row = jnp.where(is_last_row[r], tgeB_j, geB_j)
                go_row = jnp.where(is_last_row[r], tgeB_j, goB_j)
                ga_e = leftGA + ge_row
                ga_o = leftA + go_row
                GA_new = jnp.maximum(ga_e, ga_o)

                if with_dec:
                    dec = jnp.where(dGA >= diagA, 1, 0)
                    dec = jnp.where(dGB >= best01, 2, dec)
                    dec = dec | jnp.where(ga_e > ga_o, DEC_GA_EXT, 0)
                    dec = dec | jnp.where(gb_e > gb_o, DEC_GB_EXT, 0)
                    dec_accs[r][u // 4] = \
                        dec_accs[r][u // 4] | (dec << (4 * (u % 4)))

                eff = (jnp.where(row_valid[r], A_new, up[0]),
                       jnp.where(row_valid[r], GA_new, up[1]),
                       jnp.where(row_valid[r], GB_new, up[2]))
                diag = Scur[r]
                up = eff
                new_scur.append(eff)

            S_ref[0, g] = up[0]
            S_ref[1, g] = up[1]
            S_ref[2, g] = up[2]
            Sup = (A_sp, GA_sp, GB_sp)
            Scur = tuple(new_scur)
            goB_prev = goB_j
        if with_dec:
            for r in range(R):
                for w in range(UW):
                    dec_ref[0, r, jb * UW + w] = dec_accs[r][w]
        return (Sup, Scur, goB_prev)

    Sup0 = (bnd_ref[0, 0], bnd_ref[0, 1], bnd_ref[0, 2])
    Scur0 = tuple((bnd_ref[1 + r, 0], bnd_ref[1 + r, 1], bnd_ref[1 + r, 2])
                  for r in range(R))
    Sup, Scur, goB_prev = jax.lax.fori_loop(
        0, L2t // unroll, col_block, (Sup0, Scur0, gpb_ref[0]))

    bnd_ref[0, 0], bnd_ref[0, 1], bnd_ref[0, 2] = Sup
    for r in range(R):
        bnd_ref[1 + r, 0], bnd_ref[1 + r, 1], bnd_ref[1 + r, 2] = Scur[r]
    gpb_ref[0] = goB_prev

    @pl.when((i == L1R - 1) & (ct == CT - 1))
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


@functools.partial(jax.jit,
                   static_argnames=("interpret", "with_dec", "with_bias",
                                    "unroll", "plan"))
def gotoh_forward_fused(lhs, rhs, pens_cols, pens_rows, la, lb,
                        interpret=False, with_dec=True,
                        slope=None, bias_eps=None, with_bias=True,
                        unroll=PACK, plan=None):
    """Fused-operand lanewise forward: the [B, L1p, L2p] match array is
    never materialised — the kernel computes m(i, j) = sum_c
    lhs[i, c] * rhs[j, c] per cell from the operand streams.

    lhs [B, L1p, nc] f32, rhs [B, L2p, nc] f32 — the SAME operands the
    engine feeds its producer matmul (counts one side, substitution
    rows the other, aln_setup.c:40-99 profile semantics).  Callers
    slice nc to the live alphabet (5 for DNA/RNA, 23 for protein):
    exact, because the counts side is zero beyond the alphabet, so the
    dropped chain terms are exact zeros.

    Float contract: the in-kernel chain multiplies and adds in
    ascending-c order; vs the producer matmul's MXU accumulation the
    result can differ in the last ulp, so near-score-tie paths may
    differ from the match-stream path (both score-optimal — the
    tpu-fast engine family's documented contract).  If Mosaic
    contracts a chain step into an FMA the rounding changes again;
    the differential tests therefore drive this kernel with
    dyadic-valued operands (exactly representable products and sums),
    where every compilation rounds identically and the numpy oracle
    `gotoh_forward_direct_np(..., operands=(lhs, rhs))` must match
    BITWISE.  Scores on arbitrary float data are additionally checked
    against the match-stream path to ~1e-4 relative."""
    B, L1p, NC = lhs.shape
    L2p = rhs.shape[1]
    assert rhs.shape == (B, L2p, NC), (lhs.shape, rhs.shape)
    assert B % BT == 0, (B, BT)
    assert unroll % PACK == 0 or not with_dec, (unroll, PACK)
    if plan is None:
        R, L2t, ok = fused_plan(B, L1p, L2p, NC)
        assert ok, ("no feasible fused plan", B, L1p, L2p, NC)
    else:
        R, L2t = plan
    assert L1p % R == 0 and L2p % L2t == 0, (L1p, R, L2p, L2t)
    assert L2t % unroll == 0, (L2t, unroll)
    CT = L2p // L2t
    L1R = L1p // R
    NB = B // BT

    if slope is None:
        slope = jnp.zeros(B, jnp.float32)
    if bias_eps is None:
        bias_eps = jnp.zeros(B, jnp.float32)

    ncp = 4 if with_bias else 3
    lab, biasv, colpen, ga0, rowpen, cum_tgeA = _prep_streams(
        pens_cols, pens_rows, la, lb, slope, bias_eps, with_bias,
        B, L1p, L2p)

    xl = _to_lanes(lhs.astype(jnp.float32))   # [NB, L1p, NC, 8, 128]
    yl = _to_lanes(jnp.transpose(rhs.astype(jnp.float32), (0, 2, 1)))
    # yl: [NB, NC, L2p, 8, 128] — an O(L*nc) relayout, not O(L^2)

    grid = (NB, L1R, CT)
    kernel = functools.partial(_fused_kernel, L1p=L1p, L2p=L2p, L2t=L2t,
                               R=R, CT=CT, NC=NC,
                               with_dec=with_dec, with_bias=with_bias,
                               unroll=unroll)
    L2t4 = L2t // PACK
    dec_shape = ((NB, L1p, L2p // PACK, 8, 128) if with_dec
                 else (NB, 1, 1, 8, 128))
    dec_map = ((lambda b, i, ct: (b, i, ct, 0, 0)) if with_dec
               else (lambda b, i, ct: (b, 0, 0, 0, 0)))
    dec, score, state = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, 8, 128), lambda b, i, ct: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 8, 128), lambda b, i, ct: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, NC, 8, 128),
                         lambda b, i, ct: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NC, L2t, 8, 128),
                         lambda b, i, ct: (b, 0, ct, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 7, 8, 128),
                         lambda b, i, ct: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ncp, L2t, 8, 128),
                         lambda b, i, ct: (b, 0, ct, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L2t, 8, 128),
                         lambda b, i, ct: (b, 0, ct, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, R, L2t4, 8, 128) if with_dec
                         else (1, 1, 1, 8, 128), dec_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda b, i, ct: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda b, i, ct: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(dec_shape, jnp.int32),
            jax.ShapeDtypeStruct((NB, 1, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((NB, 1, 8, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, L2p, 8, 128), jnp.float32),
            pltpu.VMEM((R + 1, 3, 8, 128), jnp.float32),
            pltpu.VMEM((1, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(lab, biasv, xl, yl, rowpen, colpen, ga0)

    score = score.reshape(NB * BT)
    state = state.reshape(NB * BT)

    lb0_score = jnp.take_along_axis(
        jnp.concatenate([jnp.zeros((B, 1), jnp.float32), cum_tgeA], axis=1),
        la[:, None].astype(jnp.int32), axis=1)[:, 0]
    is_lb0 = lb == 0
    score = jnp.where(is_lb0, lb0_score, score)
    state = jnp.where(is_lb0, 2, state)
    return dec, score, state


def gotoh_forward_direct_np(match, pens_cols, pens_rows, la, lb,
                            slope=None, bias_eps=None, operands=None):
    """Float32 numpy oracle with the lanewise kernel's exact op order
    (direct GA recurrence).  Vectorized over the batch; loops over
    (i, j).  Returns (dec [B, L1p, L2p] uint8, score [B], state [B]).

    operands=(lhs [B, L1p, nc], rhs [B, L2p, nc]): replicate the FUSED
    kernel instead — the match is an ascending-c f32 multiply-add
    chain per cell (separate mul/add roundings; bitwise-equal to the
    kernel whenever the chain values are exactly representable, e.g.
    dyadic test data — see gotoh_forward_fused's float contract)."""
    if operands is not None:
        lhs_o = np.asarray(operands[0], np.float32)
        rhs_o = np.asarray(operands[1], np.float32)
        B, L1p, nc_o = lhs_o.shape
        L2p = rhs_o.shape[1]
        match = np.zeros((B, L1p, L2p), np.float32)
        for c in range(nc_o):
            prod = (lhs_o[:, :, None, c] * rhs_o[:, None, :, c]).astype(
                np.float32)
            match = (match + prod).astype(np.float32) if c else prod
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
