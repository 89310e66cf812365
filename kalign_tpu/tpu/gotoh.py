"""TPU-native Gotoh affine-gap DP.

Design (not a port of the reference's Hirschberg scheme):

  * match scores for a whole merge are ONE matmul on the MXU:
      match = rows_counts @ cols_subrows^T            [L1, L2]
    (a sequence is a one-hot profile, so residue x residue and
    residue x profile reduce to the same contraction)
  * the DP runs as a `lax.scan` over rows; within a row the affine
    gap-in-row state GA obeys the max-plus recurrence
      GA[j] = max(GA[j-1] + ge[j], A[j-1] + go[j])
    which is solved in O(log L) depth with a cummax after the
    transform u[k] = A[k] + go[k+1] - C[k+1], C = cumsum(ge):
      GA[j] = (shifted cummax of u)[j] + C[j]
    so each row is pure vector work on the VPU — no wavefront needed.
  * A and GB depend only on the previous row (elementwise).
  * per-cell decisions are packed into an int8 matrix; traceback is a
    single O(L1+L2) walk (host-side numpy on the fetched byte matrix).

Scoring semantics follow the reference (lib/src/aln_profileprofile.c):
per-column gap penalties carried in profile columns, terminal gaps on
the four matrix edges charged at tgpe with no opening cost.

The batched variant vmaps over many padded merge problems (one guide
tree level per launch).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

NEG = jnp.float32(-3.4e38)

# decision encodings
#   A-cell (bits 0-1): 0 = diagonal from A, 1 = from GA, 2 = from GB
#   GA-cell (bit 2):   set = extend (from GA), clear = open (from A)
#   GB-cell (bit 3):   set = extend (from GB), clear = open (from A)
DEC_A_MASK = 3
DEC_GA_EXT = 4
DEC_GB_EXT = 8


@partial(jax.jit, static_argnames=("with_dec",))
def gotoh_forward(match, goB, geB, tgeB, goA, geA, tgeA, la, lb,
                  with_dec=True):
    """Full-matrix forward DP.

    match : [L1p, L2p] match scores, 1-based semantics (match[i-1, j-1]
            scores pairing row residue i with col residue j); padded.
    goB/geB/tgeB : [L2p+1] per-column gap penalties of the column side,
            1-based (entry j applies at DP column j); stored NEGATIVE
            (reference profile convention).
    goA/geA/tgeA : [L1p+1] per-row penalties of the row side.
    la, lb : actual lengths (dynamic, <= padded).

    Returns (dec [L1p+1, L2p+1] int8, A_last, GA_last, GB_last rows,
             best score).
    """
    L1p = match.shape[0]
    L2p = match.shape[1]
    cols = jnp.arange(L2p + 1)
    col_valid = cols <= lb
    is_last_col = cols == lb

    # effective col-side penalties for interior GA moves
    # (terminal rows handled per-row below)
    geB_in = geB
    goB_in = goB

    # cumulative sums for the scan transform (computed per row because
    # terminal rows switch to tgeB)
    def make_row0():
        # GA[0][j] = max(GA[0][j-1], A[0][j-1]) + tgeB[j]; A[0][0] = 0
        # leading run: GA[0][j] = sum(tgeB[1..j])
        csum = jnp.cumsum(jnp.where(cols == 0, 0.0, tgeB))
        GA0 = jnp.where(cols >= 1, csum, NEG)
        GA0 = jnp.where(col_valid, GA0, NEG)
        # + 0*tgeB ties the constant rows to the inputs so the scan
        # carry has consistent varying-axes under shard_map
        A0 = jnp.where(cols == 0, 0.0, NEG).astype(jnp.float32) + 0.0 * tgeB
        GB0 = jnp.full(L2p + 1, NEG) + 0.0 * tgeB
        return A0, GA0, GB0

    A0, GA0, GB0 = make_row0()

    rows = jnp.arange(1, L1p + 1)

    def step(carry, xs):
        A_prev, GA_prev, GB_prev = carry
        # match rows and per-row penalties are fed through the scan to
        # avoid per-step dynamic gathers (they compile poorly on TPU)
        i, m_row, goA_i, geA_i, tgeA_i, goA_prev = xs
        row_valid = i <= la
        is_last_row = i == la
        # A[i][j] = max3(A', GA'+goB[j-1], GB'+goA[i-1]) + match   (j>=1)
        diagA = A_prev[:-1]
        diagGA = GA_prev[:-1] + goB[:-1]          # goB[j-1]
        diagGB = GB_prev[:-1] + goA_prev
        best01 = jnp.maximum(diagA, diagGA)
        # reference MAX3 keeps the LATER operand on ties (a > b ? a : b)
        dec_a = jnp.where(diagGA >= diagA, 1, 0)
        dec_a = jnp.where(diagGB >= best01, 2, dec_a)
        diag = jnp.maximum(best01, diagGB) + m_row
        A_row = jnp.concatenate([jnp.array([NEG]), diag])
        A_row = jnp.where(col_valid, A_row, NEG)
        A_row = jnp.where(cols == 0, NEG, A_row)

        # GB[i][j] = max(GB'[j] + geA_i, A'[j] + goA_i); terminal on
        # col 0 and col lb: tgeA with no open
        gb_ext = GB_prev + geA_i
        gb_open = A_prev + goA_i
        gb_ext_t = GB_prev + tgeA_i
        gb_open_t = A_prev + tgeA_i
        is_term_col = (cols == 0) | is_last_col
        gb_e = jnp.where(is_term_col, gb_ext_t, gb_ext)
        gb_o = jnp.where(is_term_col, gb_open_t, gb_open)
        GB_row = jnp.maximum(gb_e, gb_o)
        dec_gb = (gb_e > gb_o).astype(jnp.int8)
        GB_row = jnp.where(col_valid, GB_row, NEG)

        # GA[i][j] = max(GA[i][j-1] + ge[j], A[i][j] ... careful:
        # open uses A of the CURRENT row at j-1.
        ge_row = jnp.where(is_last_row, tgeB, geB_in)
        go_row = jnp.where(is_last_row, tgeB, goB_in)
        C = jnp.cumsum(jnp.where(cols == 0, 0.0, ge_row))
        # u[k] = A_row[k] + (go[k+1] - C[k+1]) for k = 0..L2p-1; the
        # (go - C) pairing matches the Pallas kernel's precomputed gnC
        # slots so both engines round u identically
        u = A_row[:-1] + (go_row[1:] - C[1:])
        cmax = jax.lax.cummax(u)
        GA_row = jnp.concatenate([jnp.array([NEG]), cmax + C[1:]])
        GA_row = jnp.where(col_valid, GA_row, NEG)
        # decision: extend iff GA[j-1] + ge[j] > A[j-1] + go[j].  Both
        # sides share the +C[j] term (C[j] = C[j-1] + ge[j]), so the
        # candidate compare reduces to cm[j-2] > u[j-1]; and since
        # cm[j-1] = max(cm[j-2], u[j-1]) that is exactly
        # cm[j-1] > u[j-1] — one elementwise compare on values the
        # scan already produced, with the reference's open-on-tie
        # preference preserved (ties make the compare false)
        dec_ga = jnp.concatenate(
            [jnp.zeros(1, jnp.int8), (cmax > u).astype(jnp.int8)])

        dec_row = (jnp.concatenate([jnp.zeros(1, jnp.int8),
                                    dec_a.astype(jnp.int8)])
                   | (dec_ga << 2)
                   | (dec_gb << 3))
        # rows beyond la: pass state through unchanged
        A_out = jnp.where(row_valid, A_row, A_prev)
        GA_out = jnp.where(row_valid, GA_row, GA_prev)
        GB_out = jnp.where(row_valid, GB_row, GB_prev)
        return (A_out, GA_out, GB_out), dec_row

    xs = (rows, match, goA[1:], geA[1:], tgeA[1:],
          jax.lax.dynamic_slice_in_dim(goA, 0, L1p))
    (A_f, GA_f, GB_f), dec = jax.lax.scan(step, (A0, GA0, GB0), xs)
    dec0 = jnp.zeros((1, L2p + 1), dtype=jnp.int8)
    dec_full = jnp.concatenate([dec0, dec], axis=0)
    end_a = A_f[lb]
    end_ga = GA_f[lb]
    end_gb = GB_f[lb]
    score = jnp.maximum(jnp.maximum(end_a, end_ga), end_gb)
    end_state = jnp.where(end_ga > end_a,
                          jnp.where(end_gb > end_ga, 2, 1),
                          jnp.where(end_gb > end_a, 2, 0))
    return dec_full, score, end_state


_batched_forward = jax.jit(
    jax.vmap(lambda m, goB, geB, tgeB, goA, geA, tgeA, la, lb:
             gotoh_forward(m, goB, geB, tgeB, goA, geA, tgeA, la, lb)),
)


def traceback(dec: np.ndarray, la: int, lb: int, end_state: int):
    """Recover the step path from the packed decision matrix.
    Returns list of steps over (1=gap in rows/consume col,
    2=gap in cols/consume row, 0=match) in forward order —
    matching the reference's 0/1/2 path convention where the row side
    is group A."""
    steps = []
    i, j = la, lb
    state = int(end_state)
    while i > 0 or j > 0:
        if state == 0:  # in A (match cell)
            if i == 0 or j == 0:
                # shouldn't happen; fall into gap states
                state = 1 if j > 0 else 2
                continue
            d = dec[i, j] & DEC_A_MASK
            steps.append(0)
            i -= 1
            j -= 1
            state = d  # 0=A, 1=GA, 2=GB
        elif state == 1:  # in GA: gap in rows, consumes col j
            if j == 0:
                state = 2
                continue
            ext = dec[i, j] & DEC_GA_EXT
            steps.append(1)
            j -= 1
            state = 1 if ext else 0
        else:  # state == 2, GB: gap in cols, consumes row i
            if i == 0:
                state = 1
                continue
            ext = dec[i, j] & DEC_GB_EXT
            steps.append(2)
            i -= 1
            state = 2 if ext else 0
    steps.reverse()
    return steps


def steps_to_kalign_path(steps, la, lb):
    """Convert 0/1/2 steps to the reference's annotated path array
    (path[0]=len, entries with terminal-gap flag bit 32, sentinel 3),
    matching add_gap_info_to_path_n output so downstream profile
    merging / weaving is shared."""
    n = len(steps)
    path = np.zeros(n + 2, dtype=np.int32)
    path[0] = n
    for c, s in enumerate(steps, start=1):
        path[c] = s
    path[n + 1] = 3
    # terminal flags: leading run of gap steps, trailing run
    c = 1
    while c <= n and path[c] != 0:
        path[c] |= 32
        c += 1
    c = n
    while c >= 1 and (path[c] & 3) != 0:
        path[c] |= 32
        c -= 1
    return path
