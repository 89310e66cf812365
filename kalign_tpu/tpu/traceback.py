"""On-device traceback over packed decision matrices.

Walks the [L1p, L2p] decision matrix produced by the forward kernel
(row r = DP row r+1, col c = DP column c+1; DP column 0 is analytic:
only its GB bit matters and it is "open" exactly at row 1) with a
lax.while_loop, emitting the 0/1/2 step sequence in reverse.  Keeping
this on device means only the O(L1+L2) step list crosses HBM->host (the
decision matrix itself — up to GBs for a level batch — never moves).

The loop body is unrolled UNROLL steps per iteration with an explicit
active mask (finished walks emit nothing): loop-iteration overhead, not
the 1-byte gathers, dominates the walk's runtime on TPU.

vmapped over the merge batch; each lane walks independently.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

DEC_A_MASK = 3
DEC_GA_EXT = 4
DEC_GB_EXT = 8
STEP_PAD = 3

UNROLL = 4


def _walk(fetch, la_b, lb_b, st_b, max_steps):
    """Single-problem traceback walk over a decision `fetch(i, j)`
    closure (returns the packed decision byte at DP cell (i, j) as
    int32, for i, j >= 1).  Shared by the int8-matrix and the
    lanewise nibble-packed layouts."""
    # + 0*la_b ties the constant carries to the inputs so the
    # loop carry has consistent varying-axes under shard_map.
    # The steps buffer is int32 INSIDE the loop: a vmapped int8
    # scatter (steps.at[n].set) miscompiles on TPU at batch sizes
    # >= ~1024 (walks silently corrupt; verified against identical
    # data at smaller batches); int32 scatters are sound.  Cast to
    # int8 only at the end.
    zero = (la_b * 0).astype(jnp.int32)
    steps = jnp.full((max_steps,), STEP_PAD, jnp.int32) + zero

    def substep(c):
        i, j, st, n, steps = c
        active = (i > 0) | (j > 0)
        d = fetch(jnp.maximum(i - 1, 0), jnp.maximum(j - 1, 0))
        # DP column 0 is not materialised: its only consulted bit is
        # GB's, which is "open from A" exactly at row 1
        d = jnp.where(j > 0, d,
                      jnp.where(i > 1, DEC_GB_EXT, 0))

        # state A at (i, j): emit match, move diagonally
        in_a = st == 0
        # degenerate guards (mirror host traceback)
        a_fix = in_a & ((i == 0) | (j == 0))
        st = jnp.where(a_fix, jnp.where(j > 0, 1, 2), st)
        in_a = st == 0

        in_ga = st == 1
        ga_fix = in_ga & (j == 0)
        st = jnp.where(ga_fix, 2, st)
        in_ga = st == 1
        in_gb = st == 2
        gb_fix = in_gb & (i == 0)
        st = jnp.where(gb_fix, 1, st)
        in_gb = st == 2
        in_ga = st == 1
        in_a = st == 0

        emit = jnp.where(in_a, 0, jnp.where(in_ga, 1, 2))
        steps = steps.at[n].set(jnp.where(active, emit, STEP_PAD))

        next_i = jnp.where(in_a | in_gb, i - 1, i)
        next_j = jnp.where(in_a | in_ga, j - 1, j)
        next_st = jnp.where(
            in_a, d & DEC_A_MASK,
            jnp.where(in_ga,
                      jnp.where((d & DEC_GA_EXT) != 0, 1, 0),
                      jnp.where((d & DEC_GB_EXT) != 0, 2, 0)))
        i = jnp.where(active, next_i, i).astype(jnp.int32)
        j = jnp.where(active, next_j, j).astype(jnp.int32)
        st = jnp.where(active, next_st, st).astype(jnp.int32)
        n = n + jnp.where(active, jnp.int32(1), jnp.int32(0))
        return (i, j, st, n, steps)

    def body(_, c):
        for _ in range(UNROLL):
            c = substep(c)
        return c

    # fixed trip count + per-substep active masking: a batched
    # lax.while_loop produced corrupted walks at batch >= ~1024 on
    # TPU (batch-size-dependent miscompile; dec verified correct,
    # single-problem walks of the same data correct) — a fori_loop
    # with the same masked body is immune and costs the same, since
    # every lane runs until the slowest finishes either way
    n_iters = (max_steps + UNROLL - 1) // UNROLL
    out = jax.lax.fori_loop(
        0, n_iters, body,
        (la_b.astype(jnp.int32), lb_b.astype(jnp.int32),
         st_b.astype(jnp.int32), zero, steps))
    _, _, _, n, steps = out
    # reverse the first n entries into forward order
    idx = jnp.arange(max_steps)
    rev = jnp.where(idx < n, steps[jnp.maximum(n - 1 - idx, 0)], STEP_PAD)
    return rev.astype(jnp.int8), n


@partial(jax.jit, static_argnames=("max_steps",))
def traceback_batch(dec, la, lb, end_state, max_steps):
    """dec [B, L1p, L2p] int8 (row r = DP row r+1, col c = DP col c+1);
    la, lb, end_state [B].  Returns steps [B, max_steps] int8 in FORWARD
    order, padded with 3, and n_steps [B]."""

    def one(dec_b, la_b, lb_b, st_b):
        return _walk(lambda r, c: dec_b[r, c].astype(jnp.int32),
                     la_b, lb_b, st_b, max_steps)

    return jax.vmap(one)(dec, la.astype(jnp.int32), lb.astype(jnp.int32),
                         end_state.astype(jnp.int32))


@partial(jax.jit, static_argnames=("max_steps",))
def traceback_lanewise(dec_packed, la, lb, end_state, max_steps):
    """Walk the lanewise kernel's nibble-packed decision layout
    [NB, L1p, L2p//4, 8, 128] int32 (tpu/gotoh_lanewise.py): problem
    b = nb*1024 + s*128 + l reads cell (r, c) from
    dec[nb, r, c//4, s, l] at nibble 4*(c%4).  Same walk, no unpack
    pass — the decision array never changes layout on device."""
    from kalign_tpu.tpu.gotoh_lanewise import BT, PACK
    NB, L1p, L2p4, SUB, LANES = dec_packed.shape
    B = NB * BT

    def one(nb, s, l, la_b, lb_b, st_b):
        def fetch(r, c):
            word = dec_packed[nb, r, c // PACK, s, l]
            return (word >> (4 * (c % PACK))) & 0xF
        return _walk(fetch, la_b, lb_b, st_b, max_steps)

    bs = jnp.arange(B, dtype=jnp.int32)
    return jax.vmap(one)(bs // BT, (bs // LANES) % SUB, bs % LANES,
                         la.astype(jnp.int32), lb.astype(jnp.int32),
                         end_state.astype(jnp.int32))


def _pack_steps(steps, n, score):
    score_bits = jax.lax.bitcast_convert_type(score.astype(jnp.float32),
                                              jnp.int32)
    hdr = jnp.stack([n.astype(jnp.int32), score_bits], axis=1)  # [B, 2] i32
    hdr8 = jax.lax.bitcast_convert_type(hdr, jnp.int8)   # [B, 2, 4]
    return jnp.concatenate([steps, hdr8.reshape(-1, 8)], axis=1)


@partial(jax.jit, static_argnames=("max_steps",))
def traceback_packed(dec, la, lb, end_state, score, max_steps):
    """traceback_batch + header packing: ONE int8 array
    [B, max_steps + 8] whose row is [steps..., n(4B LE), score(4B f32)].
    A single device->host transfer per launch matters on high-latency
    links (dev tunnels); decode with unpack_traceback."""
    steps, n = traceback_batch(dec, la, lb, end_state, max_steps)
    return _pack_steps(steps, n, score)


@partial(jax.jit, static_argnames=("max_steps",))
def traceback_packed_lanewise(dec_packed, la, lb, end_state, score,
                              max_steps):
    """traceback_lanewise + the same header packing as
    traceback_packed (decode with unpack_traceback)."""
    steps, n = traceback_lanewise(dec_packed, la, lb, end_state, max_steps)
    return _pack_steps(steps, n, score)


def unpack_traceback(packed: np.ndarray, max_steps: int):
    """Host-side decode of traceback_packed's layout."""
    steps = packed[:, :max_steps]
    hdr = packed[:, max_steps:].copy()
    # bitcast_convert_type packs little-endian bytes; decode with
    # explicit LE dtypes so a big-endian host doesn't read garbage
    n = hdr[:, :4].view("<i4")[:, 0]
    score = hdr[:, 4:].view("<f4")[:, 0]
    return steps, n, score
