"""Multi-chip sharding for the MSA pipeline.

Parallel axes of this workload (SURVEY.md §2.2):

  * distance matrix  — N x K pairwise bit-parallel problems: shard the
    sequence axis over "data" and the anchor axis over "model"; the
    result is all-gathered for tree building (the reference's OpenMP
    collapse(2) loop, sequence_distance.c:107-109, becomes a 2-D mesh).
  * guide-tree levels — independent merges of one tree level batch over
    "data" (the reference's per-subtree OpenMP tasks, aln_run.c:65-109).
  * ensemble runs — embarrassingly parallel over "data"; POAR tables
    merge host-side (ensemble.c runs them sequentially).

Everything is expressed with jax.sharding + jit so XLA inserts the
collectives; no hand-written NCCL/MPI analogue exists or is needed.
"""

from functools import partial
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kalign_tpu.tpu import bpm
from kalign_tpu.tpu import gotoh


def make_mesh(n_devices: Optional[int] = None,
              data: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if data is None:
        # model = largest power of two <= sqrt(n) that divides n;
        # the data axis absorbs the rest (favouring data parallelism)
        model = 1
        while (model * 2) * (model * 2) <= n:
            model *= 2
        while n % model:
            model //= 2
        data = n // model
    else:
        model = n // data
    arr = np.array(devs[:data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def _to_global(arr, sharding):
    """device_put that also works across PROCESSES: under
    jax.distributed each process contributes the shards it addresses
    (callers hold the full host array on every process — true for the
    guide-tree-phase inputs, which are broadcast-read)."""
    arr = np.asarray(arr)
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def _from_global(x) -> np.ndarray:
    """Fetch a (possibly cross-process) global array to every host."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def pad_rows(a: np.ndarray, to: int, fill=0) -> np.ndarray:
    if a.shape[0] == to:
        return a
    pad = np.full((to - a.shape[0],) + a.shape[1:], fill, dtype=a.dtype)
    return np.concatenate([a, pad], axis=0)


# ---------------------------------------------------------------------------
# sharded distance matrix
# ---------------------------------------------------------------------------

@partial(jax.jit,
         static_argnames=("max_steps", "bt", "pat_w", "sub", "interpret"))
def _dist_chunk(tok, tsrc, psrc, tlen, plen, max_steps, bt, pat_w, sub,
                interpret=False):
    """One device program for a block of (text, pattern) index pairs:
    gathers rows from the resident token table, builds Peq, and runs the
    Pallas Myers kernel over `sub`-sized sub-chunks via lax.map (bounds
    the [sub, SIGMA, MAX_PATTERN] Peq transient while keeping the whole
    block a single dispatch — tunneled devices pay per-launch latency,
    and hundreds of queued small launches can wedge the transport)."""
    from kalign_tpu.tpu.bpm_pallas import bpm_batch_pallas

    S = tsrc.shape[0] // sub
    # patterns are at most pat_w chars (static), so the kernel only
    # needs ceil(pat_w / 64) of the 16 MAX_PATTERN blocks — at 150-nt
    # DNA anchors the per-character block work drops >4x
    nblk = max(1, (pat_w + bpm.WORD - 1) // bpm.WORD)

    def one(args):
        ts, ps, nn, mm = args
        texts = jnp.take(tok, ts, axis=0)
        pats = jnp.zeros((sub, bpm.MAX_PATTERN), jnp.uint8)
        pats = pats.at[:, :pat_w].set(jnp.take(tok, ps, axis=0)[:, :pat_w])
        peq = bpm.build_peq(pats, mm)
        return bpm_batch_pallas(texts, nn, peq, mm, max_steps, bt=bt,
                                interpret=interpret, nblk=nblk)

    return jax.lax.map(one, (tsrc.reshape(S, sub), psrc.reshape(S, sub),
                             tlen.reshape(S, sub),
                             plen.reshape(S, sub))).reshape(-1)


def pallas_anchor_distances(tokens: np.ndarray, lengths: np.ndarray,
                            anchors: Sequence[int], bt: int = 2048,
                            chunk: int = None,
                            interpret: bool = False) -> np.ndarray:
    """Single-device fast path: all N*K (sequence, anchor) pairs flow
    through the Pallas bit-parallel kernel (tpu/bpm_pallas.py), with the
    longer-side-is-text orientation resolved HOST-side per pair
    (sequence_distance.c:153-162) so each pair runs one sweep.

    The token table uploads ONCE; each dispatch ships only int32 index
    vectors and gathers rows on device (at 10^5 sequences the old
    host-side pair expansion moved ~0.5 GB through the tunnel in ~400
    launches and wedged the transport).  Returns raw integer distances
    [N, K] (no length bias)."""
    if chunk is None:
        # per-dispatch pair count: bounded so ONE dispatch stays well
        # under the transport's single-execution kill limit (~60-90s
        # device time, measured 2026-08-18) even in slow bands; at 100k
        # seqs x 32 anchors this is ~13 dispatches instead of 7
        import os
        chunk = int(os.environ.get("KALIGN_TPU_DIST_CHUNK", "262144"))
    N, Lmax = tokens.shape
    K = len(anchors)
    anchors = np.asarray(anchors, np.int32)
    lengths = np.asarray(lengths, np.int32)
    a_lens = lengths[anchors]

    # per-pair orientation
    seq_idx = np.repeat(np.arange(N, dtype=np.int32), K)
    anc_idx = np.tile(np.arange(K, dtype=np.int32), N)
    li = lengths[seq_idx]
    lk = a_lens[anc_idx]
    seq_is_text = li > lk

    text_src = np.where(seq_is_text, seq_idx, anchors[anc_idx])
    pat_src = np.where(seq_is_text, anchors[anc_idx], seq_idx)
    tlen = np.where(seq_is_text, li, lk)
    plen = np.minimum(np.where(seq_is_text, lk, li), bpm.MAX_PATTERN)

    pat_w = min(bpm.MAX_PATTERN, Lmax)
    max_steps = int(Lmax + bpm.WORD)
    sub = min(8192, chunk)
    tok_dev = jax.device_put(tokens)

    total = N * K
    parts = []
    for lo in range(0, total, chunk):
        hi = min(lo + chunk, total)
        Bc = hi - lo
        Bp = ((Bc + sub - 1) // sub) * sub
        pad = Bp - Bc
        ts = np.concatenate([text_src[lo:hi],
                             np.zeros(pad, np.int32)]).astype(np.int32)
        ps = np.concatenate([pat_src[lo:hi],
                             np.zeros(pad, np.int32)]).astype(np.int32)
        nn = np.concatenate([tlen[lo:hi],
                             np.ones(pad, np.int32)]).astype(np.int32)
        mm = np.concatenate([plen[lo:hi],
                             np.ones(pad, np.int32)]).astype(np.int32)
        d = _dist_chunk(tok_dev, jnp.asarray(ts), jnp.asarray(ps),
                        jnp.asarray(nn), jnp.asarray(mm),
                        max_steps, bt, pat_w, sub, interpret)
        parts.append(d[:Bc])
    out = np.asarray(jnp.concatenate(parts)) if len(parts) > 1 \
        else np.asarray(parts[0])
    return out.reshape(N, K)


def sharded_anchor_distances(mesh: Mesh, tokens: np.ndarray,
                             lengths: np.ndarray,
                             anchors: Sequence[int]) -> np.ndarray:
    """Distance of every sequence to every anchor on the mesh.

    tokens [N, Lmax] uint8 (reduced alphabet), lengths [N].
    Rows shard over data x model (flattened); result gathered to host.
    Matches the reference distances bit-for-bit (same blocked Myers
    semantics + length-preference bias).

    On a single TPU device the Pallas kernel path is used; multi-device
    meshes (and CPU test backends) run the XLA implementation sharded
    over the mesh."""
    N, Lmax = tokens.shape
    K = len(anchors)
    n_dev = mesh.devices.size

    if n_dev == 1 and jax.default_backend() == "tpu":
        dm = pallas_anchor_distances(tokens, lengths, anchors)
        a_lens_b = np.asarray(lengths)[np.asarray(anchors, np.int32)]
        s = (np.asarray(lengths, np.int64)[:, None] + a_lens_b[None, :]) // 2
        bias = (np.minimum(10000.0, s.astype(np.float64)) / 10000.0)
        return dm.astype(np.float32) + bias.astype(np.float32)

    Np = ((N + n_dev - 1) // n_dev) * n_dev

    tokens_p = pad_rows(tokens, Np)
    lengths_p = pad_rows(np.asarray(lengths, np.int32), Np, fill=1)
    anchors = np.asarray(anchors, np.int32)

    # anchor buffers: full rows (text role) + 1024-capped pattern role
    anchor_full = tokens[anchors]                       # [K, Lmax]
    pat_w = min(bpm.MAX_PATTERN, Lmax)
    anchor_pat = np.zeros((K, bpm.MAX_PATTERN), np.uint8)
    anchor_pat[:, :pat_w] = anchor_full[:, :pat_w]
    anchor_lens = np.asarray(lengths)[anchors].astype(np.int32)

    row_sharding = NamedSharding(mesh, P(("data", "model")))
    rep = NamedSharding(mesh, P())

    max_steps = int(Lmax + bpm.WORD)

    @partial(jax.jit, static_argnames=("max_steps",),
             out_shardings=row_sharding)
    def dist_block(toks, lens, a_full, a_pat, a_lens, max_steps):
        B = toks.shape[0]
        m_seq = jnp.minimum(lens, bpm.MAX_PATTERN)
        seq_pat = jnp.zeros((B, bpm.MAX_PATTERN), jnp.uint8)
        seq_pat = seq_pat.at[:, :pat_w].set(toks[:, :pat_w])
        peq_seq = bpm.build_peq(seq_pat, m_seq)
        a_peq = bpm.build_peq(a_pat, jnp.minimum(a_lens, bpm.MAX_PATTERN))

        def one_anchor(a_row, a_len, a_pq):
            # text = longer side, pattern = shorter
            # (sequence_distance.c:153-162)
            d1 = bpm.bpm_batch(  # text = sequence, pattern = anchor
                toks, lens,
                jnp.broadcast_to(a_pq, (B,) + a_pq.shape),
                jnp.broadcast_to(jnp.minimum(a_len, bpm.MAX_PATTERN), (B,)),
                max_steps)
            d2 = bpm.bpm_batch(  # text = anchor, pattern = sequence
                jnp.broadcast_to(a_row, (B, Lmax)),
                jnp.broadcast_to(a_len, (B,)),
                peq_seq, m_seq, max_steps)
            return jnp.where(lens > a_len, d1, d2).astype(jnp.float32)
        return jax.vmap(one_anchor, in_axes=(0, 0, 0), out_axes=1)(
            a_full, a_lens, a_peq)

    toks_d = _to_global(tokens_p, row_sharding)
    lens_d = _to_global(lengths_p, row_sharding)
    out = dist_block(toks_d, lens_d,
                     _to_global(anchor_full, rep),
                     _to_global(anchor_pat, rep),
                     _to_global(anchor_lens, rep), max_steps)
    dm = _from_global(out)[:N]
    # short-sequence preference bias, computed in double then narrowed
    # exactly like the reference (sequence_distance.c:71-74): adding the
    # identical f32 bias to the integer-valued distance is bit-exact
    s = (np.asarray(lengths, np.int64)[:, None] + anchor_lens[None, :]) // 2
    bias = (np.minimum(10000.0, s.astype(np.float64)) / 10000.0)
    return dm + bias.astype(np.float32)


# ---------------------------------------------------------------------------
# batched level-synchronous DP
# ---------------------------------------------------------------------------

def batched_gotoh(mesh: Mesh, match, pens_cols, pens_rows, la, lb):
    """Run a batch of padded merge problems sharded over the whole mesh."""
    bsh = NamedSharding(mesh, P(("data", "model")))

    @jax.jit
    def run(match, pc, pr, la, lb):
        return jax.vmap(
            lambda m, c, r, a, b: gotoh.gotoh_forward(
                m, c[0], c[1], c[2], r[0], r[1], r[2], a, b)
        )(match, pc, pr, la, lb)

    args = [jax.device_put(x, bsh) for x in (match, pens_cols, pens_rows)]
    la_d = jax.device_put(la, bsh)
    lb_d = jax.device_put(lb, bsh)
    dec, score, end_state = run(args[0], args[1], args[2], la_d, lb_d)
    return np.asarray(dec), np.asarray(score), np.asarray(end_state)


def sharded_long_gotoh(mesh: Mesh, match, pens_cols, pens_rows, la, lb,
                       axis: str = "data"):
    """ONE Gotoh DP problem with the COLUMN axis sharded over the mesh
    devices — the context/sequence-parallel axis of SURVEY §5 for
    sequences whose DP rows exceed a single chip's tile budget.

    Pipelined wavefront: at global step s, device d computes DP row
    r = s - d of its column band.  The only cross-device traffic is a
    4-float halo per step over ICI (lax.ppermute): the previous row's
    boundary states for the diagonal move and the running prefix-max
    carry of the affine-gap row scan (the gap-extension prefix sums C
    are global cumsums, precomputed and sharded, so the scan transform
    needs no further communication).  Total steps = L1 + n_dev - 1.

    match [L1, W] f32 (W a multiple of the device count; pad with
    anything beyond lb), pens_cols [3, W+1], pens_rows [3, L1+1],
    la/lb ints.  Returns (dec [L1, W] int8 in the packed kernel layout
    (row r -> index r-1, col j -> index j-1), score, end_state) —
    feed dec straight to tpu.traceback.traceback_batch."""
    from jax import shard_map

    L1, W = match.shape
    n_dev = mesh.devices.size
    assert W % n_dev == 0, (W, n_dev)
    Wd = W // n_dev

    goB = np.asarray(pens_cols[0], np.float32)
    geB = np.asarray(pens_cols[1], np.float32)
    tgeB = np.asarray(pens_cols[2], np.float32)
    goA = np.asarray(pens_rows[0], np.float32)
    geA = np.asarray(pens_rows[1], np.float32)
    tgeA = np.asarray(pens_rows[2], np.float32)

    # global, per-column (cols 1..W), sharded over the mesh
    C_norm = np.cumsum(geB[1:]).astype(np.float32)
    C_term = np.cumsum(tgeB[1:]).astype(np.float32)
    z1 = np.zeros(1, np.float32)
    colv = np.stack([
        goB[1:], geB[1:], tgeB[1:], C_norm, C_term,
        np.concatenate([goB[2:], z1]),            # goB[j+1]
        np.concatenate([tgeB[2:], z1]),           # tgeB[j+1]
        np.concatenate([z1, goB[1:W]]),           # goB[j-1], 0 at col 1
        np.concatenate([C_norm[1:], z1]),         # C_norm[j+1]
        np.concatenate([C_term[1:], z1]),         # C_term[j+1]
    ]).astype(np.float32)                         # [10, W]

    # per-row scalars (rows 1..L1): goA_i, geA_i, tgeA_i, goA_prev,
    # gb0_prev (= GB[r-1, 0], the terminal column-0 gap run)
    cum_tgeA = np.cumsum(tgeA[1:]).astype(np.float32)
    gb0 = np.concatenate([np.float32(-3e38) * np.ones(1, np.float32),
                          cum_tgeA[:L1 - 1]])
    rowv = jnp.asarray(np.stack([goA[1:], geA[1:], tgeA[1:], goA[:L1],
                                 gb0]).astype(np.float32))  # [5, L1]

    NEGv = jnp.float32(-3.0e38)
    la_i = int(la)
    lb_i = int(lb)

    def local(match_l, colv_l):
        d = jax.lax.axis_index(axis)
        cols_l = jax.lax.broadcasted_iota(jnp.int32, (Wd,), 0) + d * Wd + 1
        col_valid = cols_l <= lb_i
        is_term_col = cols_l == lb_i
        goB_l, geB_l, tgeB_l, Cn_l, Ct_l, goBn_l, tgeBn_l, goBs_l, \
            Cnn_l, Ctn_l = [colv_l[k] for k in range(10)]

        # + 0*Ct_l ties constants to sharded inputs (consistent
        # varying-axes for the fori carry under shard_map)
        tie = 0.0 * Ct_l
        A0 = jnp.full((Wd,), NEGv) + tie
        GA0 = jnp.where(col_valid, Ct_l, NEGv)
        GB0 = jnp.full((Wd,), NEGv) + tie
        dec0 = jnp.zeros((L1, Wd), jnp.int8) + tie.astype(jnp.int8)
        # halo packet: [a_b, ga_b, gb_b, u_carry]
        pkt0 = jnp.full((4,), NEGv, jnp.float32) + tie[0]

        def body(s, carry):
            A_prev, GA_prev, GB_prev, prev_bnd, inbox, dec, \
                fin_A, fin_GA, fin_GB = carry
            r = s - d
            active = (r >= 1) & (r <= la_i)

            goA_i = rowv[0][jnp.clip(r - 1, 0, L1 - 1)]
            geA_i = rowv[1][jnp.clip(r - 1, 0, L1 - 1)]
            tgeA_i = rowv[2][jnp.clip(r - 1, 0, L1 - 1)]
            goA_prev = rowv[3][jnp.clip(r - 1, 0, L1 - 1)]
            gb0_prev = rowv[4][jnp.clip(r - 1, 0, L1 - 1)]
            m_row = jax.lax.dynamic_slice_in_dim(
                match_l, jnp.clip(r - 1, 0, L1 - 1), 1, 0)[0]

            # left boundary of the previous row: device 0 injects the
            # analytic DP column 0, others use the buffered halo
            a0 = jnp.where(r == 1, 0.0, NEGv)
            a_b = jnp.where(d == 0, a0, prev_bnd[0])
            ga_b = jnp.where(d == 0, NEGv, prev_bnd[1])
            gb_b = jnp.where(d == 0, gb0_prev, prev_bnd[2])
            u_in = jnp.where(d == 0, NEGv, inbox[3])

            shift = lambda x, b: jnp.concatenate([jnp.array([b]), x[:-1]])
            A_s = shift(A_prev, a_b)
            GA_s = shift(GA_prev, ga_b)
            GB_s = shift(GB_prev, gb_b)

            diagA = A_s
            diagGA = GA_s + goBs_l
            diagGB = GB_s + goA_prev
            best01 = jnp.maximum(diagA, diagGA)
            dec_a = jnp.where(diagGA >= diagA, 1, 0)
            dec_a = jnp.where(diagGB >= best01, 2, dec_a)
            A_row = jnp.maximum(best01, diagGB) + m_row
            A_row = jnp.where(col_valid, A_row, NEGv)

            is_last_row = r == la_i
            ge_eff = jnp.where(is_term_col, tgeA_i, geA_i)
            go_eff = jnp.where(is_term_col, tgeA_i, goA_i)
            gb_e = GB_prev + ge_eff
            gb_o = A_prev + go_eff
            GB_row = jnp.where(col_valid, jnp.maximum(gb_e, gb_o), NEGv)
            dec_gb = (gb_e > gb_o).astype(jnp.int32)

            ge_row = jnp.where(is_last_row, tgeB_l, geB_l)
            go_row = jnp.where(is_last_row, tgeB_l, goB_l)
            C = jnp.where(is_last_row, Ct_l, Cn_l)
            go_next = jnp.where(is_last_row, tgeBn_l, goBn_l)
            C_next = jnp.where(is_last_row, Ctn_l, Cnn_l)
            u = A_row + go_next - C_next
            u = jnp.where(cols_l < lb_i, u, NEGv)
            cm = jax.lax.cummax(u)
            prefix = jnp.maximum(shift(cm, NEGv), u_in)
            GA_row = jnp.where(col_valid, prefix + C, NEGv)
            u_out = jnp.maximum(u_in, cm[-1])

            # the GA-extend decision at the local first column compares
            # against the CURRENT row's values at the neighbour's last
            # column, which ride in this step's inbox
            ga_cur_b = jnp.where(d == 0, NEGv, inbox[1])
            a_cur_b = jnp.where(d == 0, NEGv, inbox[0])
            ga_ext = shift(GA_row, ga_cur_b) + ge_row
            ga_open = shift(A_row, a_cur_b) + go_row
            dec_ga = jnp.where(ga_ext > ga_open, 1, 0)
            dec_row = (dec_a | (dec_ga << 2) | (dec_gb << 3)).astype(jnp.int8)

            A_new = jnp.where(active, A_row, A_prev)
            GA_new = jnp.where(active, GA_row, GA_prev)
            GB_new = jnp.where(active, GB_row, GB_prev)
            dec = jax.lax.dynamic_update_slice_in_dim(
                dec, jnp.where(active, dec_row,
                               jax.lax.dynamic_slice_in_dim(
                                   dec, jnp.clip(r - 1, 0, L1 - 1),
                                   1, 0)[0])[None, :],
                jnp.clip(r - 1, 0, L1 - 1), 0)

            done_here = r == la_i
            fin_A = jnp.where(done_here, A_new, fin_A)
            fin_GA = jnp.where(done_here, GA_new, fin_GA)
            fin_GB = jnp.where(done_here, GB_new, fin_GB)

            out_pkt = jnp.array([A_new[-1], GA_new[-1], GB_new[-1],
                                 jnp.where(active, u_out, NEGv)],
                                jnp.float32)
            new_inbox = jax.lax.ppermute(
                out_pkt, axis, [(i, i + 1) for i in range(n_dev - 1)])
            # this step's inbox described the neighbour's CURRENT row —
            # which is the previous row of the row this device computes
            # NEXT step, so it becomes prev_bnd (the diag boundary)
            return (A_new, GA_new, GB_new, inbox, new_inbox, dec,
                    fin_A, fin_GA, fin_GB)

        # start at step 0 so EVERY device (including device 0) runs at
        # least one inactive step before its first row: that step's
        # ppermute ships the row-0 init state [NEG, GA0[-1], NEG, NEG]
        # — GA0[-1] is the finite terminal-gap cumsum at the device's
        # last column — to the right neighbour, seeding its diagonal
        # boundary for row 1.  Starting at 1 left device 1's row-1
        # diagonal halo at the all-NEG pkt0, silently mis-scoring any
        # path that crosses device 1's first column at row 1 (a leading
        # column-gap run of exactly Wd columns).
        init = (A0, GA0, GB0, pkt0, pkt0, dec0, A0, GA0, GB0)
        out = jax.lax.fori_loop(0, L1 + n_dev, body, init)
        _, _, _, _, _, dec, fin_A, fin_GA, fin_GB = out

        at_end = cols_l == lb_i
        pick = lambda x: jnp.max(jnp.where(at_end, x, NEGv))
        end_a = jax.lax.pmax(pick(fin_A), axis)
        end_ga = jax.lax.pmax(pick(fin_GA), axis)
        end_gb = jax.lax.pmax(pick(fin_GB), axis)
        score = jnp.maximum(jnp.maximum(end_a, end_ga), end_gb)
        st = jnp.where(end_ga > end_a,
                       jnp.where(end_gb > end_ga, 2, 1),
                       jnp.where(end_gb > end_a, 2, 0))
        return dec, score, st

    flat = Mesh(mesh.devices.reshape(-1), (axis,))
    run = jax.jit(shard_map(
        local, mesh=flat,
        in_specs=(P(None, axis), P(None, axis)),
        out_specs=(P(None, axis), P(), P())))
    dec, score, st = run(jnp.asarray(match, jnp.float32),
                         jnp.asarray(colv))
    return np.asarray(dec), float(score), int(st)


def sharded_bucket_step(mesh: Mesh, lhs, rhs, pc, pr, la, lb, eps,
                        bonus=None):
    """One progressive-merge bucket (matmul + centering bias + optional
    consistency bonus + Gotoh forward + packed traceback), with the
    MERGE BATCH AXIS sharded over every device of the mesh — the
    tree-level merge-parallel axis of SURVEY §2.2.  Each shard runs the
    full fused step on its local problems (no cross-problem
    communication exists in this stage); results gather to host.

    Inputs are numpy, batch padded to a multiple of mesh.devices.size by
    the caller.  Returns (steps list, scores) like TpuEngine buckets."""
    from jax import shard_map
    from kalign_tpu.tpu.traceback import traceback_packed, unpack_traceback

    B = lhs.shape[0]
    n_dev = mesh.devices.size
    assert B % n_dev == 0, (B, n_dev)
    axes = ("data", "model")
    bsh = NamedSharding(mesh, P(axes))
    max_steps = lhs.shape[1] + rhs.shape[1] + 2

    has_bonus = bonus is not None

    def local(lhs, rhs, pc, pr, la, lb, eps, *rest):
        match = jax.lax.dot_general(
            lhs, rhs, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        Bl, L1p, L2p = match.shape
        ii = jnp.arange(1, L1p + 1, dtype=jnp.float32)[None, :, None]
        jj = jnp.arange(1, L2p + 1, dtype=jnp.float32)[None, None, :]
        slope = lb.astype(jnp.float32) / jnp.maximum(
            la.astype(jnp.float32), 1.0)
        dev = jnp.abs(jj - ii * slope[:, None, None])
        match = match - dev * eps[:, None, None]
        if rest:
            match = match + rest[0]
        dec, score, st = jax.vmap(
            lambda m, c, r, a, b: gotoh.gotoh_forward(
                m, c[0], c[1], c[2], r[0], r[1], r[2], a, b)
        )(match, pc, pr, la, lb)
        # XLA-scan dec layout is [L1p+1, L2p+1] int8 with DP coords;
        # convert to the packed-kernel layout (row r+1 / col c+1)
        dec_k = dec[:, 1:, 1:]
        return traceback_packed(dec_k, la, lb, st, score, max_steps)

    n_in = 8 if has_bonus else 7
    run = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=tuple(P(axes) for _ in range(n_in)),
        out_specs=P(axes)))

    inputs = [lhs, rhs, pc, pr, la, lb, eps] + ([bonus] if has_bonus else [])
    args = [_to_global(np.asarray(x), bsh) for x in inputs]
    packed = _from_global(run(*args))
    steps, nsteps, score = unpack_traceback(packed, max_steps)
    return ([steps[b, :nsteps[b]] for b in range(B)],
            score.astype(np.float64))
