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
        # favor the data axis; model axis absorbs the rest
        data = n
        model = 1
        for d in (8, 4, 2):
            if n % d == 0 and n // d > 1:
                data, model = n // d if n // d >= d else d, 0
        # simple split: largest power-of-two <= sqrt for model
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


def pad_rows(a: np.ndarray, to: int, fill=0) -> np.ndarray:
    if a.shape[0] == to:
        return a
    pad = np.full((to - a.shape[0],) + a.shape[1:], fill, dtype=a.dtype)
    return np.concatenate([a, pad], axis=0)


# ---------------------------------------------------------------------------
# sharded distance matrix
# ---------------------------------------------------------------------------

def pallas_anchor_distances(tokens: np.ndarray, lengths: np.ndarray,
                            anchors: Sequence[int], bt: int = 2048,
                            chunk: int = 8192) -> np.ndarray:
    """Single-device fast path: all N*K (sequence, anchor) pairs flow
    through the Pallas bit-parallel kernel (tpu/bpm_pallas.py) in
    chunks, with the longer-side-is-text orientation resolved HOST-side
    per pair (sequence_distance.c:153-162) so each pair runs one sweep.
    Returns raw integer distances [N, K] (no length bias)."""
    from kalign_tpu.tpu.bpm_pallas import bpm_batch_pallas

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
    out = np.zeros(N * K, np.int32)
    for lo in range(0, N * K, chunk):
        hi = min(lo + chunk, N * K)
        Bc = hi - lo
        Bp = ((Bc + bt - 1) // bt) * bt
        texts = np.zeros((Bp, Lmax), np.uint8)
        texts[:Bc] = tokens[text_src[lo:hi]]
        pats = np.zeros((Bp, bpm.MAX_PATTERN), np.uint8)
        pats[:Bc, :pat_w] = tokens[pat_src[lo:hi], :pat_w]
        n = np.full(Bp, 1, np.int32)
        n[:Bc] = tlen[lo:hi]
        m = np.full(Bp, 1, np.int32)
        m[:Bc] = plen[lo:hi]
        peq = bpm.build_peq(jnp.asarray(pats), jnp.asarray(m))
        d = bpm_batch_pallas(jnp.asarray(texts), jnp.asarray(n), peq,
                             jnp.asarray(m), max_steps, bt=bt)
        out[lo:hi] = np.asarray(d)[:Bc]
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

    toks_d = jax.device_put(tokens_p, row_sharding)
    lens_d = jax.device_put(lengths_p, row_sharding)
    out = dist_block(toks_d, lens_d,
                     jax.device_put(anchor_full, rep),
                     jax.device_put(anchor_pat, rep),
                     jax.device_put(anchor_lens, rep), max_steps)
    dm = np.asarray(out)[:N]
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
    args = [jax.device_put(np.asarray(x), bsh) for x in inputs]
    packed = np.asarray(run(*args))
    steps, nsteps, score = unpack_traceback(packed, max_steps)
    return ([steps[b, :nsteps[b]] for b in range(B)],
            score.astype(np.float64))
