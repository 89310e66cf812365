"""TPU engine: progressive MSA with device DP.

Level-synchronous execution: all merges of one guide-tree level are
independent (the reference's OpenMP task recursion, aln_run.c:65-109);
they are bucketed by padded shape and launched as batched kernels.

Per merge: match matrix = one MXU matmul; Gotoh DP = Pallas row-scan
kernel (tpu/gotoh_pallas.py) with on-device traceback (tpu/traceback.py)
so only step lists leave the device; profile merge/weave are vectorized
numpy (tpu/profile.py).  On CPU backends the XLA scan implementation
(tpu/gotoh.py) with host traceback is used instead.

Contract: same pipeline semantics as the host engine; alignments are
score-equivalent but may differ in equal-score tie-breaking from the
reference's Hirschberg midpoint choices.  Quality (SP/TC) is asserted
against the host engine in tests.
"""

import functools
import os
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from kalign_tpu.core import params as P
from kalign_tpu.engine import HostEngine
from kalign_tpu.tpu import gotoh
from kalign_tpu.tpu.profile import Profile, leaf_profile, merge_profiles, weave_steps


def _bucket(n: int, q: int = 128) -> int:
    return max(q, ((n + q - 1) // q) * q)


def _densify_bonus(bonus, B, L1p, L2p):
    """Dense [B, L1p, L2p] bonus matrix from the compact tuple, with
    the exact accumulation order of ConsistencyTable.bonus."""
    per_w, apr, cfr, apc, cfc = bonus
    dense = np.zeros((B, L1p, L2p), np.float32)
    for k in range(apr.shape[1]):
        eq = (apr[:, k, :, None] == apc[:, k, None, :]) & \
            (apr[:, k, :, None] >= 0)
        dense += ((per_w * cfr[:, k, :, None]) * cfc[:, k, None, :]) * eq
    return dense


def _pow2_batch(B: int) -> int:
    """Pad batch sizes to powers of two (min 8) so device launches hit a
    BOUNDED set of compiled shapes: guide-tree levels shrink per level
    and would otherwise recompile at every distinct merge count."""
    p = 8
    while p < B:
        p *= 2
    return p


@jax.jit
def _match_matmul(counts, subrows):
    return jnp.dot(counts, subrows.T, preferred_element_type=jnp.float32)


@jax.jit
def _batched_matmul(lhs, rhs):
    return jax.lax.dot_general(lhs, rhs, (((2,), (2,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _prepare_match(lhs, rhs, la, lb, bias_eps, bonus):
    """Shared producer for the fused forwards: MXU matmul + (when a
    consistency bonus is present) XLA-side centering bias and bonus
    accumulation in the EXACT float order of the host path.  Returns
    (match, slope, bias_eps) with slope/bias_eps zeroed when the bias
    was already applied — both fused paths MUST use this one function
    so near-tie behavior never diverges between kernels."""
    match = jax.lax.dot_general(
        lhs, rhs, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [B, L1p, L2p]
    slope = lb.astype(jnp.float32) / jnp.maximum(la.astype(jnp.float32), 1.0)
    if bonus is None:
        return match, slope, bias_eps
    B, L1p, L2p = match.shape
    ii = jnp.arange(1, L1p + 1, dtype=jnp.float32)[None, :, None]
    jj = jnp.arange(1, L2p + 1, dtype=jnp.float32)[None, None, :]
    dev = jnp.abs(jj - ii * slope[:, None, None])
    match = match - dev * bias_eps[:, None, None]
    if isinstance(bonus, tuple):
        per_w, apr, cfr, apc, cfc = bonus
        acc = jnp.zeros_like(match)
        for k in range(apr.shape[1]):
            eq = (apr[:, k, :, None] == apc[:, k, None, :]) & \
                (apr[:, k, :, None] >= 0)
            term = (per_w * cfr[:, k, :, None]) * cfc[:, k, None, :]
            acc = acc + jnp.where(eq, term, 0.0)
        match = match + acc
    else:
        match = match + bonus
    return match, jnp.zeros_like(slope), jnp.zeros_like(bias_eps)


@functools.partial(jax.jit, static_argnames=("bt", "rows_per_step",
                                             "with_dec", "use_pallas"))
def _fused_forward(lhs, rhs, pc, pr, la, lb, bias_eps, bonus, bt,
                   rows_per_step, with_dec, use_pallas=True):
    """Device-resident bucket step: batched MXU matmul -> optional
    consistency bonus -> Pallas forward with the centering bias fused
    into the kernel's match-row read (saves a full elementwise pass
    over the [B, L1p, L2p] match array).

    bonus is None, a dense [B, L1p, L2p] matrix, or the compact tuple
    (per_w, apos_r, conf_r, apos_c, conf_c) from
    ConsistencyTable.bonus_arrays — the dense matrix is then built ON
    DEVICE (accumulated k-by-k into a zero matrix first, so the float
    summation order matches the host matrix exactly); only
    O(K*(L1+L2)) floats travel instead of O(L1*L2)."""
    from kalign_tpu.tpu.gotoh_pallas import gotoh_forward_pallas
    match, slope, bias_eps = _prepare_match(lhs, rhs, la, lb, bias_eps,
                                            bonus)
    if use_pallas:
        return gotoh_forward_pallas(match, pc, pr, la, lb, bt=bt,
                                    rows_per_step=rows_per_step,
                                    with_dec=with_dec,
                                    slope=slope, bias_eps=bias_eps)
    # XLA fallback (CPU tests / non-pallas backends): explicit bias,
    # vmapped scan forward, dec trimmed to the compact Pallas layout
    # (row r = DP row r+1) that traceback_packed expects
    B, L1p, L2p = match.shape
    ii = jnp.arange(1, L1p + 1, dtype=jnp.float32)[None, :, None]
    jj = jnp.arange(1, L2p + 1, dtype=jnp.float32)[None, None, :]
    dev2 = jnp.abs(jj - ii * slope[:, None, None])
    match = match - dev2 * bias_eps[:, None, None]
    dec, score, st = jax.vmap(
        lambda m, c, r, a, b: gotoh.gotoh_forward(
            m, c[0], c[1], c[2], r[0], r[1], r[2], a, b)
    )(match, pc, pr, la, lb)
    return dec[:, 1:, 1:], score, st


@functools.partial(jax.jit, static_argnames=("with_dec", "interpret", "nc"))
def _fused_forward_lanewise(lhs, rhs, pc, pr, la, lb, bias_eps, bonus,
                            with_dec=True, interpret=False, nc=0):
    """Lanewise-kernel variant of _fused_forward for full-tile batches
    (B a multiple of 1024; tpu/gotoh_lanewise.py): same MXU matmul +
    consistency-bonus semantics, then the problem-per-lane forward.
    Returns the packed-nibble decision layout — walk with
    traceback_packed_lanewise.

    nc > 0 (live alphabet width, see TpuEngine._live_nc): bonus-free
    batches skip the match materialisation entirely — the FUSED kernel
    computes the match in-kernel from the nc-sliced operand streams
    (exact slicing: the counts side is zero beyond the alphabet).

    Float note: with no bonus, the centering bias fuses into the
    kernel as |j*eps - i*(slope*eps)|, which rounds differently from
    the XLA pass's |j - i*slope|*eps — near-score-ties may resolve
    differently between the lanewise and row paths (both are
    score-optimal; the tpu-fast engines carry that contract).  The
    fused kernel's in-kernel multiply-add chain is the same contract
    class vs the producer matmul's MXU accumulation."""
    from kalign_tpu.tpu.gotoh_lanewise import (fused_feasible,
                                               gotoh_forward_fused,
                                               gotoh_forward_lanewise)
    if bonus is None and nc:
        B, L1p, _ = lhs.shape
        L2p = rhs.shape[1]
        if fused_feasible(B, L1p, L2p, nc):
            slope = (lb.astype(jnp.float32)
                     / jnp.maximum(la.astype(jnp.float32), 1.0))
            return gotoh_forward_fused(
                lhs[:, :, :nc], rhs[:, :, :nc], pc, pr, la, lb,
                with_dec=with_dec, slope=slope, bias_eps=bias_eps,
                with_bias=True, interpret=interpret)
    match, slope, bias_eps = _prepare_match(lhs, rhs, la, lb, bias_eps,
                                            bonus)
    return gotoh_forward_lanewise(match, pc, pr, la, lb, with_dec=with_dec,
                                  slope=slope, bias_eps=bias_eps,
                                  with_bias=True, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("L1p", "L2p"))
def _leaf_assemble(tok, subm, penv, rows_idx, cols_idx, la, lb, L1p, L2p):
    """Leaf seq x seq operand assembly ON DEVICE from the resident
    token table: one-hot counts (lhs), substitution rows (rhs), and
    masked penalty vectors — every op an exact select/copy of the same
    constants the host assembly uses (_dp_leaf_batch), so results are
    bitwise-identical; only int32 index vectors travel per dispatch."""
    B = rows_idx.shape[0]
    Lt = tok.shape[1]
    Lr = min(L1p, Lt)
    Lc = min(L2p, Lt)
    rt = jnp.take(tok, rows_idx, axis=0)[:, :Lr]        # [B, Lr] uint8
    ct = jnp.take(tok, cols_idx, axis=0)[:, :Lc]
    pos_r = jnp.arange(Lr)[None, :]
    pos_c = jnp.arange(Lc)[None, :]
    valid_r = (pos_r < la[:, None])[:, :, None]
    valid_c = (pos_c < lb[:, None])[:, :, None]
    lhs = jnp.zeros((B, L1p, 23), jnp.float32).at[:, :Lr].set(
        ((rt[:, :, None] == jnp.arange(23, dtype=tok.dtype)[None, None, :])
         & valid_r).astype(jnp.float32))
    rhs = jnp.zeros((B, L2p, 23), jnp.float32).at[:, :Lc].set(
        jnp.take(subm, ct.astype(jnp.int32), axis=0)
        * valid_c.astype(jnp.float32))
    colsv = jnp.arange(L2p + 1)[None, :]
    pc = jnp.where((colsv >= 1) & (colsv <= lb[:, None]),
                   1.0, 0.0)[:, None, :] * penv[None, :, None]
    rowsv = jnp.arange(L1p + 1)[None, :]
    pr = jnp.where((rowsv >= 1) & (rowsv <= la[:, None]),
                   1.0, 0.0)[:, None, :] * penv[None, :, None]
    return lhs, rhs, pc.astype(jnp.float32), pr.astype(jnp.float32)


class TpuEngine:
    def __init__(self, n_threads: int = 1, use_pallas: Optional[bool] = None,
                 mesh=None):
        """mesh: optional jax.sharding.Mesh.  With more than one device,
        merge buckets shard their batch axis over the whole mesh
        (SURVEY §2.2 tree-level merge parallelism) via
        parallel.mesh.sharded_bucket_step."""
        import os
        from kalign_tpu.utils import ensure_compile_cache
        ensure_compile_cache()
        self.host = HostEngine(n_threads=n_threads)
        self.n_threads = n_threads
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        self.use_pallas = use_pallas
        self.mesh = mesh
        # problem-per-lane kernel routing for full-tile batches:
        # "1" (default) = on where feasible, "0" = off, "interpret" =
        # force it in interpret mode (CPU differential tests of the
        # integrated path).  Default-on since the chip A/B (2026-08-18):
        # on its target workload (2048 problems, 192x192, decisions on)
        # the lanewise kernel measures 13.7 device-trace GCUPS vs 3.2
        # for the row kernel (bt=128/R=16 plan) — the in-row prefix
        # scan and decision packing dominate the row kernel there.
        self.lanewise = os.environ.get("KALIGN_TPU_LANEWISE", "1")
        # fused-operand kernel (no materialised match): "1" (default) =
        # on for narrow alphabets (DNA/RNA, nc <= 8) where the
        # in-kernel chain is ~5 multiply-adds/cell; "all" = any
        # feasible nc (protein 23 — measure before enabling by
        # default); "0" = off
        self.fused = os.environ.get("KALIGN_TPU_FUSED", "1")
        self.nc = 0          # set per align() from the live alphabet

    def _live_nc(self, subm, max_code: int) -> int:
        """Live alphabet width for the fused kernel: nc=5 when the
        substitution matrix is zero beyond the 5-letter nucleotide
        block AND every token code is < 5 (both required for exact
        nc-slicing: the counts side must be zero beyond nc), else 23.
        Returns 0 when the fused path is disabled for this width."""
        s = np.asarray(subm)
        nc = 23
        if (max_code < 5 and s.shape[0] >= 5
                and not np.any(s[5:, :]) and not np.any(s[:, 5:])):
            nc = 5
        if self.fused == "all":
            return nc
        if self.fused == "1" and nc <= 8:
            return nc
        return 0

    def _lanewise_ok(self, Bp: int, L1p: int, L2p: int) -> bool:
        if self.lanewise not in ("1", "interpret"):
            return False
        if self.mesh is not None and self.mesh.devices.size > 1:
            return False
        if not (self.use_pallas or self.lanewise == "interpret"):
            return False
        from kalign_tpu.tpu.gotoh_lanewise import BT, lanewise_feasible
        return (Bp % BT == 0 and Bp >= BT
                and lanewise_feasible(Bp, L1p, L2p))

    # cap on the [B, L1p, L2p] match bytes of ONE device launch; bigger
    # buckets split into chunked launches (an unchunked 32768-problem
    # consistency bucket at 256x256 would need an 8.6 GB match array)
    MAX_MATCH_BYTES = 1 << 30

    def _max_launch(self, L1p: int, L2p: int) -> int:
        cap = max(8, self.MAX_MATCH_BYTES // (L1p * L2p * 4))
        p = 8
        while p * 2 <= cap:
            p *= 2
        return p

    def _pad_to_launch(self, B: int) -> int:
        """Launch batch size: power of two (bounded compile cache) and a
        multiple of the mesh device count when sharding."""
        Bp = _pow2_batch(B)
        if self.mesh is not None and self.mesh.devices.size > 1:
            n_dev = self.mesh.devices.size
            Bp = ((max(Bp, n_dev) + n_dev - 1) // n_dev) * n_dev
        return Bp

    def anchor_distances(self, codes, anchors):
        """N x K bit-parallel distances on device (tpu/bpm.py, bit-exact
        with the reference's bpm_block + length bias); host layout
        [N, ceil(K/8)*8] preserved for the native tree builder."""
        if not self.use_pallas:
            return self.host.anchor_distances(codes, anchors)
        from kalign_tpu.parallel.mesh import make_mesh, \
            sharded_anchor_distances
        n = len(codes)
        lens = np.array([len(c) for c in codes], np.int32)
        Lmax = max(1, int(lens.max()))
        tokens = np.zeros((n, Lmax), np.uint8)
        for i, c in enumerate(codes):
            tokens[i, :len(c)] = c
        dm = sharded_anchor_distances(make_mesh(), tokens, lens,
                                      list(anchors))
        stride = ((len(anchors) + 7) // 8) * 8
        out = np.zeros((n, stride), dtype=np.float32)
        out[:, :len(anchors)] = dm
        return out

    # device tree builds pay off once the serial native k-means is no
    # longer trivial next to the rest of the pipeline
    DEVICE_TREE_MIN_SEQS = 2048

    def build_tree(self, codes, dm, n_anchors):
        import os
        n = len(codes)
        want = os.environ.get("KALIGN_TPU_DEVICE_TREE")
        use_device = (want == "1") or (
            want is None and self.use_pallas
            and n >= self.DEVICE_TREE_MIN_SEQS)
        if want == "0":
            use_device = False
        if use_device:
            from kalign_tpu.tpu.kmeans import (build_tree_device,
                                               build_tree_device_fused)
            # fused = the whole recursion in ONE program (one dispatch,
            # one fetch); per-depth path kept as the fallback for
            # pathologically deep splits and as an opt-out.  The fused
            # program's device time grows with n (all depths + every
            # Lloyd iteration in one dispatch) and the axon transport
            # KILLS single executions beyond ~60-90s device time
            # (measured 2026-08-18: a pure matmul chain dies between
            # ~30s and ~90s; the fused tree at n=65536 reproducibly
            # crashed the worker).  Above the cap the per-depth
            # bucketed path — many bounded dispatches — is the safe
            # and still-fast route.
            fused_max = int(os.environ.get("KALIGN_TPU_FUSED_TREE_MAX",
                                           "32768"))
            if os.environ.get("KALIGN_TPU_TREE") != "bucketed" \
                    and n <= fused_max:
                res = build_tree_device_fused(self, codes, dm, n_anchors)
                if res is not None:
                    return res
            return build_tree_device(self, codes, dm, n_anchors)
        return self.host.build_tree(codes, dm, n_anchors)

    def build_tree_pairwise(self, dm):
        return self.host.build_tree_pairwise(dm)

    def aln_pairwise_dist(self, rows):
        return self.host.aln_pairwise_dist(rows)

    # ------------------------------------------------------------------
    def _dispatch_bucket(self, lhs, rhs, pc, pr, la, lb, eps, bonus):
        """Launch matmul + bias + bonus + forward + packed traceback for
        one bucket WITHOUT fetching results (async dispatch).  Returns a
        handle for _collect_bucket.  Dispatching every bucket of a tree
        level before collecting any overlaps device compute with the
        (latency-bound) device->host result transfers."""
        B = lhs.shape[0]

        def bonus_slice(b, lo, hi):
            if b is None:
                return None
            if isinstance(b, tuple):
                return (b[0],) + tuple(a[lo:hi] for a in b[1:])
            return b[lo:hi]

        def bonus_pad(b, pad):
            if b is None:
                return None
            if isinstance(b, tuple):
                def padc(x, fill):
                    return np.concatenate(
                        [x, np.full((pad,) + x.shape[1:], fill, x.dtype)])
                per_w, apr, cfr, apc, cfc = b
                return (per_w, padc(apr, -1), padc(cfr, 0),
                        padc(apc, -1), padc(cfc, 0))
            return np.concatenate(
                [b, np.zeros((pad,) + b.shape[1:], b.dtype)])

        cap = self._max_launch(lhs.shape[1], rhs.shape[1])
        if B > cap:
            handles = []
            for lo in range(0, B, cap):
                hi = min(lo + cap, B)
                handles.append(self._dispatch_bucket(
                    lhs[lo:hi], rhs[lo:hi], pc[lo:hi], pr[lo:hi],
                    la[lo:hi], lb[lo:hi], eps[lo:hi],
                    bonus_slice(bonus, lo, hi)))
            return ("multi", handles)
        if isinstance(bonus, tuple) and not (
                self.use_pallas
                and not (self.mesh is not None
                         and self.mesh.devices.size > 1)):
            # mesh / CPU fallback paths take the dense matrix
            bonus = _densify_bonus(bonus, B, lhs.shape[1], rhs.shape[1])
        if self.mesh is not None and self.mesh.devices.size > 1:
            from kalign_tpu.parallel.mesh import sharded_bucket_step
            n_dev = self.mesh.devices.size
            from kalign_tpu.tpu.gotoh_pallas import pick_plan as _pp
            if not _pp(B, rhs.shape[1])[2] and B <= n_dev:
                # a few VMEM-infeasible giants (e.g. the root merge of
                # very long profiles): shard each problem's COLUMN axis
                # over the mesh instead of the batch axis
                match = np.array(_batched_matmul(jnp.asarray(lhs),
                                                 jnp.asarray(rhs)))
                for k in range(B):
                    self._add_center_bias(match[k], int(la[k]),
                                          int(lb[k]), float(eps[k]))
                if isinstance(bonus, tuple):
                    bonus = _densify_bonus(bonus, B, lhs.shape[1],
                                           rhs.shape[1])
                if bonus is not None:
                    match += bonus
                return ("done", self._long_seq_mesh(match, pc, pr, la, lb))
            Bp = max(_pow2_batch(B), n_dev)
            Bp = ((Bp + n_dev - 1) // n_dev) * n_dev  # non-pow2 meshes
            if Bp != B:
                pad = Bp - B

                def padn(x, fill=0):
                    return np.concatenate(
                        [x, np.full((pad,) + x.shape[1:], fill, x.dtype)])
                lhs, rhs, eps = padn(lhs), padn(rhs), padn(eps)
                pc = np.concatenate([pc, np.tile(pc[-1:], (pad, 1, 1))])
                pr = np.concatenate([pr, np.tile(pr[-1:], (pad, 1, 1))])
                la = np.concatenate([la, np.full(pad, 8, np.int32)])
                lb = np.concatenate([lb, np.full(pad, 8, np.int32)])
                bonus = bonus_pad(bonus, pad)
            steps, scores = sharded_bucket_step(
                self.mesh, lhs, rhs, pc, pr, la, lb, eps, bonus)
            return ("done", (steps[:B], scores[:B]))
        feasible = True
        Bp = _pow2_batch(B)
        lanewise = self._lanewise_ok(Bp, lhs.shape[1], rhs.shape[1])
        if self.use_pallas and not lanewise:
            from kalign_tpu.tpu.gotoh_pallas import pick_plan
            bt, R, feasible = pick_plan(Bp, rhs.shape[1])
            bt = min(bt, Bp)
        if lanewise or (self.use_pallas and feasible):
            from kalign_tpu.tpu.traceback import (traceback_packed,
                                                  traceback_packed_lanewise)
            if Bp != B:
                pad = Bp - B

                def padn(x, fill=0):
                    return np.concatenate(
                        [x, np.full((pad,) + x.shape[1:], fill, x.dtype)])
                lhs = padn(lhs)
                rhs = padn(rhs)
                pc = np.concatenate([pc, np.tile(pc[-1:], (pad, 1, 1))])
                pr = np.concatenate([pr, np.tile(pr[-1:], (pad, 1, 1))])
                la = np.concatenate([la, np.full(pad, 8, np.int32)])
                lb = np.concatenate([lb, np.full(pad, 8, np.int32)])
                eps = padn(eps)
                bonus = bonus_pad(bonus, pad)
            if isinstance(bonus, tuple):
                bonus_dev = (jnp.float32(bonus[0]),) + tuple(
                    jnp.asarray(a) for a in bonus[1:])
            elif bonus is not None:
                bonus_dev = jnp.asarray(bonus)
            else:
                bonus_dev = None
            max_steps = lhs.shape[1] + rhs.shape[1] + 2
            if lanewise:
                dec, score, st = _fused_forward_lanewise(
                    jnp.asarray(lhs), jnp.asarray(rhs), jnp.asarray(pc),
                    jnp.asarray(pr), jnp.asarray(la), jnp.asarray(lb),
                    jnp.asarray(eps), bonus_dev,
                    interpret=not self.use_pallas, nc=self.nc)
                packed = traceback_packed_lanewise(
                    dec, jnp.asarray(la), jnp.asarray(lb), st, score,
                    max_steps)
            else:
                dec, score, st = _fused_forward(
                    jnp.asarray(lhs), jnp.asarray(rhs), jnp.asarray(pc),
                    jnp.asarray(pr), jnp.asarray(la), jnp.asarray(lb),
                    jnp.asarray(eps), bonus_dev,
                    bt, R, True)
                packed = traceback_packed(dec, jnp.asarray(la),
                                          jnp.asarray(lb), st, score,
                                          max_steps)
            return ("packed", packed, max_steps, B)
        # CPU backend / VMEM-infeasible widths: materialize match
        # (same XLA dot_general as the fused path, so near-tie decisions
        # agree bitwise with the device-resident engine), use the
        # HBM-resident XLA scan — or, on a multi-device mesh, the
        # column-sharded wavefront DP (the sequence-parallel axis: one
        # huge problem spread over chips)
        match = np.array(_batched_matmul(jnp.asarray(lhs),
                                         jnp.asarray(rhs)))
        for k in range(B):
            self._add_center_bias(match[k], int(la[k]), int(lb[k]),
                                  float(eps[k]))
        if isinstance(bonus, tuple):
            bonus = _densify_bonus(bonus, B, lhs.shape[1], rhs.shape[1])
        if bonus is not None:
            match += bonus
        return ("done", self._forward_batch(match, pc, pr, la, lb))

    def _long_seq_mesh(self, match, pc, pr, la, lb):
        """VMEM-infeasible widths on a multi-device mesh: run each
        problem through the column-sharded pipelined-wavefront DP."""
        from kalign_tpu.parallel.mesh import sharded_long_gotoh
        from kalign_tpu.tpu.traceback import traceback_batch
        B, L1p, L2p = match.shape
        n_dev = self.mesh.devices.size
        Wp = ((L2p + n_dev - 1) // n_dev) * n_dev
        steps_out, scores = [], np.zeros(B, np.float64)
        for k in range(B):
            m = match[k]
            if Wp != L2p:
                m = np.pad(m, ((0, 0), (0, Wp - L2p)))
            pck = np.pad(pc[k], ((0, 0), (0, Wp - L2p)))
            dec, score, st = sharded_long_gotoh(
                self.mesh, m, pck, pr[k], int(la[k]), int(lb[k]))
            steps, n = traceback_batch(
                jnp.asarray(dec[None]), jnp.asarray([int(la[k])]),
                jnp.asarray([int(lb[k])]), jnp.asarray([st]),
                L1p + Wp + 2)
            steps_out.append(
                np.asarray(steps)[0, :int(np.asarray(n)[0])].astype(np.int8))
            scores[k] = score
        return steps_out, scores

    @staticmethod
    def _prefetch_handles(handles):
        """Fetch every dispatched bucket's packed device result in ONE
        jax.device_get (one batched transfer instead of a serial
        round trip per bucket — each costs seconds on tunneled
        devices).  Returns handles with device arrays replaced by
        numpy."""
        import jax as _jax
        arrays = []

        def walk(h):
            if h[0] == "multi":
                for sub in h[1]:
                    walk(sub)
            elif h[0] == "packed":
                arrays.append(h[1])

        for h in handles:
            walk(h)
        if not arrays:
            return handles
        fetched = iter(_jax.device_get(arrays))

        def rebuild(h):
            if h[0] == "multi":
                return ("multi", [rebuild(sub) for sub in h[1]])
            if h[0] == "packed":
                return ("packed", next(fetched)) + h[2:]
            return h

        return [rebuild(h) for h in handles]

    def _collect_bucket(self, handle):
        """Fetch + decode a _dispatch_bucket result (one transfer)."""
        if handle[0] == "multi":
            steps, scores = [], []
            for h in handle[1]:
                s, sc = self._collect_bucket(h)
                steps.extend(s)
                scores.append(sc)
            return steps, np.concatenate(scores)
        if handle[0] == "done":
            return handle[1]
        from kalign_tpu.tpu.traceback import unpack_traceback
        _, packed, max_steps, B = handle
        steps, nsteps, score = unpack_traceback(np.asarray(packed), max_steps)
        return ([steps[b, :nsteps[b]] for b in range(B)],
                score[:B].astype(np.float64))

    def _run_bucket(self, lhs, rhs, pc, pr, la, lb, eps, bonus):
        """Dispatch + collect one bucket (single-bucket callers)."""
        return self._collect_bucket(
            self._dispatch_bucket(lhs, rhs, pc, pr, la, lb, eps, bonus))

    def _forward_batch(self, match, pc, pr, la, lb):
        """match [B, L1p, L2p] etc (numpy).  Returns list of step arrays."""
        B = match.shape[0]
        feasible = True
        if self.use_pallas:
            from kalign_tpu.tpu.gotoh_pallas import pick_plan
            Bp = _pow2_batch(B)
            bt, R, feasible = pick_plan(Bp, match.shape[2])
            bt = min(bt, Bp)
        if self.use_pallas and feasible:
            from kalign_tpu.tpu.gotoh_pallas import gotoh_forward_pallas
            from kalign_tpu.tpu.traceback import traceback_batch
            if Bp != B:
                pad = Bp - B
                match = np.concatenate([match, np.zeros((pad,) + match.shape[1:], match.dtype)])
                pc = np.concatenate([pc, np.tile(pc[-1:], (pad, 1, 1))])
                pr = np.concatenate([pr, np.tile(pr[-1:], (pad, 1, 1))])
                la = np.concatenate([la, np.full(pad, 8, np.int32)])
                lb = np.concatenate([lb, np.full(pad, 8, np.int32)])
            dec, score, st = gotoh_forward_pallas(
                jnp.asarray(match), jnp.asarray(pc), jnp.asarray(pr),
                jnp.asarray(la), jnp.asarray(lb), bt=bt, rows_per_step=R)
            steps, nsteps = traceback_batch(
                dec, jnp.asarray(la), jnp.asarray(lb), st,
                match.shape[1] + match.shape[2] + 2)
            steps = np.asarray(steps)
            nsteps = np.asarray(nsteps)
            score = np.asarray(score)
            return ([steps[b, :nsteps[b]] for b in range(B)],
                    score[:B].astype(np.float64))
        else:
            out = jax.vmap(
                lambda m, c, r, a, b: gotoh.gotoh_forward(
                    m, c[0], c[1], c[2], r[0], r[1], r[2], a, b)
            )(jnp.asarray(match), jnp.asarray(pc), jnp.asarray(pr),
              jnp.asarray(la), jnp.asarray(lb))
            dec, score, st = [np.asarray(x) for x in out]
            steps = []
            for b in range(B):
                steps.append(np.asarray(
                    gotoh.traceback(dec[b], int(la[b]), int(lb[b]), int(st[b])),
                    dtype=np.int8))
            return steps, score.astype(np.float64)

    # ------------------------------------------------------------------
    def align(self, codes, tasks, ap: P.AlnParam, seq_distances,
              refine_mode=0, cons_seq_distances=None):
        """refine_mode != 0 selects the TPU-native analogue of the
        reference's flip-perturbation refinement: each merge runs K
        candidate DPs with different diagonal-bias strengths (perturbing
        exactly the near-ties the reference flips) and keeps the best by
        expected sum-of-pairs (sp_score.c semantics).

        REFINE_CONFIDENT is two-pass like the reference (aln_refine.c
        mode REFINE_CONFIDENT): pass 1 runs every merge with two cheap
        candidates and flags the merges whose candidate paths DISAGREE
        (the score-near-tie merges — the TPU-native analogue of low
        meetup margin); pass 2 replays the tree, spending the full
        candidate budget only on the flagged merges."""
        sd = None if seq_distances is None else np.asarray(seq_distances)
        max_code = max((int(np.max(c)) for c in codes if len(c)), default=0)
        self.nc = self._live_nc(ap.subm, max_code)

        ct = None
        if ap.consistency_anchors > 0:
            import os
            from kalign_tpu.utils.logging import timer
            from kalign_tpu.tpu.consistency import ConsistencyTable
            csd = sd if cons_seq_distances is None else np.asarray(cons_seq_distances)
            with timer("Consistency maps",
                       quiet=not os.environ.get("KALIGN_TPU_TIMING_DETAIL")):
                ct = ConsistencyTable.build(self, codes, ap, csd,
                                            ap.consistency_anchors,
                                            ap.consistency_weight)

        full = (1e-3, 0.0, 4e-3)
        if refine_mode == P.REFINE_CONFIDENT:
            probe = (1e-3, 0.0)
            # both passes resident when possible: the probe returns the
            # on-device path-disagreement flags, the replay spends the
            # full candidate budget only on flagged merges
            res = self._progressive_resident(codes, tasks, ap, sd,
                                             eps=probe[0], ct=ct,
                                             cand_for=lambda t: probe)
            if res is not None:
                _, _, disagree = res
                res = self._progressive_resident(
                    codes, tasks, ap, sd, eps=1e-3, ct=ct,
                    cand_for=lambda t: full if disagree[t] else (1e-3,))
            if res is not None:
                gaps, conf, _ = res
                return gaps, conf
            _, _, disagree = self._progressive(codes, tasks, ap, sd, ct,
                                               lambda t: probe)
            gaps, conf, _ = self._progressive(
                codes, tasks, ap, sd, ct,
                lambda t: full if disagree[t] else (1e-3,))
            return gaps, conf
        cand = (1e-3,) if refine_mode == P.REFINE_NONE else full
        # multi-candidate merges run K DPs + on-device expected-SP trial
        # selection (near-SP-ties may pick a different — equally
        # scoring — candidate than the host path's float64 scorer)
        res = self._progressive_resident(
            codes, tasks, ap, sd, eps=cand[0], ct=ct,
            cand_for=(lambda t: cand) if len(cand) > 1 else None)
        if res is not None:
            gaps, conf, _ = res
            return gaps, conf
        gaps, conf, _ = self._progressive(codes, tasks, ap, sd, ct,
                                          lambda t: cand)
        return gaps, conf

    def _progressive_resident(self, codes, tasks, ap: P.AlnParam, sd, eps,
                              ct=None, cand_for=None):
        """Device-resident progressive pass (tpu/resident.py): profiles
        and gap state stay on device between levels; only per-level
        profile lengths cross to the host.  Returns None when the
        workload needs the host-assembled path (multi-device mesh,
        VMEM-infeasible bucket, or opted out)."""
        import os
        if os.environ.get("KALIGN_TPU_NO_RESIDENT"):
            return None
        if self.mesh is not None and self.mesh.devices.size > 1:
            return None
        from kalign_tpu.tpu.resident import ResidentPass
        n = len(codes)
        order = np.asarray(tasks)[np.argsort(np.asarray(tasks)[:, 2])]
        task_index = {int(c): t for t, (_, _, c) in enumerate(order)}
        level = {i: 0 for i in range(n)}
        levels: List[List[int]] = []
        for a, b, c in order:
            lv = 1 + max(level[int(a)], level[int(b)])
            level[int(c)] = lv
            while len(levels) < lv:
                levels.append([])
            levels[lv - 1].append(int(c))
        sip: List[Optional[List[int]]] = [[i] for i in range(n)] + \
            [None] * (n - 1)
        nsip = [1] * n + [0] * (n - 1)
        rp = ResidentPass(self, codes, ap, sd, eps, ct=ct,
                          cand_for=cand_for)
        return rp.run(order, task_index, levels, sip, nsip)

    def _progressive(self, codes, tasks, ap: P.AlnParam, sd, ct, cand_for):
        """One bottom-up progressive pass.  cand_for(task_idx) gives the
        tuple of centering-bias candidates for that merge; merges with
        the same candidate tuple and padded shape batch into one launch.
        Returns (gaps, conf, disagree[task]) where disagree marks merges
        whose candidates produced different paths."""
        n = len(codes)
        nprof = 2 * n - 1
        lens = [len(c) for c in codes]
        gaps = [[0] * (l + 1) for l in lens]
        sip: List[Optional[List[int]]] = [[i] for i in range(n)] + \
            [None] * (n - 1)
        nsip = [1] * n + [0] * (n - 1)
        profiles: List[Optional[Profile]] = [None] * nprof
        conf = np.zeros(n - 1, dtype=np.float32)
        disagree = np.zeros(n - 1, dtype=bool)

        order = np.asarray(tasks)[np.argsort(np.asarray(tasks)[:, 2])]
        task_index = {int(c): t for t, (_, _, c) in enumerate(order)}

        # level-synchronous schedule
        level = {i: 0 for i in range(n)}
        levels: List[List[int]] = []
        for a, b, c in order:
            lv = 1 + max(level[int(a)], level[int(b)])
            level[int(c)] = lv
            while len(levels) < lv:
                levels.append([])
            levels[lv - 1].append(int(c))

        for lv_nodes in levels:
            batch = []  # (c, a, b, rows_node, cols_node, prof_r, prof_c)
            for c in lv_nodes:
                t_idx = task_index[c]
                a, b = int(order[t_idx][0]), int(order[t_idx][1])
                eff = self._effective(ap, sd, sip, a, b, n)
                pa = self._node_profile(profiles, codes, a, nsip, eff)
                pb = self._node_profile(profiles, codes, b, nsip, eff)
                leaf_a = nsip[a] == 1
                leaf_b = nsip[b] == 1
                if leaf_a and not leaf_b:
                    rows_node, cols_node = b, a
                elif leaf_b and not leaf_a:
                    rows_node, cols_node = a, b
                elif pa.length <= pb.length:
                    rows_node, cols_node = a, b
                else:
                    rows_node, cols_node = b, a
                prof_r = pa if rows_node == a else pb
                prof_c = pb if rows_node == a else pa
                cols_is_leaf = nsip[cols_node] == 1 and not (leaf_a and leaf_b)
                batch.append((c, a, b, rows_node, cols_node, prof_r, prof_c,
                              cols_is_leaf, ct))

            # bucket by padded shape and candidate set
            buckets = {}
            for item in batch:
                c = item[0]
                _, _, _, rn, cn, prof_r, prof_c, _, _ = item
                key = (_bucket(prof_r.length), _bucket(prof_c.length),
                       cand_for(task_index[c]))
                buckets.setdefault(key, []).append(item)

            # phase 1: assemble + dispatch every bucket of the level
            # (async); phase 2 collects — device compute of later buckets
            # overlaps the latency-bound result transfers of earlier ones
            dispatched = []
            for (L1p, L2p, refine_candidates), items in buckets.items():
                B = len(items)
                K = len(refine_candidates)
                # single-candidate buckets assemble directly at launch
                # size (no padding copies in dispatch); multi-candidate
                # buckets get tiled+padded there
                Ba = self._pad_to_launch(B) if K == 1 else B
                pc = np.zeros((Ba, 3, L2p + 1), np.float32)
                pr = np.zeros((Ba, 3, L1p + 1), np.float32)
                la = np.full(Ba, 8, np.int32)
                lb = np.full(Ba, 8, np.int32)
                lhs = np.zeros((Ba, L1p, 23), np.float32)
                rhs = np.zeros((Ba, L2p, 23), np.float32)
                # consistency bonuses travel as compact per-anchor
                # position/confidence arrays on the single-device pallas
                # path (densified on device inside _fused_forward);
                # other paths densify host-side in _dispatch_bucket
                compact_ok = (self.use_pallas and
                              not (self.mesh is not None
                                   and self.mesh.devices.size > 1))
                bonus = None
                if ct is not None:
                    KA = ct.K
                    b_apr = np.full((Ba, KA, L1p), -1, np.int32)
                    b_cfr = np.zeros((Ba, KA, L1p), np.float32)
                    b_apc = np.full((Ba, KA, L2p), -1, np.int32)
                    b_cfc = np.zeros((Ba, KA, L2p), np.float32)
                for k, (c, a, b, rn, cn, prof_r, prof_c, cif, _) in enumerate(items):
                    la[k] = prof_r.length
                    lb[k] = prof_c.length
                    if cif:
                        lhs[k, :la[k]] = prof_r.subrows
                        rhs[k, :lb[k]] = prof_c.counts
                    else:
                        lhs[k, :la[k]] = prof_r.counts
                        rhs[k, :lb[k]] = prof_c.subrows
                    if ct is not None:
                        apr, cfr, apc, cfc = ct.bonus_arrays(
                            rn, prof_r.length, cn, prof_c.length,
                            sip, nsip, gaps, lens)
                        b_apr[k, :, :la[k]] = apr
                        b_cfr[k, :, :la[k]] = cfr
                        b_apc[k, :, :lb[k]] = apc
                        b_cfc[k, :, :lb[k]] = cfc
                    pc[k, :, 1:lb[k] + 1] = (prof_c.pen[1:-1] *
                                             np.float32(nsip[rn])).T
                    pr[k, :, 1:la[k] + 1] = (prof_r.pen[1:-1] *
                                             np.float32(nsip[cn])).T
                if ct is not None:
                    bonus = (ct.per_weight, b_apr, b_cfr, b_apc, b_cfc)
                    if not compact_ok:
                        bonus = _densify_bonus(bonus, Ba, L1p, L2p)

                if K > 1:
                    lhs = np.tile(lhs, (K, 1, 1))
                    rhs = np.tile(rhs, (K, 1, 1))
                    pc = np.tile(pc, (K, 1, 1))
                    pr = np.tile(pr, (K, 1, 1))
                    la = np.tile(la, K)
                    lb = np.tile(lb, K)
                    if isinstance(bonus, tuple):
                        bonus = (bonus[0],) + tuple(
                            np.tile(a, (K, 1, 1)) for a in bonus[1:])
                    elif bonus is not None:
                        bonus = np.tile(bonus, (K, 1, 1))
                    eps = np.repeat(np.asarray(refine_candidates, np.float32), B)
                else:
                    eps = np.full(Ba, refine_candidates[0], np.float32)
                handle = self._dispatch_bucket(lhs, rhs, pc, pr, la, lb,
                                               eps, bonus)
                dispatched.append((items, B, K, handle))

            handles = self._prefetch_handles([d[3] for d in dispatched])
            for (items, B, K, _), handle in zip(dispatched, handles):
                all_steps, all_scores = self._collect_bucket(handle)
                if K > 1:
                    steps_list, scores, multi = self._select_candidates(
                        items, all_steps, all_scores, B, K, sip, nsip, gaps,
                        lens, ap)
                    for k, item in enumerate(items):
                        disagree[task_index[item[0]]] = multi[k]
                else:
                    steps_list, scores = all_steps, all_scores

                for k, (c, a, b, rn, cn, prof_r, prof_c, _, _) in enumerate(items):
                    steps_rc = np.asarray(steps_list[k], np.int8)
                    if rn == a:
                        steps = steps_rc
                    else:
                        steps = np.where(steps_rc == 1, 2,
                                         np.where(steps_rc == 2, 1, 0)).astype(np.int8)
                    conf[task_index[c]] = scores[k]
                    terminal = _terminal_mask(steps)
                    profiles_a = prof_r if rn == a else prof_c
                    profiles_b = prof_c if rn == a else prof_r
                    profiles[c] = merge_profiles(profiles_a, profiles_b, steps,
                                                 terminal, nsip[a], nsip[b],
                                                 ap.gpo, ap.gpe, ap.tgpe)
                    profiles[a] = None
                    profiles[b] = None
                    weave_steps(steps, gaps, sip[a], sip[b])
                    nsip[c] = nsip[a] + nsip[b]
                    sip[c] = list(reversed(sip[a])) + list(reversed(sip[b]))
        return gaps, conf, disagree

    # ------------------------------------------------------------------
    def _match(self, prof_r: Profile, prof_c: Profile, L1p, L2p,
               cols_is_leaf: bool) -> np.ndarray:
        la, lb = prof_r.length, prof_c.length
        lhs = np.zeros((L1p, 23), dtype=np.float32)
        rhs = np.zeros((L2p, 23), dtype=np.float32)
        if cols_is_leaf:
            lhs[:la] = prof_r.subrows
            rhs[:lb] = prof_c.counts
        else:
            lhs[:la] = prof_r.counts
            rhs[:lb] = prof_c.subrows
        return np.array(_match_matmul(jnp.asarray(lhs), jnp.asarray(rhs)))

    @staticmethod
    def _add_center_bias(match, la, lb, eps=1e-3):
        """Flat-DP analogue of the reference's Hirschberg midpoint bias
        (see tpu/gotoh.py docstring)."""
        if eps == 0.0:
            return
        ii = np.arange(1, la + 1, dtype=np.float32)[:, None]
        jj = np.arange(1, lb + 1, dtype=np.float32)[None, :]
        # f32 slope, matching the fused device path (_fused_forward)
        slope = np.float32(lb) / np.float32(max(la, 1))
        match[:la, :lb] -= np.abs(jj - ii * slope) * np.float32(eps)

    def _select_candidates(self, items, all_steps, all_scores, B, K,
                           sip, nsip, gaps, lens, ap: P.AlnParam):
        """Pick the best candidate per merge by expected SP score
        (mirrors the reference's trial selection, aln_refine.c:198-253)."""
        from kalign_tpu.tpu.profile import (column_gap_counts,
                                            sp_score_from_profiles)
        steps_out = []
        scores_out = np.zeros(B, dtype=np.float64)
        multi_out = np.zeros(B, dtype=bool)
        for k, (c, a, b, rn, cn, prof_r, prof_c, _, _) in enumerate(items):
            ga = column_gap_counts(prof_r.length, nsip[rn], sip[rn], lens, gaps)
            gb = column_gap_counts(prof_c.length, nsip[cn], sip[cn], lens, gaps)
            best = None
            best_sp = -np.inf
            seen = set()
            for v in range(K):
                st = np.asarray(all_steps[v * B + k], np.int8)
                key = st.tobytes()
                if key in seen:
                    continue
                seen.add(key)
                term = _terminal_mask(st)
                sp = sp_score_from_profiles(
                    prof_r, prof_c, st, term, nsip[rn], nsip[cn], ga, gb,
                    ap.subm, ap.gpo, ap.gpe, ap.tgpe)
                if sp > best_sp:
                    best_sp = sp
                    best = st
            steps_out.append(best)
            scores_out[k] = best_sp
            multi_out[k] = len(seen) > 1
        return steps_out, scores_out, multi_out

    def _effective(self, ap: P.AlnParam, sd, sip, a, b, n):
        gs, so = 1.0, 0.0
        if sd is not None:
            members = [s for s in sip[a] if s < n] + [s for s in sip[b] if s < n]
            if members:
                avg = float(np.mean(sd[members], dtype=np.float64))
                if ap.dist_scale > 0.0:
                    gs = min(1.0, max(0.3, 1.0 - ap.dist_scale * avg))
                if ap.vsm_amax > 0.0:
                    so = max(0.0, ap.vsm_amax - avg)
        eff = P.AlnParam(**{**ap.__dict__})
        if gs < 1.0 or so > 0.0:
            eff.gpo = ap.gpo * gs
            eff.gpe = ap.gpe * gs
            eff.tgpe = ap.tgpe * gs
            eff.subm_offset = so
        return eff

    def _node_profile(self, profiles, codes, node, nsip, eff: P.AlnParam):
        if profiles[node] is None:
            assert nsip[node] == 1
            profiles[node] = leaf_profile(codes[node], eff.subm, eff.gpo,
                                          eff.gpe, eff.tgpe, eff.subm_offset)
        return profiles[node]

    # Map-building pairwise DPs use a centering bias like the progressive
    # merges: consistency maps are voted on across sequences, and
    # systematically midpoint-centered paths (what the reference's
    # Hirschberg recursion produces implicitly) agree better at ambiguous
    # regions.  Round-3 set this to 1e-2 (TC 0.40 -> 0.45 on BB30014);
    # round-5 ablation shows that overcorrected: with the v2 kernels,
    # eps=0 on the MAP DPs measures TC 0.462 vs host 0.467 on BB30014
    # (1e-2: 0.452) and is neutral-or-better on the rest of the registry.
    # KALIGN_TPU_MAP_EPS overrides (float).
    MAP_EPS = float(os.environ.get("KALIGN_TPU_MAP_EPS", "0.0"))

    @staticmethod
    def _maps_from_steps_batch(steps, nsteps, swapped, li, Lmax):
        """Vectorized residue->anchor position maps from a CHUNK of step
        matrices (the per-pair cumsum loop costs ~30 us x N*K pairs —
        15 s at 100k seqs).  steps [B, S] int8 (garbage beyond nsteps),
        swapped/li [B].  Returns maps [B, Lmax] int64 (-1 unmapped);
        row b's map is maps[b, :li[b]]."""
        B, S = steps.shape
        valid = np.arange(S)[None, :] < nsteps[:, None]
        gap_i = np.where(swapped, 2, 1).astype(np.int8)[:, None]
        gap_k = np.where(swapped, 1, 2).astype(np.int8)[:, None]
        pos_i = np.cumsum(steps != gap_i, axis=1) - 1
        pos_k = np.cumsum(steps != gap_k, axis=1) - 1
        sel = (steps == 0) & valid
        maps = np.full((B, Lmax), -1, dtype=np.int64)
        b_idx = np.nonzero(sel)[0]
        maps[b_idx, pos_i[sel]] = pos_k[sel]
        return maps

    def _dp_leaf_batch(self, codes, pairs, ap, maps_spec=None):
        """Batched seq x seq DP over (rows_seq, cols_seq) index pairs of
        leaf sequences (the consistency map workload,
        anchor_consistency.c:246-267).  Assembly is fully vectorized —
        leaf profiles are one-hot counts / subm rows / constant
        penalties, so each bucket builds with fancy indexing instead of
        a per-pair python loop.  On the Pallas path the token table
        uploads ONCE and operands assemble ON DEVICE from int32 index
        vectors (bitwise-identical one-hot/gather/mask ops) — at 10^5
        sequences the host assembly of N*K one-hot matrices is tens of
        GB of allocation + transfer.

        Returns a list of step arrays in input order — or, with
        maps_spec (per-pair (li, swapped)), the residue->anchor position
        maps directly (batch-vectorized; skips materializing N*K step
        arrays)."""
        lens = np.array([len(c) for c in codes], np.int32)
        Lmax = int(lens.max())
        pad = np.zeros((len(codes), Lmax), np.uint8)
        for i, c in enumerate(codes):
            pad[i, :len(c)] = c
        subm = np.asarray(ap.subm, np.float32)
        penv = np.array([-ap.gpo, -ap.gpe, -ap.tgpe], np.float32)

        buckets = {}
        for idx, (ri, ci) in enumerate(pairs):
            key = (_bucket(lens[ri]), _bucket(lens[ci]))
            buckets.setdefault(key, []).append((idx, ri, ci))
        out: List[Optional[np.ndarray]] = [None] * len(pairs)
        import os
        if self.use_pallas or os.environ.get("KALIGN_TPU_LEAF_DEVICE"):
            done = self._dp_leaf_batch_device(pad, lens, subm, penv,
                                              buckets, out, maps_spec)
            if done:
                return out
        for (L1p, L2p), items in buckets.items():
            rows = np.array([r for _, r, _ in items], np.int32)
            cols = np.array([c for _, _, c in items], np.int32)
            la = lens[rows]
            lb = lens[cols]
            B = len(items)
            Lr = min(L1p, Lmax)
            Lc = min(L2p, Lmax)
            pos_r = np.arange(Lr)[None, :]
            pos_c = np.arange(Lc)[None, :]
            valid_r = (pos_r < la[:, None])[:, :, None]
            valid_c = (pos_c < lb[:, None])[:, :, None]
            lhs = np.zeros((B, L1p, 23), np.float32)
            lhs[:, :Lr] = (pad[rows, :Lr, None] ==
                           np.arange(23)[None, None, :]) * valid_r
            rhs = np.zeros((B, L2p, 23), np.float32)
            rhs[:, :Lc] = subm[pad[cols, :Lc]] * valid_c
            colsv = np.arange(L2p + 1)[None, :]
            pc = np.where((colsv >= 1) & (colsv <= lb[:, None]),
                          1.0, 0.0)[:, None, :] * penv[None, :, None]
            rowsv = np.arange(L1p + 1)[None, :]
            pr = np.where((rowsv >= 1) & (rowsv <= la[:, None]),
                          1.0, 0.0)[:, None, :] * penv[None, :, None]
            eps = np.full(B, self.MAP_EPS, np.float32)
            steps_list, _ = self._run_bucket(
                lhs, rhs, pc.astype(np.float32), pr.astype(np.float32),
                la, lb, eps, None)
            if maps_spec is not None:
                S = max((len(s) for s in steps_list), default=1)
                st = np.full((B, max(S, 1)), 3, np.int8)
                for k, s in enumerate(steps_list):
                    st[k, :len(s)] = s
                ns = np.array([len(s) for s in steps_list], np.int32)
                sw = np.array([maps_spec[idx][1] for idx, _, _ in items],
                              bool)
                li = np.array([maps_spec[idx][0] for idx, _, _ in items],
                              np.int64)
                maps = self._maps_from_steps_batch(st, ns, sw, li,
                                                   int(li.max()))
                for k, (idx, _, _) in enumerate(items):
                    out[idx] = maps[k, :maps_spec[idx][0]]
            else:
                for k, (idx, _, _) in enumerate(items):
                    out[idx] = np.asarray(steps_list[k], np.int8)
        return out

    def _dp_leaf_batch_device(self, pad, lens, subm, penv, buckets, out,
                              maps_spec=None):
        """Device-side assembly for _dp_leaf_batch: upload the token
        table once, ship only int32 index vectors per launch chunk,
        assemble one-hot / subm-gathered operands in-program
        (_leaf_assemble — bitwise-identical to the host assembly), run
        the fused forward + packed traceback, and fetch every chunk in
        ONE batched transfer.  Returns False if any bucket is
        VMEM-infeasible (caller keeps the host path)."""
        from kalign_tpu.tpu.gotoh_pallas import pick_plan
        from kalign_tpu.tpu.traceback import (traceback_packed,
                                              traceback_packed_lanewise)

        plans = {}
        for (L1p, L2p), items in buckets.items():
            if not self.use_pallas:
                plans[(L1p, L2p)] = (8, 8)
                continue
            Bp0 = _pow2_batch(min(len(items), self._max_launch(L1p, L2p)))
            bt, R, feasible = pick_plan(Bp0, L2p)
            if not feasible:
                return False
            plans[(L1p, L2p)] = (min(bt, Bp0), R)

        tok_dev = jnp.asarray(pad)
        lens_dev = jnp.asarray(lens)
        subm_dev = jnp.asarray(subm)
        penv_dev = jnp.asarray(penv)

        dispatched = []
        for (L1p, L2p), items in sorted(buckets.items()):
            bt, R = plans[(L1p, L2p)]
            cap = self._max_launch(L1p, L2p)
            for lo in range(0, len(items), cap):
                chunk = items[lo:lo + cap]
                Bc = len(chunk)
                Bp = _pow2_batch(Bc)
                rows = np.zeros(Bp, np.int32)
                cols = np.zeros(Bp, np.int32)
                la = np.full(Bp, 8, np.int32)
                lb = np.full(Bp, 8, np.int32)
                for k, (idx, ri, ci) in enumerate(chunk):
                    rows[k] = ri
                    cols[k] = ci
                    la[k] = lens[ri]
                    lb[k] = lens[ci]
                la_d = jnp.asarray(la)
                lb_d = jnp.asarray(lb)
                lhs, rhs, pc, pr = _leaf_assemble(
                    tok_dev, subm_dev, penv_dev, jnp.asarray(rows),
                    jnp.asarray(cols), la_d, lb_d, L1p=L1p, L2p=L2p)
                eps = jnp.full((Bp,), self.MAP_EPS, jnp.float32)
                if self._lanewise_ok(Bp, L1p, L2p):
                    # full-tile chunks take the problem-per-lane kernel
                    # (no in-row scan); sub-tile tails stay on the row
                    # kernel
                    dec, score, st = _fused_forward_lanewise(
                        lhs, rhs, pc, pr, la_d, lb_d, eps, None,
                        interpret=not self.use_pallas, nc=self.nc)
                    packed = traceback_packed_lanewise(
                        dec, la_d, lb_d, st, score, L1p + L2p + 2)
                else:
                    dec, score, st = _fused_forward(
                        lhs, rhs, pc, pr, la_d, lb_d, eps, None, bt, R,
                        True, use_pallas=self.use_pallas)
                    packed = traceback_packed(dec, la_d, lb_d, st, score,
                                              L1p + L2p + 2)
                dispatched.append(
                    (chunk, ("packed", packed, L1p + L2p + 2, Bc)))

        handles = self._prefetch_handles([d[1] for d in dispatched])
        from kalign_tpu.tpu.traceback import unpack_traceback
        for (chunk, _), handle in zip(dispatched, handles):
            if maps_spec is not None:
                _, packed, max_steps, Bc = handle
                steps, nsteps, _ = unpack_traceback(np.asarray(packed),
                                                    max_steps)
                sw = np.array([maps_spec[idx][1] for idx, _, _ in chunk],
                              bool)
                li = np.array([maps_spec[idx][0] for idx, _, _ in chunk],
                              np.int64)
                maps = self._maps_from_steps_batch(
                    steps[:Bc], nsteps[:Bc], sw, li, int(li.max()))
                for k, (idx, _, _) in enumerate(chunk):
                    out[idx] = maps[k, :maps_spec[idx][0]]
            else:
                steps_list, _ = self._collect_bucket(handle)
                for k, (idx, _, _) in enumerate(chunk):
                    out[idx] = np.asarray(steps_list[k], np.int8)
        return True

    # single-problem helper used by consistency map building
    def _dp(self, prof_rows: Profile, prof_cols: Profile, nsip_rows: int,
            nsip_cols: int, bonus: Optional[np.ndarray],
            match_from_rows: bool = False):
        L1p = _bucket(prof_rows.length)
        L2p = _bucket(prof_cols.length)
        la = np.array([prof_rows.length], np.int32)
        lb = np.array([prof_cols.length], np.int32)
        match = self._match(prof_rows, prof_cols, L1p, L2p,
                            match_from_rows)[None]
        if bonus is not None:
            match[0, :la[0], :lb[0]] += bonus
        self._add_center_bias(match[0], int(la[0]), int(lb[0]))
        pc = np.zeros((1, 3, L2p + 1), np.float32)
        pr = np.zeros((1, 3, L1p + 1), np.float32)
        pc[0, :, 1:lb[0] + 1] = (prof_cols.pen[1:-1] * np.float32(nsip_rows)).T
        pr[0, :, 1:la[0] + 1] = (prof_rows.pen[1:-1] * np.float32(nsip_cols)).T
        steps, scores = self._forward_batch(match, pc, pr, la, lb)
        return np.asarray(steps[0], np.int8), float(scores[0])


def _terminal_mask(steps: np.ndarray) -> np.ndarray:
    n = len(steps)
    term = np.zeros(n, dtype=bool)
    i = 0
    while i < n and steps[i] != 0:
        term[i] = True
        i += 1
    i = n - 1
    while i >= 0 and steps[i] != 0:
        term[i] = True
        i -= 1
    return term
