"""Device-batched bisecting k-means guide tree (tpu-fast tree path).

The reference runs 40 seeded 2-means tries per split, 4 at a time via
OpenMP tasks (bisectingKmeans.c:318-363), each a sequential Lloyd loop
over the N x 32 anchor-distance embedding.  The native port
(kt_tree.cpp) is bit-exact but wholly serial — at 10^5 sequences the
tree build is the only host-serial stage left in the pipeline.

Here the SURVEY §2.2 mapping ("device k-means — Lloyd = matmuls") is
implemented: ALL tries of ALL clusters at one recursion depth run as
one batched device program.  Distances to the two centroids use the
matmul identity ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 (MXU work), the
epsilon-compare (1e-6) and alternating tie assignment of
bisectingKmeans.c:63-73 are preserved on the sqrt scale, and
convergence is the reference's per-dimension epsilon check with the
500-iteration cap.

Contract: this is the THROUGHPUT tree (engine="tpu-fast"), deterministic
for a fixed device/program but NOT bit-identical to the native tree —
float summation order in centroid accumulation differs (XLA reductions
vs the C loop), and all 40 tries always run (the reference stops early
when a round of 4 brings no improvement; running more tries can only
find an equal-or-better SSE).  The exact engines (host / tpu) keep the
native tree, so reference goldens are unaffected.  Clusters below the
UPGMA threshold (50) fall back to the native exact UPGMA over pairwise
BPM distances, like the reference (bisectingKmeans.c:292-301).
"""

import functools
from typing import List

import numpy as np

import jax
import jax.numpy as jnp

UPGMA_THRESHOLD = 50   # KALIGN_KMEANS_UPGMA_THRESHOLD (CMakeLists.txt:71)
MAX_ITERS = 500
EPS = 1e-6
MAX_TRIES = 40




@functools.partial(jax.jit, static_argnames=("T",))
def _lloyd_batch(emb, idx, valid, parity, seeds, n_tries, T):
    """All tries of a group of clusters, in lockstep.

    emb    [N, D]    f32   resident anchor-distance embedding (uploaded
                           once per tree build; groups ship only indices)
    idx    [C, S]    i32   sample ids per cluster slot
    valid  [C, S]    bool  sample-slot mask
    parity [C, S]    i32   sample position & 1 (tie alternation)
    seeds  [C, T]    i32   per-try seed slot index
    n_tries [C]      i32   active tries per cluster (ns < 40 -> fewer)

    Returns, selected on device for the earliest best try (np.argmin
    semantics — ties keep the first, like the reference's strict-best
    update): assign [C, S] int8 (1 = right side), degenerate [C] bool."""
    safe = jnp.clip(idx, 0, emb.shape[0] - 1)
    rows = jnp.where(valid[:, :, None],
                     jnp.take(emb, safe, axis=0), 0.0)
    C, S, D = rows.shape
    nsf = jnp.sum(valid, axis=1).astype(jnp.float32)[:, None]      # [C,1]
    mean = jnp.sum(rows, axis=1) / jnp.maximum(nsf, 1.0)           # [C,D]
    seed_rows = jnp.take_along_axis(
        rows, seeds[:, :, None], axis=1)                           # [C,T,D]
    cl0 = seed_rows
    cr0 = mean[:, None, :] - (cl0 - mean[:, None, :])
    sq_rows = jnp.sum(rows * rows, axis=2)                         # [C,S]

    try_active0 = jnp.arange(T)[None, :] < n_tries[:, None]        # [C,T]

    def dists(c):
        # ||x||^2 - 2 x.c + ||c||^2 on the MXU, sqrt'ed (clamped)
        xc = jnp.einsum("csd,ctd->cts", rows, c,
                        preferred_element_type=jnp.float32)
        d2 = sq_rows[:, None, :] - 2.0 * xc + \
            jnp.sum(c * c, axis=2)[:, :, None]
        return jnp.sqrt(jnp.maximum(d2, 0.0))                      # [C,T,S]

    def body(state):
        cl, cr, _, _, _, active, it = state
        dl = dists(cl)
        dr = dists(cr)
        # cmp_floats(dr, dl): -1 -> right, 1 -> left, 0 -> parity
        diff = dr - dl
        tie = jnp.abs(diff) < EPS
        right = jnp.where(tie, parity[:, None, :] == 1, diff < 0)
        right = right & valid[:, None, :]
        left = (~right) & valid[:, None, :]
        score = jnp.sum(jnp.where(valid[:, None, :],
                                  jnp.minimum(dl, dr), 0.0), axis=2)
        num_l = jnp.sum(left, axis=2).astype(jnp.float32)
        num_r = jnp.sum(right, axis=2).astype(jnp.float32)
        degenerate = (num_l == 0) | (num_r == 0)
        wl = jnp.einsum("cts,csd->ctd", left.astype(jnp.float32), rows,
                        preferred_element_type=jnp.float32) \
            / jnp.maximum(num_l, 1.0)[:, :, None]
        wr = jnp.einsum("cts,csd->ctd", right.astype(jnp.float32), rows,
                        preferred_element_type=jnp.float32) \
            / jnp.maximum(num_r, 1.0)[:, :, None]
        moved = jnp.any((jnp.abs(wl - cl) >= EPS)
                        | (jnp.abs(wr - cr) >= EPS), axis=2)
        still = active & moved & ~degenerate & (it + 1 < MAX_ITERS)
        cl_n = jnp.where(still[:, :, None], wl, cl)
        cr_n = jnp.where(still[:, :, None], wr, cr)
        return (cl_n, cr_n, right.astype(jnp.int8), score, degenerate,
                still, it + 1)

    def cond(state):
        return jnp.any(state[5])

    init = (cl0, cr0, jnp.zeros((C, T, S), jnp.int8),
            jnp.full((C, T), jnp.float32(np.float32(3.4e38))),
            jnp.zeros((C, T), bool), try_active0, jnp.int32(0))
    # one unconditional first pass populates assign/score, then iterate
    state = body(init)
    state = jax.lax.while_loop(cond, body, state)
    _, _, assign, score, degenerate, _, _ = state
    score = jnp.where(try_active0, score, jnp.float32(3.4e38))
    # earliest best try selected on device: fetching only its
    # assignment row cuts the per-group device->host traffic T-fold
    t_best = jnp.argmin(score, axis=1)                             # [C]
    best_assign = jnp.take_along_axis(
        assign, t_best[:, None, None], axis=1)[:, 0]               # [C,S]
    best_deg = jnp.take_along_axis(
        degenerate, t_best[:, None], axis=1)[:, 0]                 # [C]
    return best_assign, best_deg


class _Node:
    __slots__ = ("id", "left", "right")

    def __init__(self, id=-1, left=None, right=None):
        self.id = id
        self.left = left
        self.right = right


def build_tree_device(engine, codes, dm: np.ndarray, n_anchors: int):
    """Drop-in for HostEngine.build_tree with the k-means splits batched
    on device per recursion depth.  Returns (tasks [n-1, 3], seq_dist)."""
    import os
    import time as _time
    detail = bool(os.environ.get("KALIGN_TPU_TIMING_DETAIL"))
    t0 = _time.time()
    n = len(codes)
    stride = dm.shape[1]
    emb = np.ascontiguousarray(dm[:, :n_anchors].astype(np.float32))
    D = n_anchors
    lens = np.array([len(c) for c in codes], np.int64)

    emb_dev = jnp.asarray(emb)

    # Fixed launch shapes: clusters group into size buckets and each
    # bucket compiles exactly ONE (C_tile, S_bucket) program reused
    # across every depth and every run.  The per-depth variable-shape
    # launches this replaces compiled a fresh program per recursion
    # depth (~11 uniques at 10^5 sequences; minutes each in bad
    # first-execution bands on tunneled devices).  Padding waste runs
    # on the MXU and is bounded by C_tile*S <= 2^18 slots per launch.
    T = MAX_TRIES
    s_buckets = [256, 2048, 16384, 131072]
    while s_buckets[-1] < n:
        s_buckets.append(s_buckets[-1] * 8)
    ctile = lambda S: max(1, (1 << 18) // S)

    # depth-synchronous recursion: every >=threshold cluster at a depth
    # dispatches (async, grouped by bucket) before any result is read
    root = _Node()
    work = [(root, np.arange(n, dtype=np.int64))]   # (node, samples)
    upgma_jobs = []                                  # (node, samples)
    while work:
        big = [(node, s) for node, s in work if len(s) >= UPGMA_THRESHOLD]
        upgma_jobs.extend(
            (node, s) for node, s in work if len(s) < UPGMA_THRESHOLD)
        work = []
        if not big:
            break
        groups = {}
        for node, s in big:
            S = next(b for b in s_buckets if len(s) <= b)
            groups.setdefault(S, []).append((node, s))
        pending = []
        for S, items in sorted(groups.items(), reverse=True):
            CT = ctile(S)
            for g0 in range(0, len(items), CT):
                grp = items[g0:g0 + CT]
                idx = np.zeros((CT, S), np.int32)
                valid = np.zeros((CT, S), bool)
                parity = np.zeros((CT, S), np.int32)
                seeds = np.zeros((CT, T), np.int32)
                n_tries = np.ones(CT, np.int32)
                for c, (node, s) in enumerate(grp):
                    ns = len(s)
                    idx[c, :ns] = s
                    valid[c, :ns] = True
                    parity[c, :ns] = np.arange(ns) & 1
                    tries = min(T, ns)
                    step = ns // tries
                    seeds[c, :tries] = np.arange(tries) * step
                    n_tries[c] = tries
                out = _lloyd_batch(
                    emb_dev, jnp.asarray(idx), jnp.asarray(valid),
                    jnp.asarray(parity), jnp.asarray(seeds),
                    jnp.asarray(n_tries), T=T)
                pending.append((grp, out))
        for grp, (assign_d, degenerate_d) in pending:
            assign = np.asarray(assign_d)
            degenerate = np.asarray(degenerate_d)
            for c, (node, s) in enumerate(grp):
                ns = len(s)
                if degenerate[c]:
                    left_s = s[:ns // 2]
                    right_s = s[ns // 2:]
                else:
                    right_mask = assign[c, :ns] == 1
                    left_s = s[~right_mask]
                    right_s = s[right_mask]
                node.left = _Node()
                node.right = _Node()
                work.append((node.left, left_s))
                work.append((node.right, right_s))

    t1 = _time.time()
    if detail:
        from kalign_tpu.utils.logging import log
        log(f"    kmeans splits (device) {t1 - t0:.2f} s")
    return _finish_tree(engine, codes, dm, n_anchors, root, upgma_jobs,
                        emb, lens, detail, t1)


def _finish_tree(engine, codes, dm, n_anchors, root, upgma_jobs, emb,
                 lens, detail, t1):
    """Shared tree-assembly tail: exact native UPGMA below the
    threshold, postorder labeling, preorder task emission, and the
    per-seq normalized mean anchor distance."""
    import time as _time
    n = len(codes)
    # exact native UPGMA below the threshold (pairwise BPM distances)
    for node, s in upgma_jobs:
        if len(s) == 1:
            node.id = int(s[0])
            continue
        sub_codes = [codes[int(i)] for i in s]
        sub_dm = np.ascontiguousarray(dm[s])
        tasks_sub, _ = engine.host.build_tree(sub_codes, sub_dm, n_anchors)
        ns = len(s)
        # leaves 0..ns-1 map to global sample ids; internals ns..2ns-2
        # (task lists are emitted preorder — allocate all nodes first)
        nodes = {i: _Node(id=int(s[i])) for i in range(ns)}
        for i in range(ns, 2 * ns - 1):
            nodes[i] = _Node()
        for a, b, cnode in tasks_sub:
            nodes[int(cnode)].left = nodes[int(a)]
            nodes[int(cnode)].right = nodes[int(b)]
        sub_root = nodes[2 * ns - 2]
        node.id = sub_root.id
        node.left = sub_root.left
        node.right = sub_root.right

    if detail:
        from kalign_tpu.utils.logging import log
        log(f"    upgma leaves ({len(upgma_jobs)} jobs) "
            f"{_time.time() - t1:.2f} s")
    # label internals postorder + emit tasks preorder (kt_tree.cpp
    # label_postorder / emit_tasks_preorder)
    label = [n]

    def label_post(nd):
        if nd.left:
            label_post(nd.left)
        if nd.right:
            label_post(nd.right)
        if nd.id == -1:
            nd.id = label[0]
            label[0] += 1

    import sys
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 4 * n + 1000))
    try:
        label_post(root)
        tasks: List[List[int]] = []

        def emit(nd):
            if nd.left and nd.right:
                tasks.append([nd.left.id, nd.right.id, nd.id])
            if nd.left:
                emit(nd.left)
            if nd.right:
                emit(nd.right)

        emit(root)
    finally:
        sys.setrecursionlimit(old_limit)
    tasks = np.asarray(tasks, np.int32)
    assert len(tasks) == n - 1, (len(tasks), n)

    # per-seq normalized mean anchor distance (bisectingKmeans.c:242-256)
    # sequential f32 accumulation over anchors, like the native code
    acc = np.zeros(n, np.float32)
    for j in range(n_anchors):
        acc = acc + emb[:, j]
    mean = acc / np.float32(n_anchors)
    seq_dist = np.where(lens > 0, mean / lens.astype(np.float32),
                        0.0).astype(np.float32)
    return tasks, seq_dist


# ---------------------------------------------------------------------------
# Fused whole-recursion k-means: ONE device program for the entire
# bisecting recursion
# ---------------------------------------------------------------------------

_PAD_CID = np.int32(1 << 28)   # sorts after every real path code
_FUSED_DEPTH_CAP = 24          # path codes stay < 2^25 (int32-safe)


@functools.partial(jax.jit, static_argnames=("Np", "T", "Dmax", "Ca"))
def _fused_splits(emb, n, Np, T, Dmax, Ca):
    """The ENTIRE bisecting-k-means recursion as one XLA program.

    The per-depth variant (build_tree_device) pays one device->host
    round trip per (depth, size-bucket) to regroup clusters — ~20 s of
    the 16k guide-tree build through a high-latency transport.  Here
    cluster membership lives on device as binary-path codes
    (root = 1, child = 2*code + side), each depth is one pass of
    sort-by-code + segment-sum Lloyd over ALL active clusters in
    lockstep, and the host sees exactly ONE fetch of the final codes.

    emb [Np, D] f32 (rows >= n zero-padded), n = real sample count.
    Returns (cid [Np] int32 path codes, active_left bool — True when a
    cluster still >= UPGMA_THRESHOLD at the depth cap; the caller then
    falls back to the per-depth path).

    Split semantics match _lloyd_batch per cluster: 40 seed tries
    (every (size//40)-th member in cluster order; member order is
    ascending original index at every depth, like the host recursion's
    stable partitions), mean-reflection second centroid, sqrt-scale
    epsilon compare with parity tie alternation, per-dimension epsilon
    convergence with the 500-iteration cap, earliest-best-try by SSE,
    and the middle-split fallback for degenerate tries
    (bisectingKmeans.c:318-363,766-971).  Float summation order differs
    from both the native code and the per-depth einsum batching
    (segment-sums here), so near-tie assignments may legitimately
    differ between the two device paths."""
    THR = UPGMA_THRESHOLD
    iota = jnp.arange(Np, dtype=jnp.int32)
    cid0 = jnp.where(iota < n, jnp.int32(1), _PAD_CID)
    done0 = iota >= n

    def depth_body(state):
        cid, done, depth = state
        cid_s, sidx = jax.lax.sort((cid, iota), num_keys=1,
                                   is_stable=True)
        rows = jnp.take(emb, sidx, axis=0)                   # [Np, D]
        done_s = jnp.take(done, sidx)
        flag = jnp.concatenate([jnp.ones((1,), bool),
                                cid_s[1:] != cid_s[:-1]])
        start = jax.lax.cummax(jnp.where(flag, iota, 0))
        rank = iota - start
        vals = jnp.where(flag, iota, Np)
        shifted = jnp.concatenate([vals[1:],
                                   jnp.full((1,), Np, jnp.int32)])
        nxt = jnp.flip(jax.lax.cummin(jnp.flip(shifted)))
        size = nxt - start
        act = (size >= THR) & ~done_s
        done_s_new = done_s | (size < THR)

        is_astart = flag & act
        aslot_raw = jnp.cumsum(is_astart.astype(jnp.int32)) - 1
        aslot = jnp.where(act, aslot_raw, Ca)                # sentinel Ca
        n_act = jnp.sum(is_astart)
        slot_ids = jnp.where(is_astart, aslot_raw, Ca)
        st_a = jnp.zeros((Ca + 1,), jnp.int32).at[slot_ids].set(
            jnp.where(is_astart, start, 0), mode="drop")
        size_a = jnp.zeros((Ca + 1,), jnp.int32).at[slot_ids].set(
            jnp.where(is_astart, size, 0), mode="drop")

        sq_rows = jnp.sum(rows * rows, axis=1)               # [Np]
        step_a = jnp.maximum(size_a // T, 0)
        seed_pos = jnp.clip(
            st_a[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
            * step_a[:, None], 0, Np - 1)                    # [Ca+1, T]
        cl0 = jnp.take(rows, seed_pos.reshape(-1), axis=0) \
            .reshape(Ca + 1, T, rows.shape[1])
        count_a = jnp.maximum(size_a.astype(jnp.float32), 1.0)
        mean_a = jax.ops.segment_sum(
            jnp.where(act[:, None], rows, 0.0), aslot,
            num_segments=Ca + 1) / count_a[:, None]
        cr0 = 2.0 * mean_a[:, None, :] - cl0
        parity1 = (rank & 1) == 1                            # [Np]

        def dist_to(c):
            c_s = jnp.take(c, jnp.clip(aslot, 0, Ca), axis=0)  # [Np,T,D]
            xc = jnp.einsum("nd,ntd->nt", rows, c_s,
                            preferred_element_type=jnp.float32)
            d2 = sq_rows[:, None] - 2.0 * xc + jnp.sum(c_s * c_s, axis=2)
            return jnp.sqrt(jnp.maximum(d2, 0.0))            # [Np, T]

        def lbody(lstate):
            cl, cr, _, _, _, still, it = lstate
            dl = dist_to(cl)
            dr = dist_to(cr)
            diff = dr - dl
            tie = jnp.abs(diff) < EPS
            right = jnp.where(tie, parity1[:, None], diff < 0.0) \
                & act[:, None]                               # [Np, T]
            left = (~right) & act[:, None]
            mind = jnp.where(act[:, None], jnp.minimum(dl, dr), 0.0)
            score = jax.ops.segment_sum(mind, aslot,
                                        num_segments=Ca + 1)  # [Ca+1,T]
            num_r = jax.ops.segment_sum(right.astype(jnp.float32),
                                        aslot, num_segments=Ca + 1)
            num_l = jax.ops.segment_sum(left.astype(jnp.float32),
                                        aslot, num_segments=Ca + 1)
            degen = (num_l == 0.0) | (num_r == 0.0)
            wl = jax.ops.segment_sum(
                rows[:, None, :] * left[:, :, None].astype(jnp.float32),
                aslot, num_segments=Ca + 1) \
                / jnp.maximum(num_l, 1.0)[:, :, None]
            wr = jax.ops.segment_sum(
                rows[:, None, :] * right[:, :, None].astype(jnp.float32),
                aslot, num_segments=Ca + 1) \
                / jnp.maximum(num_r, 1.0)[:, :, None]
            moved = jnp.any((jnp.abs(wl - cl) >= EPS)
                            | (jnp.abs(wr - cr) >= EPS), axis=2)
            still_new = still & moved & ~degen & (it + 1 < MAX_ITERS)
            cl_n = jnp.where(still_new[:, :, None], wl, cl)
            cr_n = jnp.where(still_new[:, :, None], wr, cr)
            return (cl_n, cr_n, right, score, degen, still_new, it + 1)

        slot_active = jnp.arange(Ca + 1)[:, None] < n_act     # [Ca+1, 1]
        linit = (cl0, cr0, jnp.zeros((Np, T), bool),
                 jnp.full((Ca + 1, T), jnp.float32(3.4e38)),
                 jnp.zeros((Ca + 1, T), bool),
                 jnp.broadcast_to(slot_active, (Ca + 1, T)),
                 jnp.int32(0))
        lstate = lbody(linit)
        lstate = jax.lax.while_loop(lambda s: jnp.any(s[5]), lbody,
                                    lstate)
        _, _, right, score, degen, _, _ = lstate

        t_best = jnp.argmin(score, axis=1)                    # [Ca+1]
        tb_s = jnp.take(t_best, jnp.clip(aslot, 0, Ca))       # [Np]
        r_best = jnp.take_along_axis(right, tb_s[:, None],
                                     axis=1)[:, 0]
        deg_best = degen[jnp.clip(aslot, 0, Ca), tb_s]        # [Np]
        side = jnp.where(deg_best, rank >= (size // 2), r_best)
        cid_s_new = jnp.where(
            act, 2 * cid_s + side.astype(jnp.int32), cid_s)
        cid_next = jnp.zeros_like(cid).at[sidx].set(cid_s_new)
        done_next = jnp.zeros_like(done).at[sidx].set(done_s_new)
        return (cid_next, done_next, depth + 1)

    def depth_cond(state):
        _, done, depth = state
        return jnp.any(~done) & (depth < Dmax)

    cid, done, _ = jax.lax.while_loop(depth_cond, depth_body,
                                      (cid0, done0, jnp.int32(0)))
    return cid, jnp.any(~done)


def build_tree_device_fused(engine, codes, dm: np.ndarray,
                            n_anchors: int):
    """build_tree via _fused_splits: one dispatch + one fetch for the
    whole k-means recursion.  Returns (tasks, seq_dist), or None when
    the depth cap was hit (pathologically unbalanced splits) — the
    caller falls back to the per-depth build_tree_device."""
    import os
    import time as _time
    detail = bool(os.environ.get("KALIGN_TPU_TIMING_DETAIL"))
    t0 = _time.time()
    n = len(codes)
    emb = np.ascontiguousarray(dm[:, :n_anchors].astype(np.float32))
    lens = np.array([len(c) for c in codes], np.int64)
    Np = _pow2_at_least(n)
    emb_pad = np.zeros((Np, n_anchors), np.float32)
    emb_pad[:n] = emb
    Ca = Np // UPGMA_THRESHOLD + 1
    cid_d, left_d = _fused_splits(jnp.asarray(emb_pad), jnp.int32(n),
                                  Np=Np, T=MAX_TRIES,
                                  Dmax=_FUSED_DEPTH_CAP, Ca=Ca)
    cid_h, active_left = jax.device_get((cid_d, left_d))   # ONE fetch
    if bool(active_left):
        return None
    cid_h = np.asarray(cid_h)[:n]

    # rebuild the split trie from the path codes (child 2c = left,
    # 2c+1 = right); run members are ascending original index, like the
    # host recursion's stable partitions
    order = np.lexsort((np.arange(n), cid_h))
    sorted_cid = cid_h[order]
    bounds = np.flatnonzero(np.diff(sorted_cid)) + 1
    runs = np.split(order, bounds)
    root = _Node()
    upgma_jobs = []
    for members in runs:
        c = int(cid_h[members[0]])
        path = []
        cc = c
        while cc != 1:
            path.append(cc)
            cc >>= 1
        node = root
        for cc in reversed(path):
            if node.left is None:
                node.left = _Node()
                node.right = _Node()
            node = node.left if (cc & 1) == 0 else node.right
        upgma_jobs.append((node, members.astype(np.int64)))

    t1 = _time.time()
    if detail:
        from kalign_tpu.utils.logging import log
        log(f"    kmeans splits (device, fused) {t1 - t0:.2f} s "
            f"({len(runs)} clusters)")
    return _finish_tree(engine, codes, dm, n_anchors, root, upgma_jobs,
                        emb, lens, detail, t1)


def _pow2_at_least(n: int) -> int:
    p = 64
    while p < n:
        p *= 2
    return p
