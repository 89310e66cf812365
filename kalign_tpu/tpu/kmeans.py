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
