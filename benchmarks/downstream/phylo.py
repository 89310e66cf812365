"""Phylogenetic accuracy: does the alignment support the same tree as
the ground truth?  (reference: benchmarks/downstream/phylo_accuracy.py)

Pipeline per family: p-distance matrices from the tool's and the gold
alignment -> neighbor-joining trees -> normalized Robinson-Foulds
distance between the two topologies (0 = identical, 1 = no shared
non-trivial splits)."""

import numpy as np


def p_distance_matrix(rows):
    """Pairwise proportion-of-differing-sites over mutually ungapped
    columns."""
    n = len(rows)
    arr = np.frombuffer("".join(rows).encode(), np.uint8)
    arr = arr.reshape(n, -1)
    gap = arr == ord("-")
    dm = np.zeros((n, n))
    for i in range(n):
        both = ~gap[i] & ~gap
        diff = (arr[i] != arr) & both
        denom = both.sum(axis=1)
        with np.errstate(invalid="ignore"):
            dm[i] = np.where(denom > 0, diff.sum(axis=1) / denom, 0.0)
    np.fill_diagonal(dm, 0.0)
    return dm


def _canon_split(s, n):
    """Canonical representation of a bipartition: the smaller side, or
    on equal sizes the side containing leaf 0 (an even split's two
    sides are the SAME bipartition)."""
    comp = frozenset(range(n)) - s
    if len(s) != len(comp):
        return s if len(s) < len(comp) else comp
    return s if 0 in s else comp


def neighbor_joining(dm):
    """Classic NJ (Saitou & Nei).  Returns the set of non-trivial
    splits in canonical form (_canon_split)."""
    n = dm.shape[0]
    d = dm.astype(np.float64).copy()
    active = list(range(n))
    leafsets = {i: frozenset([i]) for i in range(n)}
    splits = set()
    next_id = n
    while len(active) > 2:
        m = len(active)
        sub = d[np.ix_(active, active)]
        r = sub.sum(axis=1)
        q = (m - 2) * sub - r[:, None] - r[None, :]
        np.fill_diagonal(q, np.inf)
        i_, j_ = np.unravel_index(np.argmin(q), q.shape)
        a, b = active[i_], active[j_]
        merged = leafsets[a] | leafsets[b]
        if 1 < len(merged) < n - 1:
            splits.add(_canon_split(merged, n))
        # distances from the new node
        dn = 0.5 * (d[a, active] + d[b, active] - d[a, b])
        d = np.pad(d, ((0, 1), (0, 1)))
        d[next_id, active] = dn
        d[active, next_id] = dn
        leafsets[next_id] = merged
        active = [x for x in active if x not in (a, b)] + [next_id]
        next_id += 1
    return splits


def robinson_foulds(splits_a, splits_b, n_leaves):
    """Normalized RF: symmetric difference over the maximum possible
    (2*(n-3) non-trivial splits for two binary trees)."""
    denom = 2 * max(n_leaves - 3, 1)
    return len(splits_a ^ splits_b) / denom


def phylo_accuracy(test_rows, gold_rows):
    """Returns dict with the normalized RF distance between NJ trees of
    the tool's and the gold alignment (lower is better)."""
    n = len(gold_rows)
    st = neighbor_joining(p_distance_matrix(test_rows))
    sg = neighbor_joining(p_distance_matrix(gold_rows))
    return {
        "rf": round(robinson_foulds(st, sg, n), 4),
        "splits_shared": len(st & sg),
        "splits_total": len(sg),
    }


# ---------------------------------------------------------------------
# tree-structured family simulation (known true topology)
# ---------------------------------------------------------------------

_ALPHA20 = "ACDEFGHIKLMNPQRSTVWY"


def evolve_family(depth=4, length=200, sub_p=0.08, indel_p=0.01,
                  seed=0):
    """Evolve a protein family down a balanced binary tree: per-branch
    per-site substitutions plus short indels.  Returns (leaf_seqs,
    true_splits, n_leaves) — the non-trivial splits of the (known)
    generating topology, for Robinson-Foulds scoring of reconstructed
    trees.  DSSim families are star phylogenies (iid draws from one
    HMM), so THIS generator is what gives the phylo benchmark a
    meaningful ground-truth tree."""
    rng = np.random.default_rng(seed)
    root = rng.choice(list(_ALPHA20), size=length)

    def mutate(seq):
        seq = seq.copy()
        subs = rng.random(len(seq)) < sub_p
        seq[subs] = rng.choice(list(_ALPHA20), size=int(subs.sum()))
        out = list(seq)
        # a couple of short indels per branch
        for _ in range(rng.poisson(indel_p * len(out))):
            pos = int(rng.integers(0, max(len(out) - 3, 1)))
            k = int(rng.integers(1, 4))
            if rng.random() < 0.5 and len(out) > k + 10:
                del out[pos:pos + k]
            else:
                ins = rng.choice(list(_ALPHA20), size=k)
                out[pos:pos] = list(ins)
        return np.array(out)

    leaves = []

    def walk(seq, d):
        if d == depth:
            leaves.append("".join(seq))
            return
        walk(mutate(seq), d + 1)
        walk(mutate(seq), d + 1)

    walk(root, 0)
    n = len(leaves)
    splits = set()

    def subtree(lo, hi):
        if hi - lo <= 1:
            return
        m = (lo + hi) // 2
        for a, b in ((lo, m), (m, hi)):
            if 1 < b - a < n - 1:
                splits.add(_canon_split(frozenset(range(a, b)), n))
            subtree(a, b)

    subtree(0, n)
    return leaves, splits, n


def phylo_accuracy_vs_true(test_rows, true_splits, n_leaves):
    """Normalized RF between NJ(test alignment) and the generating
    tree."""
    st = neighbor_joining(p_distance_matrix(test_rows))
    return {
        "rf_true": round(robinson_foulds(st, true_splits, n_leaves), 4),
        "splits_recovered": len(st & true_splits),
        "splits_true": len(true_splits),
    }
