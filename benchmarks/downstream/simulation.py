"""Tree-based sequence simulation with a KNOWN true alignment.

The downstream analogue of the reference's INDELible + dendropy
pipeline (reference: benchmarks/downstream/simulation.py — birth-death
tree generation, indel-aware evolution, per-site selection classes),
rebuilt self-contained: no external simulator binary, no dendropy.

What it adds over the in-repo generators:

  * `kalign_tpu.dssim` families are star phylogenies (iid draws from
    one HMM) — no meaningful tree;
  * `phylo.evolve_family` gives a balanced tree but NO true alignment
    (indels are applied positionally, genealogy is lost).

Here every alignment column has an identity that survives evolution
(column genealogy): substitutions change the character, deletions
leave a gap in that lineage, insertions mint fresh columns spliced
into a global column order.  The leaf rows read off that order ARE the
true alignment — the same contract INDELible's TRUE files give the
reference suite.  Per-site classes (0 = neutral, 1 = fast/selected)
make the families usable by the positive-selection and detection
pipelines; the known topology feeds Robinson-Foulds scoring.
"""

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

_AA = "ACDEFGHIKLMNPQRSTVWY"
_NT = "ACGT"


# ---------------------------------------------------------------------------
# birth-death trees
# ---------------------------------------------------------------------------

@dataclass
class Tree:
    """Rooted binary tree over leaves 0..n-1.

    parent[i] / blen[i] index ALL nodes (leaves first, then internals,
    root last, parent[root] == -1)."""
    n_leaves: int
    parent: np.ndarray
    blen: np.ndarray

    def children(self):
        ch = {}
        for i, p in enumerate(self.parent):
            if p >= 0:
                ch.setdefault(int(p), []).append(i)
        return ch

    @property
    def root(self) -> int:
        return int(np.nonzero(self.parent < 0)[0][0])

    def leafsets(self):
        """frozenset of descendant leaves per internal node."""
        ch = self.children()
        out = {}

        def walk(v):
            if v < self.n_leaves:
                return frozenset([v])
            s = frozenset()
            for c in ch[v]:
                s |= walk(c)
            out[v] = s
            return s

        walk(self.root)
        return out

    def true_splits(self):
        """Non-trivial bipartitions of the topology, in the canonical
        form benchmarks.downstream.phylo uses for RF scoring."""
        from benchmarks.downstream.phylo import _canon_split
        n = self.n_leaves
        splits = set()
        for v, s in self.leafsets().items():
            if 1 < len(s) < n - 1:
                splits.add(_canon_split(s, n))
        return splits

    def newick(self, names: Optional[List[str]] = None) -> str:
        ch = self.children()
        names = names or [str(i + 1) for i in range(self.n_leaves)]

        def walk(v):
            if v < self.n_leaves:
                return f"{names[v]}:{self.blen[v]:.6f}"
            inner = ",".join(walk(c) for c in ch[v])
            tail = "" if self.parent[v] < 0 else f":{self.blen[v]:.6f}"
            return f"({inner}){tail}"

        return walk(self.root) + ";"


def birth_death_tree(n_taxa: int, seed: int = 42, birth: float = 1.0,
                     death: float = 0.4, target_depth: float = 0.5) -> Tree:
    """Sample a birth-death tree conditioned on n_taxa surviving tips,
    then rescale so the root-to-tip expectation equals target_depth
    (expected substitutions per site along a root-tip path) —
    the reference's random_birth_death_tree contract
    (reference benchmarks/downstream/simulation.py:36-60) without
    dendropy.  Simple rejection: lineages branch at rate `birth`, die
    at rate `death`; restart on extinction or overshoot."""
    rng = np.random.default_rng(seed)
    for _attempt in range(1000):
        # live lineages as (node_id, birth_time); collect edges
        parent = {0: -1}
        btime = {0: 0.0}
        dead = set()
        live = [0]
        next_id = 1
        t = 0.0
        ok = True
        while len(live) < n_taxa:
            rate = len(live) * (birth + death)
            t += rng.exponential(1.0 / rate)
            k = live[int(rng.integers(len(live)))]
            if rng.random() < birth / (birth + death):
                for _ in range(2):
                    parent[next_id] = k
                    btime[next_id] = t
                    live.append(next_id)
                    next_id += 1
                live.remove(k)
            else:
                live.remove(k)
                dead.add(k)
                if not live:
                    ok = False
                    break
        if not ok:
            continue
        # prune dead lineages; live nodes become the leaves at time t_end
        t_end = t + rng.exponential(1.0 / (len(live) * birth))
        keep = set(live)
        frontier = list(live)
        while frontier:
            v = frontier.pop()
            p = parent[v]
            if p >= 0 and p not in keep:
                keep.add(p)
                frontier.append(p)
        # suppress unary nodes (dead side pruned away)
        ch = {}
        for v in keep:
            p = parent[v]
            if p >= 0 and p in keep:
                ch.setdefault(p, []).append(v)
        def resolve(v):
            # walk down through unary chains, accumulating time
            while v in ch and len(ch[v]) == 1:
                v = ch[v][0]
            return v
        root = resolve(min(keep))
        # rebuild arrays: leaves (live, in id order) then internals
        leaves = sorted(live)
        index = {v: i for i, v in enumerate(leaves)}
        n = len(leaves)
        out_parent, out_blen = {}, {}
        counter = [n]

        def walk(v, parent_time):
            v = resolve(v)
            if v in live:
                my = index[v]
                out_blen[my] = t_end - parent_time
                return my
            my = counter[0]
            counter[0] += 1
            my_time = btime[ch[v][0]]  # both children share the event time
            out_blen[my] = my_time - parent_time
            for c in ch[v]:
                cid = walk(c, my_time)
                out_parent[cid] = my
            return my

        rid = walk(root, btime[root])
        out_parent[rid] = -1
        total = counter[0]
        parent_a = np.full(total, -1, dtype=np.int64)
        blen_a = np.zeros(total)
        for v, p in out_parent.items():
            parent_a[v] = p
        for v, b in out_blen.items():
            blen_a[v] = max(float(b), 1e-6)
        tree = Tree(n, parent_a, blen_a)
        # rescale to target depth (mean root-to-tip path)
        depths = np.zeros(total)
        ch2 = tree.children()

        def dwalk(v, d):
            depths[v] = d
            for c in ch2.get(v, []):
                dwalk(c, d + blen_a[c])

        dwalk(tree.root, 0.0)
        mean_depth = float(depths[:n].mean())
        if mean_depth <= 0:
            continue
        tree.blen = blen_a * (target_depth / mean_depth)
        return tree
    raise RuntimeError("birth-death sampling failed to converge")


# ---------------------------------------------------------------------------
# evolution with column genealogy
# ---------------------------------------------------------------------------

@dataclass
class SimulatedFamily:
    """Reference SimulatedDataset analogue (simulation.py:20-29):
    true alignment + unaligned inputs + tree + per-site classes."""
    true_rows: List[str]          # gapped leaf rows (the TRUE alignment)
    seqs: List[str]               # ungapped inputs for the aligner
    names: List[str]
    newick: str
    true_splits: set              # canonical bipartitions (RF scoring)
    n_leaves: int
    site_classes: List[int]       # per TRUE column: 0 neutral / 1 fast
    params: dict = field(default_factory=dict)


def simulate_family(n_taxa: int = 16, length: int = 200, seed: int = 0,
                    dna: bool = False, target_depth: float = 0.5,
                    indel_rate: float = 0.03, mean_indel: float = 2.0,
                    fast_fraction: float = 0.15,
                    fast_multiplier: float = 4.0) -> SimulatedFamily:
    """Evolve one family down a birth-death tree.

    Substitutions are Poisson(branch_length * site_rate) per site under
    a uniform-replacement model; indels arrive at `indel_rate` events
    per unit branch length per site with geometric lengths
    (mean `mean_indel`).  A `fast_fraction` of root sites evolves
    `fast_multiplier`x faster — the "selected" class the positive-
    selection pipeline must recover.  Column identity is preserved
    through evolution, so the returned rows are the exact true
    alignment (INDELible TRUE-file contract)."""
    rng = np.random.default_rng(seed)
    alpha = _NT if dna else _AA
    A = len(alpha)
    tree = birth_death_tree(n_taxa, seed=seed + 7, target_depth=target_depth)

    # global column order: list of column ids; root columns 0..L-1
    order = list(range(length))
    next_col = [length]
    col_class = {c: (1 if rng.random() < fast_fraction else 0)
                 for c in range(length)}

    # node sequences: dict col_id -> char index, plus ordered id list
    root_ids = list(range(length))
    root_chars = {c: int(rng.integers(A)) for c in root_ids}

    ch = tree.children()
    leaf_seqs = {}

    def evolve_edge(ids, chars, t):
        ids = list(ids)
        chars = dict(chars)
        # substitutions: per-site rate = 1.0 (or fast_multiplier)
        for c in ids:
            rate = fast_multiplier if col_class[c] else 1.0
            if rng.random() < -np.expm1(-rate * t):
                chars[c] = int(rng.integers(A))
        # indel events over the current length
        n_events = rng.poisson(indel_rate * t * max(len(ids), 1))
        for _ in range(n_events):
            k = 1 + rng.geometric(1.0 / mean_indel) - 1
            k = int(max(1, min(k, 12)))
            if rng.random() < 0.5 and len(ids) > k + 8:
                pos = int(rng.integers(0, len(ids) - k))
                for c in ids[pos:pos + k]:
                    chars.pop(c, None)
                del ids[pos:pos + k]
            else:
                pos = int(rng.integers(0, len(ids) + 1))
                fresh = list(range(next_col[0], next_col[0] + k))
                next_col[0] += k
                # splice into the GLOBAL order right after the column
                # preceding the insertion point in this lineage
                if pos == 0:
                    gpos = 0 if not ids else order.index(ids[0])
                else:
                    gpos = order.index(ids[pos - 1]) + 1
                order[gpos:gpos] = fresh
                neigh = ids[pos - 1] if pos else (ids[0] if ids else None)
                klass = col_class.get(neigh, 0)
                for c in fresh:
                    col_class[c] = klass
                    chars[c] = int(rng.integers(A))
                ids[pos:pos] = fresh
        return ids, chars

    def walk(v, ids, chars):
        if v < tree.n_leaves:
            leaf_seqs[v] = (ids, chars)
            return
        for c in ch[v]:
            walk(c, *evolve_edge(ids, chars, float(tree.blen[c])))

    walk(tree.root, root_ids, root_chars)

    # columns present in >= 1 leaf, in global order
    present = set()
    for ids, _ in leaf_seqs.values():
        present.update(ids)
    cols = [c for c in order if c in present]
    cpos = {c: i for i, c in enumerate(cols)}
    L = len(cols)
    n = tree.n_leaves
    rows = []
    for i in range(n):
        ids, chars = leaf_seqs[i]
        row = ["-"] * L
        for c in ids:
            row[cpos[c]] = alpha[chars[c]]
        rows.append("".join(row))
    names = [f"t{i + 1}" for i in range(n)]
    return SimulatedFamily(
        true_rows=rows,
        seqs=[r.replace("-", "") for r in rows],
        names=names,
        newick=tree.newick(names),
        true_splits=tree.true_splits(),
        n_leaves=n,
        site_classes=[col_class[c] for c in cols],
        params=dict(n_taxa=n_taxa, length=length, seed=seed, dna=dna,
                    target_depth=target_depth, indel_rate=indel_rate,
                    fast_fraction=fast_fraction,
                    fast_multiplier=fast_multiplier),
    )


def simulation_grid(n_families: int = 6, seed0: int = 4200,
                    dna: bool = False, quick: bool = False):
    """The reference's simulation sweep shape (depth x indel grid,
    simulation.py:iter_datasets): families across a divergence ladder."""
    depths = (0.3, 0.6, 1.0) if not quick else (0.5,)
    fams = []
    i = 0
    while len(fams) < n_families:
        d = depths[i % len(depths)]
        fams.append(simulate_family(
            n_taxa=12 + 4 * (i % 3), length=180, seed=seed0 + i,
            dna=dna, target_depth=d, indel_rate=0.02 + 0.02 * (i % 2)))
        i += 1
    return fams
