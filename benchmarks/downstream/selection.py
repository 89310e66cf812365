"""Positive-selection impact: alignment errors corrupt per-site dN/dS
estimates (reference: benchmarks/downstream/positive_selection.py).

Self-contained pipeline: simulate a codon family down a star phylogeny
where a known subset of sites evolves with an elevated nonsynonymous
rate; align the DNA with the tool; estimate per-codon-site dN/dS by
the Nei-Gojobori counting method over the alignment; score how well
the estimates identify the truly-selected sites (ROC AUC)."""

import numpy as np

_BASES = "ACGT"
_CODON_TABLE = {}


def _build_table():
    aas = ("FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRR"
           "VVVVAAAADDEEGGGG")
    i = 0
    for b1 in "TCAG":
        for b2 in "TCAG":
            for b3 in "TCAG":
                _CODON_TABLE[b1 + b2 + b3] = aas[i]
                i += 1


_build_table()


def _translate(codon):
    return _CODON_TABLE.get(codon, "X")


def simulate_selected_family(n_seq=24, n_codons=80, sel_frac=0.15,
                             neutral_nonsyn_p=0.02, sel_nonsyn_p=0.25,
                             syn_p=0.15, indel_p=0.01, seed=0):
    """Star-phylogeny codon family.  Selected sites receive frequent
    nonsynonymous substitutions; neutral sites mostly synonymous ones.
    Returns (dna_seqs, selected_mask[n_codons], gold_rows) — gold_rows
    is the TRUE codon-level DNA alignment (site homology tracked
    through the indel process), the controlled baseline for measuring
    how much alignment error costs the selection inference."""
    rng = np.random.default_rng(seed)
    # random sense-codon ancestor
    sense = [c for c, a in _CODON_TABLE.items() if a != "*"]
    root = [sense[rng.integers(len(sense))] for _ in range(n_codons)]
    selected = np.zeros(n_codons, bool)
    selected[rng.choice(n_codons, int(sel_frac * n_codons),
                        replace=False)] = True

    def syn_variant(codon):
        aa = _translate(codon)
        opts = [c for c in sense if _translate(c) == aa and c != codon]
        return opts[rng.integers(len(opts))] if opts else codon

    def nonsyn_variant(codon):
        aa = _translate(codon)
        opts = [c for c in sense if _translate(c) != aa]
        return opts[rng.integers(len(opts))]

    seqs = []
    traces = []                               # per codon: site id or -1
    for _ in range(n_seq):
        cods = []
        for j, c in enumerate(root):
            p_ns = sel_nonsyn_p if selected[j] else neutral_nonsyn_p
            r = rng.random()
            if r < p_ns:
                c = nonsyn_variant(c)
            elif r < p_ns + syn_p:
                c = syn_variant(c)
            cods.append(c)
        # occasional codon-length indels keep the alignment non-trivial
        out = []
        tr = []
        for j, c in enumerate(cods):
            if rng.random() < indel_p:
                continue                      # codon deletion
            out.append(c)
            tr.append(j)
            if rng.random() < indel_p:
                out.append(sense[rng.integers(len(sense))])
                tr.append(-1)                 # inserted codon
        seqs.append("".join(out))
        traces.append(tr)

    # true alignment: one column block per ancestral site plus insert
    # slots after it (insert codons are non-homologous filler)
    max_ins = [0] * (n_codons + 1)
    for tr in traces:
        run, last = 0, -2
        for t in tr:
            if t == -1:
                run += 1
                if run > max_ins[last + 1]:
                    max_ins[last + 1] = run
            else:
                run, last = 0, t
    block_col = [0] * (n_codons + 1)
    col = 0
    for j in range(n_codons + 1):
        block_col[j] = col
        col += 1 + max_ins[j]
    total = col
    gold_rows = []
    for seq, tr in zip(seqs, traces):
        slots = ["---"] * total
        run, last = 0, -2
        for k, t in enumerate(tr):
            codon = seq[3 * k: 3 * k + 3]
            if t == -1:
                run += 1
                slots[block_col[last + 1] + run] = codon
            else:
                run, last = 0, t
                slots[block_col[t + 1]] = codon
        gold_rows.append("".join(slots))
    keep = [c for c in range(total)
            if any(r[3 * c: 3 * c + 3] != "---" for r in gold_rows)]
    gold_rows = ["".join(r[3 * c: 3 * c + 3] for c in keep)
                 for r in gold_rows]
    # ancestral site id per codon of sequence 0 (-1 = inserted codon):
    # the dN/dS estimator indexes sites in reference-row coordinates,
    # which drift from ancestral coordinates once indels occur
    return seqs, selected, gold_rows, traces[0]


def _syn_nonsyn_sites(codon):
    """Nei-Gojobori expected synonymous site count of a codon."""
    syn = 0.0
    for pos in range(3):
        for b in _BASES:
            if b == codon[pos]:
                continue
            mut = codon[:pos] + b + codon[pos + 1:]
            if _translate(mut) == _translate(codon) and \
                    _translate(mut) != "*":
                syn += 1.0 / 3.0
    return syn


def per_site_dnds(aligned_dna_rows, ref_row=0):
    """Per-codon-site dN/dS estimates from a DNA alignment by pairwise
    Nei-Gojobori counting against every other sequence, indexed by the
    reference row's codon coordinates.  Returns (sites, dnds[sites])."""
    ref = aligned_dna_rows[ref_row]
    # map reference codon index -> 3 alignment columns (ungapped ref)
    cols = [j for j, ch in enumerate(ref) if ch != "-"]
    n_cod = len(cols) // 3
    dn = np.zeros(n_cod)
    ds = np.zeros(n_cod)
    Nn = np.zeros(n_cod)
    Ns = np.zeros(n_cod)
    for other in range(len(aligned_dna_rows)):
        if other == ref_row:
            continue
        row = aligned_dna_rows[other]
        for k in range(n_cod):
            c3 = cols[3 * k: 3 * k + 3]
            ref_cod = "".join(ref[c] for c in c3)
            oth_cod = "".join(row[c] for c in c3)
            if "-" in oth_cod or "N" in oth_cod:
                continue
            s_sites = _syn_nonsyn_sites(ref_cod)
            Ns[k] += s_sites
            Nn[k] += 3.0 - s_sites
            if oth_cod == ref_cod:
                continue
            same_aa = _translate(oth_cod) == _translate(ref_cod)
            diffs = sum(a != b for a, b in zip(ref_cod, oth_cod))
            if same_aa:
                ds[k] += diffs
            else:
                dn[k] += diffs
    with np.errstate(divide="ignore", invalid="ignore"):
        pn = np.where(Nn > 0, dn / Nn, 0.0)
        ps = np.where(Ns > 0, ds / Ns, 0.0)
        ratio = np.where(ps > 0, pn / np.maximum(ps, 1e-9), pn / 1e-2)
    return n_cod, ratio


def selection_detection(aligned_dna_rows, selected_mask, ref_sites=None,
                        ref_row=0):
    """AUC of per-site dN/dS ranking the truly-selected sites.
    ref_sites maps the reference row's codon index to its ancestral
    site id (-1 = inserted codon, excluded); identity when omitted."""
    from benchmarks.downstream.detection import roc_auc
    n_cod, ratio = per_site_dnds(aligned_dna_rows, ref_row)
    if ref_sites is None:
        ref_sites = list(range(len(selected_mask)))
    n = min(n_cod, len(ref_sites))
    keep = [k for k in range(n) if 0 <= ref_sites[k] < len(selected_mask)]
    ratio = ratio[keep]
    mask = np.asarray([selected_mask[ref_sites[k]] for k in keep], bool)
    if mask.sum() == 0 or (~mask).sum() == 0:
        return {"auc": None, "sites": int(n)}
    return {"auc": round(roc_auc(ratio[mask], ratio[~mask]), 4),
            "sites": int(n), "selected": int(mask.sum()),
            "mean_dnds_selected": round(float(ratio[mask].mean()), 3),
            "mean_dnds_neutral": round(float(ratio[~mask].mean()), 3)}
