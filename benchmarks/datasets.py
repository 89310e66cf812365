"""Benchmark dataset registry (reference: benchmarks/datasets.py:35-60).

Two dataset sources work without network access:

  * "balibase"  — the BAliBASE families committed under tests/data
                  (.tfa inputs with .msf gold alignments).
  * "dssim"     — simulated families from the DSSim profile-HMM with
                  ground-truth alignments (kalign_tpu.dssim
                  .generate_test_alignment), swept over divergence
                  (emission noise), indel rate, family size, length and
                  alphabet: 24 families across 6 categories.

A downloaded BAliBASE tree (RV11..RV50 directories) is picked up via
--data when present, matching the reference harness's directory layout.
"""

import glob
import os
from typing import List, NamedTuple, Optional


class Case(NamedTuple):
    category: str
    name: str
    # file-based cases
    tfa: Optional[str] = None
    gold: Optional[str] = None
    # generated cases
    gen: Optional[dict] = None   # kwargs for generate_test_alignment


# divergence presets: emission noise up, conservation down
_DSSIM_LEVELS = {
    "easy": dict(n_obs=20, match_err_p=0.02),
    "medium": dict(n_obs=10, match_err_p=0.05),
    "hard": dict(n_obs=5, match_err_p=0.12),
}


def dssim_cases() -> List[Case]:
    cases = []
    seed = 1000
    for level, knobs in _DSSIM_LEVELS.items():
        for n_seq, length in ((16, 150), (32, 300), (64, 500)):
            seed += 1
            cases.append(Case(
                category=f"dssim-prot-{level}",
                name=f"prot-{level}-n{n_seq}-L{length}",
                gen=dict(n_seq=n_seq, dna=False, length=length,
                         seed=seed, **knobs)))
    for level in ("easy", "medium", "hard"):
        knobs = _DSSIM_LEVELS[level]
        for n_seq, length in ((16, 200), (48, 400)):
            seed += 1
            cases.append(Case(
                category=f"dssim-dna-{level}",
                name=f"dna-{level}-n{n_seq}-L{length}",
                gen=dict(n_seq=n_seq, dna=True, length=length,
                         seed=seed, **knobs)))
    # RNA category (BRAliBASE analogue: DNA simulation transcribed)
    for n_seq, length in ((16, 200), (32, 350)):
        seed += 1
        cases.append(Case(
            category="dssim-rna",
            name=f"rna-n{n_seq}-L{length}",
            gen=dict(n_seq=n_seq, dna=True, length=length, seed=seed,
                     n_obs=10, match_err_p=0.05, rna=True)))
    # high-indel stress category
    for n_seq, length in ((24, 250), (24, 500)):
        seed += 1
        cases.append(Case(
            category="dssim-prot-indel",
            name=f"prot-indel-n{n_seq}-L{length}",
            gen=dict(n_seq=n_seq, dna=False, length=length, seed=seed,
                     n_obs=10, match_err_p=0.05, indel_p=0.10)))
    return cases


def balibase_cases(data_dir: str) -> List[Case]:
    cases = []
    # flat layout (committed tests/data) and BAliBASE RV* tree layout
    patterns = [os.path.join(data_dir, "*.tfa"),
                os.path.join(data_dir, "RV*", "*.tfa")]
    for pat in patterns:
        for tfa in sorted(glob.glob(pat)):
            stem = os.path.splitext(tfa)[0]
            gold = stem + ".msf"
            if not os.path.exists(gold):
                continue
            rv = os.path.basename(os.path.dirname(tfa))
            cat = f"balibase-{rv}" if rv.startswith("RV") else "balibase"
            cases.append(Case(category=cat, name=os.path.basename(stem),
                              tfa=tfa, gold=gold))
    return cases


def load_cases(dataset: str, data_dir: str) -> List[Case]:
    if dataset == "balibase":
        return balibase_cases(data_dir)
    if dataset == "dssim":
        return dssim_cases()
    if dataset == "all":
        return balibase_cases(data_dir) + dssim_cases()
    raise ValueError(f"unknown dataset {dataset!r}")


def materialize(case: Case):
    """Returns (seqs, names, gold_rows, gold_names) for any case."""
    if case.gen is not None:
        from kalign_tpu.dssim import generate_test_alignment
        gen = dict(case.gen)
        rna = gen.pop("rna", False)
        seqs, names, rows = generate_test_alignment(**gen)
        if rna:
            seqs = [s.replace("T", "U") for s in seqs]
            rows = [r.replace("T", "U") for r in rows]
        return seqs, names, rows, names
    from kalign_tpu.core import io as kio
    m = kio.read_inputs([case.tfa])
    seqs = [s.seq for s in m.sequences]
    names = [s.name for s in m.sequences]
    g = kio.read_alignment(case.gold)
    if g.aligned == 2:
        g.finalise()
    return seqs, names, [s.seq for s in g.sequences], \
        [s.name for s in g.sequences]
