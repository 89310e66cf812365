"""Public Python API — mirrors python-kalign's surface
(`/root/reference/python-kalign/__init__.py`).
"""

from typing import List, Optional, Sequence, Tuple, Union

from kalign_tpu.core import io as kio
from kalign_tpu.core import params as P
from kalign_tpu.core.msa import Msa
from kalign_tpu import engine as _engine

_TYPE_NAMES = {
    None: 0,
    "auto": 0,
    "protein": P.KALIGN_TYPE_PROTEIN,
    "dna": P.KALIGN_TYPE_DNA,
    "internal": P.KALIGN_TYPE_DNA_INTERNAL,
    "rna": P.KALIGN_TYPE_RNA,
    "divergent": P.KALIGN_TYPE_PROTEIN_DIVERGENT,
    "pfasum43": P.KALIGN_TYPE_PROTEIN_PFASUM43,
    "pfasum60": P.KALIGN_TYPE_PROTEIN_PFASUM60,
    "pfasum": P.KALIGN_TYPE_PROTEIN_PFASUM_AUTO,
}

_REFINE_NAMES = {
    None: P.REFINE_NONE,
    "none": P.REFINE_NONE,
    "all": P.REFINE_ALL,
    "confident": P.REFINE_CONFIDENT,
    "inline": P.REFINE_INLINE,
}


def _resolve_type(seq_type) -> int:
    if isinstance(seq_type, int):
        return seq_type
    try:
        return _TYPE_NAMES[seq_type]
    except KeyError:
        raise ValueError(f"Unknown sequence type {seq_type!r}") from None


def _resolve_mode(mode: Optional[str], consistency, ensemble, realign):
    """Mode presets (run_kalign.c:370-383 / python __init__.py:84-94):
    default -> consistency 5; fast -> consistency 0; precise ->
    ensemble 3 + realign 1."""
    if consistency is None:
        consistency = 5
        if mode == "fast":
            consistency = 0
    if mode == "precise":
        if not ensemble:
            ensemble = 3
        if not realign:
            realign = 1
    return consistency, ensemble or 0, realign or 0


def align(
    sequences: Sequence[str],
    seq_type: Union[str, int, None] = "auto",
    n_threads: int = 1,
    gap_open: float = -1.0,
    gap_extend: float = -1.0,
    terminal_gap_extend: float = -1.0,
    refine: Union[str, int, None] = None,
    mode: Optional[str] = None,
    consistency: Optional[int] = None,
    consistency_weight: float = 2.0,
    ensemble: int = 0,
    ensemble_seed: int = 42,
    min_support: int = 0,
    realign: int = 0,
    vsm_amax: float = -1.0,
    names: Optional[Sequence[str]] = None,
    engine: str = "host",
) -> List[str]:
    """Align sequences, returning the aligned rows in input order."""
    _validate_sequences(sequences)
    type_ = _resolve_type(seq_type)
    refine_ = _REFINE_NAMES[refine] if not isinstance(refine, int) else refine
    consistency, ensemble, realign = _resolve_mode(mode, consistency, ensemble, realign)

    msa = Msa.from_sequences(list(sequences), list(names) if names else None)
    msa.quiet = True
    if ensemble > 0:
        from kalign_tpu.ensemble import ensemble_align
        msa = ensemble_align(msa, n_threads=n_threads, type_=type_,
                             n_runs=ensemble, gpo=gap_open, gpe=gap_extend,
                             tgpe=terminal_gap_extend, seed=ensemble_seed,
                             min_support=min_support, refine=refine_,
                             vsm_amax=vsm_amax, realign=realign,
                             consistency_anchors=consistency,
                             consistency_weight=consistency_weight,
                             engine=engine)
    else:
        msa = _engine.align_msa(msa, n_threads=n_threads, type_=type_,
                                gpo=gap_open, gpe=gap_extend,
                                tgpe=terminal_gap_extend, refine=refine_,
                                realign=realign, vsm_amax=vsm_amax,
                                consistency_anchors=consistency,
                                consistency_weight=consistency_weight,
                                engine=engine)
    return msa.aligned_rows()


def _validate_sequences(sequences):
    if sequences is None or len(sequences) < 2:
        raise ValueError("Need at least 2 sequences to align")
    for i, s in enumerate(sequences):
        if not isinstance(s, str):
            raise TypeError(f"Sequence {i} is not a string")
        if not s:
            raise ValueError(f"Sequence {i} is empty")
        for ch in s:
            o = ord(ch)
            if o < 32 or o > 126:
                raise ValueError(f"Sequence {i} contains control/non-ASCII character")
            if ch.isdigit():
                raise ValueError(f"Sequence {i} contains digits")


def align_from_file(path: str, fmt: Optional[str] = None, **kw) -> List[str]:
    msa = kio.read_alignment(path)
    seqs = []
    for sq in msa.sequences:
        parts = []
        pos = 0
        s = sq.seq
        seqs.append(s)
    names = [sq.name for sq in msa.sequences]
    return align(seqs, names=names, **kw)


def align_file_to_file(in_path: str, out_path: str, out_format: str = "fasta",
                       **kw) -> None:
    msa = kio.read_inputs([in_path])
    from kalign_tpu.engine import align_msa
    rows = align([sq.seq for sq in msa.sequences],
                 names=[sq.name for sq in msa.sequences], **kw)
    aligned = Msa.from_sequences(rows, [sq.name for sq in msa.sequences])
    aligned.finalise()
    kio.write_alignment_file(aligned, out_path, out_format)


def read_alignment(path: str) -> Msa:
    return kio.read_alignment(path)


def write_alignment(msa_or_rows, path: str, fmt: str = "fasta",
                    names: Optional[List[str]] = None):
    if isinstance(msa_or_rows, Msa):
        msa = msa_or_rows
    else:
        msa = Msa.from_sequences(list(msa_or_rows), names)
        msa.finalise()
    kio.write_alignment_file(msa, path, fmt)


def compare(ref_rows, test_rows, ref_names=None, test_names=None) -> float:
    from kalign_tpu.core.cmp import msa_compare
    return msa_compare(ref_rows, test_rows, ref_names, test_names)


def compare_detailed(ref_rows, test_rows, ref_names=None, test_names=None,
                     max_gap_frac: float = 1.0):
    from kalign_tpu.core.cmp import msa_compare_detailed
    return msa_compare_detailed(ref_rows, test_rows, ref_names, test_names,
                                max_gap_frac)
