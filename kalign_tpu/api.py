"""Public Python API — mirrors python-kalign's surface
(`/root/reference/python-kalign/__init__.py`): align, align_from_file,
align_file_to_file, write_alignment, compare, compare_detailed,
generate_test_sequences, set_num_threads/get_num_threads, and the
biopython / skbio output adapters.
"""

import threading
from typing import List, Optional, Sequence, Union

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

_thread_state = threading.local()
_DEFAULT_THREADS = 1


def set_num_threads(n: int) -> None:
    """Set the default worker-thread count for the native engine."""
    global _DEFAULT_THREADS
    if n < 1:
        raise ValueError("Thread count must be >= 1")
    _DEFAULT_THREADS = n


def get_num_threads() -> int:
    return _DEFAULT_THREADS


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
    if mode not in (None, "default", "fast", "precise"):
        raise ValueError(f"Unknown mode {mode!r}")
    if consistency is None:
        consistency = 0 if mode == "fast" else 5
    if mode == "precise":
        if not ensemble:
            ensemble = 3
        if not realign:
            realign = 1
    return consistency, ensemble or 0, realign or 0


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
                raise ValueError(
                    f"Sequence {i} contains control/non-ASCII character")
            if ch.isdigit():
                raise ValueError(f"Sequence {i} contains digits")


def _run_alignment(sequences, names, *, seq_type, n_threads, gap_open,
                   gap_extend, terminal_gap_extend, refine, mode,
                   consistency, consistency_weight, ensemble, ensemble_seed,
                   min_support, realign, vsm_amax, engine,
                   dist_scale=0.0, adaptive_budget=False):
    type_ = _resolve_type(seq_type)
    refine_ = refine if isinstance(refine, int) else _REFINE_NAMES[refine]
    consistency, ensemble, realign = _resolve_mode(mode, consistency,
                                                   ensemble, realign)
    if n_threads is None:
        n_threads = _DEFAULT_THREADS

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
                                adaptive_budget=int(adaptive_budget),
                                realign=realign, vsm_amax=vsm_amax,
                                dist_scale=dist_scale,
                                consistency_anchors=consistency,
                                consistency_weight=consistency_weight,
                                engine=engine)
    return msa


def align(
    sequences: Sequence[str],
    seq_type: Union[str, int, None] = "auto",
    n_threads: Optional[int] = None,
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
    dist_scale: float = 0.0,
    adaptive_budget: bool = False,
    names: Optional[Sequence[str]] = None,
    fmt: str = "plain",
    ids: Optional[Sequence[str]] = None,
    engine: str = "host",
):
    """Align sequences.

    fmt: "plain" (list of aligned rows, input order), "biopython"
    (Bio.Align.MultipleSeqAlignment with PP annotations when ensemble
    confidence is available), or "skbio" (TabularMSA).
    """
    _validate_sequences(sequences)
    if ids is not None and names is None:
        names = ids
    msa = _run_alignment(sequences, names, seq_type=seq_type,
                         n_threads=n_threads, gap_open=gap_open,
                         gap_extend=gap_extend,
                         terminal_gap_extend=terminal_gap_extend,
                         refine=refine, mode=mode, consistency=consistency,
                         consistency_weight=consistency_weight,
                         ensemble=ensemble, ensemble_seed=ensemble_seed,
                         min_support=min_support, realign=realign,
                         vsm_amax=vsm_amax, dist_scale=dist_scale,
                         adaptive_budget=adaptive_budget, engine=engine)
    rows = msa.aligned_rows()
    if fmt == "plain":
        return rows
    out_names = [sq.name for sq in msa.sequences]
    if fmt == "biopython":
        return _to_biopython(msa, rows, out_names)
    if fmt == "skbio":
        return _to_skbio(msa, rows, out_names)
    raise ValueError(f"Unknown fmt {fmt!r}")


def _conf_to_pp(conf: float) -> str:
    if conf >= 0.95:
        return "*"
    return str(int(conf * 10))


def _to_biopython(msa, rows, names):
    try:
        from Bio.Align import MultipleSeqAlignment
        from Bio.Seq import Seq
        from Bio.SeqRecord import SeqRecord
    except ImportError as e:
        raise ImportError(
            "Biopython required for fmt='biopython'. "
            "Run: pip install biopython") from e
    records = []
    for i, (row, name) in enumerate(zip(rows, names)):
        rec = SeqRecord(Seq(row), id=name, description="")
        conf = msa.sequences[i].confidence
        if conf is not None:
            pp = "".join("." if ch in "-." else _conf_to_pp(c)
                         for ch, c in zip(row, conf))
            rec.letter_annotations["posterior_probability"] = pp
        records.append(rec)
    aln = MultipleSeqAlignment(records)
    if msa.col_confidence is not None:
        aln.column_annotations = {
            "posterior_probability":
                "".join(_conf_to_pp(c) for c in msa.col_confidence)}
    return aln


def _to_skbio(msa, rows, names):
    try:
        from skbio import DNA, Protein, RNA, TabularMSA
    except ImportError as e:
        raise ImportError(
            "scikit-bio required for fmt='skbio'. "
            "Run: pip install scikit-bio") from e
    alphabet = set("".join(rows).upper().replace("-", ""))
    if alphabet.issubset(set("ACGTN")):
        cls = DNA
    elif alphabet.issubset(set("ACGUN")):
        cls = RNA
    else:
        cls = Protein
    seqs = [cls(row, metadata={"id": name})
            for row, name in zip(rows, names)]
    return TabularMSA(seqs)


def align_from_file(path: str, out_format: str = "plain", **kw) -> List[str]:
    msa = kio.read_inputs([path])
    seqs = [sq.seq for sq in msa.sequences]
    names = [sq.name for sq in msa.sequences]
    return align(seqs, names=names, fmt=out_format if out_format != "plain"
                 else "plain", **kw)


def align_file_to_file(in_path: str, out_path: str, out_format: str = "fasta",
                       **kw) -> None:
    msa = kio.read_inputs([in_path])
    aligned = _run_alignment(
        [sq.seq for sq in msa.sequences], [sq.name for sq in msa.sequences],
        seq_type=kw.pop("seq_type", "auto"),
        n_threads=kw.pop("n_threads", None),
        gap_open=kw.pop("gap_open", -1.0),
        gap_extend=kw.pop("gap_extend", -1.0),
        terminal_gap_extend=kw.pop("terminal_gap_extend", -1.0),
        refine=kw.pop("refine", None), mode=kw.pop("mode", None),
        consistency=kw.pop("consistency", None),
        consistency_weight=kw.pop("consistency_weight", 2.0),
        ensemble=kw.pop("ensemble", 0),
        ensemble_seed=kw.pop("ensemble_seed", 42),
        min_support=kw.pop("min_support", 0),
        realign=kw.pop("realign", 0), vsm_amax=kw.pop("vsm_amax", -1.0),
        engine=kw.pop("engine", "host"))
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


def generate_test_sequences(n_seq: int = 20, n_obs: int = 10,
                            dna: bool = False, length: int = 250,
                            seed: int = 42):
    """Profile-HMM simulated families (bit-exact DSSim port)."""
    from kalign_tpu.dssim import generate_test_sequences as gen
    return gen(n_seq, n_obs, dna, length, seed)


def compare(reference, test, ref_names=None, test_names=None) -> float:
    """SP agreement %.  Accepts file paths or row lists."""
    ref_rows, ref_names = _rows_arg(reference, ref_names)
    test_rows, test_names = _rows_arg(test, test_names)
    from kalign_tpu.core.cmp import msa_compare
    return msa_compare(ref_rows, test_rows, ref_names, test_names)


def compare_detailed(reference, test, ref_names=None, test_names=None,
                     max_gap_frac: float = 1.0, column_mask=None):
    """Detailed recall/precision/F1/TC scoring.  ``column_mask``
    (optional list/array of 0/1 per reference column, mirrors
    ``kalign_msa_compare_with_mask``, kalign.h:107 / msa_cmp.c:449-480)
    overrides the gap-fraction core-column rule; its length must equal
    the reference alignment length."""
    ref_rows, ref_names = _rows_arg(reference, ref_names)
    test_rows, test_names = _rows_arg(test, test_names)
    from kalign_tpu.core.cmp import msa_compare_detailed
    return msa_compare_detailed(ref_rows, test_rows, ref_names, test_names,
                                max_gap_frac, scored_cols=column_mask)


def compare_with_mask(reference, test, column_mask,
                      ref_names=None, test_names=None):
    """Explicit-column-mask comparison (``kalign_msa_compare_with_mask``,
    msa_cmp.c:449-480): score only reference columns whose mask entry is
    truthy.  Raises ValueError when the mask length doesn't match the
    reference alignment length, like the reference's ASSERT."""
    return compare_detailed(reference, test, ref_names, test_names,
                            column_mask=column_mask)


def post_realign(msa_or_path, out_path: Optional[str] = None,
                 out_format: str = "fasta", seq_type=None,
                 gap_open: float = -1.0, gap_extend: float = -1.0,
                 terminal_gap_extend: float = -1.0,
                 refine=None, adaptive_budget: int = 0,
                 dist_scale: float = 0.0, vsm_amax: float = -1.0,
                 realign_iterations: int = 1, use_seq_weights: float = -1.0,
                 n_threads: Optional[int] = None,
                 engine: Optional[str] = None) -> Msa:
    """Realign an existing alignment in place (``kalign_post_realign``,
    kalign.h:73 / aln_wrap.c:539-669): rebuild the guide tree from
    alignment-derived identity distances and re-run the progressive
    pass, keeping the established alignment as the starting point.

    Accepts an ``Msa`` or a path to an aligned file; writes to
    ``out_path`` when given and always returns the realigned Msa."""
    import os as _os
    if isinstance(msa_or_path, str):
        msa = kio.read_alignment(msa_or_path)
    else:
        msa = msa_or_path
    msa = _engine.post_realign_msa(
        msa, n_threads=n_threads or get_num_threads(),
        type_=_resolve_type(seq_type),
        gpo=gap_open, gpe=gap_extend, tgpe=terminal_gap_extend,
        refine=_REFINE_NAMES[refine] if not isinstance(refine, int)
        else refine,
        adaptive_budget=adaptive_budget, dist_scale=dist_scale,
        vsm_amax=vsm_amax, realign_iterations=realign_iterations,
        use_seq_weights=use_seq_weights,
        engine=engine or _os.environ.get("KALIGN_TPU_ENGINE", "host"))
    if out_path is not None:
        kio.write_alignment_file(msa, out_path, out_format)
    return msa


def _rows_arg(arg, names):
    if isinstance(arg, str):
        msa = kio.read_alignment(arg)
        if msa.aligned == 2:
            msa.finalise()
        return [sq.seq for sq in msa.sequences], [sq.name for sq in msa.sequences]
    return list(arg), names
