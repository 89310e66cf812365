"""Per-case align + score wrappers, including external-tool comparison
(reference: benchmarks/scoring.py:17-50 — clustalo/mafft/muscle are
invoked when present on PATH; absent tools are skipped, not faked)."""

import os
import shutil
import subprocess
import tempfile
import time


def _detailed(gold_rows, gold_names, test_rows, test_names):
    from kalign_tpu.core.cmp import msa_compare_detailed
    return msa_compare_detailed(gold_rows, test_rows, gold_names,
                                test_names, 0.2)


def score_kalign(seqs, names, gold_rows, gold_names, mode="default",
                 engine="host", n_threads=1):
    """Align with this framework and score against gold."""
    from kalign_tpu.api import align
    t0 = time.time()
    out = align(seqs, names=names, mode=None if mode == "default" else mode,
                engine=engine, n_threads=n_threads)
    wall = time.time() - t0
    d = _detailed(gold_rows, gold_names, out, names)
    return dict(wall_s=round(wall, 3), sp=round(d.recall, 4),
                tc=round(d.tc, 4), precision=round(d.precision, 4),
                f1=round(d.f1, 4), alnlen=len(out[0]) if out else 0)


_EXTERNAL = {
    "clustalo": ["clustalo", "-i", "{in}", "-o", "{out}", "--force"],
    "mafft": ["mafft", "--quiet", "{in}"],          # writes stdout
    "muscle": ["muscle", "-align", "{in}", "-output", "{out}"],
    # the reference kalign binary itself (an out-of-tree build or one
    # on PATH) — the apples-to-apples external comparison
    "kalign-ref": ["{kalign-ref}", "-i", "{in}", "-o", "{out}", "-q"],
}


def _kalign_ref_bin():
    """Reference kalign binary: $KALIGN_REF_BIN, the out-of-tree
    .refbuild (CLAUDE.md parity-testing setup), or one on PATH."""
    cand = os.environ.get("KALIGN_REF_BIN")
    if cand and os.access(cand, os.X_OK):
        return cand
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cand = os.path.join(here, ".refbuild", "src", "kalign")
    if os.access(cand, os.X_OK):
        return cand
    return shutil.which("kalign")


def _tool_available(tool):
    if tool == "kalign-ref":
        return _kalign_ref_bin() is not None
    return shutil.which(tool) is not None


def available_external_tools():
    return [t for t in _EXTERNAL if _tool_available(t)]


def align_external(tool, seqs, names, timeout=600):
    """Align with an external tool (if installed); returns
    (aligned_rows, row_names, wall_s) or None when the tool is missing
    or fails.  Used by both the scoring path and the gap-structure
    analysis (benchmarks/analysis.py)."""
    if not _tool_available(tool):
        return None
    from kalign_tpu.core import io as kio
    with tempfile.TemporaryDirectory() as td:
        fin = os.path.join(td, "in.fa")
        fout = os.path.join(td, "out.fa")
        with open(fin, "w") as fh:
            for n, s in zip(names, seqs):
                fh.write(f">{n}\n{s}\n")
        cmd = [a.replace("{in}", fin).replace("{out}", fout)
               .replace("{kalign-ref}", _kalign_ref_bin() or "kalign")
               for a in _EXTERNAL[tool]]
        t0 = time.time()
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=timeout)
        except (subprocess.TimeoutExpired, OSError):
            return None
        wall = time.time() - t0
        if tool == "mafft":
            with open(fout, "w") as fh:
                fh.write(r.stdout)
        if r.returncode != 0 or not os.path.exists(fout):
            return None
        m = kio.read_alignment(fout)
        if m.aligned == 2:
            m.finalise()
        return ([s.seq for s in m.sequences],
                [s.name for s in m.sequences], wall)


def score_external(tool, seqs, names, gold_rows, gold_names, timeout=600):
    """Align with an external tool (if installed) and score against the
    same gold; returns None when the tool is unavailable."""
    a = align_external(tool, seqs, names, timeout)
    if a is None:
        return None
    rows, row_names, wall = a
    d = _detailed(gold_rows, gold_names, rows, row_names)
    return dict(tool=tool, wall_s=round(wall, 3), sp=round(d.recall, 4),
                tc=round(d.tc, 4))
