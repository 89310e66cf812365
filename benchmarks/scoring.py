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
}


def available_external_tools():
    return [t for t in _EXTERNAL if shutil.which(t)]


def score_external(tool, seqs, names, gold_rows, gold_names, timeout=600):
    """Align with an external tool (if installed) and score against the
    same gold; returns None when the tool is unavailable."""
    if shutil.which(tool) is None:
        return None
    from kalign_tpu.core import io as kio
    with tempfile.TemporaryDirectory() as td:
        fin = os.path.join(td, "in.fa")
        fout = os.path.join(td, "out.fa")
        with open(fin, "w") as fh:
            for n, s in zip(names, seqs):
                fh.write(f">{n}\n{s}\n")
        cmd = [a.replace("{in}", fin).replace("{out}", fout)
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
        d = _detailed(gold_rows, gold_names, [s.seq for s in m.sequences],
                      [s.name for s in m.sequences])
        return dict(tool=tool, wall_s=round(wall, 3), sp=round(d.recall, 4),
                    tc=round(d.tc, 4))
