"""Provenance capture for reproducible benchmark artifacts.

The equivalent of the reference's benchmarks/downstream/provenance.py:
every committed result file should carry enough metadata to re-run it —
framework version + git state, the JAX/runtime stack, the accelerator,
host hardware, and the versions of any external tools that
participated.  Absent tools are recorded as absent, never guessed.
"""

from __future__ import annotations

import json
import os
import platform
import re
import subprocess
import time

_TOOL_VERSION_CMDS = {
    # binary: (args, regex over stdout+stderr)
    "kalign": (["-v"], r"(\d+\.\d+\.\d+\S*)"),
    "clustalo": (["--version"], r"([\d.]+\S*)"),
    "mafft": (["--version"], r"v?([\d.]+\S*)"),
    "muscle": (["-version"], r"([\d.]+\S*)"),
    "hmmsearch": (["-h"], r"HMMER\s+([\d.]+\S*)"),
}


def _run_version(binary, args, pattern):
    try:
        r = subprocess.run([binary] + args, capture_output=True,
                           text=True, timeout=20)
    except (OSError, subprocess.TimeoutExpired):
        return None
    m = re.search(pattern, (r.stdout or "") + (r.stderr or ""))
    return m.group(1) if m else "unknown"


def tool_versions() -> dict:
    """Versions of external tools on PATH (None = not installed)."""
    out = {}
    for tool, (args, pat) in _TOOL_VERSION_CMDS.items():
        out[tool] = _run_version(tool, args, pat)
    # the reference binary the parity/scoring layer uses, wherever the
    # scoring module resolved it from (may be an out-of-tree build)
    from benchmarks.scoring import _kalign_ref_bin
    ref = _kalign_ref_bin()
    if ref:
        out["kalign-ref"] = _run_version(ref, ["-v"], r"(\d+\.\d+\.\d+\S*)")
        out["kalign-ref-path"] = ref
    return out


def _git(args):
    try:
        r = subprocess.run(["git"] + args, capture_output=True, text=True,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.dirname(os.path.abspath(__file__)))),
                           timeout=10)
        return r.stdout.strip() if r.returncode == 0 else None
    except OSError:
        return None


def _cpu_model() -> str:
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("model name"):
                    return line.split(":", 1)[1].strip()
    except OSError:
        pass
    return platform.processor() or "unknown"


def _ram_gb() -> float:
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemTotal"):
                    return round(int(line.split()[1]) / 1e6, 1)
    except OSError:
        pass
    return 0.0


def collect(parameters: dict = None, devices: bool = True) -> dict:
    """Full provenance record; `devices=False` skips touching the
    accelerator runtime (it can hang on a wedged transport)."""
    import kalign_tpu
    rec = dict(
        timestamp=time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        kalign_tpu_version=getattr(kalign_tpu, "__version__", "unknown"),
        git_commit=_git(["rev-parse", "HEAD"]),
        git_dirty=bool(_git(["status", "--porcelain"])),
        hostname=platform.node(),
        cpu_model=_cpu_model(),
        cpu_cores=os.cpu_count(),
        ram_gb=_ram_gb(),
        os_version=platform.platform(),
        python_version=platform.python_version(),
        tool_versions=tool_versions(),
        parameters=parameters or {},
    )
    try:
        import jax
        rec["jax_version"] = jax.__version__
        if devices:
            rec["backend"] = jax.default_backend()
            rec["devices"] = [str(d) for d in jax.devices()]
    except Exception as e:  # never let provenance kill a result
        rec["jax_error"] = str(e)[:120]
    return rec


def result_name(kind: str, tag: str = None, ext: str = "json") -> str:
    """Deterministic result file name: <kind>_<YYYYMMDD>[_tag].<ext>."""
    day = time.strftime("%Y%m%d")
    mid = f"_{tag}" if tag else ""
    return f"{kind}_{day}{mid}.{ext}"


if __name__ == "__main__":
    print(json.dumps(collect(devices=False), indent=1))
