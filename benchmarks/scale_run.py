"""Reproducible large-N scale measurement (the `tests/large_benchmark.c`
analogue; reference baselines in BENCHMARKS.md "100k-sequence scale").

    python -m benchmarks.scale_run --n 16384 --length 150 [--dna]
        [--mode default|fast] [--engine auto|tpu-fast|host]
        [--trace DIR] [--out JSON]

Generates the DSSim family (cached under --cache-dir, default /tmp),
runs the full pipeline in-process with sub-phase timers
(KALIGN_TPU_TIMING_DETAIL=1), and prints ONE json line:
wall seconds, per-phase seconds parsed from the timer log, and — when
--trace is given — total device-busy seconds from the jax.profiler
trace (utils/devtime.py; the tunnel-independent hardware metric).

The reference numbers this compares against (kalign v3.5.1, 1 core,
this image) were measured from the same generator seed:
100k x ~150nt DNA: 228.6 s default / 82.5 s --fast (BENCHMARKS.md).
"""

import argparse
import contextlib
import io
import json
import os
import re
import sys
import time


def _family_path(cache_dir, n, length, dna, seed, n_obs):
    tag = f"dssim_{n}x{length}{'dna' if dna else 'aa'}_s{seed}_o{n_obs}.fa"
    return os.path.join(cache_dir, tag)


def ensure_family(cache_dir, n, length, dna, seed, n_obs, quiet=False):
    path = _family_path(cache_dir, n, length, dna, seed, n_obs)
    if os.path.exists(path):
        return path
    from kalign_tpu.dssim import generate_test_sequences
    t0 = time.time()
    seqs, names = generate_test_sequences(n_seq=n, n_obs=n_obs, dna=dna,
                                          length=length, seed=seed)
    # pid-unique tmp name: concurrent runs with identical params must
    # not clobber each other's partial writes before os.replace
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        for nm, s in zip(names, seqs):
            f.write(f">{nm}\n{s}\n")
    os.replace(tmp, path)
    if not quiet:
        print(f"generated {path} in {time.time() - t0:.1f}s",
              file=sys.stderr)
    return path


_PHASE_RE = re.compile(
    r":\s+LOG\s+:\s+(.+?) took ([0-9.]+) seconds\.$")


def parse_phase_log(text):
    """Timer lines from utils/logging.py:
    `[ts] :     LOG : <name> took <secs> seconds.`"""
    phases = {}
    for line in text.splitlines():
        m = _PHASE_RE.search(line.strip())
        if m:
            # accumulate: a timer label can fire once per pass (e.g.
            # "Alignment" under --realign / ensemble), and the phase
            # total must cover every pass, not just the last one
            name = m.group(1).strip()
            phases[name] = phases.get(name, 0.0) + float(m.group(2))
    return phases


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--length", type=int, default=150)
    ap.add_argument("--dna", action="store_true")
    ap.add_argument("--n-obs", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--mode", choices=("default", "fast"), default="fast")
    ap.add_argument("--engine", default="auto")
    ap.add_argument("--trace", default=None, metavar="DIR")
    ap.add_argument("--cache-dir", default="/tmp")
    ap.add_argument("--out", default=None, metavar="JSON",
                    help="also write the result line to this file")
    ap.add_argument("--out-msa", default=None,
                    help="keep the alignment (default: discard)")
    ap.add_argument("--repeat", type=int, default=1,
                    help="run the pipeline N times in THIS process and "
                         "report every wall (run 1 = cold: compiles + "
                         "first-execution program loads; later runs = "
                         "warm, the kalign_tpu.serve production number)")
    args = ap.parse_args(argv)

    os.environ.setdefault("KALIGN_TPU_TIMING_DETAIL", "1")
    fasta = ensure_family(args.cache_dir, args.n, args.length, args.dna,
                          args.seed, args.n_obs)

    from kalign_tpu import cli as kcli

    out_path = args.out_msa or os.path.join(
        args.cache_dir, f"scale_run_{args.n}.afa")
    argv_cli = ["-i", fasta, "-o", out_path, "--engine", args.engine]
    if args.mode == "fast":
        argv_cli.append("--fast")
    if args.trace:
        argv_cli += ["--trace", args.trace]

    # capture the timer log (stderr) while letting it stream through
    cap = io.StringIO()

    class _Tee(io.TextIOBase):
        def write(self, s):
            cap.write(s)
            sys.__stderr__.write(s)
            return len(s)

        def flush(self):
            sys.__stderr__.flush()

    walls = []
    phase_logs = []
    for rep in range(max(args.repeat, 1)):
        cap.seek(0)
        cap.truncate(0)
        t0 = time.time()
        try:
            with contextlib.redirect_stderr(_Tee()):
                rc = kcli.main(argv_cli)
        except SystemExit as e:  # argparse errors inside the CLI
            rc = e.code if isinstance(e.code, int) else 2
        wall = time.time() - t0
        if rc not in (0, None):
            line = json.dumps({"error": f"cli rc={rc}", "wall_s": wall,
                               "repeat": rep})
            print(line)
            if args.out:  # automation must see the failure, not stale data
                with open(args.out, "w") as f:
                    f.write(line + "\n")
            return 1
        walls.append(round(wall, 2))
        phase_logs.append(parse_phase_log(cap.getvalue()))

    result = {
        "n": args.n, "length": args.length,
        "alphabet": "dna" if args.dna else "protein",
        "mode": args.mode, "engine": args.engine,
        "wall_s": walls[0],
        "phases": phase_logs[0],
    }
    if len(walls) > 1:
        # warm = the last repeat (everything compiled + loaded)
        result["walls"] = walls
        result["warm_wall_s"] = walls[-1]
        result["warm_phases"] = phase_logs[-1]
    if args.trace:
        try:
            from kalign_tpu.utils.devtime import device_seconds
            result["device_s"] = round(device_seconds(args.trace), 3)
        except Exception as e:  # trace parse must never kill the result
            result["device_trace_error"] = str(e)[:120]
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
