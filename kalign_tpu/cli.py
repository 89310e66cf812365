"""kalign-compatible command line interface.

Flag surface mirrors the reference binary (src/run_kalign.c:155-292),
including mode presets (--fast / --precise) and ensemble options.
"""

import argparse
import os
import sys

from kalign_tpu.core import io as kio
from kalign_tpu.core import params as P
from kalign_tpu import engine as E
from kalign_tpu.version import __version__, KALIGN_COMPAT_VERSION

TYPES = {
    None: 0, "rna": P.KALIGN_TYPE_RNA, "dna": P.KALIGN_TYPE_DNA,
    "internal": P.KALIGN_TYPE_DNA_INTERNAL, "protein": P.KALIGN_TYPE_PROTEIN,
    "divergent": P.KALIGN_TYPE_PROTEIN_DIVERGENT,
    "pfasum43": P.KALIGN_TYPE_PROTEIN_PFASUM43,
    "pfasum60": P.KALIGN_TYPE_PROTEIN_PFASUM60,
    "pfasum": P.KALIGN_TYPE_PROTEIN_PFASUM_AUTO,
}
REFINES = {None: P.REFINE_NONE, "none": P.REFINE_NONE, "all": P.REFINE_ALL,
           "confident": P.REFINE_CONFIDENT}


def _resolve_type(s):
    if s is None:
        return 0
    for key in ("rna", "dna", "internal", "protein", "divergent",
                "pfasum43", "pfasum60", "pfasum"):
        if key in s:
            return TYPES[key]
    raise SystemExit(f"Type {s} not recognized.")


def build_parser():
    p = argparse.ArgumentParser(prog="kalign-tpu", add_help=True)
    p.add_argument("-i", "--input", "--infile", "--in", dest="infile",
                   action="append", default=None)
    p.add_argument("-o", "--output", "--outfile", "--out", dest="outfile",
                   default=None)
    p.add_argument("-f", "--format", dest="format", default=None)
    p.add_argument("--type", dest="type", default=None)
    p.add_argument("--gpo", type=float, default=-1.0)
    p.add_argument("--gpe", type=float, default=-1.0)
    p.add_argument("--tgpe", type=float, default=-1.0)
    p.add_argument("--refine", default=None)
    p.add_argument("--adaptive-budget", action="store_true")
    p.add_argument("--ensemble", nargs="?", const=5, type=int, default=0)
    p.add_argument("--ensemble-seed", type=int, default=42)
    # distributed ensemble: each worker process aligns runs
    # k % workers == worker into --ensemble-scratch; a final
    # --ensemble-merge invocation combines POAR tables and finalises
    p.add_argument("--ensemble-scratch", default=None,
                   help="shared directory for distributed ensemble "
                        "partials (worker + merge modes)")
    p.add_argument("--ensemble-worker", type=int, default=None,
                   help="this process's worker id (0-based)")
    p.add_argument("--ensemble-workers", type=int, default=None,
                   help="total number of worker processes")
    p.add_argument("--ensemble-merge", action="store_true",
                   help="merge worker partials from --ensemble-scratch "
                        "and write the final alignment")
    p.add_argument("--min-support", type=int, default=0)
    p.add_argument("--save-poar", default=None)
    p.add_argument("--load-poar", default=None)
    p.add_argument("--save-checkpoint", default=None, metavar="DIR",
                   help="persist distance/guide-tree artifacts")
    p.add_argument("--resume-checkpoint", default=None, metavar="DIR",
                   help="resume from --save-checkpoint artifacts")
    p.add_argument("--consistency", type=int, default=5)
    p.add_argument("--consistency-weight", type=float, default=2.0)
    p.add_argument("--fast", action="store_true")
    p.add_argument("--precise", action="store_true")
    p.add_argument("--realign", type=int, default=0)
    p.add_argument("--vsm-amax", type=float, default=-1.0)
    p.add_argument("-n", "--nthreads", type=int, default=1)
    p.add_argument("--set", dest="param_set", type=int, default=-1,
                   help="parameter-set id (parsed for reference CLI "
                        "compatibility; unused, run_kalign.c:158,206)")
    p.add_argument("--showw", action="store_true",
                   help="print the warranty disclaimer and exit")
    p.add_argument("-q", "--quiet", action="store_true")
    p.add_argument("-v", "-V", "--version", action="store_true", dest="version")
    p.add_argument("--engine", default=os.environ.get("KALIGN_TPU_ENGINE", "host"),
                   choices=["host", "tpu", "tpu-fast", "tpu-mesh", "auto"])
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="capture a jax.profiler device trace of the "
                        "alignment into DIR (open with TensorBoard / "
                        "xprof)")
    p.add_argument("--server", default=None, metavar="SOCKET",
                   help="send this invocation to a running warm "
                        "alignment server (python -m kalign_tpu.serve) "
                        "instead of paying per-process compile/load "
                        "costs; bare --server uses the default socket, "
                        "--server=SOCKET an explicit one (the separate-"
                        "token form is rejected so an input file can "
                        "never be mistaken for a socket path)")
    p.add_argument("--server-start", action="store_true",
                   help="with --server: spawn the warm server in the "
                        "background if the socket is not answering, "
                        "wait for it, then submit")
    p.add_argument("files", nargs="*")
    return p


def _ensure_server(sock: str, timeout: float = 900.0) -> None:
    """Spawn the warm server detached if the socket is not answering,
    then wait for it to come up (first start pays the warmup compiles —
    minutes on remote-compile devices; later CLI calls are warm)."""
    import socket as socklib
    import subprocess
    import time

    def _alive():
        try:
            with socklib.socket(socklib.AF_UNIX,
                                socklib.SOCK_STREAM) as s:
                s.settimeout(5.0)
                s.connect(sock)
            return True
        except OSError:
            return False

    if _alive():
        return
    subprocess.Popen(
        [sys.executable, "-m", "kalign_tpu.serve", "--socket", sock],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True)
    t0 = time.time()
    while time.time() - t0 < timeout:
        if _alive():
            return
        time.sleep(1.0)
    raise SystemExit(f"server on {sock} did not come up in {timeout:.0f}s")


def main(argv=None):
    raw = list(sys.argv[1:]) if argv is None else list(argv)
    # A bare --server means "the default socket".  Rewriting it to the
    # =-form BEFORE parsing keeps argparse from consuming a following
    # input file as the socket path (`kalign --server in.fa -o out`).
    raw = ["--server=__default__" if tok == "--server" else tok
           for tok in raw]
    args = build_parser().parse_args(raw)
    if args.server is not None:
        from kalign_tpu.serve import DEFAULT_SOCKET, request
        sock = (DEFAULT_SOCKET if args.server == "__default__"
                else args.server)
        # strip the --server flags before forwarding (all =-form now)
        out = [tok for tok in raw
               if tok != "--server-start"
               and not tok.startswith("--server=")]
        if args.server_start:
            _ensure_server(sock)
        resp = request(sock, out)
        if resp.get("error"):
            print(resp["error"], file=sys.stderr)
        return int(resp.get("rc", 1))
    if args.version:
        print(f"kalign-tpu {__version__} (kalign {KALIGN_COMPAT_VERSION} compatible)")
        return 0
    if args.showw:
        # run_kalign.c:306-310 / run_reformat.c:58-73
        print("Disclaimer of Warranty (Apache License, Version 2.0, "
              "Section 7):\n\n"
              "Unless required by applicable law or agreed to in writing, "
              "Licensor\nprovides the Work (and each Contributor provides "
              "its Contributions)\non an \"AS IS\" BASIS, WITHOUT "
              "WARRANTIES OR CONDITIONS OF ANY KIND,\neither express or "
              "implied, including, without limitation, any\nwarranties or "
              "conditions of TITLE, NON-INFRINGEMENT,\nMERCHANTABILITY, or "
              "FITNESS FOR A PARTICULAR PURPOSE.\n\n"
              "See the COPYING file for the full Apache License, "
              "Version 2.0.")
        return 0

    infiles = list(args.infile or []) + list(args.files)
    if not infiles:
        build_parser().print_help()
        print("No input files", file=sys.stderr)
        return 0
    infiles = [None if f == "-" else f for f in infiles]

    type_ = _resolve_type(args.type)
    refine = REFINES.get(args.refine if args.refine is None else
                         ("all" if "all" in args.refine else
                          "confident" if "confident" in args.refine else "none"))

    # mode presets (run_kalign.c:370-383)
    consistency = args.consistency
    ensemble = args.ensemble
    realign = args.realign
    if args.fast and consistency == 5:
        consistency = 0
    if args.precise:
        if ensemble == 0:
            ensemble = 3
        if realign == 0:
            realign = 1

    msa = kio.read_inputs(infiles)
    msa.quiet = args.quiet

    trace_ctx = None
    if args.trace:
        import contextlib
        import jax
        trace_ctx = contextlib.ExitStack()
        trace_ctx.enter_context(jax.profiler.trace(args.trace))

    if args.load_poar:
        from kalign_tpu.ensemble import consensus_from_poar
        msa = consensus_from_poar(msa, args.load_poar,
                                  args.min_support if args.min_support > 0 else 2)
    elif ensemble > 0 and args.ensemble_worker is not None:
        from kalign_tpu.ensemble import ensemble_worker
        if not args.ensemble_scratch:
            raise SystemExit("--ensemble-worker requires --ensemble-scratch")
        workers = args.ensemble_workers or 1
        done = ensemble_worker(
            msa, args.ensemble_worker, workers, args.ensemble_scratch,
            n_runs=ensemble, n_threads=args.nthreads, type_=type_,
            gpo=args.gpo, gpe=args.gpe, tgpe=args.tgpe,
            seed=args.ensemble_seed, refine=refine,
            vsm_amax=args.vsm_amax, realign=realign,
            consistency_anchors=consistency,
            consistency_weight=args.consistency_weight,
            engine=args.engine)
        if not args.quiet:
            print(f"worker {args.ensemble_worker}/{workers}: runs {done} "
                  f"written to {args.ensemble_scratch}", file=sys.stderr)
        return 0
    elif ensemble > 0 and args.ensemble_merge:
        from kalign_tpu.ensemble import ensemble_merge
        if not args.ensemble_scratch:
            raise SystemExit("--ensemble-merge requires --ensemble-scratch")
        msa = ensemble_merge(msa, args.ensemble_scratch, n_runs=ensemble,
                             n_threads=args.nthreads, type_=type_,
                             gpo=args.gpo, gpe=args.gpe, tgpe=args.tgpe,
                             seed=args.ensemble_seed,
                             min_support=args.min_support,
                             save_poar=args.save_poar,
                             vsm_amax=args.vsm_amax,
                             consistency_anchors=consistency,
                             consistency_weight=args.consistency_weight,
                             engine=args.engine)
    elif ensemble > 0:
        from kalign_tpu.ensemble import ensemble_align
        msa = ensemble_align(msa, n_threads=args.nthreads, type_=type_,
                             n_runs=ensemble, gpo=args.gpo, gpe=args.gpe,
                             tgpe=args.tgpe, seed=args.ensemble_seed,
                             min_support=args.min_support,
                             save_poar=args.save_poar, refine=refine,
                             vsm_amax=args.vsm_amax, realign=realign,
                             consistency_anchors=consistency,
                             consistency_weight=args.consistency_weight,
                             engine=args.engine)
    else:
        msa = E.align_msa(msa, n_threads=args.nthreads, type_=type_,
                          gpo=args.gpo, gpe=args.gpe, tgpe=args.tgpe,
                          refine=refine, adaptive_budget=int(args.adaptive_budget),
                          realign=realign, vsm_amax=args.vsm_amax,
                          consistency_anchors=consistency,
                          consistency_weight=args.consistency_weight,
                          engine=args.engine,
                          save_checkpoint=args.save_checkpoint,
                          resume_checkpoint=args.resume_checkpoint)

    if trace_ctx is not None:
        trace_ctx.close()
        if not args.quiet:
            print(f"device trace written to {args.trace}", file=sys.stderr)
    kio.write_alignment_file(msa, args.outfile, args.format)
    return 0


if __name__ == "__main__":
    sys.exit(main())
