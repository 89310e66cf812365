"""Pre-seed the persistent XLA compile cache with the engine's
canonical shape buckets.

The reference binary cold-starts in milliseconds (run_kalign.c:142); a
JAX engine cold-starts compile-bound — 222 s for BB11001 with
engine="tpu" through the dev tunnel's remote compiler, 2.8 s warm.  The
persistent compilation cache (utils.ensure_compile_cache,
~/.cache/kalign_tpu/xla) makes every LATER process warm; this module is
the shipping mechanism for that warmth: run it once per machine /
jax upgrade (e.g. from a postinstall step or `make -C kalign_tpu/native
warmup`) and one-shot CLI invocations start hot.

The cache artifact itself is machine+backend+jax-version specific, so
it cannot be baked into the wheel; seeding it at install time is the
portable equivalent.

Usage:
    python -m kalign_tpu.warmup                  # default: all engines
    python -m kalign_tpu.warmup --engines tpu-fast --sizes 64,256
"""

import argparse
import sys
import time


# (n_seq, length) pairs chosen to touch the common padded shape
# buckets: 128/256-wide DP tiles and pow2 batch sizes 8..256.
DEFAULT_SIZES = [(16, 120), (64, 200), (256, 200)]


DEFAULT_TREE_NP = (2048, 16384, 131072)


def warmup_tree_programs(np_buckets=DEFAULT_TREE_NP, quiet=False):
    """Compile-only seeding of the fused guide-tree program for the
    padded sizes big inputs hit (the device tree engages at >= 2048
    sequences, far above the alignment warmup sizes).  AOT
    lower+compile writes the persistent cache without executing the
    recursion."""
    import jax
    import jax.numpy as jnp
    from kalign_tpu.tpu.kmeans import (_fused_splits, UPGMA_THRESHOLD,
                                       MAX_TRIES, _FUSED_DEPTH_CAP)
    for Np in np_buckets:
        t0 = time.time()
        try:
            _fused_splits.lower(
                jax.ShapeDtypeStruct((Np, 32), jnp.float32),
                jax.ShapeDtypeStruct((), jnp.int32),
                Np=Np, T=MAX_TRIES, Dmax=_FUSED_DEPTH_CAP,
                Ca=Np // UPGMA_THRESHOLD + 1).compile()
            status = "ok"
        except Exception as e:
            status = f"failed: {e}"[:120]
        if not quiet:
            print(f"warmup tree Np={Np}: {status} "
                  f"({time.time() - t0:.1f}s)", file=sys.stderr)


def warmup(engines=("tpu-fast", "tpu"), sizes=DEFAULT_SIZES,
           consistency=True, quiet=False, tree_np=DEFAULT_TREE_NP):
    from kalign_tpu.utils import ensure_compile_cache
    ensure_compile_cache()
    from kalign_tpu import dssim
    from kalign_tpu.core.msa import Msa
    from kalign_tpu import engine as E

    if "tpu-fast" in engines and tree_np:
        warmup_tree_programs(tree_np, quiet=quiet)
    for engine in engines:
        for n_seq, length in sizes:
            t0 = time.time()
            seqs, names = dssim.generate_test_sequences(
                n_seq, n_obs=10, dna=False, length=length, seed=7)
            m = Msa.from_sequences(seqs, names)
            m.quiet = True
            kw = {}
            if consistency and engine == "tpu":
                kw["consistency_anchors"] = 5
            else:
                kw["consistency_anchors"] = 0
            try:
                E.align_msa(m, engine=engine, **kw)
                status = "ok"
            except Exception as e:  # keep seeding the rest
                status = f"failed: {e}"[:120]
            if not quiet:
                print(f"warmup {engine} {n_seq}x{length}: {status} "
                      f"({time.time() - t0:.1f}s)", file=sys.stderr)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="pre-seed the XLA compile cache for kalign_tpu")
    ap.add_argument("--engines", default="tpu-fast,tpu")
    ap.add_argument("--sizes", default=None,
                    help="comma list of NxL, e.g. 64x200,256x200")
    ap.add_argument("--no-consistency", action="store_true")
    ap.add_argument("--tree-np", default=None,
                    help="comma list of padded tree sizes to AOT-compile"
                         " (default 2048,16384,131072; 'none' disables)")
    ap.add_argument("-q", "--quiet", action="store_true")
    args = ap.parse_args(argv)
    sizes = DEFAULT_SIZES
    if args.sizes:
        sizes = []
        for part in args.sizes.split(","):
            n, L = part.lower().split("x")
            sizes.append((int(n), int(L)))
    tree_np = DEFAULT_TREE_NP
    if args.tree_np is not None:
        tree_np = () if args.tree_np.lower() == "none" else \
            tuple(int(x) for x in args.tree_np.split(","))
    warmup(engines=tuple(args.engines.split(",")), sizes=sizes,
           consistency=not args.no_consistency, quiet=args.quiet,
           tree_np=tree_np)
    return 0


if __name__ == "__main__":
    sys.exit(main())
