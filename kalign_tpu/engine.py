"""Pipeline driver: ties the data model to a compute engine.

Mirrors the orchestration of ``kalign_run_seeded`` / ``kalign_run_realign``
(``lib/src/aln_wrap.c:133-537``):

  input check -> dealign -> sort len/name -> encode reduced -> guide tree
  -> encode full -> params -> [consistency] -> progressive align
  -> [refine] -> [realign iterations] -> finalise -> restore rank order

Engines:
  * "host":     native C++ exact engine (default; bit-identical to the
                reference binary)
  * "tpu":      bit-exact device engine — native orchestration with all
                Hirschberg DP on the accelerator (tpu/exact.py); also
                column-identical to the reference
  * "tpu-fast": throughput engine (Pallas kernels, level-batched
                merges); score-equivalent, may differ on ties
  * "tpu-mesh": tpu-fast sharded over a device mesh
"""

import threading
from typing import List, Optional

import numpy as np

# serializes native DP-hook install/align/uninstall (see ExactTpuEngine)
_HOOK_LOCK = threading.Lock()

from kalign_tpu.utils.logging import log, timer
from kalign_tpu.core import alphabet as alpha
from kalign_tpu.core import params as P
from kalign_tpu.core.msa import Msa, BIOTYPE_DNA, BIOTYPE_PROTEIN, ALN_STATUS_ALIGNED
from kalign_tpu.utils.sorting import glibc_msort


def pick_anchors(msa: Msa) -> List[int]:
    """Length-stride anchor selection (``pick_anchor.c:17-72``): sort ids
    by length descending (glibc qsort tie behavior), take every
    numseq/num_anchor-th."""
    n = msa.numseq
    num_anchor = min(32, n)
    order = glibc_msort(list(range(n)),
                        lambda x, y: -1 if msa.sequences[x].len > msa.sequences[y].len else 1)
    stride = n // num_anchor
    return [order[i * stride] for i in range(num_anchor)]


class HostEngine:
    """Exact host engine backed by the native C++ library."""

    def __init__(self, n_threads: int = 1):
        from kalign_tpu import native
        self.native = native
        self.lib = native.lib()
        self.n_threads = n_threads

    def anchor_distances(self, codes, anchors):
        flat, off, lens = self.native.flatten_seqs(codes)
        n_anchors = len(anchors)
        stride = ((n_anchors + 7) // 8) * 8
        out = np.zeros((len(codes), stride), dtype=np.float32)
        self.lib.kt_dist_to_anchors(flat, off, lens, len(codes),
                                    np.asarray(anchors, dtype=np.int32),
                                    n_anchors, out.reshape(-1), self.n_threads)
        return out

    def build_tree(self, codes, dm: np.ndarray, n_anchors: int):
        flat, off, lens = self.native.flatten_seqs(codes)
        n = len(codes)
        tasks = np.zeros(3 * (n - 1), dtype=np.int32)
        seq_dist = np.zeros(n, dtype=np.float32)
        cnt = self.lib.kt_build_tree(flat, off, lens, n,
                                     np.ascontiguousarray(dm.reshape(-1)),
                                     n_anchors, tasks, seq_dist)
        assert cnt == n - 1
        return tasks.reshape(-1, 3), seq_dist

    def build_tree_pairwise(self, dm: np.ndarray):
        n = dm.shape[0]
        tasks = np.zeros(3 * (n - 1), dtype=np.int32)
        seq_dist = np.zeros(n, dtype=np.float32)
        dmc = np.ascontiguousarray(dm.astype(np.float32).reshape(-1))
        cnt = self.lib.kt_build_tree_pairwise(dmc, n, tasks, seq_dist)
        assert cnt == n - 1
        return tasks.reshape(-1, 3), seq_dist

    def align(self, codes, tasks, ap: P.AlnParam, seq_distances, refine_mode=0,
              cons_seq_distances=None):
        flat, off, lens = self.native.flatten_seqs(codes)
        n = len(codes)
        gaps_out = np.zeros(int(np.sum(lens + 1)), dtype=np.int32)
        conf_out = np.zeros(n - 1, dtype=np.float32)
        sd = None
        sd_ptr = None
        if seq_distances is not None:
            sd = np.ascontiguousarray(seq_distances, dtype=np.float32)
            sd_ptr = sd.ctypes.data
        csd = None
        csd_ptr = None
        if cons_seq_distances is not None:
            csd = np.ascontiguousarray(cons_seq_distances, dtype=np.float32)
            csd_ptr = csd.ctypes.data
        rc = self.lib.kt_align_msa(
            flat, off, lens, n,
            np.ascontiguousarray(tasks.reshape(-1).astype(np.int32)), n - 1,
            np.ascontiguousarray(ap.subm.astype(np.float32).reshape(-1)),
            float(ap.gpo), float(ap.gpe), float(ap.tgpe),
            float(ap.dist_scale), float(ap.vsm_amax), float(ap.use_seq_weights),
            sd_ptr, csd_ptr,
            int(ap.consistency_anchors), float(ap.consistency_weight),
            int(refine_mode), int(ap.adaptive_budget),
            gaps_out, conf_out, self.n_threads)
        if rc != 0:
            raise RuntimeError("native alignment failed")
        # unpack per-sequence gap arrays
        gaps = []
        pos = 0
        for l in lens:
            gaps.append(gaps_out[pos:pos + l + 1].tolist())
            pos += l + 1
        return gaps, conf_out

    def aln_pairwise_dist(self, rows: List[str]):
        n = len(rows)
        alnlen = len(rows[0])
        buf = np.frombuffer("".join(rows).encode("ascii"), dtype=np.uint8).copy()
        dm = np.zeros(n * n, dtype=np.float32)
        self.lib.kt_aln_pairwise_dist(buf, n, alnlen, dm)
        return dm.reshape(n, n)


class ExactTpuEngine(HostEngine):
    """Bit-exact device engine: the native runtime orchestrates
    (profiles, consistency, refinement, flip bookkeeping) and every
    Hirschberg DP — merges and consistency pairwise maps — runs on the
    accelerator through the DP hook (tpu/exact.py segmented wavefront).
    Produces column-identical alignments to the reference; the anchor
    distance matrix also runs on device when one is available."""

    def __init__(self, n_threads: int = 1):
        super().__init__(n_threads=n_threads)
        from kalign_tpu.utils import ensure_compile_cache
        ensure_compile_cache()
        from kalign_tpu.tpu.exact import ExactDpBackend
        self.backend = ExactDpBackend()

    def anchor_distances(self, codes, anchors):
        import jax
        if jax.default_backend() == "cpu":
            # native BPM is bit-identical and faster than jax-on-CPU
            return super().anchor_distances(codes, anchors)
        from kalign_tpu.parallel.mesh import make_mesh, \
            sharded_anchor_distances
        n = len(codes)
        lens = np.array([len(c) for c in codes], np.int32)
        Lmax = max(1, int(lens.max()))
        tokens = np.zeros((n, Lmax), np.uint8)
        for i, c in enumerate(codes):
            tokens[i, :len(c)] = c
        dm = sharded_anchor_distances(make_mesh(), tokens, lens,
                                      list(anchors))
        stride = ((len(anchors) + 7) // 8) * 8
        out = np.zeros((n, stride), dtype=np.float32)
        out[:, :len(anchors)] = dm
        return out

    def align(self, codes, tasks, ap, seq_distances, refine_mode=0,
              cons_seq_distances=None):
        # The native DP hooks are process-wide globals (kt_align.cpp);
        # serialize install -> align -> uninstall so two ExactTpuEngine
        # instances in one process can't race on them (ctypes releases
        # the GIL during kt_align_msa).
        with _HOOK_LOCK:
            self.backend.install()
            try:
                return super().align(codes, tasks, ap, seq_distances,
                                     refine_mode=refine_mode,
                                     cons_seq_distances=cons_seq_distances)
            except RuntimeError as e:
                if self.backend.last_error:
                    raise RuntimeError(
                        "device DP backend failed:\n"
                        + self.backend.last_error) from e
                raise
            finally:
                self.backend.uninstall()


def resolve_auto_engine(msa: Optional[Msa] = None) -> str:
    """engine="auto" policy: the throughput device engine when an
    accelerator is attached and the problem is big enough to amortize
    launch latency; the native host engine otherwise (it is
    byte-identical and faster on small inputs)."""
    try:
        import jax
        has_device = jax.default_backend() not in ("cpu",)
    except Exception:
        has_device = False
    if not has_device:
        return "host"
    if msa is not None and msa.numseq < 256:
        return "host"
    import jax
    return "tpu-mesh" if len(jax.devices()) > 1 else "tpu-fast"


def _autoroute_cap() -> int:
    """Family-size ceiling for divergent-family auto-routing to the
    bit-exact engine (KALIGN_TPU_AUTOROUTE_MAX, default 16384).  Round
    3 capped it at 2048 out of caution; the exact engine's batched
    pairwise + level-batched merge hooks scale well past that, and
    divergent families are exactly where its accuracy is worth the
    latency."""
    import os as _os
    try:
        return int(_os.environ.get("KALIGN_TPU_AUTOROUTE_MAX", "16384"))
    except ValueError:
        return 16384


def get_engine(name: str = "host", n_threads: int = 1, mesh=None):
    """'host' = native C++ core; 'tpu' = bit-exact device engine (DP on
    the accelerator, column-identical to the reference); 'tpu-fast' =
    throughput-oriented device engine (score-equivalent, may differ on
    equal-score ties); 'tpu-mesh' = tpu-fast with merge buckets sharded
    over ALL visible devices (jax.sharding.Mesh; pass mesh= to control
    the layout)."""
    if name == "host":
        return HostEngine(n_threads=n_threads)
    if name == "tpu":
        return ExactTpuEngine(n_threads=n_threads)
    if name == "tpu-fast":
        from kalign_tpu.tpu.engine import TpuEngine
        return TpuEngine(n_threads=n_threads, mesh=mesh)
    if name == "tpu-mesh":
        from kalign_tpu.tpu.engine import TpuEngine
        if mesh is None:
            from kalign_tpu.parallel.mesh import make_mesh
            mesh = make_mesh()
        return TpuEngine(n_threads=n_threads, mesh=mesh)
    raise ValueError(f"unknown engine {name!r}")


def _encoded(msa: Msa, kind: int):
    msa.encode(kind)
    return [sq.s for sq in msa.sequences]


def _build_guide_tree(msa: Msa, eng, noise_rng=None, noise_sigma: float = 0.0):
    """Anchors + distance matrix + bisecting-kmeans tree.  Optional
    multiplicative gaussian noise for ensemble tree perturbation
    (bisectingKmeans.c:104-116).

    KALIGN_TPU_TIMING_DETAIL=1 logs the distance / tree sub-phases."""
    import os as _os
    no_detail = not _os.environ.get("KALIGN_TPU_TIMING_DETAIL")
    anchors = pick_anchors(msa)
    codes = [sq.s for sq in msa.sequences]
    with timer("  anchor distances", no_detail or msa.quiet):
        dm = eng.anchor_distances(codes, anchors)
    if noise_rng is not None and noise_sigma > 0.0:
        n_anchors = len(anchors)
        for i in range(msa.numseq):
            for j in range(n_anchors):
                noise = noise_rng.gaussian(1.0, float(noise_sigma))
                if noise < 0.1:
                    noise = 0.1
                dm[i, j] = np.float32(dm[i, j] * np.float32(noise))
    with timer("  guide tree", no_detail or msa.quiet):
        tasks, seq_dist = eng.build_tree(codes, dm, len(anchors))
    return tasks, seq_dist


def resolve_params(msa: Msa, type_: int, gpo: float, gpe: float, tgpe: float,
                   n_threads: int) -> P.AlnParam:
    type_ = P.resolve_pfasum_auto(type_, msa.biotype,
                                  [sq.len for sq in msa.sequences])
    return P.aln_param_init(msa.biotype, type_, gpo, gpe, tgpe, n_threads)


def align_msa(msa: Msa, n_threads: int = 1, type_: int = 0,
              gpo: float = -1.0, gpe: float = -1.0, tgpe: float = -1.0,
              refine: int = P.REFINE_NONE, adaptive_budget: int = 0,
              tree_seed: int = 0, tree_noise: float = 0.0,
              dist_scale: float = 0.0, vsm_amax: float = -1.0,
              use_seq_weights: float = -1.0,
              consistency_anchors: int = 0, consistency_weight: float = 2.0,
              realign: int = 0,
              engine: str = "host",
              save_checkpoint: Optional[str] = None,
              resume_checkpoint: Optional[str] = None) -> Msa:
    """Full alignment pipeline (kalign_run_seeded / kalign_run_realign).
    engine="auto" resolves via resolve_auto_engine (device + problem
    size aware).

    save_checkpoint=DIR persists the distance/guide-tree artifacts
    (reference-format task list + distance npz, checkpoint.py) after
    the tree phase; resume_checkpoint=DIR loads them instead of
    recomputing distances + tree — the resumable phase boundary the
    reference exposes through its POAR/task-list files."""
    if engine == "auto":
        engine = resolve_auto_engine(msa)
    eng = get_engine(engine, n_threads)
    quiet = msa.quiet

    msa.essential_input_check()
    if msa.aligned != 1:  # ALN_STATUS_UNALIGNED
        msa.dealign()
    msa.sort_len_name()

    # reduced alphabet for distance estimation
    if msa.biotype == BIOTYPE_DNA:
        log("Detected DNA sequences.", quiet)
        _encoded(msa, alpha.ALPHA_DEFAULT_DNA)
    elif msa.biotype == BIOTYPE_PROTEIN:
        log("Detected protein sequences.", quiet)
        _encoded(msa, alpha.ALPHA_REDUCED_PROTEIN)
    else:
        raise ValueError("Unable to determine what alphabet to use.")

    noise_rng = None
    if tree_seed != 0 and tree_noise > 0.0:
        from kalign_tpu.utils.rng import XoshiroRng
        noise_rng = XoshiroRng(tree_seed)
    if resume_checkpoint is not None:
        import os as _os
        from kalign_tpu import checkpoint as ckpt
        tasks = ckpt.read_tasks(_os.path.join(resume_checkpoint,
                                              "tasks.txt"))
        _, seq_dist, _ = ckpt.load_distances(
            _os.path.join(resume_checkpoint, "distances.npz"),
            expect_fingerprint=ckpt.input_fingerprint(
                [sq.seq for sq in msa.sequences]))
        if len(tasks) != msa.numseq - 1 or len(seq_dist) != msa.numseq:
            raise ValueError(
                "checkpoint does not match the input (expected "
                f"{msa.numseq} sequences)")
        log("Resumed distances + guide tree from checkpoint", quiet)
    else:
        log("Calculating pairwise distances", quiet)
        with timer("Distances + guide tree", quiet):
            tasks, seq_dist = _build_guide_tree(msa, eng, noise_rng,
                                                tree_noise)
    msa.seq_distances = seq_dist
    # Divergent-family auto-routing: the throughput engine's equal-score
    # tie-breaking loses real column accuracy exactly where alignment is
    # hardest (BB30014: TC 0.45 vs host 0.47).  Families whose mean
    # normalized anchor distance exceeds 0.5 (well above the hardest
    # DSSim sweeps at ~0.44, below only genuinely divergent sets) route
    # to the bit-exact device engine up to a size cap (the exact
    # engine's batched pairwise/merge hooks scale well past the old
    # 2048 ceiling; accuracy-critical divergent families accept its
    # higher latency).  Tune: KALIGN_TPU_AUTOROUTE_MAX=N; opt out:
    # KALIGN_TPU_NO_AUTOROUTE=1.
    if engine in ("tpu-fast", "tpu-mesh") \
            and msa.numseq <= _autoroute_cap():
        import os as _os
        if not _os.environ.get("KALIGN_TPU_NO_AUTOROUTE"):
            mean_sd = float(np.mean(np.asarray(seq_dist, np.float64)))
            if mean_sd > 0.5:
                log(f"Divergent family (mean distance {mean_sd:.2f}): "
                    "using the exact engine", quiet)
                engine = "tpu"
                eng = get_engine(engine, n_threads)
    if save_checkpoint is not None:
        import os as _os
        from kalign_tpu import checkpoint as ckpt
        _os.makedirs(save_checkpoint, exist_ok=True)
        ckpt.write_tasks(tasks, _os.path.join(save_checkpoint, "tasks.txt"))
        ckpt.save_distances(_os.path.join(save_checkpoint, "distances.npz"),
                            np.zeros((0, 0), np.float32), seq_dist,
                            fingerprint=ckpt.input_fingerprint(
                                [sq.seq for sq in msa.sequences]))

    # full alphabet for the DP
    if msa.biotype == BIOTYPE_PROTEIN:
        _encoded(msa, alpha.ALPHA_AMBIGUOUS_PROTEIN)

    ap = resolve_params(msa, type_, gpo, gpe, tgpe, n_threads)
    ap.adaptive_budget = adaptive_budget
    if use_seq_weights >= 0.0:
        ap.use_seq_weights = use_seq_weights
    if dist_scale > 0.0:
        ap.dist_scale = dist_scale
    if vsm_amax >= 0.0:
        ap.vsm_amax = vsm_amax
    if consistency_anchors > 0:
        ap.consistency_anchors = consistency_anchors
        ap.consistency_weight = consistency_weight

    # Refinement scheduling mirrors kalign_run_realign (aln_wrap.c:440-509):
    # inline refine applies to every progressive pass; two-pass refinement
    # (ALL/CONFIDENT) runs only on the final alignment.
    inline_mode = P.REFINE_INLINE if refine == P.REFINE_INLINE else P.REFINE_NONE
    bpm_seq_dist = msa.seq_distances  # anchors for consistency stay BPM-based

    codes = [sq.s for sq in msa.sequences]
    first_mode = refine if realign == 0 else inline_mode
    log("Aligning", quiet)
    with timer("Alignment", quiet):
        gaps, conf = eng.align(codes, tasks, ap, msa.seq_distances,
                               refine_mode=first_mode,
                               cons_seq_distances=bpm_seq_dist)
    for sq, g in zip(msa.sequences, gaps):
        sq.gaps = g
    msa.aligned = ALN_STATUS_ALIGNED

    # iterative realignment: rebuild tree from alignment identity
    for it in range(realign):
        msa.finalise()
        dm = eng.aln_pairwise_dist(msa.aligned_rows())
        msa.strip_gaps()
        if msa.biotype == BIOTYPE_DNA:
            _encoded(msa, alpha.ALPHA_DEFAULT_DNA)
        else:
            _encoded(msa, alpha.ALPHA_AMBIGUOUS_PROTEIN)
        msa.set_sip_nsip()
        tasks, seq_dist = eng.build_tree_pairwise(dm)
        msa.seq_distances = seq_dist
        last = it == realign - 1
        mode = refine if (last and refine in (P.REFINE_ALL, P.REFINE_CONFIDENT)) \
            else inline_mode
        codes = [sq.s for sq in msa.sequences]
        gaps, conf = eng.align(codes, tasks, ap, msa.seq_distances,
                               refine_mode=mode,
                               cons_seq_distances=bpm_seq_dist)
        for sq, g in zip(msa.sequences, gaps):
            sq.gaps = g
        msa.aligned = ALN_STATUS_ALIGNED

    msa.finalise()
    msa.sort_rank()
    msa.task_confidence = conf
    return msa


def post_realign_msa(msa: Msa, n_threads: int = 1, type_: int = 0,
                     gpo: float = -1.0, gpe: float = -1.0, tgpe: float = -1.0,
                     refine: int = P.REFINE_NONE, adaptive_budget: int = 0,
                     dist_scale: float = 0.0, vsm_amax: float = -1.0,
                     realign_iterations: int = 1,
                     use_seq_weights: float = -1.0,
                     engine: str = "host") -> Msa:
    """Realign an EXISTING alignment without redoing the BPM-distance
    guide tree: rebuild the tree from alignment-derived pairwise
    identity each iteration and re-run the progressive pass
    (``kalign_post_realign``, aln_wrap.c:539-669, kalign.h:73).

    Unlike ``align_msa`` the input must already be aligned; row order
    is preserved (restored to input rank at the end) and no length/name
    sort happens."""
    if realign_iterations < 1:
        raise ValueError("Need at least 1 realign iteration")
    if msa.aligned not in (2, 3):  # ALIGNED or FINAL
        raise ValueError("post_realign requires an aligned MSA")
    widths = {sq.len + sum(sq.gaps) for sq in msa.sequences}
    if len(widths) > 1:  # UNKNOWN shares FINAL's value in the reference
        raise ValueError(
            "post_realign requires equal-length aligned rows "
            f"(got widths {sorted(widths)})")
    if engine == "auto":
        engine = resolve_auto_engine(msa)
    eng = get_engine(engine, n_threads)
    quiet = msa.quiet

    if msa.biotype == 2:  # BIOTYPE_UNDEF
        msa.detect_alphabet()
    ap = resolve_params(msa, type_, gpo, gpe, tgpe, n_threads)
    ap.adaptive_budget = adaptive_budget
    if use_seq_weights >= 0.0:
        ap.use_seq_weights = use_seq_weights
    ap.dist_scale = dist_scale
    if vsm_amax >= 0.0:
        ap.vsm_amax = vsm_amax

    inline_mode = P.REFINE_INLINE if refine == P.REFINE_INLINE else P.REFINE_NONE
    log("Post-realign (%d iterations, vsm_amax=%.2f)"
        % (realign_iterations, ap.vsm_amax), quiet)
    conf = None
    with timer("Post-realign", quiet):
        for it in range(realign_iterations):
            if msa.aligned != 3:  # not FINAL yet
                msa.finalise()
            dm = eng.aln_pairwise_dist(msa.aligned_rows())
            msa.strip_gaps()
            if msa.biotype == BIOTYPE_DNA:
                _encoded(msa, alpha.ALPHA_DEFAULT_DNA)
            else:
                _encoded(msa, alpha.ALPHA_AMBIGUOUS_PROTEIN)
            msa.set_sip_nsip()
            tasks, seq_dist = eng.build_tree_pairwise(dm)
            msa.seq_distances = seq_dist
            last = it == realign_iterations - 1
            mode = refine if (last and refine in (P.REFINE_ALL,
                                                  P.REFINE_CONFIDENT)) \
                else inline_mode
            codes = [sq.s for sq in msa.sequences]
            gaps, conf = eng.align(codes, tasks, ap, msa.seq_distances,
                                   refine_mode=mode,
                                   cons_seq_distances=msa.seq_distances)
            for sq, g in zip(msa.sequences, gaps):
                sq.gaps = g
            msa.aligned = ALN_STATUS_ALIGNED

    msa.finalise()
    msa.sort_rank()
    msa.task_confidence = conf
    return msa
