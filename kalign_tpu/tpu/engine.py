"""TPU engine: progressive MSA with device DP.

Per merge: match matrix = one MXU matmul; Gotoh DP = row scan with
cummax (tpu/gotoh.py); traceback host-side; profile merge/weave
vectorized numpy (tpu/profile.py).  Guide-tree distances use the native
bit-parallel kernel on host until the Pallas BPM path replaces them
(tpu/bpm_pallas.py).

Contract: same pipeline semantics as the host engine; alignments are
score-equivalent but may differ in equal-score tie-breaking from the
reference's Hirschberg midpoint choices.  Quality (SP/TC) is asserted
against the host engine in tests.
"""

from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from kalign_tpu.core import params as P
from kalign_tpu.engine import HostEngine
from kalign_tpu.tpu import gotoh
from kalign_tpu.tpu.profile import Profile, leaf_profile, merge_profiles, weave_steps


def _bucket(n: int, q: int = 256) -> int:
    return max(q, ((n + q - 1) // q) * q)


@jax.jit
def _match_matmul(counts, subrows):
    return jnp.dot(counts, subrows.T, preferred_element_type=jnp.float32)


class TpuEngine:
    def __init__(self, n_threads: int = 1):
        self.host = HostEngine(n_threads=n_threads)
        self.n_threads = n_threads

    # tree / distance stages delegate to the host kernels for now
    def anchor_distances(self, codes, anchors):
        return self.host.anchor_distances(codes, anchors)

    def build_tree(self, codes, dm, n_anchors):
        return self.host.build_tree(codes, dm, n_anchors)

    def build_tree_pairwise(self, dm):
        return self.host.build_tree_pairwise(dm)

    def aln_pairwise_dist(self, rows):
        return self.host.aln_pairwise_dist(rows)

    # ------------------------------------------------------------------
    def _dp(self, prof_rows: Profile, prof_cols: Profile, nsip_rows: int,
            nsip_cols: int, bonus: Optional[np.ndarray],
            match_from_rows: bool = False):
        """Run the device DP; returns steps (0/1/2) with rows as side A.

        match_from_rows: use the row side's substitution rows against the
        column side's counts (the reference's residue x profile
        orientation); otherwise rows-counts x cols-subrows."""
        la = prof_rows.length
        lb = prof_cols.length
        L1p = _bucket(la)
        L2p = _bucket(lb)

        lhs = np.zeros((L1p, 23), dtype=np.float32)
        rhs = np.zeros((L2p, 23), dtype=np.float32)
        if match_from_rows:
            lhs[:la] = prof_rows.subrows
            rhs[:lb] = prof_cols.counts
        else:
            lhs[:la] = prof_rows.counts
            rhs[:lb] = prof_cols.subrows
        match = np.array(_match_matmul(jnp.asarray(lhs),
                                       jnp.asarray(rhs)))
        # Diagonal-centering regularizer: the reference's Hirschberg meetup
        # subtracts |mid-j|/1000 at every midpoint choice; since every row
        # is the midpoint of exactly one recursion window, the flat-DP
        # analogue is a per-row deviation-from-diagonal penalty of the same
        # magnitude.  Keeps gap placement balanced on near-ties.
        ii = np.arange(1, la + 1, dtype=np.float32)[:, None]
        jj = np.arange(1, lb + 1, dtype=np.float32)[None, :]
        match[:la, :lb] -= np.abs(jj - ii * (lb / max(la, 1))) * np.float32(1e-3)
        if bonus is not None:
            match[:la, :lb] += bonus

        # per-column penalties: pen * nsip_other; entry j applies at col j
        def pad_pen(pen, L, n, nsip_other):
            out = np.zeros((3, L + 1), dtype=np.float32)
            body = pen[1:-1] * np.float32(nsip_other)  # cols 1..n
            out[:, 1:n + 1] = body.T
            return out

        pb = pad_pen(prof_cols.pen, L2p, lb, nsip_rows)
        pa = pad_pen(prof_rows.pen, L1p, la, nsip_cols)

        dec, score, end_state = gotoh.gotoh_forward(
            jnp.asarray(match), jnp.asarray(pb[0]), jnp.asarray(pb[1]),
            jnp.asarray(pb[2]), jnp.asarray(pa[0]), jnp.asarray(pa[1]),
            jnp.asarray(pa[2]), jnp.int32(la), jnp.int32(lb))
        steps = gotoh.traceback(np.asarray(dec), la, lb, int(end_state))
        return np.asarray(steps, dtype=np.int8), float(score)

    # ------------------------------------------------------------------
    def align(self, codes, tasks, ap: P.AlnParam, seq_distances,
              refine_mode=0, cons_seq_distances=None):
        if refine_mode not in (0,):
            raise NotImplementedError(
                "TPU engine supports refine=none; use engine='host' for "
                "refinement modes in this version")
        n = len(codes)
        nprof = 2 * n - 1
        lens = [len(c) for c in codes]
        gaps = [[0] * (l + 1) for l in lens]
        sip: List[Optional[List[int]]] = [[i] for i in range(n)] + \
            [None] * (n - 1)
        nsip = [1] * n + [0] * (n - 1)
        profiles: List[Optional[Profile]] = [None] * nprof
        conf = np.zeros(n - 1, dtype=np.float32)

        sd = None if seq_distances is None else np.asarray(seq_distances)

        ct = None
        if ap.consistency_anchors > 0:
            from kalign_tpu.tpu.consistency import ConsistencyTable
            csd = sd if cons_seq_distances is None else np.asarray(cons_seq_distances)
            ct = ConsistencyTable.build(self, codes, ap, csd,
                                        ap.consistency_anchors,
                                        ap.consistency_weight)

        order = np.asarray(tasks)[np.argsort(np.asarray(tasks)[:, 2])]
        for t_idx, (a, b, c) in enumerate(order):
            a, b, c = int(a), int(b), int(c)
            eff = self._effective(ap, sd, sip, a, b, n)
            pa = self._node_profile(profiles, codes, a, nsip, eff)
            pb = self._node_profile(profiles, codes, b, nsip, eff)

            # operand roles follow the reference (aln_run.c:297-388):
            # leaf x profile puts the profile on the row side (its
            # asymmetric substitution rows drive the match scores);
            # otherwise the shorter side is the row side.
            leaf_a = nsip[a] == 1
            leaf_b = nsip[b] == 1
            if leaf_a and not leaf_b:
                rows_node, cols_node = b, a
            elif leaf_b and not leaf_a:
                rows_node, cols_node = a, b
            elif pa.length <= pb.length:
                rows_node, cols_node = a, b
            else:
                rows_node, cols_node = b, a
            prof_r = pa if rows_node == a else pb
            prof_c = pb if rows_node == a else pa
            cols_is_leaf = nsip[cols_node] == 1 and not \
                (leaf_a and leaf_b)

            bonus = None
            if ct is not None:
                bonus = ct.bonus(self, rows_node, prof_r.length,
                                 cols_node, prof_c.length,
                                 sip, nsip, gaps, lens)

            steps_rc, score = self._dp(prof_r, prof_c, nsip[rows_node],
                                       nsip[cols_node], bonus,
                                       match_from_rows=cols_is_leaf)
            # In _dp, step 1 = gap in ROW side, 2 = gap in COL side.
            # Reference convention: 1 = gap in a, 2 = gap in b.
            if rows_node == a:
                steps = steps_rc
            else:
                steps = np.where(steps_rc == 1, 2,
                                 np.where(steps_rc == 2, 1, 0)).astype(np.int8)
            conf[t_idx] = score

            terminal = _terminal_mask(steps)
            profiles[c] = merge_profiles(pa, pb, steps, terminal,
                                         nsip[a], nsip[b],
                                         ap.gpo, ap.gpe, ap.tgpe)
            profiles[a] = None
            profiles[b] = None
            weave_steps(steps, gaps, sip[a], sip[b])
            nsip[c] = nsip[a] + nsip[b]
            sip[c] = list(reversed(sip[a])) + list(reversed(sip[b]))
        return gaps, conf

    # ------------------------------------------------------------------
    def _effective(self, ap: P.AlnParam, sd, sip, a, b, n):
        gs, so = 1.0, 0.0
        if sd is not None:
            members = [s for s in sip[a] if s < n] + [s for s in sip[b] if s < n]
            if members:
                avg = float(np.mean(sd[members], dtype=np.float64))
                if ap.dist_scale > 0.0:
                    gs = min(1.0, max(0.3, 1.0 - ap.dist_scale * avg))
                if ap.vsm_amax > 0.0:
                    so = max(0.0, ap.vsm_amax - avg)
        eff = P.AlnParam(**{**ap.__dict__})
        if gs < 1.0 or so > 0.0:
            eff.gpo = ap.gpo * gs
            eff.gpe = ap.gpe * gs
            eff.tgpe = ap.tgpe * gs
            eff.subm_offset = so
        return eff

    def _node_profile(self, profiles, codes, node, nsip, eff: P.AlnParam):
        if profiles[node] is None:
            assert nsip[node] == 1
            profiles[node] = leaf_profile(codes[node], eff.subm, eff.gpo,
                                          eff.gpe, eff.tgpe, eff.subm_offset)
        return profiles[node]


def _terminal_mask(steps: np.ndarray) -> np.ndarray:
    n = len(steps)
    term = np.zeros(n, dtype=bool)
    i = 0
    while i < n and steps[i] != 0:
        term[i] = True
        i += 1
    i = n - 1
    while i >= 0 and steps[i] != 0:
        term[i] = True
        i -= 1
    return term
