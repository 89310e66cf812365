"""Bit-exact device DP for the TPU engine.

Reproduces the reference Hirschberg meet-in-the-middle alignment
(/root/reference/lib/src/aln_controller.c:21-436, aln_seqseq.c,
aln_seqprofile.c, aln_profileprofile.c) with the O(L^2) sweep work on
the accelerator:

  * Every recursion depth packs its (row-disjoint) forward/backward
    windows into one "segmented" anti-diagonal wavefront launch of a
    fixed padded shape.  Cell (i, j) depends on (i-1, j-1), (i-1, j)
    and (i, j-1) only, and the wavefront computes each cell with the
    same scalar float operation order as the reference row sweep, so
    the produced states are bit-identical.  (The log-depth scan engine
    in tpu/gotoh.py is NOT bit-exact: it reassociates the gap chains.)
  * The meetup combine (aln_seqseq.c:241-419) + margin/flip
    bookkeeping and the recursion control run on the host in exact
    float32 — they are O(L) per depth.

The module is driven through the native runtime's DP hook
(kt_set_dp_hook): the C++ driver keeps orchestrating profiles,
consistency tables, distance scaling and refinement, and calls back
here for every full-path alignment.
"""

import ctypes

import numpy as np

NEG = np.float32(-3.4028234663852886e38)  # -FLT_MAX, as the reference uses

_f32p = ctypes.POINTER(ctypes.c_float)
_i32p = ctypes.POINTER(ctypes.c_int32)
_u8p = ctypes.POINTER(ctypes.c_uint8)


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


def _pack_budget():
    """Chunk-packing budget for batched recursions: on accelerators,
    pack many problems per launch (per-launch latency dominates; the
    wavefront costs B*h + C steps packed vs B*(h + C) separate); on the
    CPU backend, padded grid work costs more than launch overhead, so
    pack minimally."""
    import jax
    return 4096 if jax.default_backend() != "cpu" else 0


# --------------------------------------------------------------------
# device kernel: segmented anti-diagonal wavefront sweep
# --------------------------------------------------------------------
#
# One launch sweeps a (VR, C+1) grid of "virtual rows" x global columns.
# Each Hirschberg window occupies a band of virtual rows: one init row
# (the reference's pre-loop boundary initialization) followed by its
# processed rows.  All per-cell penalties arrive as per-row / per-column
# ADDENDS (x - gpe and x + (-gpe) are identical IEEE ops), which unifies
# the residuesxresidues / profilexresidues / profilexprofile sweeps and
# the forward/backward directions (the host builds backward plans in
# column-reversed coordinates).

def _sweep_one(is_init, is_final, active, startq, endq, init_tg, start_tg,
               end_tg, seedA, seedGA, seedGB, gb_ext, gb_open, gb_tg, dgb,
               ga_ext_p, ga_open_p, ga_tg_p, dga_p, match, bonus, p1cnt,
               p2sub_p, win_slot, VR, C, Wmax, use_chain):
    """Sweep a single (VR, C+1) grid.  *_p column arrays arrive reversed
    and padded with VR zeros on each side so that the values at
    j = d - vr (vr = 0..VR-1) are one dynamic slice per step."""
    jax, jnp = _jax()
    lax = jax.lax

    vr_idx = jnp.arange(VR, dtype=jnp.int32)
    D = VR + C + 1
    neg = jnp.float32(NEG)

    def shift1(x):
        # index vr-1 with NEG fill (vr=0 has no up-neighbor)
        return jnp.concatenate([jnp.full((1,), neg, x.dtype), x[:-1]])

    def colvals(arr_pad, d):
        # arr_pad = pad(arr[::-1], VR both sides); arr[d - vr] at lane vr
        return lax.dynamic_slice(arr_pad, (C - d + VR,), (VR,))

    def step(d, carry):
        A1, GA1, GB1, A2, GA2, GB2, out = carry
        jv = d - vr_idx                                   # (VR,)
        jc = jnp.clip(jv, 0, C)
        inwin = active & (jv >= startq) & (jv <= endq)

        A_l, GA_l = A1, GA1                               # (vr, j-1)
        A_u, GA_u, GB_u = shift1(A1), shift1(GA1), shift1(GB1)  # (vr-1, j)
        A_d, GA_d, GB_d = shift1(A2), shift1(GA2), shift1(GB2)  # (vr-1, j-1)

        ga_ext = colvals(ga_ext_p, d)
        ga_open = colvals(ga_open_p, d)
        ga_tg = colvals(ga_tg_p, d)
        dga = colvals(dga_p, d)
        match_d = jnp.take_along_axis(match, jc[:, None], axis=1)[:, 0]
        bonus_d = jnp.take_along_axis(bonus, jc[:, None], axis=1)[:, 0]

        at_start = jv == startq
        at_end = jv == endq

        # ---- init rows (reference pre-loop boundary init) ----
        ga_chain = jnp.maximum(GA_l + ga_ext, A_l + ga_open)
        ga_chain_tg = jnp.maximum(GA_l, A_l) + ga_tg
        iA = jnp.where(at_start, seedA, neg)
        iGA = jnp.where(at_start, seedGA,
                        jnp.where(at_end, neg,
                                  jnp.where(init_tg, ga_chain_tg, ga_chain)))
        iGB = jnp.where(at_start, seedGB, neg)

        # ---- processed rows ----
        a_int = jnp.maximum(jnp.maximum(A_d, GA_d + dga), GB_d + dgb)
        if use_chain:
            # profilexprofile match: sequential mul-add chain in
            # descending residue order (aln_profileprofile.c:114-117);
            # zero-count terms add +-0.0 which never changes a value
            # that subsequent comparisons can distinguish.
            p2sub_d = lax.dynamic_slice(
                p2sub_p, (C - d + VR, 0), (VR, 23))       # (VR, 23)
            for c in range(22, -1, -1):
                a_int = a_int + p1cnt[:, c] * p2sub_d[:, c]
        else:
            a_int = a_int + match_d
        a_int = a_int + bonus_d
        pA = jnp.where(at_start, neg, a_int)
        pGA = jnp.where(at_start | at_end, neg, ga_chain)
        gb_std = jnp.maximum(GB_u + gb_ext, A_u + gb_open)
        gb_tgv = jnp.maximum(GB_u, A_u) + gb_tg
        pGB = jnp.where(at_start,
                        jnp.where(start_tg, gb_tgv, gb_std),
                        jnp.where(at_end,
                                  jnp.where(end_tg, gb_tgv, gb_std),
                                  gb_std))

        nA = jnp.where(inwin, jnp.where(is_init, iA, pA), neg)
        nGA = jnp.where(inwin, jnp.where(is_init, iGA, pGA), neg)
        nGB = jnp.where(inwin, jnp.where(is_init, iGB, pGB), neg)

        # capture band-final rows into the per-window output
        fin = is_final & inwin
        vals = jnp.stack([nA, nGA, nGB], axis=-1)         # (VR, 3)
        vals = jnp.where(fin[:, None], vals, -jnp.inf)
        slot = jnp.where(fin, win_slot, Wmax)
        out = out.at[slot, jc].max(vals)

        return nA, nGA, nGB, A1, GA1, GB1, out

    init = jnp.full((VR,), neg)
    out0 = jnp.full((Wmax + 1, C + 1, 3), -jnp.inf, dtype=jnp.float32)
    carry = (init, init, init, init, init, init, out0)
    carry = lax.fori_loop(0, D, step, carry)
    return carry[6][:Wmax]


_SWEEP_CACHE = {}


def _sweep_batch(shape_key):
    """jitted, vmapped-over-grids sweep for a static shape bucket."""
    if shape_key in _SWEEP_CACHE:
        return _SWEEP_CACHE[shape_key]
    jax, _ = _jax()
    VR, C, Wmax, use_chain = shape_key

    def one(plan):
        return _sweep_one(
            plan["is_init"], plan["is_final"], plan["active"],
            plan["startq"], plan["endq"], plan["init_tg"], plan["start_tg"],
            plan["end_tg"], plan["seedA"], plan["seedGA"], plan["seedGB"],
            plan["gb_ext"], plan["gb_open"], plan["gb_tg"], plan["dgb"],
            plan["ga_ext_p"], plan["ga_open_p"], plan["ga_tg_p"],
            plan["dga_p"], plan["match"], plan["bonus"], plan["p1cnt"],
            plan["p2sub_p"], plan["win_slot"], VR, C, Wmax, use_chain)

    fn = jax.jit(jax.vmap(one))
    _SWEEP_CACHE[shape_key] = fn
    return fn


# --------------------------------------------------------------------
# host side: one hook invocation = one Hirschberg recursion
# --------------------------------------------------------------------

class _Win:
    """One recursion window (aln_controller.c window state)."""
    __slots__ = ("sa", "ea", "sb", "eb", "fs", "bs", "mid",
                 "children", "margin", "has2")

    def __init__(self, sa, ea, sb, eb, fs, bs):
        self.sa, self.ea, self.sb, self.eb = sa, ea, sb, eb
        self.fs, self.bs = fs, bs      # forward / backward seeds (A, GA, GB)
        self.mid = sa + (ea - sa) // 2
        self.children = ()
        self.margin = None             # np.float32 when max2 > -FLT_MAX
        self.has2 = False


def _pow2(n):
    p = 1
    while p < n:
        p *= 2
    return p


def _two_max(s):
    """Exact replica of MeetState::offer's strict-> two-max scan
    (kt_gotoh.cpp / aln_seqseq.c:241-419) over the flattened offer
    sequence, in closed form: the winner is the first global argmax;
    the runner-up is the last value to occupy max2, which is either the
    best strict prefix record before the winner (demoted at the winner)
    or the first later occurrence of the second-best value."""
    m1 = s.max()
    if not (m1 > NEG):
        return NEG, -1, NEG, -1
    i1 = int(np.argmax(s))
    rest = s.copy()
    rest[i1] = -np.inf
    m2 = rest.max()
    if not (m2 > NEG):
        return m1, i1, np.float32(NEG), -1
    if i1 > 0 and s[:i1].max() == m2:
        i2 = int(np.argmax(s[:i1]))
    else:
        i2 = i1 + 1 + int(np.argmax(rest[i1 + 1:]))
    return m1, i1, np.float32(m2), i2


_TRANS = (1, 2, 3, 5, 6, 7)


def _collect_margins(top):
    """Margin bookkeeping in DFS preorder (finish_meet accumulation
    order in the reference recursion)."""
    msum = np.float32(0.0)
    mlist = []
    stack = [top]
    while stack:
        w = stack.pop()
        if w.has2:
            mlist.append(w.margin)
            msum = np.float32(msum + w.margin)
        stack.extend(reversed(w.children))
    return msum, len(mlist), mlist


class ExactAligner:
    """Drives one merge's meet-in-the-middle recursion with batched
    device wavefront sweeps.  All float scalar work (meetup, margins,
    flips) is numpy float32 matching the reference op order."""

    def __init__(self, mode, seq1, seq2, prof1, prof2, len_a, len_b, sip,
                 subm, gpo, gpe, tgpe, soff, bonus,
                 flip_threshold=0.0, flip_trial=0, flip_stride=1,
                 bstride=None):
        import jax.numpy as jnp  # noqa: F401  (ensure jax importable)
        self.mode = mode
        self.la, self.lb = len_a, len_b
        self.flip_threshold = np.float32(flip_threshold)
        self.flip_trial = int(flip_trial)
        self.flip_stride = max(int(flip_stride), 1)
        self.flip_counter = 0
        self.margins = []              # (preorder) per-node margins

        la, lb = len_a, len_b
        gpo, gpe, tgpe = np.float32(gpo), np.float32(gpe), np.float32(tgpe)
        soff = np.float32(soff)
        self.gpo, self.gpe, self.tgpe = gpo, gpe, tgpe

        C = lb  # grid columns 0..C
        self.C = C
        self.Cpad = _pow2(C + 1) - 1   # kernel C (cols 0..Cpad)
        self.VR = _pow2(max((la + 1) // 2 + 2, 8))
        self.Wmax = self.VR
        self.use_chain = mode == 2

        z = np.zeros
        f32 = np.float32
        # ---- match / bonus matrices in grid coordinates ----
        if mode == 0:
            s1 = np.frombuffer(seq1, dtype=np.uint8, count=la) \
                if isinstance(seq1, bytes) else seq1
            s2 = seq2
            se = (subm.astype(f32) - soff).astype(f32)
            core = se[s1][:, s2]                      # (la, lb)
            mF = z((la, C + 1), f32)
            mF[:, 1:] = core
            mB = z((la, C + 1), f32)
            mB[:, :lb] = core
        elif mode == 1:
            P1 = prof1.reshape(la + 2, 64)
            s2 = seq2
            sub_rows = P1[1:la + 1, 32:55]
            mF = z((la, C + 1), f32)
            mF[:, 1:] = sub_rows[:, s2]
            mB = z((la, C + 1), f32)
            mB[:, :lb] = sub_rows[:, s2]
        else:
            P1 = prof1.reshape(la + 2, 64)
            P2 = prof2.reshape(lb + 2, 64)
            mF = z((la, 1), f32)       # unused in chain mode
            mB = z((la, 1), f32)
        self.matchF = mF
        self.matchB_r = mB[:, ::-1].copy() if mode != 2 else mB

        if bonus is not None:
            stride = lb if bstride is None else int(bstride)
            bg = bonus[(np.arange(la)[:, None] * stride +
                        np.arange(C + 1)[None, :]).ravel()].reshape(la, C + 1)
        else:
            bg = z((la, C + 1), f32)
        self.bonusF = bg
        self.bonusB_r = bg[:, ::-1].copy()

        # ---- per-row addends (global row i) ----
        if mode == 0:
            self.gb_ext = np.full(la, -gpe, f32)
            self.gb_open = np.full(la, -gpo, f32)
            self.gb_tg = np.full(la, -tgpe, f32)
            self.dgbF = np.full(la, -gpo, f32)
            self.dgbB = np.full(la, -gpo, f32)
        else:
            self.gb_ext = P1[1:la + 1, 28].copy()
            self.gb_open = P1[1:la + 1, 27].copy()
            self.gb_tg = P1[1:la + 1, 29].copy()
            self.dgbF = P1[0:la, 27].copy()
            self.dgbB = P1[2:la + 2, 27].copy()
        # pp match chain rows
        if mode == 2:
            self.p1cnt_g = P1[1:la + 1, 0:23].copy()
            p2F = z((C + 1, 23), f32)
            p2F[:lb + 1] = P2[0:lb + 1, 32:55]
            p2B = z((C + 1, 23), f32)
            p2B[:lb + 1] = P2[1:lb + 2, 32:55]
            self.p2subF = p2F
            self.p2subB_r = p2B[::-1].copy()
        else:
            self.p1cnt_g = z((la, 23), f32)
            self.p2subF = z((1, 23), f32)
            self.p2subB_r = z((1, 23), f32)

        # ---- per-column addends in grid coordinates ----
        jj = np.arange(C + 1)
        if mode == 0:
            open_c = gpo
            ext_c = gpe
            tg_c = tgpe
            caF = (np.full(C + 1, -ext_c, f32), np.full(C + 1, -open_c, f32),
                   np.full(C + 1, -tg_c, f32), np.full(C + 1, -gpo, f32))
            caB = caF
        elif mode == 1:
            op = f32(gpo * np.float32(sip))
            ex = f32(gpe * np.float32(sip))
            tx = f32(tgpe * np.float32(sip))
            caF = (np.full(C + 1, -ex, f32), np.full(C + 1, -op, f32),
                   np.full(C + 1, -tx, f32), np.full(C + 1, -op, f32))
            caB = caF
        else:
            gaF_ext = P2[jj, 28].astype(f32)
            gaF_open = P2[jj, 27].astype(f32)
            gaF_tg = P2[jj, 29].astype(f32)
            dgaF = z(C + 1, f32)
            dgaF[1:] = P2[jj[1:] - 1, 27]
            jb1 = np.minimum(jj + 1, lb + 1)
            jb2 = np.minimum(jj + 2, lb + 1)
            gaB_ext = P2[jb1, 28].astype(f32)
            gaB_open = P2[jb1, 27].astype(f32)
            gaB_tg = P2[jb1, 29].astype(f32)
            dgaB = P2[jb2, 27].astype(f32)
            caF = (gaF_ext, gaF_open, gaF_tg, dgaF)
            caB = (gaB_ext, gaB_open, gaB_tg, dgaB)
        # backward arrays live in reversed grid coordinates q = lb - j
        self.colsF = caF
        self.colsB = tuple(a[::-1].copy() for a in caB)

        # meet transition addends
        if mode == 0:
            self.t2v = np.full(C + 1, -gpo, f32)
            self.t5v = np.full(C + 1, -gpo, f32)
        elif mode == 1:
            self.t2v = np.full(C + 1, -f32(gpo * np.float32(sip)), f32)
            self.t5v = np.full(C + 1, -f32(gpo * np.float32(sip)), f32)
        else:
            self.t2v = P2[np.minimum(jj + 1, lb + 1), 27].astype(f32)
            self.t5v = P2[jj, 27].astype(f32)
        if mode == 0:
            self.P1rows = None
        else:
            self.P1rows = P1

    # -- per-window meet addends that depend on mid --
    def _trans_adds(self, w):
        if self.mode == 0:
            t3 = -self.gpo
            t7 = -self.gpo
            t6_in = -self.tgpe if w.sb == 0 else -self.gpe
            t6_end = -self.tgpe if w.eb == self.lb else -self.gpe
        else:
            P1 = self.P1rows
            t3 = P1[w.mid + 1, 27]
            t7 = P1[w.mid, 27]
            t6_in = P1[w.mid + 1, 29] if w.sb == 0 else P1[w.mid + 1, 28]
            t6_end = P1[w.mid + 1, 29] if w.eb == self.lb else P1[w.mid + 1, 28]
        return (np.float32(t3), np.float32(t7), np.float32(t6_in),
                np.float32(t6_end))

    # ---------------- plan building ----------------

    def _build_plans(self, wins):
        """Build the stacked (2, ...) fwd+bwd plan for a window chunk."""
        VR, C, Wmax = self.VR, self.Cpad, self.Wmax
        lb = self.lb
        f32, i32 = np.float32, np.int32

        def empty_grid():
            return dict(
                is_init=np.zeros(VR, bool), is_final=np.zeros(VR, bool),
                active=np.zeros(VR, bool),
                startq=np.zeros(VR, i32), endq=np.full(VR, -1, i32),
                init_tg=np.zeros(VR, bool), start_tg=np.zeros(VR, bool),
                end_tg=np.zeros(VR, bool),
                seedA=np.zeros(VR, f32), seedGA=np.zeros(VR, f32),
                seedGB=np.zeros(VR, f32),
                gb_ext=np.zeros(VR, f32), gb_open=np.zeros(VR, f32),
                gb_tg=np.zeros(VR, f32), dgb=np.zeros(VR, f32),
                match=np.zeros((VR, C + 1), f32),
                bonus=np.zeros((VR, C + 1), f32),
                p1cnt=np.zeros((VR, 23), f32),
                win_slot=np.full(VR, Wmax, i32),
            )

        def fill(grid, direction):
            vr = 0
            for slot, w in enumerate(wins):
                if direction == "f":
                    ra, rb = w.sa, w.mid
                    startq, endq = w.sb, w.eb
                    seeds = w.fs
                    init_tg = w.sb == 0
                    start_tg = w.sb == 0
                    end_tg = w.eb == lb
                    rows = np.arange(ra, rb)
                else:
                    ra, rb = w.mid, w.ea
                    startq, endq = lb - w.eb, lb - w.sb
                    seeds = w.bs
                    init_tg = w.eb == lb
                    start_tg = w.eb == lb
                    end_tg = w.sb == 0
                    rows = np.arange(rb - 1, ra - 1, -1)
                R = rb - ra
                band = slice(vr, vr + R + 1)
                grid["active"][band] = True
                grid["startq"][band] = startq
                grid["endq"][band] = endq
                grid["is_init"][vr] = True
                grid["init_tg"][band] = init_tg
                grid["start_tg"][band] = start_tg
                grid["end_tg"][band] = end_tg
                grid["seedA"][vr] = seeds[0]
                grid["seedGA"][vr] = seeds[1]
                grid["seedGB"][vr] = seeds[2]
                grid["is_final"][vr + R] = True
                grid["win_slot"][vr + R] = slot
                if R:
                    rs = slice(vr + 1, vr + R + 1)
                    grid["gb_ext"][rs] = self.gb_ext[rows]
                    grid["gb_open"][rs] = self.gb_open[rows]
                    grid["gb_tg"][rs] = self.gb_tg[rows]
                    if direction == "f":
                        grid["dgb"][rs] = self.dgbF[rows]
                        if self.mode != 2:
                            grid["match"][rs, :self.C + 1] = self.matchF[rows]
                        else:
                            grid["p1cnt"][rs] = self.p1cnt_g[rows]
                        grid["bonus"][rs, :self.C + 1] = self.bonusF[rows]
                    else:
                        grid["dgb"][rs] = self.dgbB[rows]
                        if self.mode != 2:
                            grid["match"][rs, :self.C + 1] = \
                                self.matchB_r[rows]
                        else:
                            grid["p1cnt"][rs] = self.p1cnt_g[rows]
                        grid["bonus"][rs, :self.C + 1] = self.bonusB_r[rows]
                vr += R + 1
            return grid

        gf = fill(empty_grid(), "f")
        gb = fill(empty_grid(), "b")

        def colpack(cols, grid_cols):
            out = []
            for a in cols:
                full = np.zeros(C + 1, np.float32)
                full[:a.shape[0]] = a
                out.append(np.concatenate(
                    [np.zeros(VR, np.float32), full[::-1],
                     np.zeros(VR, np.float32)]))
            return out
        caF = colpack(self.colsF, C)
        caB = colpack(self.colsB, C)
        for g, ca in ((gf, caF), (gb, caB)):
            g["ga_ext_p"], g["ga_open_p"], g["ga_tg_p"], g["dga_p"] = ca

        def subpack(p2):
            full = np.zeros((C + 1, 23), np.float32)
            full[:p2.shape[0]] = p2
            return np.concatenate(
                [np.zeros((VR, 23), np.float32), full[::-1],
                 np.zeros((VR, 23), np.float32)], axis=0)
        gf["p2sub_p"] = subpack(self.p2subF)
        gb["p2sub_p"] = subpack(self.p2subB_r)

        return {k: np.stack([gf[k], gb[k]]) for k in gf}

    def _run_chunk(self, wins):
        import jax.numpy as jnp
        plans = self._build_plans(wins)
        key = (self.VR, self.Cpad, self.Wmax, self.use_chain)
        fn = _sweep_batch(key)
        out_dev = fn({k: jnp.asarray(v) for k, v in plans.items()})
        # fetch only the live windows' columns (the padded out buffer is
        # Wmax x Cpad; on remote devices the transfer dominates)
        lb = self.lb
        out = np.asarray(out_dev[:, :len(wins), :lb + 1])
        res = []
        for slot, w in enumerate(wins):
            fst = out[0, slot]                    # global-j indexed
            bst = out[1, slot][::-1]              # un-reverse q -> j
            res.append((fst, bst))
        return res


    # ---------------- meetup (exact float32, host) ----------------

    def _meet_window(self, w, fst, bst):
        """aln_*_meetup + finish_meet (kt_gotoh.cpp meet_rr/meet_pr/
        meet_pp) for one window; returns (meet_col, transition)."""
        sb, eb = w.sb, w.eb
        middle = np.float32(
            np.float32(eb - sb) / np.float32(2.0) + np.float32(sb))
        thousand = np.float32(1000.0)

        # -FLT_MAX sums overflow to -inf exactly as the reference C does
        with np.errstate(over="ignore"):
            fa, fga, fgb = fst[sb:eb, 0], fst[sb:eb, 1], fst[sb:eb, 2]
            ba, bga, bgb = bst[sb:eb, 0], bst[sb:eb, 1], bst[sb:eb, 2]
            idx = np.arange(sb, eb, dtype=np.float32)
            sub = np.abs(middle - idx) / thousand
            t3, t7, t6_in, t6_end = self._trans_adds(w)
            n = eb - sb
            S = np.empty((n, 6), np.float32)
            S[:, 0] = (fa + ba) - sub
            S[:, 1] = ((fa + bga) + self.t2v[sb:eb]) - sub
            S[:, 2] = ((fa + bgb) + t3) - sub
            S[:, 3] = ((fga + ba) + self.t5v[sb:eb]) - sub
            S[:, 4] = ((fgb + bgb) + t6_in) - sub
            S[:, 5] = ((fgb + ba) + t7) - sub
            sub_e = np.abs(middle - np.float32(eb)) / thousand
            f3 = ((fst[eb, 0] + bst[eb, 2]) + t3) - sub_e
            f6 = ((fst[eb, 2] + bst[eb, 2]) + t6_end) - sub_e
            flat = np.concatenate([S.ravel(), np.float32([f3, f6])])

        m1, i1, m2, i2 = _two_max(flat)

        def decode(k):
            if k < 0:
                return -1, -1
            if k < 6 * n:
                return sb + k // 6, _TRANS[k % 6]
            return eb, (3 if k == 6 * n else 6)

        c, tr = decode(i1)
        if i2 >= 0:                      # st.max2 > -FLT_MAX
            margin = np.float32(m1 - m2)
            w.margin = margin
            w.has2 = True
        if self.flip_threshold > 0.0 and i2 >= 0:
            margin = np.float32(m1 - m2)
            if margin < self.flip_threshold:
                if self.flip_trial > 0 and (
                        self.flip_counter % self.flip_stride
                        == self.flip_trial - 1):
                    c, tr = decode(i2)
                self.flip_counter += 1
        return c, tr

    # ---------------- recursion (continue_align table) ----------------

    def _spawn(self, w, c, tr):
        """Child windows + raw-path writes (aln_controller.c:194-436)."""
        Z, N = np.float32(0.0), NEG
        path = self.path
        mid = w.mid
        sa, ea, sb, eb, fs, bs = w.sa, w.ea, w.sb, w.eb, w.fs, w.bs
        if tr == 1:
            path[mid] = c
            path[mid + 1] = c + 1
            L = _Win(sa, mid - 1, sb, c - 1, fs, (Z, N, N))
            R = _Win(mid + 1, ea, c + 1, eb, (Z, N, N), bs)
        elif tr == 2:
            path[mid] = c
            L = _Win(sa, mid - 1, sb, c - 1, fs, (Z, N, N))
            R = _Win(mid, ea, c + 1, eb, (N, Z, N), bs)
        elif tr == 3:
            path[mid] = c
            L = _Win(sa, mid - 1, sb, c - 1, fs, (Z, N, N))
            R = _Win(mid + 1, ea, c, eb, (N, N, Z), bs)
        elif tr == 5:
            path[mid + 1] = c + 1
            L = _Win(sa, mid, sb, c - 1, fs, (N, Z, N))
            R = _Win(mid + 1, ea, c + 1, eb, (Z, N, N), bs)
        elif tr == 6:
            L = _Win(sa, mid - 1, sb, c, fs, (N, N, Z))
            R = _Win(mid + 1, ea, c, eb, (N, N, Z), bs)
        elif tr == 7:
            path[mid + 1] = c + 1
            L = _Win(sa, mid - 1, sb, c, fs, (N, N, Z))
            R = _Win(mid + 1, ea, c + 1, eb, (Z, N, N), bs)
        else:
            return ()
        w.children = (L, R)
        return (L, R)

    @staticmethod
    def _live(w):
        return w.sa < w.ea and w.sb < w.eb

    def _chunks(self, wins):
        """Pack windows so each chunk's fwd and bwd bands fit in VR."""
        out, cur, sf, sb_, = [], [], 0, 0
        for w in wins:
            rf = (w.mid - w.sa) + 1
            rb = (w.ea - w.mid) + 1
            if cur and (sf + rf > self.VR or sb_ + rb > self.VR
                        or len(cur) >= self.Wmax):
                out.append(cur)
                cur, sf, sb_ = [], 0, 0
            cur.append(w)
            sf += rf
            sb_ += rb
        if cur:
            out.append(cur)
        return out

    def run(self, path_out):
        """Full recursion; returns (margin_sum, margin_count, margins)."""
        self.path = path_out
        Z = np.float32(0.0)
        top = _Win(0, self.la, 0, self.lb, (Z, NEG, NEG), (Z, NEG, NEG))
        flips = self.flip_threshold > 0.0 and self.flip_trial > 0
        if flips:
            # flip_counter consumes low-margin meets in recursion (DFS
            # preorder) order — sequential by construction.
            stack = [top]
            while stack:
                w = stack.pop()
                if not self._live(w):
                    continue
                ((fst, bst),) = self._run_chunk([w])
                c, tr = self._meet_window(w, fst, bst)
                kids = self._spawn(w, c, tr)
                stack.extend(reversed(kids))
        else:
            frontier = [top] if self._live(top) else []
            while frontier:
                nxt = []
                for chunk in self._chunks(frontier):
                    res = self._run_chunk(chunk)
                    for w, (fst, bst) in zip(chunk, res):
                        c, tr = self._meet_window(w, fst, bst)
                        for k in self._spawn(w, c, tr):
                            if self._live(k):
                                nxt.append(k)
                frontier = nxt
        return _collect_margins(top)


# --------------------------------------------------------------------
# native-driver hook adapter
# --------------------------------------------------------------------

def _exactness_canary():
    """One small seq x seq problem through the device wavefront vs the
    native oracle.  Bit-exactness rests on the backend compiler not
    contracting mul/add chains or reassociating maxes; if a compiler
    change ever breaks that, this turns silent loss of byte-parity
    into a loud error at engine start."""
    import kalign_tpu.native as native
    from kalign_tpu.core import params as P

    L = native.lib()
    rng = np.random.default_rng(1234)
    ap = P.aln_param_init(P.BIOTYPE_PROTEIN, P.KALIGN_TYPE_PROTEIN,
                          -1.0, -1.0, -1.0, 1)
    subm = np.ascontiguousarray(ap.subm.astype(np.float32).reshape(-1))
    la, lb = 33, 47
    s1 = rng.integers(0, 23, la).astype(np.uint8)
    s2 = rng.integers(0, 23, lb).astype(np.uint8)
    g = (np.float32(ap.gpo), np.float32(ap.gpe), np.float32(ap.tgpe))
    path_ref = np.full(lb + 2, -1, np.int32)
    info = np.zeros(3, np.float32)
    L.kt_run_align_single(0, s1.ctypes.data, s2.ctypes.data, None, None,
                          la, lb, 0, subm, g[0], g[1], g[2],
                          np.float32(0.7), None, lb, 0.0, 0, 1, 0,
                          path_ref, info)
    aln = ExactAligner(0, s1, s2, None, None, la, lb, 0,
                       subm.reshape(23, 23), g[0], g[1], g[2],
                       np.float32(0.7), None)
    path_dev = np.full(la + 2, -1, np.int32)
    msum, mcount, _ = aln.run(path_dev)
    if not (np.array_equal(path_ref[:la + 2], path_dev)
            and np.float32(msum) == info[0]
            and mcount == int(info[1])):
        raise RuntimeError(
            "bit-exactness canary failed: the accelerator backend no "
            "longer reproduces the reference float op order (compiler "
            "FMA contraction / reassociation?).  Use engine='host' and "
            "report this.")


_CANARY_OK = False


class ExactDpBackend:
    """DP_HOOK_TYPE adapter: receives raw pointers from the native
    driver, wraps them as numpy views, and runs ExactAligner."""

    def __init__(self):
        self._cb = None
        self.calls = 0
        self.last_error = None

    def callback(self):
        from kalign_tpu import native
        if self._cb is None:
            self._cb = native.DP_HOOK_TYPE(self._call)
        return self._cb

    def merge_batch_callback(self):
        from kalign_tpu import native
        if getattr(self, "_mcb", None) is None:
            self._mcb = native.MERGE_BATCH_HOOK_TYPE(self._call_merge_batch)
        return self._mcb

    def _call_merge_batch(self, n, modes, seqs_a, seqs_b, profs_a, profs_b,
                          lens_a, lens_b, sips, bonuses, bstrides,
                          gpos, gpes, tgpes, soffs, subm,
                          paths_out, stride, margin_sums, margin_counts):
        try:
            self.calls += 1
            n = int(n)
            stride = int(stride)

            def u8(ptr, ln):
                return np.ctypeslib.as_array(
                    ctypes.cast(ptr, _u8p), shape=(ln,))

            def f32(ptr, ln):
                return np.ctypeslib.as_array(
                    ctypes.cast(ptr, _f32p), shape=(ln,))

            sm = f32(subm, 529).reshape(23, 23)
            aligners = []
            for m in range(n):
                mode = int(modes[m])
                la, lb = int(lens_a[m]), int(lens_b[m])
                bs = int(bstrides[m])
                s1 = u8(seqs_a[m], la) if mode == 0 else None
                s2 = u8(seqs_b[m], lb) if mode != 2 else None
                p1 = f32(profs_a[m], (la + 2) * 64) if mode != 0 else None
                p2 = f32(profs_b[m], (lb + 2) * 64) if mode == 2 else None
                bon = f32(bonuses[m], la * bs + 1) if bonuses[m] else None
                aligners.append(ExactAligner(
                    mode, s1, s2, p1, p2, la, lb, int(sips[m]),
                    sm if mode == 0 else None,
                    gpos[m], gpes[m], tgpes[m], soffs[m], bon,
                    bstride=bs))
            # shared padded dims for grid stacking; like ExactPairBatch,
            # give VR headroom beyond one problem's top window so early
            # depths pack multiple merges per launch
            single = max(a.VR for a in aligners)
            total = sum((a.la + 1) // 2 + 2 for a in aligners)
            VR = _pow2(max(single, min(total, _pack_budget())))
            C = max(a.Cpad for a in aligners)
            for a in aligners:
                a.VR = VR
                a.Cpad = C
                a.Wmax = VR
            flat = np.ctypeslib.as_array(
                ctypes.cast(paths_out, _i32p), shape=(n * stride,))
            paths = [flat[m * stride:(m + 1) * stride] for m in range(n)]
            stats = run_merge_batch(aligners, paths)
            ms = np.ctypeslib.as_array(
                ctypes.cast(margin_sums, _f32p), shape=(n,))
            mc = np.ctypeslib.as_array(
                ctypes.cast(margin_counts, _i32p), shape=(n,))
            for m, (s, cnt) in enumerate(stats):
                ms[m] = s
                mc[m] = cnt
            return 0
        except Exception as e:  # pragma: no cover - debugging aid
            import traceback
            self.last_error = traceback.format_exc()
            print("ExactDpBackend merge-batch error:", e)
            print(self.last_error)
            return 1

    def trial_batch_callback(self):
        from kalign_tpu import native
        if getattr(self, "_tcb", None) is None:
            self._tcb = native.TRIAL_BATCH_HOOK_TYPE(self._call_trial_batch)
        return self._tcb

    def _call_trial_batch(self, mode, seq1, seq2, prof1, prof2,
                          len_a, len_b, sip, subm, gpo, gpe, tgpe, soff,
                          bonus, bstride, n_trials, flip_threshold,
                          flip_stride, paths_out, path_stride,
                          margin_sums, margin_counts):
        try:
            self.calls += 1
            la, lb = int(len_a), int(len_b)
            stride = int(path_stride)
            K = int(n_trials) - 1

            def u8(ptr, ln):
                return np.ctypeslib.as_array(
                    ctypes.cast(ptr, _u8p), shape=(ln,))

            def f32(ptr, ln):
                return np.ctypeslib.as_array(
                    ctypes.cast(ptr, _f32p), shape=(ln,))

            s1 = u8(seq1, la) if mode == 0 else None
            s2 = u8(seq2, lb) if mode != 2 else None
            p1 = f32(prof1, (la + 2) * 64) if mode != 0 else None
            p2 = f32(prof2, (lb + 2) * 64) if mode == 2 else None
            sm = f32(subm, 529).reshape(23, 23) if mode == 0 else None
            bs = int(bstride)
            bon = f32(bonus, la * bs + 1) if bonus else None
            aligners = [ExactAligner(
                mode, s1, s2, p1, p2, la, lb, int(sip), sm,
                gpo, gpe, tgpe, soff, bon,
                flip_threshold, k, int(flip_stride), bstride=bs)
                for k in range(1, K + 1)]
            flat = np.ctypeslib.as_array(
                ctypes.cast(paths_out, _i32p), shape=(K * stride,))
            paths = [flat[k * stride:(k + 1) * stride] for k in range(K)]
            stats = run_flip_trials(aligners, paths)
            ms = np.ctypeslib.as_array(
                ctypes.cast(margin_sums, _f32p), shape=(K,))
            mc = np.ctypeslib.as_array(
                ctypes.cast(margin_counts, _i32p), shape=(K,))
            for k, (s, cnt) in enumerate(stats):
                ms[k] = s
                mc[k] = cnt
            return 0
        except Exception as e:  # pragma: no cover - debugging aid
            import traceback
            self.last_error = traceback.format_exc()
            print("ExactDpBackend trial-batch error:", e)
            print(self.last_error)
            return 1

    def pairwise_callback(self):
        from kalign_tpu import native
        if getattr(self, "_pcb", None) is None:
            self._pcb = native.PAIRWISE_HOOK_TYPE(self._call_pairwise)
        return self._pcb

    def _call_pairwise(self, n_pairs, seqs_a, lens_a, seqs_b, lens_b,
                       subm, gpo, gpe, tgpe, paths_out, stride):
        try:
            self.calls += 1
            n = int(n_pairs)
            stride = int(stride)

            def u8(ptr, ln):
                return np.ctypeslib.as_array(
                    ctypes.cast(ptr, _u8p), shape=(ln,))

            sm = np.ctypeslib.as_array(
                ctypes.cast(subm, _f32p), shape=(529,)).reshape(23, 23)
            flat = np.ctypeslib.as_array(
                ctypes.cast(paths_out, _i32p), shape=(n * stride,))
            # bound the upfront match-matrix memory: an NxK pre-pass at
            # 16k sequences is ~80k pairs; process in slices
            CAP = 2048
            for lo in range(0, n, CAP):
                hi = min(lo + CAP, n)
                pairs = []
                for p in range(lo, hi):
                    la, lb = int(lens_a[p]), int(lens_b[p])
                    pairs.append((u8(seqs_a[p], la), u8(seqs_b[p], lb)))
                paths = [flat[p * stride:(p + 1) * stride]
                         for p in range(lo, hi)]
                batch = ExactPairBatch(pairs, sm, gpo, gpe, tgpe)
                batch.run(paths)
            return 0
        except Exception as e:  # pragma: no cover - debugging aid
            import traceback
            self.last_error = traceback.format_exc()
            print("ExactDpBackend pairwise error:", e)
            print(self.last_error)
            return 1

    def install(self):
        global _CANARY_OK
        if not _CANARY_OK:
            _exactness_canary()
            _CANARY_OK = True
        from kalign_tpu import native
        native.set_dp_hook(self.callback())
        native.set_pairwise_hook(self.pairwise_callback())
        native.set_merge_batch_hook(self.merge_batch_callback())
        native.set_trial_batch_hook(self.trial_batch_callback())

    @staticmethod
    def uninstall():
        from kalign_tpu import native
        native.set_dp_hook(None)
        native.set_pairwise_hook(None)
        native.set_merge_batch_hook(None)
        native.set_trial_batch_hook(None)

    def _call(self, mode, seq1, seq2, prof1, prof2, len_a, len_b, sip,
              subm, gpo, gpe, tgpe, soff, bonus, bstride,
              flip_threshold, flip_trial, flip_stride,
              path_out, info_out, margins_out, margins_cap):
        try:
            self.calls += 1
            la, lb = int(len_a), int(len_b)

            def u8(ptr, n):
                return np.ctypeslib.as_array(
                    ctypes.cast(ptr, _u8p), shape=(n,))

            def f32(ptr, n):
                return np.ctypeslib.as_array(
                    ctypes.cast(ptr, _f32p), shape=(n,))

            s1 = u8(seq1, la) if mode == 0 else None
            s2 = u8(seq2, lb) if mode != 2 else None
            p1 = f32(prof1, (la + 2) * 64) if mode != 0 else None
            p2 = f32(prof2, (lb + 2) * 64) if mode == 2 else None
            sm = f32(subm, 529).reshape(23, 23) if mode == 0 else None
            bstride = int(bstride)
            bon = f32(bonus, la * bstride + 1) if bonus else None

            aln = ExactAligner(mode, s1, s2, p1, p2, la, lb, int(sip),
                               sm, gpo, gpe, tgpe, soff, bon,
                               flip_threshold, flip_trial, flip_stride,
                               bstride=bstride)
            path = np.ctypeslib.as_array(
                ctypes.cast(path_out, _i32p), shape=(la + 2,))
            msum, mcount, mlist = aln.run(path)
            info = f32(info_out, 2)
            info[0] = msum
            info[1] = np.float32(mcount)
            if margins_out and margins_cap > 0:
                marr = f32(margins_out, margins_cap)
                k = min(len(mlist), int(margins_cap))
                marr[:k] = mlist[:k]
            return 0
        except Exception as e:  # pragma: no cover - debugging aid
            import traceback
            self.last_error = traceback.format_exc()
            print("ExactDpBackend error:", e)
            print(self.last_error)
            return 1


# --------------------------------------------------------------------
# batched residues x residues problems (consistency pre-pass)
# --------------------------------------------------------------------

class _BWin(_Win):
    __slots__ = ("pid",)

    def __init__(self, pid, sa, ea, sb, eb, fs, bs):
        super().__init__(sa, ea, sb, eb, fs, bs)
        self.pid = pid


class ExactPairBatch:
    """All of the consistency pre-pass's NxK pairwise (residues x
    residues) Hirschberg recursions in LOCKSTEP: every BFS depth packs
    the live windows of EVERY problem into shared segmented-wavefront
    launches (SURVEY 2.2 — NxK problems in one launch).  Sharing one
    grid across problems is exact here because rr-mode column penalty
    addends are scalars (same for every problem); per-window row data
    and edge flags come from each window's own problem."""

    def __init__(self, pairs, subm, gpo, gpe, tgpe):
        # pairs: list of (s1, s2) uint8 arrays, rows = shorter side
        self.pairs = pairs
        gpo, gpe, tgpe = np.float32(gpo), np.float32(gpe), np.float32(tgpe)
        self.gpo, self.gpe, self.tgpe = gpo, gpe, tgpe
        se = subm.astype(np.float32)  # soff = 0 in the consistency pass
        self.la = [len(a) for a, _ in pairs]
        self.lb = [len(b) for _, b in pairs]
        self.matchF = []
        self.matchB = []
        for s1, s2 in pairs:
            core = se[s1][:, s2]
            mF = np.zeros((len(s1), len(s2) + 1), np.float32)
            mF[:, 1:] = core
            mB = np.zeros((len(s1), len(s2) + 1), np.float32)
            mB[:, :len(s2)] = core
            self.matchF.append(mF)
            self.matchB.append(mB[:, ::-1].copy())

        # VR is both the grid height and the chunk-packing budget:
        # size it to hold SEVERAL problems' top-level windows (up to a
        # cap) so early recursion depths batch across problems too —
        # wavefront steps scale as VR + C, so packing B problems into
        # one launch costs (B*h + C) steps instead of B*(h + C)
        single = max((la + 1) // 2 + 2 for la in self.la)
        total = sum((la + 1) // 2 + 2 for la in self.la)
        budget = _pack_budget()
        self.VR = _pow2(max(8, single, min(total, budget)))
        self.C = max(self.lb)
        self.Cpad = _pow2(self.C + 1) - 1
        self.Wmax = self.VR

        C = self.Cpad
        f32 = np.float32
        cols = (np.full(C + 1, -gpe, f32), np.full(C + 1, -gpo, f32),
                np.full(C + 1, -tgpe, f32), np.full(C + 1, -gpo, f32))

        def colpack(a):
            return np.concatenate([np.zeros(self.VR, f32), a[::-1],
                                   np.zeros(self.VR, f32)])
        self._cols_p = [colpack(a) for a in cols]
        self._zsub = np.zeros((self.VR * 2 + C + 1, 23), f32)

    def _build_plan(self, wins, direction):
        VR, C, Wmax = self.VR, self.Cpad, self.Wmax
        f32, i32 = np.float32, np.int32
        g = dict(
            is_init=np.zeros(VR, bool), is_final=np.zeros(VR, bool),
            active=np.zeros(VR, bool),
            startq=np.zeros(VR, i32), endq=np.full(VR, -1, i32),
            init_tg=np.zeros(VR, bool), start_tg=np.zeros(VR, bool),
            end_tg=np.zeros(VR, bool),
            seedA=np.zeros(VR, f32), seedGA=np.zeros(VR, f32),
            seedGB=np.zeros(VR, f32),
            gb_ext=np.full(VR, -self.gpe, f32),
            gb_open=np.full(VR, -self.gpo, f32),
            gb_tg=np.full(VR, -self.tgpe, f32),
            dgb=np.full(VR, -self.gpo, f32),
            match=np.zeros((VR, C + 1), f32),
            bonus=np.zeros((VR, C + 1), f32),
            p1cnt=np.zeros((VR, 23), f32),
            win_slot=np.full(VR, Wmax, i32),
        )
        g["ga_ext_p"], g["ga_open_p"], g["ga_tg_p"], g["dga_p"] = self._cols_p
        g["p2sub_p"] = self._zsub
        vr = 0
        for slot, w in enumerate(wins):
            lb = self.lb[w.pid]
            if direction == "f":
                ra, rb = w.sa, w.mid
                startq, endq = w.sb, w.eb
                seeds = w.fs
                init_tg = start_tg = w.sb == 0
                end_tg = w.eb == lb
                rows = np.arange(ra, rb)
                msrc = self.matchF[w.pid]
            else:
                ra, rb = w.mid, w.ea
                startq, endq = lb - w.eb, lb - w.sb
                seeds = w.bs
                init_tg = start_tg = w.eb == lb
                end_tg = w.sb == 0
                rows = np.arange(rb - 1, ra - 1, -1)
                msrc = self.matchB[w.pid]
            R = rb - ra
            band = slice(vr, vr + R + 1)
            g["active"][band] = True
            g["startq"][band] = startq
            g["endq"][band] = endq
            g["is_init"][vr] = True
            g["init_tg"][band] = init_tg
            g["start_tg"][band] = start_tg
            g["end_tg"][band] = end_tg
            g["seedA"][vr], g["seedGA"][vr], g["seedGB"][vr] = seeds
            g["is_final"][vr + R] = True
            g["win_slot"][vr + R] = slot
            if R:
                # backward plans live in reversed coordinates q = lb - j;
                # matchB rows are pre-reversed at the PROBLEM's width, so
                # left-align them at this problem's lb+1 columns
                g["match"][vr + 1:vr + R + 1, :self.lb[w.pid] + 1] = \
                    msrc[rows]
            vr += R + 1
        return g

    def _run_chunk(self, wins):
        import jax.numpy as jnp
        gf = self._build_plan(wins, "f")
        gb = self._build_plan(wins, "b")
        plans = {k: np.stack([gf[k], gb[k]]) for k in gf}
        fn = _sweep_batch((self.VR, self.Cpad, self.Wmax, False))
        out_dev = fn({k: jnp.asarray(v) for k, v in plans.items()})
        max_lb = max(self.lb[w.pid] for w in wins)
        out = np.asarray(out_dev[:, :len(wins), :max_lb + 1])
        res = []
        for slot, w in enumerate(wins):
            lb = self.lb[w.pid]
            fst = out[0, slot][:lb + 1]
            bst = out[1, slot][:lb + 1][::-1]
            res.append((fst, bst))
        return res

    def _meet(self, w, fst, bst):
        sb, eb = w.sb, w.eb
        lb = self.lb[w.pid]
        middle = np.float32(
            np.float32(eb - sb) / np.float32(2.0) + np.float32(sb))
        thousand = np.float32(1000.0)
        with np.errstate(over="ignore"):
            fa, fga, fgb = fst[sb:eb, 0], fst[sb:eb, 1], fst[sb:eb, 2]
            ba, bga, bgb = bst[sb:eb, 0], bst[sb:eb, 1], bst[sb:eb, 2]
            idx = np.arange(sb, eb, dtype=np.float32)
            sub = np.abs(middle - idx) / thousand
            t6_in = -self.tgpe if sb == 0 else -self.gpe
            t6_end = -self.tgpe if eb == lb else -self.gpe
            n = eb - sb
            S = np.empty((n, 6), np.float32)
            S[:, 0] = (fa + ba) - sub
            S[:, 1] = ((fa + bga) + (-self.gpo)) - sub
            S[:, 2] = ((fa + bgb) + (-self.gpo)) - sub
            S[:, 3] = ((fga + ba) + (-self.gpo)) - sub
            S[:, 4] = ((fgb + bgb) + t6_in) - sub
            S[:, 5] = ((fgb + ba) + (-self.gpo)) - sub
            sub_e = np.abs(middle - np.float32(eb)) / thousand
            f3 = ((fst[eb, 0] + bst[eb, 2]) + (-self.gpo)) - sub_e
            f6 = ((fst[eb, 2] + bst[eb, 2]) + t6_end) - sub_e
            flat = np.concatenate([S.ravel(), np.float32([f3, f6])])
        m1, i1, m2, i2 = _two_max(flat)
        if i1 < 0:
            return -1, -1
        if i1 < 6 * n:
            return sb + i1 // 6, _TRANS[i1 % 6]
        return eb, (3 if i1 == 6 * n else 6)

    def _spawn(self, w, c, tr, path):
        Z, N = np.float32(0.0), NEG
        mid = w.mid
        sa, ea, sb, eb, fs, bs = w.sa, w.ea, w.sb, w.eb, w.fs, w.bs
        pid = w.pid
        if tr == 1:
            path[mid] = c
            path[mid + 1] = c + 1
            L = _BWin(pid, sa, mid - 1, sb, c - 1, fs, (Z, N, N))
            R = _BWin(pid, mid + 1, ea, c + 1, eb, (Z, N, N), bs)
        elif tr == 2:
            path[mid] = c
            L = _BWin(pid, sa, mid - 1, sb, c - 1, fs, (Z, N, N))
            R = _BWin(pid, mid, ea, c + 1, eb, (N, Z, N), bs)
        elif tr == 3:
            path[mid] = c
            L = _BWin(pid, sa, mid - 1, sb, c - 1, fs, (Z, N, N))
            R = _BWin(pid, mid + 1, ea, c, eb, (N, N, Z), bs)
        elif tr == 5:
            path[mid + 1] = c + 1
            L = _BWin(pid, sa, mid, sb, c - 1, fs, (N, Z, N))
            R = _BWin(pid, mid + 1, ea, c + 1, eb, (Z, N, N), bs)
        elif tr == 6:
            L = _BWin(pid, sa, mid - 1, sb, c, fs, (N, N, Z))
            R = _BWin(pid, mid + 1, ea, c, eb, (N, N, Z), bs)
        elif tr == 7:
            path[mid + 1] = c + 1
            L = _BWin(pid, sa, mid - 1, sb, c, fs, (N, N, Z))
            R = _BWin(pid, mid + 1, ea, c + 1, eb, (Z, N, N), bs)
        else:
            return ()
        return (L, R)

    def _chunks(self, wins):
        out, cur, sf, sb_ = [], [], 0, 0
        for w in wins:
            rf = (w.mid - w.sa) + 1
            rb = (w.ea - w.mid) + 1
            if cur and (sf + rf > self.VR or sb_ + rb > self.VR
                        or len(cur) >= self.Wmax):
                out.append(cur)
                cur, sf, sb_ = [], 0, 0
            cur.append(w)
            sf += rf
            sb_ += rb
        if cur:
            out.append(cur)
        return out

    def run(self, paths_out):
        """paths_out: list of int32 arrays (la_p + 2, pre-set -1)."""
        Z = np.float32(0.0)
        frontier = []
        for pid in range(len(self.pairs)):
            w = _BWin(pid, 0, self.la[pid], 0, self.lb[pid],
                      (Z, NEG, NEG), (Z, NEG, NEG))
            if w.sa < w.ea and w.sb < w.eb:
                frontier.append(w)
        while frontier:
            nxt = []
            for chunk in self._chunks(frontier):
                res = self._run_chunk(chunk)
                for w, (fst, bst) in zip(chunk, res):
                    c, tr = self._meet(w, fst, bst)
                    for k in self._spawn(w, c, tr, paths_out[w.pid]):
                        if k.sa < k.ea and k.sb < k.eb:
                            nxt.append(k)
            frontier = nxt


# --------------------------------------------------------------------
# batched tree-level merges (all modes, lockstep recursions)
# --------------------------------------------------------------------

# grids per stacked launch (2 per chunk): bounds one launch's upload
_MAX_GRIDS = 64


def run_merge_batch(aligners, paths):
    """Run every aligner's flip-free Hirschberg recursion in lockstep:
    each BFS depth stacks ALL problems' fwd/bwd grids on the launch
    axis (every problem brings its own per-column data, so this works
    for all three operand kinds — unlike the rr-only cross-problem
    grid sharing of ExactPairBatch).  All aligners must share padded
    (VR, Cpad) dims.  Returns [(margin_sum, margin_count)] per
    problem."""
    import jax.numpy as jnp

    roots = []
    frontiers = []
    for aln, path in zip(aligners, paths):
        aln.path = path
        Z = np.float32(0.0)
        top = _Win(0, aln.la, 0, aln.lb, (Z, NEG, NEG), (Z, NEG, NEG))
        roots.append(top)
        frontiers.append([top] if aln._live(top) else [])

    while any(frontiers):
        work = []
        for i, fr in enumerate(frontiers):
            if fr:
                for chunk in aligners[i]._chunks(fr):
                    work.append((i, chunk))
        nxts = [[] for _ in aligners]
        groups = {}
        for item in work:
            groups.setdefault(aligners[item[0]].use_chain, []).append(item)
        for chain, all_items in groups.items():
            # cap grids per launch (bounds one launch's match/bonus
            # upload) and fetch only live slots/columns — transfers
            # dominate on remote devices
            for base in range(0, len(all_items), _MAX_GRIDS // 2):
                items = all_items[base:base + _MAX_GRIDS // 2]
                plans = [aligners[i]._build_plans(chunk)
                         for i, chunk in items]
                stacked = {k: np.concatenate([p[k] for p in plans])
                           for k in plans[0]}
                a0 = aligners[items[0][0]]
                fn = _sweep_batch((a0.VR, a0.Cpad, a0.Wmax, chain))
                out_dev = fn({k: jnp.asarray(v)
                              for k, v in stacked.items()})
                max_slots = max(len(chunk) for _, chunk in items)
                max_lb = max(aligners[i].lb for i, _ in items)
                out = np.asarray(out_dev[:, :max_slots, :max_lb + 1])
                g = 0
                for i, chunk in items:
                    aln = aligners[i]
                    lb = aln.lb
                    for slot, w in enumerate(chunk):
                        fst = out[g, slot][:lb + 1]
                        bst = out[g + 1, slot][:lb + 1][::-1]
                        c, tr = aln._meet_window(w, fst, bst)
                        for k2 in aln._spawn(w, c, tr):
                            if aln._live(k2):
                                nxts[i].append(k2)
                    g += 2
        frontiers = nxts

    out = []
    for top in roots:
        msum, mcount, _ = _collect_margins(top)
        out.append((msum, mcount))
    return out


# --------------------------------------------------------------------
# batched refinement flip trials (one merge, K perturbed recursions)
# --------------------------------------------------------------------

def run_flip_trials(aligners, paths):
    """K flip-perturbation trials of ONE merge in lockstep.  Every
    trial's recursion is DFS (flip_counter consumes low-margin meets in
    preorder, aln_refine.c trial semantics), so each step takes ONE
    window per live trial — but the trials share operands, so their
    windows pack into one grid built from aligners[0]'s matrices.
    Returns [(margin_sum, margin_count)] per trial."""
    a0 = aligners[0]
    roots = []
    stacks = []
    for aln, path in zip(aligners, paths):
        aln.path = path
        Z = np.float32(0.0)
        top = _Win(0, aln.la, 0, aln.lb, (Z, NEG, NEG), (Z, NEG, NEG))
        roots.append(top)
        stacks.append([top] if aln._live(top) else [])

    while True:
        wins = []
        owners = []
        for t, st in enumerate(stacks):
            while st:
                w = st.pop()
                if aligners[t]._live(w):
                    wins.append(w)
                    owners.append(t)
                    break
        if not wins:
            break
        # shared matrices: a0 builds every trial's plans; repack into
        # VR-budget chunks (each window belongs to a distinct trial, so
        # intra-step ordering is free)
        owner_of = {id(w): t for w, t in zip(wins, owners)}
        for chunk in a0._chunks(wins):
            res = a0._run_chunk(chunk)
            for w, (fst, bst) in zip(chunk, res):
                t = owner_of[id(w)]
                aln = aligners[t]
                c, tr = aln._meet_window(w, fst, bst)
                kids = aln._spawn(w, c, tr)
                # DFS order: push right then left so left pops first
                stacks[t].extend(reversed(kids))

    return [_collect_margins(top)[:2] for top in roots]
