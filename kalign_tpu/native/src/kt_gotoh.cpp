/* Gotoh affine-gap DP with meet-in-the-middle path recovery.
 *
 * Exact reimplementation of the reference compute core:
 *   - 3-state (match / gap-in-row / gap-in-col) forward & backward row
 *     sweeps for the three operand kinds:
 *       residues x residues   (lib/src/aln_seqseq.c)
 *       profile  x residues   (lib/src/aln_seqprofile.c)
 *       profile  x profile    (lib/src/aln_profileprofile.c)
 *   - midpoint meet with 6 transition types, distance-from-middle
 *     tiebreak, margin tracking and flip perturbation
 *   - divide-and-conquer controller (lib/src/aln_controller.c)
 *   - raw-path converters: the default one reproduces the reference's
 *     add_gap_info_to_path_n byte-for-byte INCLUDING its dead gap-bit
 *     loop (aln_setup.c:196 tests the sentinel index, so 4/8/16 bits are
 *     never set on this path); the fixed variant mirrors convert_raw_path
 *     (aln_refine.c:590-672) used by refinement.
 *
 * Terminal-gap handling, boundary states per transition, and float
 * operation order follow the reference exactly (compiled without FMA).
 */
#include "kt_gotoh.h"

#include <cfloat>
#include <cmath>
#include <cstring>

namespace kt {

static const int kSerialThreshold = 250; /* KALIGN_ALN_SERIAL_THRESHOLD */

void AlnMem::ensure(int la, int lb) {
  len_a = la;
  len_b = lb;
  int g = (la > lb ? la : lb) + 2;
  if ((int)fa.size() < g) {
    fa.resize(g);
    fga.resize(g);
    fgb.resize(g);
    ba.resize(g);
    bga.resize(g);
    bgb.resize(g);
  }
  int p = la + lb + 2;
  if ((int)path.size() < p) {
    path.resize(p);
    tmp_path.resize(p);
  }
}

void AlnMem::init_window() {
  starta = 0;
  startb = 0;
  enda = len_a;
  endb = len_b;
  fa[0] = 0.0f;
  fga[0] = -FLT_MAX;
  fgb[0] = -FLT_MAX;
  ba[0] = 0.0f;
  bga[0] = -FLT_MAX;
  bgb[0] = -FLT_MAX;
  int g = (len_a > len_b ? len_a : len_b) + 2;
  for (int i = 0; i < g; i++) path[i] = -1;
}

#define KT_MAX(a, b) ((a) > (b) ? (a) : (b))
#define KT_MAX3(a, b, c) KT_MAX(KT_MAX(a, b), c)

/* ------------------------------------------------------------------ */
/* residues x residues                                                 */
/* ------------------------------------------------------------------ */

static void fwd_rr(AlnMem& m) {
  float* sa = m.fa.data();
  float* sga = m.fga.data();
  float* sgb = m.fgb.data();
  const uint8_t* seq1 = m.seq1;
  const uint8_t* seq2 = m.seq2 - 1; /* 1-based column indexing */
  const int starta = m.starta, enda = m.enda;
  const int startb = m.startb, endb = m.endb;
  const float gpo = m.pr->gpo, gpe = m.pr->gpe, tgpe = m.pr->tgpe;
  const float soff = m.pr->soff;

  sa[startb] = sa[0];
  sga[startb] = sga[0];
  sgb[startb] = sgb[0];
  if (startb) {
    for (int j = startb + 1; j < endb; j++) {
      sa[j] = -FLT_MAX;
      sga[j] = KT_MAX(sga[j - 1] - gpe, sa[j - 1] - gpo);
      sgb[j] = -FLT_MAX;
    }
  } else {
    for (int j = startb + 1; j < endb; j++) {
      sa[j] = -FLT_MAX;
      sga[j] = KT_MAX(sga[j - 1], sa[j - 1]) - tgpe;
      sgb[j] = -FLT_MAX;
    }
  }
  sa[endb] = -FLT_MAX;
  sga[endb] = -FLT_MAX;
  sgb[endb] = -FLT_MAX;

  for (int i = starta; i < enda; i++) {
    const float* subp = m.pr->subm + 23 * seq1[i];
    float pa = sa[startb];
    float pga = sga[startb];
    float pgb = sgb[startb];
    sa[startb] = -FLT_MAX;
    sga[startb] = -FLT_MAX;
    float xa = sa[startb];
    float xga = sga[startb];
    if (startb) {
      sgb[startb] = KT_MAX(pgb - gpe, pa - gpo);
    } else {
      sgb[startb] = KT_MAX(pgb, pa) - tgpe;
    }
    int j;
    for (j = startb + 1; j < endb; j++) {
      float ca = sa[j];
      pa = KT_MAX3(pa, pga - gpo, pgb - gpo);
      pa += subp[seq2[j]] - soff;
      if (m.bonus) pa += m.bonus[(int64_t)i * m.bstride + j];
      sa[j] = pa;
      pga = sga[j];
      sga[j] = KT_MAX(xga - gpe, xa - gpo);
      pgb = sgb[j];
      sgb[j] = KT_MAX(pgb - gpe, ca - gpo);
      pa = ca;
      xa = sa[j];
      xga = sga[j];
    }
    float ca = sa[j];
    pa = KT_MAX3(pa, pga - gpo, pgb - gpo);
    pa += subp[seq2[j]] - soff;
    if (m.bonus) pa += m.bonus[(int64_t)i * m.bstride + j];
    sa[j] = pa;
    sga[j] = -FLT_MAX;
    if (endb != m.len_b) {
      sgb[j] = KT_MAX(sgb[j] - gpe, ca - gpo);
    } else {
      sgb[j] = KT_MAX(sgb[j], ca) - tgpe;
    }
  }
}

static void bwd_rr(AlnMem& m) {
  float* sa = m.ba.data();
  float* sga = m.bga.data();
  float* sgb = m.bgb.data();
  const uint8_t* seq1 = m.seq1 + m.starta2;
  const uint8_t* seq2 = m.seq2;
  const int starta = m.starta2, enda = m.enda2;
  const int startb = m.startb, endb = m.endb;
  const float gpo = m.pr->gpo, gpe = m.pr->gpe, tgpe = m.pr->tgpe;
  const float soff = m.pr->soff;

  sa[endb] = sa[0];
  sga[endb] = sga[0];
  sgb[endb] = sgb[0];
  if (endb != m.len_b) {
    for (int j = endb - 1; j > startb; j--) {
      sa[j] = -FLT_MAX;
      sga[j] = KT_MAX(sga[j + 1] - gpe, sa[j + 1] - gpo);
      sgb[j] = -FLT_MAX;
    }
  } else {
    for (int j = endb - 1; j > startb; j--) {
      sa[j] = -FLT_MAX;
      sga[j] = KT_MAX(sga[j + 1], sa[j + 1]) - tgpe;
      sgb[j] = -FLT_MAX;
    }
  }
  sa[startb] = -FLT_MAX;
  sga[startb] = -FLT_MAX;
  sgb[startb] = -FLT_MAX;

  int i = enda - starta;
  while (i--) {
    const float* subp = m.pr->subm + 23 * seq1[i];
    float pa = sa[endb];
    float pga = sga[endb];
    float pgb = sgb[endb];
    sa[endb] = -FLT_MAX;
    sga[endb] = -FLT_MAX;
    float xa = sa[endb];
    float xga = sga[endb];
    if (endb != m.len_b) {
      sgb[endb] = KT_MAX(pgb - gpe, pa - gpo);
    } else {
      sgb[endb] = KT_MAX(pgb, pa) - tgpe;
    }
    int j;
    for (j = endb - 1; j > startb; j--) {
      float ca = sa[j];
      pa = KT_MAX3(pa, pga - gpo, pgb - gpo);
      pa += subp[seq2[j]] - soff;
      if (m.bonus) pa += m.bonus[(int64_t)(starta + i) * m.bstride + j];
      sa[j] = pa;
      pga = sga[j];
      sga[j] = KT_MAX(xga - gpe, xa - gpo);
      pgb = sgb[j];
      sgb[j] = KT_MAX(pgb - gpe, ca - gpo);
      pa = ca;
      xa = sa[j];
      xga = sga[j];
    }
    float ca = sa[j];
    pa = KT_MAX3(pa, pga - gpo, pgb - gpo);
    pa += subp[seq2[j]] - soff;
    if (m.bonus) pa += m.bonus[(int64_t)(starta + i) * m.bstride + j];
    sa[j] = pa;
    sga[j] = -FLT_MAX;
    if (startb) {
      sgb[j] = KT_MAX(sgb[j] - gpe, ca - gpo);
    } else {
      sgb[j] = KT_MAX(sgb[j], ca) - tgpe;
    }
  }
}

/* ------------------------------------------------------------------ */
/* meetup: shared midpoint-combine machinery                           */
/* ------------------------------------------------------------------ */

struct MeetState {
  float max = -FLT_MAX, max2 = -FLT_MAX;
  int c = -1, c2 = -1;
  int tr = -1, tr2 = -1;

  inline void offer(float s, int trans, int i) {
    if (s > max) {
      max2 = max;
      c2 = c;
      tr2 = tr;
      max = s;
      tr = trans;
      c = i;
    } else if (s > max2) {
      max2 = s;
      c2 = i;
      tr2 = trans;
    }
  }
};

/* margin bookkeeping + flip perturbation, shared across the three
   meetup variants (aln_seqseq.c:375-414 et al.) */
static void finish_meet(AlnMem& m, MeetState& st, int* meet, int* trans,
                        float* score) {
  if (st.max2 > -FLT_MAX) {
    float margin = st.max - st.max2;
    if (m.flip_margins && m.margin_count < m.flip_margin_alloc) {
      m.flip_margins[m.margin_count] = margin;
    }
    m.margin_sum += margin;
    m.margin_count++;
  }
  if (m.flip_threshold > 0.0f && st.c2 >= 0 && st.max2 > -FLT_MAX) {
    float margin = st.max - st.max2;
    if (margin < m.flip_threshold) {
      if (m.flip_bit_map) {
        if (m.flip_counter < m.flip_n_uncertain) {
          int bit = m.flip_bit_map[m.flip_counter];
          if (bit >= 0 && ((1u << bit) & m.flip_mask)) {
            st.c = st.c2;
            st.tr = st.tr2;
          }
        }
      } else if (m.flip_mask != 0) {
        if ((1u << (m.flip_counter % m.flip_stride)) & m.flip_mask) {
          st.c = st.c2;
          st.tr = st.tr2;
        }
      } else if (m.flip_trial > 0) {
        if (m.flip_counter % m.flip_stride == m.flip_trial - 1) {
          st.c = st.c2;
          st.tr = st.tr2;
        }
      }
      m.flip_counter++;
    }
  }
  *meet = st.c;
  *trans = st.tr;
  *score = st.max;
}

static void meet_rr(AlnMem& m, const int oc[5], int* meet, int* trans,
                    float* score) {
  const float* fa = m.fa.data();
  const float* fga = m.fga.data();
  const float* fgb = m.fgb.data();
  const float* ba = m.ba.data();
  const float* bga = m.bga.data();
  const float* bgb = m.bgb.data();
  const float gpo = m.pr->gpo, gpe = m.pr->gpe, tgpe = m.pr->tgpe;
  const float middle = (float)(oc[3] - oc[2]) / 2.0f + (float)oc[2];
  MeetState st;
  for (int i = oc[2]; i < oc[3]; i++) {
    float sub = fabsf(middle - (float)i) / 1000.0f;
    st.offer(fa[i] + ba[i] - sub, 1, i);
    st.offer(fa[i] + bga[i] - gpo - sub, 2, i);
    st.offer(fa[i] + bgb[i] - gpo - sub, 3, i);
    st.offer(fga[i] + ba[i] - gpo - sub, 5, i);
    if (m.startb == 0) {
      st.offer(fgb[i] + bgb[i] - tgpe - sub, 6, i);
    } else {
      st.offer(fgb[i] + bgb[i] - gpe - sub, 6, i);
    }
    st.offer(fgb[i] + ba[i] - gpo - sub, 7, i);
  }
  {
    int i = oc[3];
    float sub = fabsf(middle - (float)i) / 1000.0f;
    st.offer(fa[i] + bgb[i] - gpo - sub, 3, i);
    if (m.endb == m.len_b) {
      st.offer(fgb[i] + bgb[i] - tgpe - sub, 6, i);
    } else {
      st.offer(fgb[i] + bgb[i] - gpe - sub, 6, i);
    }
  }
  finish_meet(m, st, meet, trans, score);
}

/* ------------------------------------------------------------------ */
/* profile x residues                                                  */
/* ------------------------------------------------------------------ */

static void fwd_pr(AlnMem& m) {
  float* sa = m.fa.data();
  float* sga = m.fga.data();
  float* sgb = m.fgb.data();
  const float* p1 = m.prof1 + ((int64_t)m.starta << 6);
  const uint8_t* seq2 = m.seq2 - 1;
  const int startb = m.startb, endb = m.endb;
  const float open = m.pr->gpo * m.sip;
  const float ext = m.pr->gpe * m.sip;
  const float text = m.pr->tgpe * m.sip;

  sa[startb] = sa[0];
  sga[startb] = sga[0];
  sgb[startb] = sgb[0];
  if (startb) {
    for (int j = startb + 1; j < endb; j++) {
      sa[j] = -FLT_MAX;
      sga[j] = KT_MAX(sga[j - 1] - ext, sa[j - 1] - open);
      sgb[j] = -FLT_MAX;
    }
  } else {
    for (int j = startb + 1; j < endb; j++) {
      sa[j] = -FLT_MAX;
      sga[j] = KT_MAX(sga[j - 1], sa[j - 1]) - text;
      sgb[j] = -FLT_MAX;
    }
  }
  sa[endb] = -FLT_MAX;
  sga[endb] = -FLT_MAX;
  sgb[endb] = -FLT_MAX;

  for (int i = m.starta; i < m.enda; i++) {
    p1 += 64;
    float pa = sa[startb];
    float pga = sga[startb];
    float pgb = sgb[startb];
    sa[startb] = -FLT_MAX;
    sga[startb] = -FLT_MAX;
    float xa = sa[startb];
    float xga = sga[startb];
    if (startb) {
      sgb[startb] = KT_MAX(pgb + p1[28], pa + p1[27]);
    } else {
      sgb[startb] = KT_MAX(pgb, pa) + p1[29];
    }
    int j;
    for (j = startb + 1; j < endb; j++) {
      float ca = sa[j];
      pa = KT_MAX3(pa, pga - open, pgb + p1[-37]);
      pa += p1[32 + seq2[j]];
      if (m.bonus) pa += m.bonus[(int64_t)i * m.bstride + j];
      sa[j] = pa;
      pga = sga[j];
      sga[j] = KT_MAX(xga - ext, xa - open);
      pgb = sgb[j];
      sgb[j] = KT_MAX(pgb + p1[28], ca + p1[27]);
      pa = ca;
      xa = sa[j];
      xga = sga[j];
    }
    float ca = sa[j];
    pa = KT_MAX3(pa, pga - open, pgb + p1[-37]);
    pa += p1[32 + seq2[j]];
    if (m.bonus) pa += m.bonus[(int64_t)i * m.bstride + j];
    sa[j] = pa;
    sga[j] = -FLT_MAX;
    if (endb != m.len_b) {
      sgb[j] = KT_MAX(sgb[j] + p1[28], ca + p1[27]);
    } else {
      sgb[j] = KT_MAX(sgb[j], ca) + p1[29];
    }
  }
}

static void bwd_pr(AlnMem& m) {
  float* sa = m.ba.data();
  float* sga = m.bga.data();
  float* sgb = m.bgb.data();
  const float* p1 = m.prof1 + ((int64_t)(m.enda2 + 1) << 6);
  const uint8_t* seq2 = m.seq2;
  const int startb = m.startb, endb = m.endb;
  const float open = m.pr->gpo * m.sip;
  const float ext = m.pr->gpe * m.sip;
  const float text = m.pr->tgpe * m.sip;

  sa[endb] = sa[0];
  sga[endb] = sga[0];
  sgb[endb] = sgb[0];
  if (endb != m.len_b) {
    for (int j = endb - 1; j > startb; j--) {
      sa[j] = -FLT_MAX;
      sga[j] = KT_MAX(sga[j + 1] - ext, sa[j + 1] - open);
      sgb[j] = -FLT_MAX;
    }
  } else {
    for (int j = endb - 1; j > startb; j--) {
      sa[j] = -FLT_MAX;
      sga[j] = KT_MAX(sga[j + 1], sa[j + 1]) - text;
      sgb[j] = -FLT_MAX;
    }
  }
  sa[startb] = -FLT_MAX;
  sga[startb] = -FLT_MAX;
  sgb[startb] = -FLT_MAX;

  int i = m.enda2 - m.starta2;
  while (i--) {
    p1 -= 64;
    float pa = sa[endb];
    float pga = sga[endb];
    float pgb = sgb[endb];
    sa[endb] = -FLT_MAX;
    sga[endb] = -FLT_MAX;
    float xa = sa[endb];
    float xga = sga[endb];
    if (endb != m.len_b) {
      sgb[endb] = KT_MAX(pgb + p1[28], pa + p1[27]);
    } else {
      sgb[endb] = KT_MAX(pgb, pa) + p1[29];
    }
    int j;
    for (j = endb - 1; j > startb; j--) {
      float ca = sa[j];
      pa = KT_MAX3(pa, pga - open, pgb + p1[91]);
      pa += p1[32 + seq2[j]];
      if (m.bonus) pa += m.bonus[(int64_t)(m.starta2 + i) * m.bstride + j];
      sa[j] = pa;
      pga = sga[j];
      sga[j] = KT_MAX(xga - ext, xa - open);
      pgb = sgb[j];
      sgb[j] = KT_MAX(pgb + p1[28], ca + p1[27]);
      pa = ca;
      xa = sa[j];
      xga = sga[j];
    }
    float ca = sa[j];
    pa = KT_MAX3(pa, pga - open, pgb + p1[91]);
    pa += p1[32 + seq2[j]];
    if (m.bonus) pa += m.bonus[(int64_t)(m.starta2 + i) * m.bstride + j];
    sa[j] = pa;
    sga[j] = -FLT_MAX;
    if (startb) {
      sgb[j] = KT_MAX(sgb[j] + p1[28], ca + p1[27]);
    } else {
      sgb[j] = KT_MAX(sgb[j], ca) + p1[29];
    }
  }
}

static void meet_pr(AlnMem& m, const int oc[5], int* meet, int* trans,
                    float* score) {
  const float* fa = m.fa.data();
  const float* fga = m.fga.data();
  const float* fgb = m.fgb.data();
  const float* ba = m.ba.data();
  const float* bga = m.bga.data();
  const float* bgb = m.bgb.data();
  const float sip = (float)m.sip;
  const float open = m.pr->gpo * sip;
  const float* p1 = m.prof1 + ((int64_t)(oc[4] + 1) << 6);
  const float middle = (float)(oc[3] - oc[2]) / 2.0f + (float)oc[2];
  MeetState st;
  for (int i = oc[2]; i < oc[3]; i++) {
    float sub = fabsf(middle - (float)i) / 1000.0f;
    st.offer(fa[i] + ba[i] - sub, 1, i);
    st.offer(fa[i] + bga[i] - open - sub, 2, i);
    st.offer(fa[i] + bgb[i] + p1[27] - sub, 3, i);
    st.offer(fga[i] + ba[i] - open - sub, 5, i);
    if (m.startb == 0) {
      st.offer(fgb[i] + bgb[i] + p1[29] - sub, 6, i);
    } else {
      st.offer(fgb[i] + bgb[i] + p1[28] - sub, 6, i);
    }
    st.offer(fgb[i] + ba[i] + p1[-37] - sub, 7, i);
  }
  {
    int i = oc[3];
    float sub = fabsf(middle - (float)i) / 1000.0f;
    st.offer(fa[i] + bgb[i] + p1[27] - sub, 3, i);
    if (m.endb == m.len_b) {
      st.offer(fgb[i] + bgb[i] + p1[29] - sub, 6, i);
    } else {
      st.offer(fgb[i] + bgb[i] + p1[28] - sub, 6, i);
    }
  }
  finish_meet(m, st, meet, trans, score);
}

/* ------------------------------------------------------------------ */
/* profile x profile                                                   */
/* ------------------------------------------------------------------ */

static void fwd_pp(AlnMem& m) {
  unsigned int freq[24];
  float* sa = m.fa.data();
  float* sga = m.fga.data();
  float* sgb = m.fgb.data();
  const float* p1 = m.prof1 + ((int64_t)m.starta << 6);
  const float* p2 = m.prof2 + ((int64_t)m.startb << 6);
  const int startb = m.startb, endb = m.endb;

  sa[startb] = sa[0];
  sga[startb] = sga[0];
  sgb[startb] = sgb[0];
  if (startb) {
    for (int j = startb + 1; j < endb; j++) {
      p2 += 64;
      sa[j] = -FLT_MAX;
      sga[j] = KT_MAX(sga[j - 1] + p2[28], sa[j - 1] + p2[27]);
      sgb[j] = -FLT_MAX;
    }
    p2 += 64;
  } else {
    for (int j = startb + 1; j < endb; j++) {
      p2 += 64;
      sa[j] = -FLT_MAX;
      sga[j] = KT_MAX(sga[j - 1], sa[j - 1]) + p2[29];
      sgb[j] = -FLT_MAX;
    }
    p2 += 64;
  }
  p2 -= (int64_t)(endb - startb) << 6;
  sa[endb] = -FLT_MAX;
  sga[endb] = -FLT_MAX;
  sgb[endb] = -FLT_MAX;

  for (int i = m.starta; i < m.enda; i++) {
    p1 += 64;
    int f = 0;
    for (int j = 0; j < 23; j++) {
      if (p1[j]) freq[f++] = j;
    }
    f--;

    float pa = sa[startb];
    float pga = sga[startb];
    float pgb = sgb[startb];
    sa[startb] = -FLT_MAX;
    sga[startb] = -FLT_MAX;
    float xa = sa[startb];
    float xga = sga[startb];
    if (startb) {
      sgb[startb] = KT_MAX(pgb + p1[28], pa + p1[27]);
    } else {
      sgb[startb] = KT_MAX(pgb, pa) + p1[29];
    }
    int j;
    for (j = startb + 1; j < endb; j++) {
      p2 += 64;
      float ca = sa[j];
      pa = KT_MAX3(pa, pga + p2[-37], pgb + p1[-37]);
      for (int c = f; c >= 0; c--) {
        pa += p1[freq[c]] * p2[32 + freq[c]];
      }
      if (m.bonus) pa += m.bonus[(int64_t)i * m.bstride + j];
      sa[j] = pa;
      pga = sga[j];
      sga[j] = KT_MAX(xga + p2[28], xa + p2[27]);
      pgb = sgb[j];
      sgb[j] = KT_MAX(pgb + p1[28], ca + p1[27]);
      pa = ca;
      xa = sa[j];
      xga = sga[j];
    }
    p2 += 64;
    float ca = sa[j];
    pa = KT_MAX3(pa, pga + p2[-37], pgb + p1[-37]);
    for (int c = f; c >= 0; c--) {
      pa += p1[freq[c]] * p2[32 + freq[c]];
    }
    if (m.bonus) pa += m.bonus[(int64_t)i * m.bstride + j];
    sa[j] = pa;
    sga[j] = -FLT_MAX;
    if (endb != m.len_b) {
      sgb[j] = KT_MAX(sgb[j] + p1[28], ca + p1[27]);
    } else {
      sgb[j] = KT_MAX(sgb[j], ca) + p1[29];
    }
    p2 -= (int64_t)(endb - startb) << 6;
  }
}

static void bwd_pp(AlnMem& m) {
  unsigned int freq[24];
  float* sa = m.ba.data();
  float* sga = m.bga.data();
  float* sgb = m.bgb.data();
  const float* p1 = m.prof1 + ((int64_t)(m.enda2 + 1) << 6);
  const float* p2 = m.prof2 + ((int64_t)(m.endb + 1) << 6);
  const int startb = m.startb, endb = m.endb;

  sa[endb] = sa[0];
  sga[endb] = sga[0];
  sgb[endb] = sgb[0];
  if (endb != m.len_b) {
    for (int j = endb - 1; j > startb; j--) {
      p2 -= 64;
      sa[j] = -FLT_MAX;
      sga[j] = KT_MAX(sga[j + 1] + p2[28], sa[j + 1] + p2[27]);
      sgb[j] = -FLT_MAX;
    }
    p2 -= 64;
  } else {
    for (int j = endb - 1; j > startb; j--) {
      p2 -= 64;
      sa[j] = -FLT_MAX;
      sga[j] = KT_MAX(sga[j + 1], sa[j + 1]) + p2[29];
      sgb[j] = -FLT_MAX;
    }
    p2 -= 64;
  }
  sa[startb] = -FLT_MAX;
  sga[startb] = -FLT_MAX;
  sgb[startb] = -FLT_MAX;

  int i = m.enda2 - m.starta2;
  while (i--) {
    p1 -= 64;
    int f = 0;
    for (int j = 0; j < 23; j++) {
      if (p1[j]) freq[f++] = j;
    }
    f--;

    float pa = sa[endb];
    float pga = sga[endb];
    float pgb = sgb[endb];
    sa[endb] = -FLT_MAX;
    sga[endb] = -FLT_MAX;
    float xa = sa[endb];
    float xga = sga[endb];
    if (endb != m.len_b) {
      sgb[endb] = KT_MAX(pgb + p1[28], pa + p1[27]);
    } else {
      sgb[endb] = KT_MAX(pgb, pa) + p1[29];
    }
    p2 += (int64_t)(endb - startb) << 6;
    int j;
    for (j = endb - 1; j > startb; j--) {
      p2 -= 64;
      float ca = sa[j];
      pa = KT_MAX3(pa, pga + p2[91], pgb + p1[91]);
      for (int c = f; c >= 0; c--) {
        pa += p1[freq[c]] * p2[32 + freq[c]];
      }
      if (m.bonus) pa += m.bonus[(int64_t)(m.starta2 + i) * m.bstride + j];
      sa[j] = pa;
      pga = sga[j];
      sga[j] = KT_MAX(xga + p2[28], xa + p2[27]);
      pgb = sgb[j];
      sgb[j] = KT_MAX(pgb + p1[28], ca + p1[27]);
      pa = ca;
      xa = sa[j];
      xga = sga[j];
    }
    p2 -= 64;
    float ca = sa[j];
    pa = KT_MAX3(pa, pga + p2[91], pgb + p1[91]);
    for (int c = f; c >= 0; c--) {
      pa += p1[freq[c]] * p2[32 + freq[c]];
    }
    if (m.bonus) pa += m.bonus[(int64_t)(m.starta2 + i) * m.bstride + j];
    sa[j] = pa;
    sga[j] = -FLT_MAX;
    if (startb) {
      sgb[j] = KT_MAX(sgb[j] + p1[28], ca + p1[27]);
    } else {
      sgb[j] = KT_MAX(sgb[j], ca) + p1[29];
    }
  }
}

static void meet_pp(AlnMem& m, const int oc[5], int* meet, int* trans,
                    float* score) {
  const float* fa = m.fa.data();
  const float* fga = m.fga.data();
  const float* fgb = m.fgb.data();
  const float* ba = m.ba.data();
  const float* bga = m.bga.data();
  const float* bgb = m.bgb.data();
  const float* p1 = m.prof1 + ((int64_t)(oc[4] + 1) << 6);
  const float* p2 = m.prof2 + ((int64_t)oc[2] << 6);
  const float middle = (float)(oc[3] - oc[2]) / 2.0f + (float)oc[2];
  MeetState st;
  for (int i = oc[2]; i < oc[3]; i++) {
    float sub = fabsf(middle - (float)i) / 1000.0f;
    p2 += 64;
    st.offer(fa[i] + ba[i] - sub, 1, i);
    st.offer(fa[i] + bga[i] + p2[27] - sub, 2, i);
    st.offer(fa[i] + bgb[i] + p1[27] - sub, 3, i);
    st.offer(fga[i] + ba[i] + p2[-37] - sub, 5, i);
    if (m.startb == 0) {
      st.offer(fgb[i] + bgb[i] + p1[29] - sub, 6, i);
    } else {
      st.offer(fgb[i] + bgb[i] + p1[28] - sub, 6, i);
    }
    st.offer(fgb[i] + ba[i] + p1[-37] - sub, 7, i);
  }
  {
    int i = oc[3];
    float sub = fabsf(middle - (float)i) / 1000.0f;
    st.offer(fa[i] + bgb[i] + p1[27] - sub, 3, i);
    if (m.endb == m.len_b) {
      st.offer(fgb[i] + bgb[i] + p1[29] - sub, 6, i);
    } else {
      st.offer(fgb[i] + bgb[i] + p1[28] - sub, 6, i);
    }
  }
  finish_meet(m, st, meet, trans, score);
}

/* ------------------------------------------------------------------ */
/* divide-and-conquer controller (aln_controller.c:21-436)             */
/* ------------------------------------------------------------------ */

static void continue_align(AlnMem& m, const float in[6], const int oc[5],
                           int meet, int transition);

void run_align(AlnMem& m) {
  if (m.starta >= m.enda) return;
  if (m.startb >= m.endb) return;

  float in[6] = {m.fa[0], m.fga[0], m.fgb[0], m.ba[0], m.bga[0], m.bgb[0]};
  int mid = ((m.enda - m.starta) / 2) + m.starta;
  int oc[5] = {m.starta, m.enda, m.startb, m.endb, mid};

  m.enda = mid;
  m.starta2 = mid;
  m.enda2 = oc[1];

  int meet, transition;
  float score;
  if (m.seq1) {
    fwd_rr(m);
    bwd_rr(m);
    meet_rr(m, oc, &meet, &transition, &score);
  } else if (m.prof2) {
    fwd_pp(m);
    bwd_pp(m);
    meet_pp(m, oc, &meet, &transition, &score);
  } else {
    fwd_pr(m);
    bwd_pr(m);
    meet_pr(m, oc, &meet, &transition, &score);
  }
  if (m.score_only) {
    m.score = score;
  } else {
    continue_align(m, in, oc, meet, transition);
  }
}

static void continue_align(AlnMem& m, const float in[6], const int oc[5],
                           int meet, int transition) {
  int* path = m.path.data();
  switch (transition) {
    case 1: /* match -> match */
      path[oc[4]] = meet;
      path[oc[4] + 1] = meet + 1;
      m.fa[0] = in[0];
      m.fga[0] = in[1];
      m.fgb[0] = in[2];
      m.ba[0] = 0.0f;
      m.bga[0] = -FLT_MAX;
      m.bgb[0] = -FLT_MAX;
      m.starta = oc[0];
      m.enda = oc[4] - 1;
      m.startb = oc[2];
      m.endb = meet - 1;
      run_align(m);
      m.starta = oc[4] + 1;
      m.enda = oc[1];
      m.startb = meet + 1;
      m.endb = oc[3];
      m.fa[0] = 0.0f;
      m.fga[0] = -FLT_MAX;
      m.fgb[0] = -FLT_MAX;
      m.ba[0] = in[3];
      m.bga[0] = in[4];
      m.bgb[0] = in[5];
      run_align(m);
      break;
    case 2: /* match -> gap-in-row */
      path[oc[4]] = meet;
      m.fa[0] = in[0];
      m.fga[0] = in[1];
      m.fgb[0] = in[2];
      m.ba[0] = 0.0f;
      m.bga[0] = -FLT_MAX;
      m.bgb[0] = -FLT_MAX;
      m.starta = oc[0];
      m.enda = oc[4] - 1;
      m.startb = oc[2];
      m.endb = meet - 1;
      run_align(m);
      m.starta = oc[4];
      m.enda = oc[1];
      m.startb = meet + 1;
      m.endb = oc[3];
      m.fa[0] = -FLT_MAX;
      m.fga[0] = 0.0f;
      m.fgb[0] = -FLT_MAX;
      m.ba[0] = in[3];
      m.bga[0] = in[4];
      m.bgb[0] = in[5];
      run_align(m);
      break;
    case 3: /* match -> gap-in-col */
      path[oc[4]] = meet;
      m.fa[0] = in[0];
      m.fga[0] = in[1];
      m.fgb[0] = in[2];
      m.ba[0] = 0.0f;
      m.bga[0] = -FLT_MAX;
      m.bgb[0] = -FLT_MAX;
      m.starta = oc[0];
      m.enda = oc[4] - 1;
      m.startb = oc[2];
      m.endb = meet - 1;
      run_align(m);
      m.starta = oc[4] + 1;
      m.enda = oc[1];
      m.startb = meet;
      m.endb = oc[3];
      m.fa[0] = -FLT_MAX;
      m.fga[0] = -FLT_MAX;
      m.fgb[0] = 0.0f;
      m.ba[0] = in[3];
      m.bga[0] = in[4];
      m.bgb[0] = in[5];
      run_align(m);
      break;
    case 5: /* gap-in-row -> match */
      path[oc[4] + 1] = meet + 1;
      m.fa[0] = in[0];
      m.fga[0] = in[1];
      m.fgb[0] = in[2];
      m.ba[0] = -FLT_MAX;
      m.bga[0] = 0.0f;
      m.bgb[0] = -FLT_MAX;
      m.starta = oc[0];
      m.enda = oc[4];
      m.startb = oc[2];
      m.endb = meet - 1;
      run_align(m);
      m.starta = oc[4] + 1;
      m.enda = oc[1];
      m.startb = meet + 1;
      m.endb = oc[3];
      m.fa[0] = 0.0f;
      m.fga[0] = -FLT_MAX;
      m.fgb[0] = -FLT_MAX;
      m.ba[0] = in[3];
      m.bga[0] = in[4];
      m.bgb[0] = in[5];
      run_align(m);
      break;
    case 6: /* gap-in-col -> gap-in-col */
      m.fa[0] = in[0];
      m.fga[0] = in[1];
      m.fgb[0] = in[2];
      m.ba[0] = -FLT_MAX;
      m.bga[0] = -FLT_MAX;
      m.bgb[0] = 0.0f;
      m.starta = oc[0];
      m.enda = oc[4] - 1;
      m.startb = oc[2];
      m.endb = meet;
      run_align(m);
      m.starta = oc[4] + 1;
      m.enda = oc[1];
      m.startb = meet;
      m.endb = oc[3];
      m.fa[0] = -FLT_MAX;
      m.fga[0] = -FLT_MAX;
      m.fgb[0] = 0.0f;
      m.ba[0] = in[3];
      m.bga[0] = in[4];
      m.bgb[0] = in[5];
      run_align(m);
      break;
    case 7: /* gap-in-col -> match */
      path[oc[4] + 1] = meet + 1;
      m.fa[0] = in[0];
      m.fga[0] = in[1];
      m.fgb[0] = in[2];
      m.ba[0] = -FLT_MAX;
      m.bga[0] = -FLT_MAX;
      m.bgb[0] = 0.0f;
      m.starta = oc[0];
      m.enda = oc[4] - 1;
      m.startb = oc[2];
      m.endb = meet;
      run_align(m);
      m.starta = oc[4] + 1;
      m.enda = oc[1];
      m.startb = meet + 1;
      m.endb = oc[3];
      m.fa[0] = 0.0f;
      m.fga[0] = -FLT_MAX;
      m.fgb[0] = -FLT_MAX;
      m.ba[0] = in[3];
      m.bga[0] = in[4];
      m.bgb[0] = in[5];
      run_align(m);
      break;
    default:
      break;
  }
}

/* ------------------------------------------------------------------ */
/* path post-processing                                                */
/* ------------------------------------------------------------------ */

void mirror_path(AlnMem& m, int len_a, int len_b) {
  int* apath = m.path.data();
  int* opath = m.tmp_path.data();
  for (int i = 0; i < len_a + 2; i++) opath[i] = -1;
  for (int i = 1; i <= len_b; i++) {
    if (apath[i] != -1) opath[apath[i]] = i;
  }
  std::swap(m.path, m.tmp_path);
}

/* Reference add_gap_info_to_path_n (aln_setup.c:121-228): converts the
 * raw column-match path to 0/1/2 steps.  Its gap open/close bit loop
 * tests the sentinel slot and therefore never runs; only terminal-gap
 * flags (bit 32) are applied.  Reproduced as-is for parity. */
void path_to_steps_default(AlnMem& m) {
  const int len_a = m.len_a;
  const int len_b = m.len_b;
  int* path = m.path.data();
  int* o = m.tmp_path.data();
  for (int i = 0; i < len_a + len_b + 2; i++) o[i] = 0;

  int j = 1;
  int b = -1;
  if (path[1] == -1) {
    o[j++] = 2;
  } else {
    if (path[1] != 1) {
      for (int a = 0; a < path[1] - 1; a++) o[j++] = 1;
      o[j++] = 0;
    } else {
      o[j++] = 0;
    }
  }
  b = path[1];
  for (int i = 2; i <= len_a; i++) {
    if (path[i] == -1) {
      o[j++] = 2;
    } else {
      if (path[i] - 1 != b && b != -1) {
        for (int a = 0; a < path[i] - b - 1; a++) o[j++] = 1;
        o[j++] = 0;
      } else {
        o[j++] = 0;
      }
    }
    b = path[i];
  }
  if (path[len_a] < len_b && path[len_a] != -1) {
    for (int a = 0; a < len_b - path[len_a]; a++) o[j++] = 1;
  }
  o[0] = j - 1;
  o[j] = 3;
  /* (dead gap-bit annotation loop omitted: reference condition is never
     true, aln_setup.c:196) */
  int i = 1;
  while (o[i] != 0) {
    o[i] |= 32;
    i++;
  }
  i = o[0];
  while (o[i] != 0) {
    o[i] |= 32;
    i--;
  }
  std::swap(m.path, m.tmp_path);
}

/* Fixed converter used by refinement (convert_raw_path,
 * aln_refine.c:590-672): correct b_last tracking + full gap-bit pass. */
void path_to_steps_fixed(AlnMem& m) {
  const int len_a = m.len_a;
  const int len_b = m.len_b;
  int* path = m.path.data();
  int* o = m.tmp_path.data();
  for (int i = 0; i < len_a + len_b + 2; i++) o[i] = 0;

  int j = 1;
  int b_last = 0;
  for (int i = 1; i <= len_a; i++) {
    if (path[i] == -1) {
      o[j++] = 2;
    } else {
      for (int a = b_last + 1; a < path[i]; a++) o[j++] = 1;
      o[j++] = 0;
      b_last = path[i];
    }
  }
  for (int a = b_last + 1; a <= len_b; a++) o[j++] = 1;

  o[0] = j - 1;
  o[j] = 3;

  int i = 2;
  while (o[i] != 3) {
    if ((o[i - 1] & 3) && !(o[i] & 3)) {
      if (o[i - 1] & 8) {
        o[i - 1] += 8;
      } else {
        o[i - 1] |= 16;
      }
    } else if (!(o[i - 1] & 3) && (o[i] & 3)) {
      o[i] |= 4;
    } else if ((o[i - 1] & 1) && (o[i] & 1)) {
      o[i] |= 8;
    } else if ((o[i - 1] & 2) && (o[i] & 2)) {
      o[i] |= 8;
    }
    i++;
  }
  i = 1;
  while (o[i] != 0) {
    o[i] |= 32;
    i++;
  }
  i = o[0];
  while (o[i] != 0) {
    o[i] |= 32;
    i--;
  }
  std::swap(m.path, m.tmp_path);
}

}  // namespace kt
