import jax
jax.config.update('jax_platforms','cpu')
import numpy as np, random
from kalign_tpu.core import params as P
from kalign_tpu import engine as E
from kalign_tpu.tpu.engine import TpuEngine
from kalign_tpu.tpu.profile import leaf_profile

def score_alignment(s1, s2, steps, subm, gpo, gpe, tgpe):
    """Reference gap model: interior run costs gpo + (len-1)*gpe and an
    extra gpo when closed into a match; terminal runs cost tgpe*len,
    leading terminal runs also pay the close gpo."""
    n = len(steps); term = np.zeros(n, bool)
    i = 0
    while i < n and steps[i] != 0: term[i]=True; i+=1
    i = n-1
    while i >= 0 and steps[i] != 0: term[i]=True; i-=1
    sc = 0.0; p1=p2=0; prev=0
    for c in range(n):
        s = steps[c]
        if s == 0:
            if prev != 0:  # close charge
                sc -= gpo
            sc += float(subm[s1[p1], s2[p2]]); p1+=1; p2+=1
        else:
            if term[c]: sc -= tgpe
            elif s != prev: sc -= gpo
            else: sc -= gpe
            if s == 1: p2 += 1
            else: p1 += 1
        prev = s
    return sc

rng = random.Random(int(__import__('sys').argv[1]) if len(__import__('sys').argv)>1 else 3)
ap = P.aln_param_init(P.BIOTYPE_PROTEIN, 0)
eng = TpuEngine(); host = E.get_engine("host")
bad = same_count = 0
N = 40
for trial in range(N):
    l1 = rng.randint(20, 200)
    s1 = np.array([rng.randrange(20) for _ in range(l1)], dtype=np.uint8)
    s2 = s1.copy().tolist()
    for _ in range(l1//3):
        op = rng.random(); pos = rng.randrange(len(s2))
        if op < .5: s2[pos] = rng.randrange(20)
        elif op < .75 and len(s2)>10: del s2[pos]
        else: s2.insert(pos, rng.randrange(20))
    s2 = np.array(s2, dtype=np.uint8); l2 = len(s2)
    tasks = np.array([[0,1,2]], dtype=np.int32)
    gaps, conf = host.align([s1, s2], tasks, ap, None, 0)
    def gcols(g):
        g = np.asarray(g); return np.cumsum(g[:-1]+1)-1
    c1, c2 = gcols(gaps[0]), gcols(gaps[1])
    ncol = max(c1.max(), c2.max())+1
    m1 = np.zeros(ncol, bool); m1[c1]=True
    m2 = np.zeros(ncol, bool); m2[c2]=True
    steps_host = np.where(m1&m2, 0, np.where(m2, 1, 2)).astype(np.int8)
    sc_host = score_alignment(s1, s2, steps_host, ap.subm, ap.gpo, ap.gpe, ap.tgpe)
    pa = leaf_profile(s1, ap.subm, ap.gpo, ap.gpe, ap.tgpe, 0.0)
    pb = leaf_profile(s2, ap.subm, ap.gpo, ap.gpe, ap.tgpe, 0.0)
    if l1 <= l2:
        steps_tpu, sc = eng._dp(pa, pb, 1, 1, None)
    else:
        st, sc = eng._dp(pb, pa, 1, 1, None)
        steps_tpu = np.where(st==1, 2, np.where(st==2, 1, 0)).astype(np.int8)
    sc_tpu = score_alignment(s1, s2, steps_tpu, ap.subm, ap.gpo, ap.gpe, ap.tgpe)
    if np.array_equal(steps_host, steps_tpu): same_count += 1
    if abs(sc_host-sc_tpu) > 1e-2 or abs(sc_tpu - float(sc)) > 1e-2:
        bad += 1
        print(f"trial {trial}: l1={l1} l2={l2} host={sc_host:.2f} tpu={sc_tpu:.2f} dp={float(sc):.2f}")
print(f"bad: {bad}/{N}, identical paths: {same_count}/{N}")
