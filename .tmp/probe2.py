import sys, time, jax, numpy as np
import jax.numpy as jnp
from functools import partial
NEG = jnp.float32(-3.4e38)

def forward_minimal(match, goB, geB, tgeB, goA, geA, tgeA, la, lb, emit_dec, dec_dtype):
    L1p, L2p = match.shape
    cols = jnp.arange(L2p + 1)
    col_valid = cols <= lb
    is_last_col = cols == lb
    csum = jnp.cumsum(jnp.where(cols == 0, 0.0, tgeB))
    GA0 = jnp.where((cols >= 1) & col_valid, csum, NEG)
    A0 = jnp.where(cols == 0, 0.0, NEG).astype(jnp.float32)
    GB0 = jnp.full(L2p + 1, NEG)
    rows = jnp.arange(1, L1p + 1)
    def step(carry, xs):
        A_prev, GA_prev, GB_prev = carry
        i, m_row, goA_i, geA_i, tgeA_i, goA_prev = xs
        row_valid = i <= la
        is_last_row = i == la
        diag = jnp.maximum(jnp.maximum(A_prev[:-1], GA_prev[:-1] + goB[:-1]), GB_prev[:-1] + goA_prev) + m_row
        A_row = jnp.where(col_valid & (cols > 0), jnp.pad(diag, (1,0), constant_values=NEG), NEG)
        is_term_col = (cols == 0) | is_last_col
        ge_eff = jnp.where(is_term_col, tgeA_i, geA_i)
        go_eff = jnp.where(is_term_col, tgeA_i, goA_i)
        GB_row = jnp.maximum(GB_prev + ge_eff, A_prev + go_eff)
        GB_row = jnp.where(col_valid, GB_row, NEG)
        ge_row = jnp.where(is_last_row, tgeB, geB)
        go_row = jnp.where(is_last_row, tgeB, goB)
        C = jnp.cumsum(jnp.where(cols == 0, 0.0, ge_row))
        u = A_row[:-1] + go_row[1:] - C[1:]
        GA_row = jnp.where(col_valid & (cols > 0), jnp.pad(jax.lax.cummax(u) + C[1:], (1,0), constant_values=NEG), NEG)
        A_out = jnp.where(row_valid, A_row, A_prev)
        GA_out = jnp.where(row_valid, GA_row, GA_prev)
        GB_out = jnp.where(row_valid, GB_row, GB_prev)
        if emit_dec:
            dec = (A_row > GA_row).astype(dec_dtype) | ((GB_row > A_row).astype(dec_dtype) << 1)
        else:
            dec = jnp.float32(0.0)
        return (A_out, GA_out, GB_out), dec
    xs = (rows, match, goA[1:], geA[1:], tgeA[1:], jax.lax.dynamic_slice_in_dim(goA, 0, L1p))
    (A_f, GA_f, GB_f), dec = jax.lax.scan(step, (A0, GA0, GB0), xs)
    return jnp.maximum(jnp.maximum(A_f[lb], GA_f[lb]), GB_f[lb]), dec

mode = sys.argv[1]
B, L = 64, 256
rng = np.random.default_rng(0)
match = jnp.asarray(rng.normal(size=(B, L, L)).astype(np.float32))
p = jnp.asarray(np.tile(np.float32(-7.0), (B, L+1)))
la = jnp.full((B,), L-3, jnp.int32); lb = jnp.full((B,), L-5, jnp.int32)
emit = mode != "nodec"
dt_ = jnp.int8 if mode == "int8" else jnp.int32
f = jax.jit(jax.vmap(partial(forward_minimal, emit_dec=emit, dec_dtype=dt_)))
t0=time.time(); c = f.lower(match,p,p,p,p,p,p,la,lb).compile(); print(mode, "compile", round(time.time()-t0,1))
t0=time.time()
for _ in range(10): out = c(match,p,p,p,p,p,p,la,lb)
jax.block_until_ready(out)
dt=(time.time()-t0)/10
print(mode, f"per-launch {dt*1000:.2f} ms GCUPS {B*L*L/dt/1e9:.2f}")
