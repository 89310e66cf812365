import sys, time, jax, numpy as np
import jax.numpy as jnp
sys.path.insert(0,"/root/repo")
from kalign_tpu.tpu.gotoh_pallas import gotoh_forward_pallas
from kalign_tpu.tpu import gotoh

# correctness on device vs XLA-on-cpu
cpu = jax.devices("cpu")[0]
rng = np.random.default_rng(3)
B, L1, L2 = 8, 128, 128
match = rng.normal(size=(B, L1, L2)).astype(np.float32) * 3
pc = np.tile(np.array([-7.0,-1.25,-1.0],np.float32)[None,:,None],(B,1,L2+1))
pr = np.tile(np.array([-7.0,-1.25,-1.0],np.float32)[None,:,None],(B,1,L1+1))
la = rng.integers(L1//2, L1+1, size=B).astype(np.int32)
lb = rng.integers(L2//2, L2+1, size=B).astype(np.int32)
dec_p, score_p, st_p = gotoh_forward_pallas(jnp.asarray(match), jnp.asarray(pc), jnp.asarray(pr), jnp.asarray(la), jnp.asarray(lb), bt=8)
with jax.default_device(cpu):
    ref = jax.vmap(lambda m,c,r,a,b: gotoh.gotoh_forward(m,c[0],c[1],c[2],r[0],r[1],r[2],a,b))(
        jnp.asarray(match), jnp.asarray(pc), jnp.asarray(pr), jnp.asarray(la), jnp.asarray(lb))
dec_x, score_x, st_x = [np.asarray(x) for x in ref]
dp = np.asarray(dec_p)
bad = sum(1 for b in range(B) if (dp[b, :la[b], :lb[b]+1] != dec_x[b, 1:la[b]+1, :lb[b]+1]).any())
print("device correctness: score diff", np.abs(np.asarray(score_p)-score_x).max(), "dec bad:", bad)

for (B, L, bt) in [(64,256,8), (256,256,32), (64,512,16), (256,512,32), (512,1024,32)]:
    rng = np.random.default_rng(0)
    match = jnp.asarray(rng.normal(size=(B, L, L)).astype(np.float32))
    pcx = jnp.asarray(np.tile(np.array([-7.0,-1.25,-1.0],np.float32)[None,:,None],(B,1,L+1)))
    la = jnp.full((B,), L-3, jnp.int32); lb = jnp.full((B,), L-5, jnp.int32)
    out = gotoh_forward_pallas(match, pcx, pcx, la, lb, bt=bt)
    jax.block_until_ready(out)
    iters = 10
    t0=time.time()
    for _ in range(iters):
        out = gotoh_forward_pallas(match, pcx, pcx, la, lb, bt=bt)
    jax.block_until_ready(out)
    dt=(time.time()-t0)/iters
    print(f"B={B} L={L} bt={bt}: {dt*1000:.2f} ms GCUPS {B*L*L/dt/1e9:.2f}")
