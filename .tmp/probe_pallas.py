import sys, time, jax, numpy as np
import jax.numpy as jnp
sys.path.insert(0,"/root/repo")
from kalign_tpu.tpu.gotoh_pallas import gotoh_forward_pallas
B, L, bt = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
rng = np.random.default_rng(0)
match = jnp.asarray(rng.normal(size=(B, L, L)).astype(np.float32))
pc = jnp.asarray(np.tile(np.array([-7.0,-1.25,-1.0],np.float32)[None,:,None],(B,1,L+1)))
pr = pc
la = jnp.full((B,), L-3, jnp.int32); lb = jnp.full((B,), L-5, jnp.int32)
t0=time.time()
out = gotoh_forward_pallas(match, pc, pr, la, lb, bt=bt)
jax.block_until_ready(out)
print(f"compile+run {time.time()-t0:.1f}s")
t0=time.time(); iters=20
for _ in range(iters): out = gotoh_forward_pallas(match, pc, pr, la, lb, bt=bt)
jax.block_until_ready(out)
dt=(time.time()-t0)/iters
print(f"B={B} L={L} bt={bt}: {dt*1000:.2f} ms/launch GCUPS {B*L*L/dt/1e9:.2f}")
