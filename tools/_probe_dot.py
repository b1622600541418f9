import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, N = 1280, 512
rng = np.random.RandomState(3)
w = rng.randn(1, K).astype(np.float32) * 4
idx = rng.randint(0, K - 4, (1, N)).astype(np.int32)

def kern(w_ref, idx_ref, o_ref):
    wf = w_ref[...]
    hi = wf.astype(jnp.bfloat16).astype(jnp.float32)
    lo = (wf - hi).astype(jnp.bfloat16).astype(jnp.float32)
    rel = idx_ref[...]
    krow = jax.lax.broadcasted_iota(jnp.int32, (128, N), 0)
    rows = []
    for r in range(K // 128):
        d = (r * 128 + krow) - rel
        rows.append((d == 0).astype(jnp.float32))
    oh = jnp.concatenate(rows, axis=0)
    lhs = jnp.concatenate([hi, pltpu.roll(hi, K - 1, 1),
                           lo, pltpu.roll(lo, K - 1, 1)], axis=0)
    g = jnp.dot(lhs, oh, preferred_element_type=jnp.float32)
    o_ref[...] = g

out = pl.pallas_call(
    kern, out_shape=jax.ShapeDtypeStruct((4, N), jnp.float32),
)(jnp.asarray(w), jnp.asarray(idx))
out = np.asarray(out)
t0 = out[0] + out[2]
t1 = out[1] + out[3]
ref0 = w[0][idx[0]]
ref1 = w[0][idx[0] + 1]
print("tap0 err", np.abs(t0 - ref0).max(), "tap1 err", np.abs(t1 - ref1).max())
hi = w.astype(np.float32).astype(jnp.bfloat16).astype(np.float32)
lo = (w - hi).astype(jnp.bfloat16).astype(np.float32)
print("split residual", np.abs(w - hi - lo).max())
