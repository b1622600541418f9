import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from libgooey_tpu.ops import pallas_grain
B = 512
F, V = 2048, 32
rng = np.random.RandomState(1)
arena = jnp.asarray(rng.randn(F, 2).astype(np.float32))
base = jnp.zeros((V,), jnp.int32)
frames = jnp.full((V,), float(F), jnp.float32)
age0 = jnp.linspace(0.0, 64.0, V).astype(jnp.float32)
inc = jnp.asarray(rng.uniform(0.25, 2.2, V).astype(np.float32))

def both(a, b_, fr, g0, ic):
    got = pallas_grain.sampler_read_linear(a, b_, fr, g0, ic, B=B)
    n = jnp.arange(B, dtype=jnp.float32)
    pos = jnp.clip((g0[:, None] + n) * ic[:, None], 0.0, fr[:, None] - 1.0)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, (fr[:, None] - 1.0).astype(jnp.int32))
    frac = (pos - jnp.floor(pos))[..., None]
    f0 = a[b_[:, None] + i0]
    f1 = a[b_[:, None] + i1]
    return got, f0 + (f1 - f0) * frac, pos

ys, refs, pos = jax.jit(both)(arena, base, frames, age0, inc)
ys, refs, pos = map(np.asarray, (ys, refs, pos))
err = np.abs(ys - refs)
print("max err", err.max())
idx = np.unravel_index(err.argmax(), err.shape)
v, n, ch = idx
print("at voice", v, "n", n, "ch", ch, "inc", float(inc[v]), "pos", pos[v, n])
print("got", ys[idx], "ref", refs[idx])
# error distribution per voice
pv = err.max(axis=(1, 2))
print("per-voice max:", np.array2string(pv, precision=6))
