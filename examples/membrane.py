"""Membrane resonator lab: noise burst × MaxCurve envelope exciting the
5-band resonator, with Q/gain scale sweeps (mirrors examples/membrane.rs —
the same `noise~ -> *~ envelope -> MembraneResonator` patch, batched)."""

import numpy as np
import jax.numpy as jnp

from libgooey_tpu.core import rng
from libgooey_tpu.core.max_curve import max_curve
from libgooey_tpu.ops import filters

SR = 44100.0
B = 512


def render_hit(q_scale: float, gain_scale: float, seconds: float = 2.5):
    """One membrane hit: envelope [(1, 5ms, 0.8), (0, 2000ms, -0.83)]."""
    n = int(SR * seconds)
    t = np.arange(n, dtype=np.float32) / SR
    attack_s, decay_s = 0.005, 2.0
    env = np.where(
        t < attack_s,
        np.asarray(max_curve(t / attack_s, 0.8)),
        1.0 - np.asarray(max_curve(np.clip((t - attack_s) / decay_s, 0, 1), -0.83)),
    ).astype(np.float32)
    noise = np.asarray(rng.white(np.arange(n, dtype=np.uint32))) * 0.99
    excite = (noise * env)[None, :]

    state = filters.MembraneState.init((1,))
    outs = []
    ring_peak = 0.0
    for s in range(0, n, B):
        x = jnp.asarray(excite[:, s:s + B])
        state, y, ring = filters.membrane_block(
            state, x, jnp.full((1,), q_scale, jnp.float32),
            jnp.full((1,), gain_scale, jnp.float32), SR,
        )
        outs.append(np.asarray(y[0]))
        ring_peak = max(ring_peak, float(np.asarray(ring).max()))
    return np.concatenate(outs), ring_peak


def main(out_path: str = "/tmp/gooey_membrane.wav", quick: bool = False):
    secs = 0.25 if quick else 2.5
    sections = []
    # the membrane.rs arrow-key sweeps: Q scaling then gain scaling
    for q in (0.005, 0.01, 0.02):
        audio, ring = render_hit(q, 0.001, secs)
        print(f"q_scale={q}: peak {np.abs(audio).max():.4f} ring {ring:.5f}")
        sections.append(audio)
    for g in (0.0005, 0.001, 0.002):
        audio, ring = render_hit(0.01, g, secs)
        print(f"gain_scale={g}: peak {np.abs(audio).max():.4f} ring {ring:.5f}")
        sections.append(audio)

    audio = np.concatenate(sections)
    from libgooey_tpu.io_wav import write_wav
    write_wav(out_path, audio, 44100)
    print(f"wrote {out_path}")
    return out_path


if __name__ == "__main__":
    main()
