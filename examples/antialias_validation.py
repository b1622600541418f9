"""Oversampler validation: known-bin alias reduction in dB plus device
throughput in ns/sample (mirrors examples/antialias_validation.rs:122-181 —
the same tanh-drive measurement and the Off/2x/4x micro-bench)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from libgooey_tpu.io_wav import write_wav
from libgooey_tpu.ops import oversample as ov

SR = 48000.0
N = 8192
FUND = 10000.0
DRIVE = 10.0


def run(x, mode):
    st = ov.OversamplerState.init(())
    outs = []
    for i in range(0, len(x), 512):
        st, y = ov.process(st, lambda v: jnp.tanh(v * DRIVE),
                           jnp.asarray(x[i:i + 512]), mode)
        outs.append(np.asarray(y))
    return np.concatenate(outs)


def coherent(sig, freq):
    t = np.arange(2000, len(sig))
    ph = 2 * np.pi * freq * t / SR
    s = sig[2000:]
    return np.hypot(np.dot(s, np.cos(ph)), np.dot(s, np.sin(ph)))


def bench_mode(mode, n=1 << 20):
    """Device throughput, ns/sample (jitted whole-buffer oversample)."""
    x = (np.sin(2 * np.pi * FUND * np.arange(n) / SR) * 0.8).astype(np.float32)

    @jax.jit
    def f(xx):
        st = ov.OversamplerState.init(())
        _, y = ov.process(st, lambda v: jnp.tanh(v * DRIVE), xx, mode)
        return y

    xx = jnp.asarray(x)
    f(xx).block_until_ready()                      # compile
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        f(xx).block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return dt / n * 1e9


def main(quick: bool = False):
    t = np.arange(N)
    x = (np.sin(2 * np.pi * FUND * t / SR) * 0.8).astype(np.float32)
    base = run(x, 1)
    x2 = run(x, 2)
    x4 = run(x, 4)
    # 3rd harmonic (30 kHz) folds to 18 kHz at the base rate
    alias_bin = 18000.0
    p_off = coherent(base, alias_bin)
    print(f"2x known-bin alias reduction versus off: "
          f"{20 * np.log10(p_off / max(coherent(x2, alias_bin), 1e-12)):.2f} dB")
    print(f"4x known-bin alias reduction versus off: "
          f"{20 * np.log10(p_off / max(coherent(x4, alias_bin), 1e-12)):.2f} dB")

    for name, sig in (("base-rate-sweep", base), ("oversampled-2x-sweep", x2),
                      ("oversampled-4x-sweep", x4)):
        path = f"/tmp/gooey_{name}.wav"
        write_wav(path, sig, int(SR), bits=32)
        print(f"Wrote {path}")

    bn = 1 << 16 if quick else 1 << 20
    off_ns = bench_mode(1, bn)
    x2_ns = bench_mode(2, bn)
    x4_ns = bench_mode(4, bn)
    print(f"Off throughput: {off_ns:.2f} ns/sample")
    print(f"2x throughput: {x2_ns:.2f} ns/sample ({x2_ns / off_ns:.2f}x off cost)")
    print(f"4x throughput: {x4_ns:.2f} ns/sample ({x4_ns / off_ns:.2f}x off cost)")


if __name__ == "__main__":
    main()
