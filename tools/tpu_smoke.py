#!/usr/bin/env python
"""Compile-and-run every Pallas kernel on the ambient (real TPU) backend.

The test suite runs Pallas kernels in interpret mode on CPU, which never
exercises the Mosaic lowering — features it rejects (e.g. partial loop
unrolls) therefore only surface on real hardware.  This smoke drives every
kernel entry point plus the full GooeyEngine render path on whatever
backend jax picks (the TPU tunnel under the driver), so a lowering or
runtime regression fails loudly before a round ends.

Usage: python tools/tpu_smoke.py        (~2-4 min cold, seconds warm)
Prints one OK line per surface and "SMOKE OK" at the end; any exception is
fatal.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SR = 44100.0
B = 512


def _ok(name, t0):
    print(f"OK {name} ({time.perf_counter() - t0:.1f}s)", flush=True)


def smoke_bus_chain():
    """All 10 reorderable effects in one chain — hits every bus kernel:
    spring/saturation/waveshaper/env-follower/compressor/tilt/delay/
    lowpass/feedback-waveshaper/plate."""
    t0 = time.perf_counter()
    from libgooey_tpu.mixer import chain as chain_mod

    chain = chain_mod.EffectChain(SR, 120.0)
    for eid in range(chain_mod.REORDERABLE_EFFECT_COUNT + 1):
        chain.add(eid)
    x = jnp.asarray(
        np.random.RandomState(0).randn(4, 2, B).astype(np.float32) * 0.3
    )
    targets = tuple(chain.targets_list())
    key = chain.static_key()

    @jax.jit
    def run(states, xs):
        def step(st, xb):
            st2, y = chain_mod.process_chain(
                st, xb, targets, key, sample_rate=SR
            )
            return tuple(st2), y

        return jax.lax.scan(step, states, xs)

    _, y = jax.block_until_ready(run(tuple(chain.states), x))
    assert np.isfinite(np.asarray(y)).all(), "bus chain produced non-finite"
    _ok("bus_chain(10 effects)", t0)


def smoke_linrec1():
    t0 = time.perf_counter()
    from libgooey_tpu.ops import pallas_scan

    V = pallas_scan.ROW_TILE * 2
    a = jnp.full((V, B), 0.99, jnp.float32)
    b = jnp.ones((V, B), jnp.float32) * 0.01
    y0 = jnp.zeros((V,), jnp.float32)
    assert pallas_scan.supported(a, y0)
    y = jax.block_until_ready(
        jax.jit(lambda a, b, y0: pallas_scan.linrec1_pallas(a, b, y0))(a, b, y0)
    )
    assert np.isfinite(np.asarray(y)).all()
    _ok("linrec1_pallas", t0)


def smoke_env_bank():
    t0 = time.perf_counter()
    from libgooey_tpu.ops import pallas_fx

    V = 1024 + 128  # exercises lane padding
    rs = np.random.RandomState(2)
    rect = jnp.asarray(np.abs(rs.randn(V, B)).astype(np.float32))
    frz = jnp.asarray((rs.rand(V, B) < 0.1).astype(np.float32))
    env0 = jnp.zeros((V,), jnp.float32)
    env, envl = jax.block_until_ready(
        pallas_fx.env_follow_bank(rect, frz, env0, att=0.97, rel=0.999)
    )
    assert np.isfinite(np.asarray(env)).all()
    _ok("env_follow_bank", t0)


def smoke_svf_bank():
    t0 = time.perf_counter()
    from libgooey_tpu.ops import pallas_fx

    V = 1024 + 128
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(V, B).astype(np.float32))
    g = jnp.asarray((0.01 + 0.5 * rs.rand(V, B)).astype(np.float32))
    h = jnp.asarray((0.3 + 0.5 * rs.rand(V, B)).astype(np.float32))
    reset = jnp.asarray(rs.rand(V, B) < 0.01)
    ic = jnp.zeros((V,), jnp.float32)
    v1, v2, ic1, ic2 = jax.block_until_ready(
        pallas_fx.svf_bank(x, g, h, reset, ic, ic)
    )
    assert np.isfinite(np.asarray(v2)).all()
    _ok("svf_bank", t0)


def smoke_fbws_bank():
    t0 = time.perf_counter()
    from libgooey_tpu.effects import feedback_waveshaper as fw
    from libgooey_tpu.ops import pallas_fx

    V = 1024 + 128
    rs = np.random.RandomState(4)
    u = jnp.asarray(rs.randn(V, B).astype(np.float32))
    cs = jnp.asarray((0.5 + rs.rand(V, B)).astype(np.float32))
    packed = pallas_fx.pack_fbws_bank(fw.FBShaperState.init((V,)))
    dc, nst = jax.block_until_ready(pallas_fx.fbws_bank(u, cs, packed))
    assert np.isfinite(np.asarray(dc)).all()
    assert np.isfinite(np.asarray(nst)).all()
    _ok("fbws_bank", t0)


def smoke_pink_bank():
    t0 = time.perf_counter()
    from libgooey_tpu.ops import pallas_fx

    V = 1024 + 128
    rs = np.random.RandomState(6)
    w = jnp.asarray(rs.randn(V, B).astype(np.float32))
    rst = jnp.asarray((rs.rand(V, B) < 0.01).astype(np.float32))
    fstate = jnp.zeros((V, 3), jnp.float32)
    pink, stl = jax.block_until_ready(pallas_fx.pink_bank(
        w, rst, fstate, poles=(0.99765, 0.963, 0.57),
        gains=(0.099, 0.2965, 1.0527), direct=0.1848, outg=0.11))
    assert np.isfinite(np.asarray(pink)).all()
    _ok("pink_bank", t0)


def smoke_linrec2_bank():
    t0 = time.perf_counter()
    from libgooey_tpu.ops import pallas_fx

    V = 128 + 5
    rs = np.random.RandomState(9)
    a1 = jnp.asarray((-1.2 + 0.1 * rs.rand(V, B)).astype(np.float32))
    a2 = jnp.asarray((0.5 + 0.1 * rs.rand(V, B)).astype(np.float32))
    w = jnp.asarray(rs.randn(V, B).astype(np.float32))
    ones = jnp.ones((V, B), jnp.float32)
    zeros = jnp.zeros((V, B), jnp.float32)
    z = jnp.zeros((V,), jnp.float32)
    s1, s2, s1l, s2l = jax.block_until_ready(
        pallas_fx.linrec2_bank(-a1, -a2, ones, zeros, w, zeros, z, z)
    )
    assert np.isfinite(np.asarray(s1)).all()
    _ok("linrec2_bank", t0)


def smoke_affine1_bank():
    t0 = time.perf_counter()
    from libgooey_tpu.ops import pallas_fx

    V = 128 + 3
    rs = np.random.RandomState(10)
    a = jnp.full((V, B), -3.0e38, jnp.float32)
    bcoef = jnp.asarray((0.9 + 0.09 * rs.rand(V, B)).astype(np.float32))
    c = jnp.asarray(rs.randn(V, B).astype(np.float32) * 0.05)
    y, yl = jax.block_until_ready(
        pallas_fx.affine1_bank(a, bcoef, c, jnp.zeros(V, jnp.float32))
    )
    assert np.isfinite(np.asarray(y)).all()
    _ok("affine1_bank", t0)


def smoke_mix_bank():
    t0 = time.perf_counter()
    from libgooey_tpu.ops import pallas_fx

    V = 1024 + 60  # exercises voice-tile padding
    rs = np.random.RandomState(8)
    x = jnp.asarray(rs.randn(V, B).astype(np.float32) * 0.2)
    pc = jnp.asarray(rs.rand(V).astype(np.float32))
    pt = jnp.asarray(rs.rand(V).astype(np.float32))
    gc = jnp.asarray(rs.rand(V).astype(np.float32))
    gt = jnp.asarray(rs.rand(V).astype(np.float32))
    suml, sumr, summ = jax.block_until_ready(
        pallas_fx.mix_bank(x, pc, pt, gc, gt, coeff=0.0015059)
    )
    assert np.isfinite(np.asarray(suml)).all()
    assert np.isfinite(np.asarray(summ)).all()
    _ok("mix_bank", t0)


def smoke_grain_read():
    t0 = time.perf_counter()
    from libgooey_tpu.ops import pallas_grain

    L, G = 4096, 64
    rng = np.random.RandomState(1)
    buf = jnp.asarray(rng.randn(L).astype(np.float32))
    p0 = jnp.linspace(0.0, L - 8.0, G).astype(jnp.float32)
    # cover every window tier incl. reverse reads
    step = jnp.asarray(
        rng.uniform(-2.0, 4.0, G).astype(np.float32))
    y, ref = jax.block_until_ready(
        jax.jit(
            lambda b, p, s: (pallas_grain.grain_read_cubic(b, p, s, B=B),
                             pallas_grain.gather_read_cubic(b, p, s, B=B))
        )(buf, p0, step)
    )
    # Error budget vs the gather path on HARDWARE: the kernel's chunked
    # position math ((p0 + n0) + j vs p0 + n) can land 1-2 ulp(pos) away
    # after Mosaic/XLA fuse differently, which moves the interpolation
    # point by up to ~2*ulp(max_pos) — an error of slope * delta, NOT a
    # wrong-tap error (tap selection is exact; see _probe history).  For
    # a white randn buffer slope ~= |adjacent delta| <= ~8.
    max_pos = float(L)
    budget = 1e-4 + 8.0 * 2.0 * max_pos * 2.0 ** -23
    err = float(np.abs(np.asarray(y) - np.asarray(ref)).max())
    assert err < budget, (err, budget)
    _ok(f"grain_read_cubic (err {err:.1e})", t0)

    # sampler stereo linear reads vs the XLA gather path, on hardware.
    # A SMOOTH arena makes tap-selection bugs visible above the pos-ulp
    # noise: a wrong tap errs by the adjacent delta (~2e-2 here) while
    # pos-ulp ambiguity errs by slope * 2ulp(pos) (~1e-6).
    F, V = 2048, 32
    i2 = np.arange(F, dtype=np.float32)
    smooth = np.stack([np.sin(0.02 * i2), np.cos(0.017 * i2)], 1) * 2.0
    arena = jnp.asarray(smooth.astype(np.float32))
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
        return got, f0 + (f1 - f0) * frac

    ys, refs = jax.block_until_ready(
        jax.jit(both)(arena, base, frames, age0, inc))
    errs = float(np.abs(np.asarray(ys) - np.asarray(refs)).max())
    assert errs < 1e-4, errs
    _ok(f"sampler_read_linear (err {errs:.1e})", t0)


def smoke_engine_render():
    """Full product path: GooeyEngine render with sequenced drums, the bus
    FX, granulator and a sampler rack — the driver-bench-shaped workload."""
    t0 = time.perf_counter()
    from libgooey_tpu import capi
    from libgooey_tpu.mixer.chain import EFFECT_DELAY, EFFECT_PLATE_REVERB

    e = capi.engine_new(SR)
    capi.engine_set_bpm(e, 120.0)
    for ch in range(4):
        capi.engine_sequencer_set_step(e, ch, ch * 2, True, 0.9)
        capi.engine_sequencer_start(e, ch)
    capi.engine_set_effect_enabled(e, EFFECT_DELAY, True)
    capi.engine_set_effect_enabled(e, EFFECT_PLATE_REVERB, True)
    capi.engine_granulator_load(
        e, np.random.RandomState(2).randn(int(SR)).astype(np.float32), SR
    )
    capi.engine_granulator_trigger(e, 0.9)
    buf = capi.engine_render(e, B * 4)
    buf = np.asarray(buf)
    assert np.isfinite(buf).all(), "engine render produced non-finite"
    assert np.abs(buf).max() > 0.0, "engine render silent"
    _ok("gooey_engine_render", t0)


def smoke_voice_fused():
    """Fused instrument-bank kernels vs their XLA twins, on hardware."""
    from libgooey_tpu.core.smoother import smoothing_coeff
    from libgooey_tpu.engine import engine as eng
    from libgooey_tpu.ops import pallas_voice as pv

    V = 16
    coeff = smoothing_coeff(SR)
    off = np.full(V, B, np.int32)
    off[:4] = [0, 40, 3, 100]
    vel = np.full(V, 0.8, np.float32)
    static = {"kick": dict(max_harmonics=64, feedback_path=False),
              "snare": dict(max_harmonics=64)}
    prev = pv.IMPL
    try:
        for kind in ("kick", "snare", "hihat2", "bass", "tom2"):
            t0 = time.perf_counter()
            mod = eng.FAMILIES[kind]
            state = mod.init_state(V)
            kw = dict(sample_rate=SR, block_size=B, smooth_coeff=coeff,
                      **static.get(kind, {}))
            pv.IMPL = "xla"
            _, out_x = mod.render_block(state, off, vel, np.int32(0), **kw)
            pv.IMPL = "auto"
            _, out_f = mod.render_block(state, off, vel, np.int32(0), **kw)
            err = float(jnp.max(jnp.abs(out_x - out_f)))
            assert err < 1e-4, f"{kind} fused-vs-xla on hardware: {err}"
            _ok(f"voice_fused ({kind}, err {err:.1e})", t0)
    finally:
        pv.IMPL = prev


def smoke_entry():
    t0 = time.perf_counter()
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    assert np.isfinite(np.asarray(out[1])).all()
    _ok("graft entry()", t0)


def smoke_wsola_stream():
    """Device-resident WSOLA hop scan (ops/wsola_stream.py): the hop
    search/read kernels run at non-engine block lengths (hopB=1024,
    grainB=2048) that only this path exercises."""
    t0 = time.perf_counter()
    from libgooey_tpu.mixer import wsola
    from libgooey_tpu.mixer.loop_channel import PITCH_PRESERVE
    from libgooey_tpu.mixer.mixer import Mixer
    from libgooey_tpu.mixer.stereo_buffer import StereoSampleBuffer

    old = wsola.USE_DEVICE_SEARCH
    wsola.USE_DEVICE_SEARCH = True
    try:
        m = Mixer(SR, block_size=B, buffer_capacity=1 << 16)
        m.set_bpm(180.0)
        rng = np.random.RandomState(0)
        tone = (rng.randn(1 << 15) * 0.3).astype(np.float32)
        ch = m.channels[0]
        ch.set_buffer(StereoSampleBuffer.from_channels(tone, tone, SR, 120.0))
        ch.pitch_mode = PITCH_PRESERVE
        ch.set_playing(True)
        from libgooey_tpu.mixer import stream as stream_mod

        assert stream_mod.stream_config(m, 0) is not None
        out = np.asarray(m.render_blocks(8))
        assert np.isfinite(out).all() and np.abs(out).max() > 1e-4
    finally:
        wsola.USE_DEVICE_SEARCH = old
    _ok("wsola stream scan", t0)


def main():
    print(f"# backend: {jax.default_backend()}  device: "
          f"{jax.devices()[0].device_kind}", file=sys.stderr)
    smoke_linrec1()
    smoke_env_bank()
    smoke_svf_bank()
    smoke_fbws_bank()
    smoke_pink_bank()
    smoke_linrec2_bank()
    smoke_affine1_bank()
    smoke_mix_bank()
    smoke_grain_read()
    smoke_bus_chain()
    smoke_voice_fused()
    smoke_wsola_stream()
    smoke_entry()
    smoke_engine_render()
    print("SMOKE OK")


if __name__ == "__main__":
    main()
