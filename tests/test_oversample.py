"""Oversampler: alias reduction and passband integrity (the reference's
oversampler.rs:373-415 assertions: ≥20 dB alias reduction at 4x with < 1 dB
fundamental change, tanh drive 10 @ 10 kHz / 48 kHz)."""

import numpy as np
import jax.numpy as jnp

from libgooey_tpu.ops import oversample as ov

SR = 48000.0
N = 8192


def run(fn, x, mode):
    st = ov.OversamplerState.init(())
    outs = []
    for i in range(0, len(x), 512):
        st, y = ov.process(st, fn, jnp.asarray(x[i : i + 512]), mode)
        outs.append(np.asarray(y))
    return np.concatenate(outs)


def coherent(sig, freq):
    t = np.arange(2000, len(sig))
    ph = 2 * np.pi * freq * t / SR
    s = sig[2000:]
    return np.hypot(np.dot(s, np.cos(ph)), np.dot(s, np.sin(ph)))


def test_halfband_design_response():
    """Analytic stop-band of the stage-1 design exceeds 90 dB."""
    coefs = ov.STAGE1
    w = np.linspace(0.001, np.pi - 0.001, 2048)
    z2 = np.exp(-2j * w)

    def A(cs):
        r = np.ones_like(z2)
        for a in cs:
            r = r * (a + z2) / (1 + a * z2)
        return r

    H = 0.5 * (A(coefs[0::2]) + np.exp(-1j * w) * A(coefs[1::2]))
    sb = np.abs(H)[w > (0.5 + 2 * 0.04) * np.pi]
    pb = np.abs(H)[w < (0.5 - 2 * 0.04) * np.pi]
    assert 20 * np.log10(sb.max()) < -90.0
    assert abs(20 * np.log10(pb.min())) < 0.01


def test_passband_unity():
    t = np.arange(N)
    for f in [1000.0, 5000.0, 10000.0]:
        x = np.sin(2 * np.pi * f * t / SR).astype(np.float32)
        for mode in (2, 4):
            y = run(lambda v: v, x, mode)
            ratio = np.sqrt(np.mean(y[2000:] ** 2)) / np.sqrt(np.mean(x[2000:] ** 2))
            assert abs(ratio - 1.0) < 0.02, (f, mode, ratio)


def test_alias_reduction_tanh_drive10():
    t = np.arange(N)
    x = (np.sin(2 * np.pi * 10000 * t / SR) * 0.8).astype(np.float32)
    drive = lambda v: jnp.tanh(v * 10.0)
    base = run(drive, x, 1)
    os4 = run(drive, x, 4)
    # 3rd harmonic (30 kHz) folds to 18 kHz at the base rate
    alias_red = 20 * np.log10(
        coherent(base, 18000.0) / max(coherent(os4, 18000.0), 1e-12)
    )
    fund_change = 20 * np.log10(coherent(os4, 10000.0) / coherent(base, 10000.0))
    assert alias_red >= 20.0, alias_red
    assert abs(fund_change) < 1.0, fund_change


def test_block_boundary_continuity():
    """Split processing must equal one-shot processing (state carried)."""
    rs = np.random.RandomState(0)
    x = rs.uniform(-1, 1, 2048).astype(np.float32)
    whole_st = ov.OversamplerState.init(())
    _, whole = ov.process(whole_st, lambda v: jnp.tanh(v * 3), jnp.asarray(x), 4)
    split = run(lambda v: jnp.tanh(v * 3), x, 4)
    np.testing.assert_allclose(split, np.asarray(whole), atol=1e-5)
