"""Oscillators and filters vs per-sample oracles + spectral guardrails.

Mirrors the reference test strategy (SURVEY.md §4): coherent-sampling DFT for
alias assertions (tests/aliasing.rs), filter response RMS checks
(resonant_lowpass.rs tests), pink-noise slope (pink_noise.rs:160-186).
"""

import numpy as np

from libgooey_tpu.ops import filters, noise, osc


SR = 44100.0


def coherent_dft_power(signal, freq, sr):
    """Leakage-free single-bin power via direct evaluation (the reference's
    Goertzel-style approach, tests/aliasing.rs)."""
    n = len(signal)
    t = np.arange(n)
    ph = 2 * np.pi * freq * t / sr
    re = np.dot(signal, np.cos(ph))
    im = -np.dot(signal, np.sin(ph))
    return (re * re + im * im) / (n * n)


def render_osc(fn, freq, n, **kw):
    idx = np.arange(n, dtype=np.float32)
    return np.asarray(fn(idx, np.float32(freq), SR, **kw))


def alias_ratio(sig, fundamental, sr):
    """Total power at non-harmonic coherent bins / fundamental power."""
    n = len(sig)
    fund = coherent_dft_power(sig, fundamental, sr)
    alias = 0.0
    base = sr / n
    harmonics = {round(fundamental * k / base) for k in range(1, 64)}
    for b in range(1, n // 2, 7):  # sample the spectrum sparsely
        if b in harmonics:
            continue
        alias += coherent_dft_power(sig, b * base, sr)
    return alias / max(fund, 1e-30)


def test_polyblep_reduces_aliasing_dramatically():
    # coherent fundamental: pick freq = k * sr / n
    n = 8192
    freq = round(2000.0 * n / SR) * SR / n
    naive = render_osc(osc.saw_naive, freq, n)
    blep = render_osc(osc.saw_blep, freq, n)
    r_naive = alias_ratio(naive, freq, SR)
    r_blep = alias_ratio(blep, freq, SR)
    assert r_blep < r_naive * 0.05, (r_naive, r_blep)

    naive = render_osc(osc.square_naive, freq, n)
    blep = render_osc(osc.square_blep, freq, n)
    assert alias_ratio(blep, freq, SR) < alias_ratio(naive, freq, SR) * 0.05


def test_polyblep_oracle():
    """saw/square match a direct transcription of polyblep.rs."""

    def poly_blep_ref(t, dt):
        if t < dt:
            t = t / dt
            return 2 * t - t * t - 1
        if t > 1 - dt:
            t = (t - 1) / dt
            return t * t + 2 * t + 1
        return 0.0

    freq = 441.0
    inc = freq / SR
    got = render_osc(osc.saw_blep, freq, 1000)
    for n in range(1000):
        phase = (n * inc) % 1.0
        want = (2 * phase - 1) - poly_blep_ref(phase, inc)
        assert abs(got[n] - want) < 1e-4


def test_sine_and_ringmod():
    idx = np.arange(100, dtype=np.float32)
    s = np.asarray(osc.sine(idx, np.float32(440.0), SR))
    want = np.sin(idx * 440.0 * 2 * np.pi / SR)
    np.testing.assert_allclose(s, want, atol=1e-5)
    rm = np.asarray(osc.ring_mod(idx, np.float32(440.0), np.float32(220.0), SR))
    np.testing.assert_allclose(
        rm, want * np.sin(idx * 220.0 * 2 * np.pi / SR), atol=1e-5
    )


def test_triangle_additive_oracle():
    """Chebyshev-recurrence triangle vs direct harmonic sum
    (oscillator.rs:106-131)."""
    freq = 220.0
    n = 256
    idx = np.arange(n, dtype=np.float32)
    got = np.asarray(osc.triangle_additive(idx, np.float32(freq), SR, 512))

    nyquist = SR / 2
    max_h = int(nyquist / freq)
    want = np.zeros(n)
    i = 1
    while i <= max_h and freq * i <= nyquist:
        hfreq = freq * i
        ratio = hfreq / nyquist
        taper = 1.0 - ((ratio - 0.75) / 0.25) ** 2 if ratio > 0.75 else 1.0
        want += (1.0 / i**2) * taper * np.sin(idx * hfreq * 2 * np.pi / SR)
        i += 2
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_noise_deterministic():
    idx = np.arange(64, dtype=np.float32)
    a = np.asarray(osc.noise(idx))
    b = np.asarray(osc.noise(idx))
    np.testing.assert_array_equal(a, b)
    assert np.all(np.abs(a) <= 1.0)


# --- filters -----------------------------------------------------------------


def _run_svf_blocked(x, cutoff, q, sr, block=128):
    st = filters.SVFState.init(())
    out = []
    for i in range(0, len(x), block):
        st, y = filters.resonant_lowpass_block(st, x[i : i + block], cutoff, q, sr)
        out.append(np.asarray(y))
    return np.concatenate(out)


def _svf_oracle(x, cutoff, q, sr):
    """Direct transcription of resonant_lowpass.rs process()."""
    g = np.tan(np.pi * min(max(cutoff, 20.0), sr * 0.45) / sr)
    r = 1.0 / min(max(q, 0.5), 10.0)
    h = 1.0 / (1.0 + r * g + g * g)
    ic1 = ic2 = 0.0
    out = np.zeros_like(x)
    for n, xn in enumerate(x):
        v1 = (g * (xn - ic2) + ic1) * h
        v2 = ic2 + g * v1
        ic1 = 2 * v1 - ic1
        ic2 = 2 * v2 - ic2
        out[n] = 0.0 if abs(v2) < 1e-15 else v2
    return out


def test_svf_matches_oracle_across_blocks():
    rs = np.random.RandomState(3)
    x = rs.uniform(-1, 1, 500).astype(np.float32)
    got = _run_svf_blocked(x, 1000.0, 2.0, SR, block=128)
    want = _svf_oracle(x, 1000.0, 2.0, SR)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_svf_lowpass_attenuates_highs():
    t = np.arange(int(SR), dtype=np.float32)
    lo = np.sin(2 * np.pi * 100 * t / SR).astype(np.float32)
    hi = np.sin(2 * np.pi * 8000 * t / SR).astype(np.float32)
    out_lo = _run_svf_blocked(lo, 1000.0, 0.707, 48000.0, block=4096)
    out_hi = _run_svf_blocked(hi, 1000.0, 0.707, 48000.0, block=4096)
    rms = lambda v: np.sqrt(np.mean(v[len(v) // 2 :] ** 2))
    assert rms(out_lo) > rms(out_hi) * 10.0


def test_resonant_highpass_oracle():
    rs = np.random.RandomState(4)
    x = rs.uniform(-1, 1, 300).astype(np.float32)
    st = filters.OnePoleState.init(())
    _, got = filters.resonant_highpass_block(st, x, 8000.0, 4.0, SR)
    got = np.asarray(got)

    alpha = 1.0 - np.exp(-2.0 * np.pi * 8000.0 / SR)
    state = 0.0
    for n, xn in enumerate(x):
        hp = xn - state
        state += alpha * hp
        want = hp * (1.0 + 4.0 * 0.1)
        assert abs(got[n] - want) < 1e-5


def test_dc_block_oracle():
    rs = np.random.RandomState(5)
    x = (rs.uniform(-1, 1, 256) + 0.5).astype(np.float32)
    st = filters.DCBlockState.init(())
    _, got = filters.dc_block(st, x)
    got = np.asarray(got)
    x1 = y1 = 0.0
    for n, xn in enumerate(x):
        y = xn - x1 + 0.995 * y1
        x1, y1 = xn, y
        assert abs(got[n] - y) < 5e-5  # f32 scan reassociation tolerance
    # removes DC: after the pole settles (tau ~200 samples at R=0.995), the
    # +0.5 input offset is gone from the output
    x_long = (rs.uniform(-1, 1, 8192) + 0.5).astype(np.float32)
    _, y_long = filters.dc_block(filters.DCBlockState.init(()), x_long)
    tail = np.asarray(y_long)[4096:]
    assert abs(tail.mean()) < 0.05 < abs(x_long[4096:].mean())


def test_pink_noise_slope_and_reset():
    st = noise.PinkState.init(())
    counters = np.arange(65536)
    _, pink = noise.pink_block(st, counters, 44100.0)
    pink = np.asarray(pink)
    assert np.all(np.isfinite(pink))
    assert np.all(np.abs(pink) < 2.0)
    assert abs(pink.mean()) < 0.03

    # slope between octaves 250 Hz → 8 kHz in −1.5..−4.5 dB/oct across rates
    for sr in [44100.0, 48000.0, 96000.0]:
        _, p = noise.pink_block(noise.PinkState.init(()), counters, sr)
        p = np.asarray(p)[4096:]
        freqs = [250.0, 500.0, 1000.0, 2000.0, 4000.0, 8000.0]
        pw = []
        n = 4096
        for f in freqs:
            acc = 0.0
            for b in range(8):
                seg = p[b * n : (b + 1) * n]
                bin_f = round(f * n / sr) * sr / n
                acc += coherent_dft_power(seg, bin_f, sr)
            pw.append(acc)
        slope = (10 * np.log10(pw[-1]) - 10 * np.log10(pw[0])) / (len(pw) - 1)
        assert -4.5 < slope < -1.5, (sr, slope)

    # reset ≡ identical sequence (counter restart + zero state)
    _, p1 = noise.pink_block(noise.PinkState.init(()), np.arange(256), 44100.0)
    _, p2 = noise.pink_block(noise.PinkState.init(()), np.arange(256), 44100.0)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_pink_block_continuity():
    """Split rendering across blocks must equal one long block."""
    counters = np.arange(1024)
    _, whole = noise.pink_block(noise.PinkState.init(()), counters, 44100.0)
    st = noise.PinkState.init(())
    parts = []
    for i in range(0, 1024, 256):
        st, p = noise.pink_block(st, counters[i : i + 256], 44100.0)
        parts.append(np.asarray(p))
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(whole), atol=1e-5)
