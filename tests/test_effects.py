"""Bus effects vs per-sample oracles: delay, spring reverb, waveshaper,
limiters (reference test strategy: echo darkening delay.rs:588-616, reverb
stability/decay reverb.rs tests, T60 windows plate_reverb.rs:581-649)."""

import numpy as np

from libgooey_tpu.effects import delay as delay_mod
from libgooey_tpu.effects import limiter, reverb_spring
from libgooey_tpu.effects import waveshaper as ws

SR = 44100.0
B = 512


def run_delay(x, time_s, feedback, mix, cutoff, pingpong=False, snap=True):
    st = delay_mod.init_state(SR, time_s, feedback, mix, cutoff)
    targets = np.array([time_s, feedback, mix, cutoff], np.float32)
    outs = []
    for i in range(0, x.shape[-1], B):
        st, y = delay_mod.process_block(
            st, x[:, i : i + B], targets, sample_rate=SR, pingpong=pingpong
        )
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1)


def delay_oracle(x, time_s, feedback, mix, cutoff):
    """Per-sample mono transcription of delay.rs process_one (settled params)."""
    L = int(SR * delay_mod.MAX_DELAY_TIME) + 1
    buf = np.zeros(L, np.float32)
    w = 0
    z1 = z2 = 0.0
    out = np.zeros_like(x)
    ds = time_s * SR
    di = int(ds)
    frac = ds - di
    g = 1.0 - np.exp(-2 * np.pi * cutoff / SR)
    for n in range(len(x)):
        i1 = (w + L - di) % L
        i2 = (w + L - di - 1) % L
        delayed = buf[i1] * (1 - frac) + buf[i2] * frac
        rfb = 0.3 * (z1 - z2)
        z1 = z1 + g * (delayed + rfb - z1)
        z2 = z2 + g * (z1 - z2)
        filtered = z2
        wsamp = x[n] + filtered * feedback
        buf[w] = wsamp if abs(wsamp) > 1e-15 else 0.0
        w = (w + 1) % L
        out[n] = x[n] * (1 - mix) + filtered * mix
    return out


def test_delay_matches_oracle():
    rs = np.random.RandomState(0)
    n = 8192
    x = np.zeros((2, n), np.float32)
    x[:, :64] = rs.uniform(-1, 1, (1, 64))  # same burst on both channels
    got = run_delay(x, 0.05, 0.6, 0.5, 4000.0)
    want = delay_oracle(x[0], 0.05, 0.6, 0.5, 4000.0)
    err = np.max(np.abs(got[0] - want))
    assert err < 1e-4, err
    # dual-mono: both channels identical for identical input
    np.testing.assert_allclose(got[0], got[1], atol=1e-6)


def test_delay_echoes_darken():
    """Each echo passes the LP again → successive echoes lose HF
    (delay.rs:588-616)."""
    n = int(SR)
    t = np.arange(200)
    burst = np.sin(2 * np.pi * 6000 * t / SR).astype(np.float32)
    x = np.zeros((2, n), np.float32)
    x[:, :200] = burst
    out = run_delay(x, 0.1, 0.8, 1.0, 2000.0)[0]
    d = int(0.1 * SR)

    def hf_energy(seg):
        sp = np.abs(np.fft.rfft(seg, 4096))
        f = np.fft.rfftfreq(4096, 1 / SR)
        return sp[(f > 4000)].sum()

    e1 = hf_energy(out[d : d + 400])
    e2 = hf_energy(out[2 * d : 2 * d + 400])
    assert e2 < e1 * 0.7, (e1, e2)


def test_delay_pingpong_alternates():
    n = int(SR * 0.8)
    x = np.zeros((2, n), np.float32)
    x[:, :32] = 1.0
    out = run_delay(x, 0.2, 0.7, 1.0, 8000.0, pingpong=True)
    d = int(0.2 * SR)
    win = lambda c, k: np.abs(out[c, k * d + 10 : k * d + 400]).max()
    # echo 1 on the left, echo 2 on the right, echo 3 back left...
    assert win(0, 1) > 5 * win(1, 1) or win(1, 2) > 5 * win(0, 2)


def run_spring(x, decay, mix, damping):
    st = reverb_spring.init_state(SR, decay, mix, damping)
    targets = np.array([decay, mix, damping], np.float32)
    outs = []
    for i in range(0, x.shape[-1], B):
        st, y = reverb_spring.process_block(
            st, x[:, i : i + B], targets, sample_rate=SR
        )
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1)


def spring_oracle(x, decay, mix, damping, delays):
    bufs = [np.zeros(d, np.float32) for d in delays]
    idxs = [0] * 6
    fb = 0.0
    damp_state = 0.0
    out = np.zeros_like(x)
    feedback = decay**0.4 * 0.95
    for n in range(len(x)):
        signal = x[n] + fb
        for i in range(6):
            g = reverb_spring.GAINS[i]
            delayed = bufs[i][idxs[i]]
            v = signal - g * delayed
            signal = g * v + delayed
            bufs[i][idxs[i]] = v
            idxs[i] = (idxs[i] + 1) % delays[i]
        damp_state = signal * (1 - damping) + damp_state * damping
        fb = damp_state * feedback
        out[n] = x[n] * (1 - mix) + signal * mix
    return out


def test_spring_matches_oracle():
    rs = np.random.RandomState(1)
    n = 4096
    x = np.zeros((2, n), np.float32)
    x[:, :128] = rs.uniform(-1, 1, (2, 128))
    got = run_spring(x, 0.5, 1.0, 0.4)
    dl, dr = reverb_spring.delay_lengths(SR)
    want_l = spring_oracle(x[0], 0.5, 1.0, 0.4, dl)
    want_r = spring_oracle(x[1], 0.5, 1.0, 0.4, dr)
    err = max(np.max(np.abs(got[0] - want_l)), np.max(np.abs(got[1] - want_r)))
    assert err < 1e-4, err


def test_spring_stable_at_max_decay():
    n = int(SR * 2)
    x = np.zeros((2, n), np.float32)
    x[:, :100] = 1.0
    out = run_spring(x, 1.0, 1.0, 0.0)
    assert np.all(np.isfinite(out))
    assert np.abs(out).max() < 20.0


def test_spring_decay_controls_tail():
    n = int(SR)
    x = np.zeros((2, n), np.float32)
    x[:, :100] = 1.0
    rms = lambda v: np.sqrt(np.mean(v**2) + 1e-20)
    short = run_spring(x, 0.1, 1.0, 0.5)
    long = run_spring(x, 0.9, 1.0, 0.5)
    assert rms(long[0, 30000:]) > 5 * rms(short[0, 30000:])


def test_spring_channels_decorrelate():
    n = 16384
    x = np.zeros((2, n), np.float32)
    x[:, :100] = 1.0
    out = run_spring(x, 0.7, 1.0, 0.3)
    l, r = out[0, 2000:], out[1, 2000:]
    corr = np.dot(l, r) / (np.linalg.norm(l) * np.linalg.norm(r) + 1e-12)
    assert corr < 0.9


def test_waveshaper_and_limiters():
    x = np.linspace(-2, 2, 101).astype(np.float32)
    # brick wall clamps exactly
    np.testing.assert_allclose(np.asarray(limiter.brick_wall(x, 0.8)), np.clip(x, -0.8, 0.8))
    # soft limiter: tanh(x/t)*t
    np.testing.assert_allclose(
        np.asarray(limiter.soft_limit(x, 0.5)), np.tanh(x / 0.5) * 0.5, atol=1e-6
    )
    # waveshaper oracle (waveshaper.rs:59-68)
    drive = 4.0
    comp = np.tanh(0.5) / np.tanh(0.5 * drive)
    got = np.asarray(ws.process(x, drive, mix=1.0))
    np.testing.assert_allclose(got, np.tanh(x * drive) * comp, atol=1e-6)
    # bypass at drive <= 1
    np.testing.assert_allclose(np.asarray(ws.process(x, 1.0, mix=1.0)), x)
