"""Plate reverb vs per-sample oracle + the reference's T60/width assertions
(plate_reverb.rs:566-765)."""

import numpy as np

from libgooey_tpu.effects import reverb_plate as plate

SR = 44100.0
B = 512


class _Line:
    def __init__(self, capacity):
        self.buf = np.zeros(max(capacity, 4), np.float32)
        self.idx = 0

    def write(self, x):
        self.buf[self.idx] = np.float32(x)
        self.idx = (self.idx + 1) % len(self.buf)

    def read_frac(self, offset):
        ln = len(self.buf)
        offset = min(max(offset, 1.0), ln - 2)
        whole = int(offset)
        frac = offset - whole
        a = self.buf[(self.idx + ln - whole) % ln]
        b = self.buf[(self.idx + ln - whole - 1) % ln]
        return a + frac * (b - a)

    def tap_frac(self, offset):
        ln = len(self.buf)
        offset = min(max(offset, 0.0), ln - 2)
        whole = int(offset)
        frac = offset - whole
        a = self.buf[(self.idx + ln - 1 - whole) % ln]
        b = self.buf[(self.idx + ln - 2 - whole) % ln]
        return a + frac * (b - a)

    def allpass(self, x, gain, delay):
        d = self.read_frac(delay)
        v = x - gain * d
        self.write(v)
        return gain * v + d


def plate_oracle(mono_in, decay, mix, damping, predelay=0.0, width=1.0, size=0.5):
    srs = SR / plate.DATTORRO_SR
    exc = plate.EXCURSION * srs
    sz = 4.0 ** (2 * size - 1) if size <= 0.5 else 2.0 ** (2 * size - 1)
    fixed = lambda b: _Line(int(np.ceil(b * srs)) + 4)
    sized = lambda b, h: _Line(int(np.ceil(b * 2.0 * srs + h)) + 4)
    pre = _Line(int(np.ceil(0.2 * SR)) + 8)
    iaps = [fixed(d) for d in plate.INPUT_AP_DELAYS]
    map_a, d1a, ap2a, d2a = sized(672, exc), sized(4453, 0), sized(1800, 0), sized(3720, 0)
    map_b, d1b, ap2b, d2b = sized(908, exc), sized(4217, 0), sized(2656, 0), sized(3163, 0)
    bw = da = db = fba = fbb = 0.0
    pa = pb = 0.0
    decay_g = decay * 0.95
    dd2 = min(max(decay_g + 0.15, 0.25), 0.5)
    damp = damping * 0.95
    outs_l, outs_r = [], []
    for x in mono_in:
        pre.write(x)
        din = pre.tap_frac(predelay * 0.2 * SR)
        bw += plate.INPUT_BANDWIDTH * (din - bw)
        sig = bw
        for ap, (d, g) in zip(iaps, zip(plate.INPUT_AP_DELAYS, plate.INPUT_AP_GAINS)):
            sig = ap.allpass(sig, g, max(d * srs, 1.0))
        pa = (pa + plate.LFO_RATE_A / SR) % 1.0
        pb = (pb + plate.LFO_RATE_B / SR) % 1.0
        lfa, lfb = np.sin(2 * np.pi * pa), np.sin(2 * np.pi * pb)
        in_a, in_b = sig + fbb, sig + fba
        a1 = map_a.allpass(in_a, 0.70, 672 * srs * sz + lfa * exc)
        ra = d1a.read_frac(4453 * srs * sz)
        d1a.write(a1)
        da = ra * (1 - damp) + da * damp
        a2 = ap2a.allpass(da * decay_g, dd2, 1800 * srs * sz)
        rda = d2a.read_frac(3720 * srs * sz)
        d2a.write(a2)
        b1 = map_b.allpass(in_b, 0.70, 908 * srs * sz + lfb * exc)
        rb = d1b.read_frac(4217 * srs * sz)
        d1b.write(b1)
        db = rb * (1 - damp) + db * damp
        b2 = ap2b.allpass(db * decay_g, dd2, 2656 * srs * sz)
        rdb = d2b.read_frac(3163 * srs * sz)
        d2b.write(b2)
        fba, fbb = rda * decay_g, rdb * decay_g
        ts = srs * sz
        yl = 0.6 * (d1b.tap_frac(266 * ts) + d1b.tap_frac(2974 * ts)
                    - ap2b.tap_frac(1913 * ts) + d2b.tap_frac(1996 * ts)
                    - d1a.tap_frac(1990 * ts) - ap2a.tap_frac(187 * ts)
                    - d2a.tap_frac(1066 * ts))
        yr = 0.6 * (d1a.tap_frac(353 * ts) + d1a.tap_frac(3627 * ts)
                    - ap2a.tap_frac(1228 * ts) + d2a.tap_frac(2673 * ts)
                    - d1b.tap_frac(2111 * ts) - ap2b.tap_frac(335 * ts)
                    - d2b.tap_frac(121 * ts))
        mid, side = 0.5 * (yl + yr), 0.5 * (yl - yr) * width
        outs_l.append(mid + side)
        outs_r.append(mid - side)
    return np.array(outs_l), np.array(outs_r)


def run_plate(x, decay, mix, damping, predelay=0.0, width=1.0, size=0.5, n=None):
    st = plate.init_state(SR, decay, mix, damping, predelay, width, size)
    targets = np.array([decay, mix, damping, predelay, width, size], np.float32)
    outs = []
    for i in range(0, x.shape[-1], B):
        st, y = plate.process_block(st, x[:, i : i + B], targets, sample_rate=SR)
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1)


def test_plate_matches_oracle():
    n = 6144
    x = np.zeros((2, n), np.float32)
    x[:, 0] = 1.0
    got = run_plate(x, 0.5, 1.0, 0.4, size=0.5)
    wl, wr = plate_oracle(x[0], 0.5, 1.0, 0.4, size=0.5)
    # wet-only: mix=1 → out = wet
    err = max(np.max(np.abs(got[0] - wl)), np.max(np.abs(got[1] - wr)))
    peak = max(np.abs(wl).max(), 1e-9)
    assert err < 1e-4, (err, peak)


def test_plate_matches_oracle_small_size():
    n = 4096
    x = np.zeros((2, n), np.float32)
    x[:, 0] = 1.0
    got = run_plate(x, 0.7, 1.0, 0.2, size=0.1)
    wl, wr = plate_oracle(x[0], 0.7, 1.0, 0.2, size=0.1)
    err = max(np.max(np.abs(got[0] - wl)), np.max(np.abs(got[1] - wr)))
    assert err < 1e-4, err


def test_plate_t60_in_range():
    """decay 0.5, full wet → T60 between 0.3 and 4 s (plate_reverb.rs:613-649)."""
    n = int(SR * 5)
    x = np.zeros((2, n), np.float32)
    x[:, :4] = 1.0
    out = run_plate(x, 0.5, 1.0, 0.3)[0]
    env = np.array([
        np.sqrt(np.mean(out[i : i + 2048] ** 2) + 1e-30)
        for i in range(0, n - 2048, 2048)
    ])
    peak_i = int(np.argmax(env))
    peak = env[peak_i]
    below = np.nonzero(env[peak_i:] < peak * 1e-3)[0]  # -60 dB
    assert len(below) > 0, "tail never reached -60 dB within 5 s"
    t60 = below[0] * 2048 / SR
    assert 0.3 < t60 < 4.0, t60


def test_plate_width_zero_collapses():
    n = 8192
    x = np.zeros((2, n), np.float32)
    x[:, 0] = 1.0
    out = run_plate(x, 0.5, 1.0, 0.3, width=0.0)
    np.testing.assert_allclose(out[0], out[1], atol=1e-6)


def test_plate_stable_at_max_decay():
    n = int(SR * 2)
    x = np.zeros((2, n), np.float32)
    x[:, :100] = 1.0
    out = run_plate(x, 1.0, 1.0, 0.0)
    assert np.all(np.isfinite(out))
    assert np.abs(out).max() < 50.0
