"""Per-sample scalar oracle for the HiHat2 bank (hihat2.rs semantics as
realized by libgooey_tpu.instruments.hihat2.render_block)."""

import numpy as np

from libgooey_tpu.ops.noise import DIRECT_GAIN, OUTPUT_GAIN, coefficients

F = np.float32
TWO_PI = F(2.0 * np.pi)

PITCH_RANGE = (3500.0, 10_000.0)
ATTACK_MS_RANGE = (0.5, 200.0)
DECAY_MS_RANGE = (0.5, 4000.0)
TONE_RANGE = (500.0, 10_000.0)
PARAM_NAMES = ("pitch", "decay", "attack", "tone", "volume", "tuning")
DEFAULT_SEED = 0x9ABCDEF0  # rng.DEFAULT_SEED


M32 = 0xFFFFFFFF


def mix32(x):
    x = int(x) & M32
    x ^= x >> 16
    x = (x * 0x7FEB352D) & M32
    x ^= x >> 15
    x = (x * 0x846CA68B) & M32
    x ^= x >> 16
    return x


def white(counter, seed=DEFAULT_SEED):
    s = (int(seed) * 0x9E3779B9 + 0x85EBCA6B) & M32
    bits = mix32((int(counter) & M32) ^ mix32(s)) >> 8
    return F(F(bits) / F((1 << 24) - 1) * 2.0 - 1.0)


def denorm(x, lo, hi):
    return F(lo + min(max(x, 0.0), 1.0) * (hi - lo))


def tuning_mult(x):
    return F(2.0 ** (((min(max(x, 0.0), 1.0) - 0.5) * 24.0) / 12.0))


def max_curve(p, c):
    p = min(max(p, 0.0), 1.0)
    cabs = abs(c)
    if cabs < 1e-6:
        return F(p)

    def one_sided(p):
        hp = ((cabs + 1e-20) * 1.2) ** 0.41 * 0.91
        fp = hp / (1.0 - hp)
        if abs(fp) < 1e-6:
            return p
        return np.expm1(fp * p) / np.expm1(fp)

    return F(1.0 - one_sided(1.0 - p)) if c < 0 else F(one_sided(p))


class HiHat2Oracle:
    def __init__(self, config: dict, sample_rate=44100.0, coeff=None,
                 filter_slope=1, noise_color=0, voice_salt=0):
        from libgooey_tpu.core.smoother import smoothing_coeff

        self.sr = sample_rate
        self.q = F(1.0 - (coeff if coeff is not None else
                          float(np.asarray(smoothing_coeff(sample_rate)))))
        self.cur = {n: F(min(max(config.get(n, 0.5), 0.0), 1.0))
                    for n in PARAM_NAMES}
        self.tgt = dict(self.cur)
        self.slope24 = filter_slope == 1
        self.pink_sel = noise_color == 1
        self.salt = np.uint32((int(voice_salt) * 0x9E3779B9) & 0xFFFFFFFF)
        self.trig_sample = -(2**30)
        self.vel = F(1.0)
        # f64 phase accumulators = the exact mod-1 recurrence.  DOCUMENTED
        # DEVIATION: hihat2.rs PhaseModOsc keeps phase_cycle in f32 and
        # drifts from the exact phase by a per-sample rounding random walk
        # (~1e-4 of output amplitude after 2k samples through the FM
        # chain); the bank's split-increment accumulation tracks the exact
        # phase to ~1e-7 cycles, so the oracle pins the exact recurrence.
        self.mod_phase = 0.0
        self.main_phase = 0.0
        self.env = F(0.0)
        self.hp1 = [F(0.0)] * 4  # x1 x2 y1 y2
        self.hp2 = [F(0.0)] * 4
        self.ic1 = F(0.0)
        self.ic2 = F(0.0)
        self.pink_poles, self.pink_gains = coefficients(sample_rate)
        self.pink_state = [F(0.0)] * 3
        self.down_k = F(1.0 - np.exp(-1.0 / 100.0))
        self.n = 0
        self._pending = None

    def set_param(self, name, value):
        self.tgt[name] = F(min(max(value, 0.0), 1.0))

    def trigger(self, velocity):
        self._pending = F(min(max(velocity, 0.0), 1.0))

    def _biquad(self, st, x, b0, b1, b2, a1, a2, reset):
        if reset:
            st[0] = st[1] = st[2] = st[3] = F(0.0)
        y = F(b0 * x + b1 * st[0] + b2 * st[1] - a1 * st[2] - a2 * st[3])
        out = F(0.0) if abs(y) < 1e-15 else y
        st[1] = st[0]
        st[0] = F(x)
        st[3] = st[2]
        st[2] = y
        return out

    def tick(self):
        reset = self._pending is not None
        if reset:
            self.vel = self._pending
            self.trig_sample = self.n
            self._pending = None

        for name in PARAM_NAMES:
            delta = F((self.cur[name] - self.tgt[name]) * self.q)
            self.cur[name] = self.tgt[name] + (F(0.0) if abs(delta) < 1e-4
                                               else delta)
        p = self.cur

        elapsed = (self.n - self.trig_sample) / self.sr
        attack_s = denorm(p["attack"], *ATTACK_MS_RANGE) * 0.001
        decay_s = denorm(p["decay"], *DECAY_MS_RANGE) * 0.001
        pitch_hz = F(denorm(F(p["pitch"] * p["pitch"]), *PITCH_RANGE)
                     * tuning_mult(p["tuning"]))

        # noise (global-sample counter, never reset)
        counter = np.uint32(np.uint32(self.n) + self.salt)
        w = white(counter)
        if self.pink_sel:
            outs = []
            for i in range(3):
                y = F(self.pink_poles[i] * self.pink_state[i]
                      + self.pink_gains[i] * w)
                self.pink_state[i] = y
                outs.append(y)
            noise = F((outs[0] + outs[1] + outs[2] + w * DIRECT_GAIN)
                      * OUTPUT_GAIN)
        else:
            noise = w

        # phase-mod chain
        mod_inc = F(pitch_hz * 0.1 / self.sr)
        main_inc = F(pitch_hz / self.sr)
        self.mod_phase = (float(mod_inc) + (0.0 if reset else self.mod_phase)) % 1.0
        self.main_phase = (float(main_inc) + (0.0 if reset else self.main_phase)) % 1.0
        mod_out = F(np.sin(TWO_PI * ((self.mod_phase + noise * F(0.25)) % 1.0)))
        main_out = F(np.sin(TWO_PI * ((self.main_phase + mod_out * F(0.75)) % 1.0)))

        # RBJ highpass stages at pitch (q = 1)
        omega = 2.0 * np.pi * pitch_hz / self.sr
        sin_o, cos_o = np.sin(omega), np.cos(omega)
        alpha = sin_o / 2.0
        a0 = 1.0 + alpha
        b0 = F((1.0 + cos_o) / 2.0 / a0)
        b1 = F(-(1.0 + cos_o) / a0)
        b2 = F((1.0 + cos_o) / 2.0 / a0)
        a1 = F(-2.0 * cos_o / a0)
        a2 = F((1.0 - alpha) / a0)
        y1 = self._biquad(self.hp1, main_out, b0, b1, b2, a1, a2, reset)
        y2 = self._biquad(self.hp2, y1, b0, b1, b2, a1, a2, reset)
        filtered = F(y2 * 0.8) if self.slope24 else y1

        # MaxCurve envelope through the asymmetric smoother
        if elapsed < 0.0:
            env_raw = F(0.0)
        elif elapsed < attack_s:
            prog = elapsed / max(attack_s, 1e-9) if attack_s > 0 else 1.0
            env_raw = max_curve(prog, -0.3)
        else:
            prog = ((elapsed - attack_s) / max(decay_s, 1e-9)
                    if decay_s > 0 else 1.0)
            env_raw = F(1.0 - max_curve(min(max(prog, 0.0), 1.0), -0.8))
        prev = F(0.0) if reset else self.env
        self.env = F(max(env_raw, (1.0 - self.down_k) * prev
                         + self.down_k * env_raw))

        output = F(filtered * self.env * self.vel * F(0.35))

        # tone SVF highpass (q=0.5 → r=2)
        tone = min(max(denorm(p["tone"], *TONE_RANGE), 20.0), self.sr * 0.45)
        g = F(np.tan(np.pi * tone / self.sr))
        r = F(2.0)
        h = F(1.0 / (1.0 + r * g + g * g))
        if reset:
            self.ic1 = self.ic2 = F(0.0)
        v1 = F((g * (output - self.ic2) + self.ic1) * h)
        v2 = F(self.ic2 + g * v1)
        hp = F(output - (r * v1 + v2))
        self.ic1 = F(2.0 * v1 - self.ic1)
        self.ic2 = F(2.0 * v2 - self.ic2)

        out = F(hp * p["volume"])
        self.n += 1
        return float(out)
