"""Per-sample scalar oracle for ONE poly-synth voice lane (poly_synth.rs
semantics as realized by libgooey_tpu.instruments.poly.render_block)."""

import numpy as np

from bass_oracle import ExactPhase, poly_blep

F = np.float32
TWO_PI = F(2.0 * np.pi)

PARAM_NAMES = (
    "osc_shape", "detune_amount", "filter_cutoff", "filter_resonance",
    "filter_env_amount", "amp_attack", "amp_decay", "amp_sustain",
    "amp_release", "filter_attack", "filter_decay", "filter_sustain",
    "filter_release", "volume",
)


def env_time(x):
    return F(0.001 * 5000.0 ** min(max(x, 0.0), 1.0))


def cutoff_hz(x):
    return F(20.0 * (18000.0 / 20.0) ** min(max(x, 0.0), 1.0))


def adsr_amp(elapsed, a, d, s, release_elapsed, release):
    """core.envelope.amplitude with sustain + linear release ramp."""

    def held(e):
        if e < 0.0:
            return F(0.0)
        if e < a:
            return F(max(e / a, 0.0))
        if e < a + d:
            return F(1.0 - (1.0 - s) * (max((e - a) / d, 0.0) ** 0.5))
        return F(s)

    if release_elapsed > 0.0:
        pre = held(elapsed - release_elapsed)
        return F(pre * max(1.0 - release_elapsed / release, 0.0))
    return held(elapsed)


class PolyVoiceOracle:
    """One lane; params settled (targets == current) for clarity."""

    def __init__(self, config: dict, sample_rate=44100.0, block_size=512):
        self.sr = sample_rate
        self.p = {k: F(min(max(config.get(k, 0.5), 0.0), 1.0))
                  for k in PARAM_NAMES}
        self.trig_sample = -(2**30)
        self.release_sample = -(2**30)
        self.ever = False
        self.vel = F(1.0)
        self.freq = F(440.0)
        self.amp = (0.01, 0.3, 0.7, 0.5)
        self.filt = (0.01, 0.3, 0.7, 0.5)
        self._osc_a = ExactPhase(block_size)
        self._osc_b = ExactPhase(block_size)
        self.ph_a = F(0.0)
        self.ph_b = F(0.0)
        self.ic1 = F(0.0)
        self.ic2 = F(0.0)
        self.n = 0
        self._trig = None
        self._rel = False
        self.phase_trace = []

    def trigger(self, freq, velocity=1.0):
        self._trig = (F(freq), F(velocity))

    def release(self):
        self._rel = True

    def tick(self):
        p = self.p
        reset = self._trig is not None
        if reset:
            self.freq, self.vel = self._trig
            self.trig_sample = self.n
            self.amp = (max(env_time(p["amp_attack"]), 0.001),
                        max(env_time(p["amp_decay"]), 0.001),
                        min(max(p["amp_sustain"], 0.0), 1.0),
                        max(env_time(p["amp_release"]), 0.001))
            self.filt = (max(env_time(p["filter_attack"]), 0.001),
                         max(env_time(p["filter_decay"]), 0.001),
                         min(max(p["filter_sustain"], 0.0), 1.0),
                         max(env_time(p["filter_release"]), 0.001))
            self.ever = True
            self._trig = None
        if self._rel:
            self.release_sample = self.n
            self._rel = False
        # a (re)trigger at/after the release clears it
        if self.release_sample <= self.trig_sample:
            self.release_sample = -(2**30)

        elapsed = (self.n - self.trig_sample) / self.sr
        rel_elapsed = (max(self.n - self.release_sample, 0) / self.sr
                       if self.release_sample > -(2**30) else 0.0)

        amp_env = adsr_amp(elapsed, *self.amp[:3], rel_elapsed, self.amp[3])
        filt_env = adsr_amp(elapsed, *self.filt[:3], rel_elapsed, self.filt[3])

        detune = F(1.0 + p["detune_amount"] * 0.0175)
        inc_a = F(self.freq / self.sr)
        inc_b = F(self.freq * detune / self.sr)
        # exact split-increment mod-1 phase, mirroring the bank's
        # ops.scan.phase_cumsum_reset (polyblep.rs keeps f64 phase; both
        # track the exact recurrence to ~1e-7 cycles, and sharing the
        # bank's arithmetic makes the comparison pointwise)
        self.ph_a = self._osc_a.tick(inc_a, reset)
        self.ph_b = self._osc_b.tick(inc_b, reset)
        self.phase_trace.append((self.ph_a, self.ph_b, inc_a, inc_b))
        shape = p["osc_shape"]

        def pair(ph, inc):
            saw = F((2.0 * ph - 1.0) - poly_blep(ph, inc))
            sq = F((1.0 if ph < 0.5 else -1.0) + poly_blep(ph, inc)
                   - poly_blep((ph + 0.5) % 1.0, inc))
            return F(saw * (1.0 - shape) + sq * shape)

        osc_mix = F((pair(self.ph_a, inc_a) + pair(self.ph_b, inc_b)) * 0.5)

        base = cutoff_hz(p["filter_cutoff"])
        cut = min(max(base + p["filter_env_amount"] * filt_env
                      * (18000.0 - base), 20.0), 18000.0)
        cut = min(max(cut, 20.0), self.sr * 0.45)
        g = F(np.tan(np.pi * cut / self.sr))
        q = F(0.5 + p["filter_resonance"] * 14.5)
        r = F(1.0 / max(q, 0.5))
        h = F(1.0 / (1.0 + r * g + g * g))
        if reset:
            self.ic1 = self.ic2 = F(0.0)
        v1 = F((g * (osc_mix - self.ic2) + self.ic1) * h)
        v2 = F(self.ic2 + g * v1)
        self.ic1 = F(2.0 * v1 - self.ic1)
        self.ic2 = F(2.0 * v2 - self.ic2)
        lp = v2

        out = F(lp * amp_env * np.sqrt(self.vel) * p["volume"])
        if not self.ever:
            out = F(0.0)
        self.n += 1
        # the bank mixes 6 lanes with 1/4 headroom; one active lane:
        return float(F(out * 0.25))
