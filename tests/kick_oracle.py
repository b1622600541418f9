"""Per-sample scalar oracle for the kick voice.

A straightforward sequential float32 implementation of the kick's per-sample
semantics (mirroring src/instruments/kick.rs tick/trigger behavior, but using
this framework's counter-based noise sources so RNG matches).  The blocked,
batched, scan-based device implementation must agree with this to ~1e-4.
"""

from __future__ import annotations

import numpy as np

from oversample_oracle import OracleOversampler

from libgooey_tpu.core import rng

F = np.float32


def _hash_white(counter: int) -> float:
    return float(np.asarray(rng.white(np.uint32(counter & 0xFFFFFFFF))))


class _Smoother:
    def __init__(self, value, coeff):
        self.cur = F(value)
        self.tgt = F(value)
        self.coeff = F(coeff)

    def set_target(self, v):
        self.tgt = F(min(max(v, 0.0), 1.0))

    def tick(self):
        if self.cur != self.tgt:
            self.cur = F(self.cur + self.coeff * (self.tgt - self.cur))
            if abs(self.cur - self.tgt) < 1e-4:
                self.cur = self.tgt
        return self.cur


def denorm(x, lo, hi):
    return F(lo + min(max(x, 0.0), 1.0) * (hi - lo))


def adsr_amp(elapsed, attack, decay, sustain, a_curve=1.0, d_curve=1.0):
    attack = max(attack, 0.001)
    decay = max(decay, 0.001)
    if elapsed < 0:
        return F(0.0)
    if elapsed < attack:
        p = elapsed / attack
        return F(p ** min(max(a_curve, 0.1), 10.0))
    if elapsed < attack + decay:
        p = (elapsed - attack) / decay
        curved = p ** min(max(d_curve, 0.1), 10.0)
        return F(1.0 - (1.0 - sustain) * curved)
    return F(sustain)


class KickOracle:
    """One kick voice, ticked per sample."""

    def __init__(self, config: dict, sample_rate=44100.0, coeff=None):
        from libgooey_tpu.core.smoother import smoothing_coeff

        self.sr = sample_rate
        c = coeff if coeff is not None else smoothing_coeff(sample_rate)
        self.p = {k: _Smoother(v, c) for k, v in config.items()}
        self.trig_n = None
        self.vel = 1.0
        self.pitch_mult = 1.0
        self.pitch_curve = 1.0
        self.amp_decay = 0.5
        self.amp_curve = 1.0
        self.pm_active = False
        # filter / shaper state
        self.click_state = 0.0
        self.svf_ic1 = 0.0
        self.svf_ic2 = 0.0
        self.pink_f = [0.0, 0.0, 0.0]
        self.ws_last = 0.0
        self.ws_filt = 0.0
        self.ws_dcx = 0.0
        self.ws_dcy = 0.0
        self.ws_env = 0.0
        self.ws_ovs = OracleOversampler(4)

    def trigger(self, n, velocity):
        self.vel = min(max(velocity, 0.0), 1.0)
        self.trig_n = n
        scale = 1.0 - 0.5 * self.vel * self.vel
        pea = self.p["pitch_envelope_amount"].cur
        psr = denorm(self.p["pitch_start_ratio"].cur, 1.0, 10.0)
        self.pitch_mult = F(1.0 + (psr - 1.0) * pea)
        pc = denorm(self.p["pitch_envelope_curve"].cur, 0.1, 4.0)
        self.pitch_curve = 1.0 if abs(pc - 1.0) < 0.01 else pc
        self.amp_decay = denorm(self.p["amp_decay"].cur, 0.0, 4.0) * scale
        ac = denorm(self.p["amp_decay_curve"].cur, 0.1, 10.0)
        self.amp_curve = 1.0 if abs(ac - 1.0) < 0.01 else ac
        self.pm_active = self.p["phase_mod_amount"].cur > 0.001
        # resets
        self.click_state = 0.0
        self.svf_ic1 = 0.0
        self.svf_ic2 = 0.0
        self.pink_f = [0.0, 0.0, 0.0]

    def tick(self, n) -> float:
        vals = {k: s.tick() for k, s in self.p.items()}
        if self.trig_n is None:
            return 0.0
        ei = n - self.trig_n
        idx = F(ei)
        elapsed = F(idx / F(self.sr))
        sr = F(self.sr)

        vel2 = self.vel * self.vel
        scale = F(1.0 - 0.5 * vel2)
        base_decay = F(denorm(vals["oscillator_decay"], 0.01, 4.0) * scale)
        semis = (min(max(vals["tuning"], 0.0), 1.0) - 0.5) * 24.0
        base_freq = F(denorm(vals["frequency"], 30.0, 120.0) * 2.0 ** (semis / 12.0))

        pitch_env = adsr_amp(elapsed, 0.001, base_decay, 0.0, 1.0, self.pitch_curve)
        fmult = F(1.0 + (self.pitch_mult - 1.0) * pitch_env)
        pm_amt = vals["phase_mod_amount"]
        if pm_amt > 0.001 and self.pm_active and 0.0 <= elapsed <= 0.006:
            if elapsed < 0.001:
                pm = (elapsed / 0.001) ** 0.3
            else:
                pm = 1.0 - ((elapsed - 0.001) / 0.005) ** 0.4
            fmult = F(fmult * (1.0 + pm * pm_amt * 2.0))

        osc_env = adsr_amp(elapsed, 0.001, base_decay, 0.0)
        two_pi = F(2.0 * np.pi)
        sub = F(np.sin(idx * F(base_freq * fmult) * two_pi / sr)) * osc_env * vals["sub"]

        # punch: additive odd harmonics, 1/i^2, Gibbs taper top 25%
        punch = F(0.0)
        pf = F(base_freq * 2.5 * fmult)
        nyq = sr / 2
        max_h = int(nyq / pf)
        i = 1
        acc = F(0.0)
        while i <= max_h and pf * i <= nyq:
            hf = pf * i
            ratio = hf / nyq
            taper = 1.0 - ((ratio - 0.75) / 0.25) ** 2 if ratio > 0.75 else 1.0
            acc += F((1.0 / i**2) * taper * np.sin(idx * F(hf) * two_pi / sr))
            i += 2
        punch = acc * osc_env * F(vals["punch"] * 0.7)

        click_env = adsr_amp(elapsed, 0.001, base_decay * 0.2, 0.0)
        cvs = 0.6 + 0.4 * self.vel
        click_raw = F(_hash_white(int(np.floor(idx)))) * click_env * F(
            vals["click"] * 0.15 * cvs
        )
        alpha = F(1.0 - np.exp(-2.0 * np.pi * 8000.0 / self.sr))
        hp = F(click_raw - self.click_state)
        self.click_state = F(self.click_state + alpha * hp)
        click_out = F(hp * (1.0 + 4.0 * 0.1))

        # pink noise layer
        noise_amt = vals["noise_amount"]
        from libgooey_tpu.ops.noise import DIRECT_GAIN, OUTPUT_GAIN, coefficients

        poles, gains = coefficients(self.sr)
        w = F(_hash_white(ei))
        for j in range(3):
            self.pink_f[j] = F(poles[j] * self.pink_f[j] + gains[j] * w)
        pink = F((sum(self.pink_f) + w * DIRECT_GAIN) * OUTPUT_GAIN)
        cut = denorm(vals["noise_cutoff"], 20.0, 10000.0)
        res = denorm(vals["noise_resonance"], 0.0, 5.0)
        g = F(np.tan(np.pi * min(max(cut, 20.0), self.sr * 0.45) / self.sr))
        r = F(1.0 / min(max(res, 0.5), 10.0))
        h = F(1.0 / (1.0 + r * g + g * g))
        v1 = F((g * (pink - self.svf_ic2) + self.svf_ic1) * h)
        v2 = F(self.svf_ic2 + g * v1)
        self.svf_ic1 = F(2 * v1 - self.svf_ic1)
        self.svf_ic2 = F(2 * v2 - self.svf_ic2)
        nf = 0.0 if abs(v2) < 1e-15 else v2
        noise_env = adsr_amp(elapsed, 0.001, base_decay, 0.0)
        noise_out = F(nf * noise_env * noise_amt * 0.5) if noise_amt > 0.001 else F(0.0)

        total = F(sub + punch + click_out + noise_out)

        # feedback waveshaper (mix=1), zero-feedback semantics
        od = vals["overdrive"]
        drive = F(1.0 + od**3 * 40.0)
        fb = F(vals["feedback"] * 0.98)
        fc = F(min(max(200.0 + vals["feedback_cutoff"] * 3800.0, 200.0), 20000.0))
        gcoef = F(min(max(1.0 - np.exp(-2.0 * np.pi * fc / self.sr), 0.0), 0.9))
        att = F(np.exp(-1.0 / (0.001 * self.sr)))
        rel = F(np.exp(-1.0 / (0.120 * self.sr)))
        # the block path always feeds the oversampler (bypass only gates
        # the output + freezes the env/DC/filter states)
        shaped_os = self.ws_ovs.process(F(drive * total + fb * self.ws_last),
                                        np.tanh)
        if drive <= 1.0:
            shaped_out = total  # bypass, downstream state frozen
        else:
            shaped = F(shaped_os)
            rect = abs(total)
            c = att if rect > self.ws_env else rel
            self.ws_env = F(self.ws_env + (1.0 - c) * (rect - self.ws_env))
            reference = max(self.ws_env, 0.05)
            driven = max(abs(np.tanh(reference * drive)), 1e-6)
            comp_no_fb = F(np.tanh(reference) / driven)
            dn = min(max((drive - 1.0) / 99.0, 0.0), 1.0)
            fn_ = min(max(fb / 0.98, 0.0), 1.0)
            high_end = dn**1.35 * fn_**2.0
            makeup = 10.0 ** (5.1 * high_end / 20.0)
            taming = 1.0 / (1.0 + comp_no_fb * fb * 0.25)
            comp = F(min(comp_no_fb * taming * makeup, 3.0))
            compensated = F(shaped * comp)
            dc_out = F(compensated - self.ws_dcx + 0.995 * self.ws_dcy)
            self.ws_dcx = compensated
            self.ws_dcy = dc_out
            self.ws_filt = F(self.ws_filt + gcoef * (dc_out - self.ws_filt))
            self.ws_last = self.ws_filt
            shaped_out = dc_out  # mix = 1

        amp_env = adsr_amp(
            elapsed, 0.001, max(self.amp_decay, 0.001), 0.0, 0.5, self.amp_curve
        )
        return float(
            F(shaped_out * amp_env * F(np.sqrt(self.vel)) * vals["volume"])
        )
