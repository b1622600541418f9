"""Per-sample scalar oracle for the snare voice (mirrors snare.rs semantics
with this framework's counter-based noise)."""

from __future__ import annotations

import numpy as np

from oversample_oracle import OracleOversampler

from kick_oracle import _Smoother, _hash_white, adsr_amp, denorm

F = np.float32


class SnareOracle:
    def __init__(self, config: dict, filter_type=1, sample_rate=44100.0):
        self.ws_ovs = OracleOversampler(4)
        from libgooey_tpu.core.smoother import smoothing_coeff

        self.sr = sample_rate
        c = smoothing_coeff(sample_rate)
        self.p = {k: _Smoother(v, c) for k, v in config.items()}
        self.filter_type = filter_type
        self.trig_n = None
        self.vel = 0.5
        self.pitch_mult = 1.0
        self.tonal_curve = 1.0
        self.amp_decay = 0.5
        self.amp_curve = 1.0
        self.pm_active = False
        self.low = 0.0
        self.band = 0.0

    def trigger(self, n, velocity):
        self.vel = min(max(velocity, 0.0), 1.0)
        self.trig_n = n
        self.pitch_mult = F(1.0 + self.p["pitch_drop"].cur * 1.5)
        self.tonal_curve = denorm(self.p["tonal_decay_curve"].cur, 0.1, 10.0)
        scale = 1.0 - 0.45 * self.vel**2
        self.amp_decay = denorm(self.p["amp_decay"].cur, 0.0, 4.0) * scale
        self.amp_curve = denorm(self.p["amp_decay_curve"].cur, 0.1, 10.0)
        self.pm_active = self.p["phase_mod_amount"].cur > 0.001
        self.low = 0.0
        self.band = 0.0

    def tick(self, n):
        vals = {k: s.tick() for k, s in self.p.items()}
        if self.trig_n is None:
            return 0.0
        ei = n - self.trig_n
        idx = F(ei)
        elapsed = F(idx / F(self.sr))
        sr = F(self.sr)
        two_pi = F(2 * np.pi)

        vel2 = self.vel**2
        decay_scale = F(1.0 - 0.45 * vel2)
        pitch_scale = F(1.0 - 0.5 * vel2)
        scaled_decay = F(denorm(vals["decay"], 0.05, 3.5) * decay_scale)
        pitch_decay = min(scaled_decay * 0.3 * pitch_scale, scaled_decay * 0.25)
        semis = (min(max(vals["tuning"], 0), 1) - 0.5) * 24.0
        base_freq = F(denorm(vals["frequency"], 100.0, 600.0) * 2.0 ** (semis / 12))

        pitch_env = adsr_amp(elapsed, 0.001, pitch_decay, 0.0)
        fmult = F(1.0 + (self.pitch_mult - 1.0) * pitch_env)
        pm_amt = vals["phase_mod_amount"]
        if pm_amt > 0.001 and self.pm_active and 0 <= elapsed <= 0.006:
            pm = (elapsed / 0.001) ** 0.3 if elapsed < 0.001 else 1.0 - ((elapsed - 0.001) / 0.005) ** 0.4
            fmult = F(fmult * (1.0 + pm * pm_amt))

        hold_env = adsr_amp(elapsed, 0.001, 0.001, 1.0)

        # tonal: additive odd harmonics 1/i^2 with Gibbs taper
        tf = F(base_freq * fmult)
        nyq = sr / 2
        max_h = int(nyq / tf)
        acc = F(0.0)
        i = 1
        while i <= max_h and tf * i <= nyq:
            hf = tf * i
            ratio = hf / nyq
            taper = 1.0 - ((ratio - 0.75) / 0.25) ** 2 if ratio > 0.75 else 1.0
            acc += F((1.0 / i**2) * taper * np.sin(idx * F(hf) * two_pi / sr))
            i += 2
        tonal_env = adsr_amp(
            elapsed, 0.001, denorm(vals["tonal_decay"], 0.0, 3.5) * decay_scale,
            0.0, 1.0, self.tonal_curve,
        )
        xf = vals["xfade"]
        tonal_out = acc * hold_env * vals["tonal"] * tonal_env * (1 - xf)

        # noise through Chamberlin SVF (2x iterated)
        w = F(_hash_white(int(np.floor(idx))))
        noise_raw = F(w * hold_env * vals["noise"] * 0.8)
        cutoff = denorm(vals["filter_cutoff"], 100.0, 10000.0)
        res = denorm(vals["filter_resonance"], 0.5, 10.0)
        f = F(2.0 * np.sin(np.pi * min(cutoff / self.sr, 0.45)))
        q = F(1.0 / max(res, 0.5))
        high = 0.0
        for _ in range(2):
            self.low = F(self.low + f * self.band)
            high = F(noise_raw - self.low - q * self.band)
            self.band = F(f * high + self.band)
        taps = {0: self.low, 1: self.band, 2: high, 3: self.low + high}
        filtered = taps.get(self.filter_type, self.band)
        noise_env = adsr_amp(elapsed, 0.001, denorm(vals["noise_decay"], 0.0, 3.5) * decay_scale, 0.0)
        tail_env = adsr_amp(elapsed, 0.001, denorm(vals["noise_tail_decay"], 0.0, 3.5) * decay_scale, 0.0)
        noise_out = F(filtered * (noise_env * 0.7 + tail_env * 0.3) * xf)

        crack_env = adsr_amp(elapsed, 0.001, scaled_decay * 0.2, 0.0)
        crack_out = F(w * crack_env * vals["brightness"] * 0.4 * (0.7 + 0.3 * self.vel))

        total = F(tonal_out + noise_out + crack_out)

        drive = F(1.0 + vals["overdrive"] * 9.0)
        d_eff = max(drive, 1.0 + 1e-6)
        comp = F(np.tanh(0.5) / np.tanh(0.5 * d_eff))
        shaped_os = self.ws_ovs.process(
            total, lambda v: np.tanh(v * d_eff) * comp
        )  # always fed (ws.process evaluates through the oversampler
        #    unconditionally; bypass only selects the output)
        shaped = total if drive <= 1.0 else F(shaped_os)

        amp_env = adsr_amp(elapsed, 0.001, max(self.amp_decay, 0.001), 0.0, 1.0, self.amp_curve)
        return float(F(shaped * amp_env * F(np.sqrt(self.vel)) * vals["volume"]))
