"""Per-sample scalar oracle for the Tom2 bank (tom2.rs semantics as realized
by libgooey_tpu.instruments.tom2.render_block)."""

import numpy as np

from hihat2_oracle import max_curve, mix32, white
from libgooey_tpu.ops.filters import MEMBRANE_PARAMS
from libgooey_tpu.ops.morph import RAND_SEED, TOM_IMPULSE

F = np.float32
TWO_PI = F(2.0 * np.pi)
FREQ_MIN, FREQ_MAX = 40.0, 600.0
FADE_START_FREQ, MIN_AUDIBLE_FREQ = 40.0, 20.0
DECAY_MIN_MS, DECAY_MAX_MS = 0.5, 4000.0


def tuning_mult(x):
    return F(2.0 ** (((min(max(x, 0.0), 1.0) - 0.5) * 24.0) / 12.0))


def mtof(midi):
    return F(440.0 * 2.0 ** ((midi - 69.0) / 12.0))


def triangle_from_phase(phase):
    t = phase % 1.0
    return F(4.0 * t - 1.0) if t < 0.5 else F(3.0 - 4.0 * t)


class _Biquad:
    def __init__(self):
        self.x1 = self.x2 = self.y1 = self.y2 = F(0.0)

    def tick(self, x, b0, b1, b2, a1, a2, reset):
        if reset:
            self.x1 = self.x2 = self.y1 = self.y2 = F(0.0)
        y = F(b0 * x + b1 * self.x1 + b2 * self.x2
              - a1 * self.y1 - a2 * self.y2)
        out = F(0.0) if abs(y) < 1e-15 else y
        self.x2 = self.x1
        self.x1 = F(x)
        self.y2 = self.y1
        self.y1 = y
        return out


def bp_coeffs(freq, q, gain, sr):
    freq = min(max(freq, 20.0), sr * 0.5 * 0.95)
    q = min(max(q, 0.1), 100.0)
    omega = 2.0 * np.pi * freq / sr
    sin_o, cos_o = np.sin(omega), np.cos(omega)
    alpha = sin_o / (2.0 * q)
    a0 = 1.0 + alpha
    return (F(q * alpha * gain / a0), F(0.0), F(-q * alpha * gain / a0),
            F(-2.0 * cos_o / a0), F((1.0 - alpha) / a0))


class Tom2Oracle:
    def __init__(self, config: dict, sample_rate=44100.0):
        self.sr = sample_rate
        self.p = {k: F(v) for k, v in config.items()}
        self.trig_sample = -(2**30)
        self.decay_s = F(2.0)
        # standalone triangle + morph phase accumulators.  f64 = the exact
        # mod-1 recurrence; DOCUMENTED DEVIATION: morph_osc.rs keeps f32
        # phases that drift from the exact phase by per-sample rounding —
        # the bank tracks the exact recurrence (scan.phase_cumsum_reset)
        self.tri_phase = 0.0
        self.m_main = 0.0
        self.m_tri = 0.0
        self.m_fixed = 0.0
        self.m_gated = 0.0
        self.m_rand_seg = 0
        self.m_rand_frac = F(0.0)
        self.bandpass = _Biquad()
        self.membrane = [_Biquad() for _ in range(5)]
        self.ring = F(0.0)
        self.n = 0
        self._pending = False

    def trigger(self):
        self._pending = True

    def tick(self):
        reset = self._pending
        if reset:
            self.trig_sample = self.n
            self.decay_s = F((DECAY_MIN_MS + (self.p["decay"] / 100.0)
                              * (DECAY_MAX_MS - DECAY_MIN_MS)) * 0.001)
            self._pending = False
        p = self.p
        sr = self.sr

        elapsed_i = self.n - self.trig_sample
        elapsed = elapsed_i * F(1.0 / sr)
        attack_s = 0.001
        if elapsed < 0.0:
            env = F(0.0)
        elif elapsed < attack_s:
            env = max_curve(elapsed / attack_s, 0.8)
        else:
            prog = min(max((elapsed - attack_s) / self.decay_s, 0.0), 1.0)
            env = F(1.0 - max_curve(prog, -0.83))
        env_complete = elapsed >= (attack_s + self.decay_s)

        base_freq = F((FREQ_MIN + (p["tune"] / 100.0) ** 2
                       * (FREQ_MAX - FREQ_MIN)) * tuning_mult(p["tuning"]))
        bend_scaled = F((p["bend"] / 100.0) * 2.0)
        raw_freq = F(base_freq * (1.0 + (env * bend_scaled) ** 2))
        past_attack = (elapsed >= attack_s) or (env > 0.9)
        main_done = env_complete or (past_attack and raw_freq < MIN_AUDIBLE_FREQ)
        fade_factor = F((raw_freq - MIN_AUDIBLE_FREQ)
                        / (FADE_START_FREQ - MIN_AUDIBLE_FREQ)) \
            if (past_attack and raw_freq < FADE_START_FREQ) else F(1.0)
        fade_factor = F(fade_factor)
        mod_freq = F(max(raw_freq, FREQ_MIN))

        # sources
        click = F(TOM_IMPULSE[elapsed_i] * 1.1) \
            if 0 <= elapsed_i < len(TOM_IMPULSE) else F(0.0)
        tri_inc = F(mod_freq / sr)
        self.tri_phase = (float(tri_inc) + (0.0 if reset else self.tri_phase)) % 1.0
        tri = F(triangle_from_phase((self.tri_phase - float(tri_inc)) % 1.0) * 0.5)

        mix_control = F((p["tone"] / 100.0) * 2.0 - 1.0)
        color_midi = F(30.0 + (p["color"] / 100.0) * 20.0)
        # morph oscillator
        inc = F(mod_freq / sr)
        self.m_main = (float(inc) + (0.0 if reset else self.m_main)) % 1.0
        self.m_tri = (float(inc) + (0.0 if reset else self.m_tri)) % 1.0
        self.m_gated = (float(inc) + (0.0 if reset else self.m_gated)) % 1.0
        fixed_inc = F(190.0 / sr)
        self.m_fixed = (float(fixed_inc) + (0.0 if reset else self.m_fixed)) % 1.0
        used = lambda ph, i: F((ph - float(i)) % 1.0)
        main_sine = F(np.sin(TWO_PI * used(self.m_main, inc)) * 0.5)
        m_tri = F(triangle_from_phase(used(self.m_tri, inc)) * 0.5)
        fixed_sine = F(np.sin(TWO_PI * used(self.m_fixed, fixed_inc)) * 0.5)
        gated = F(np.sin(TWO_PI * used(self.m_gated, inc)) * 0.2) \
            if p["tone"] < 99.0 else F(0.0)
        w = F(white(np.uint32(elapsed_i & 0xFFFFFFFF)) * 0.2)
        rr = mtof(mtof(color_midi))     # rand~ rate: the Max patch's double-mtof
        if reset:
            self.m_rand_seg, self.m_rand_frac = 0, F(0.0)
        t = F(self.m_rand_frac + F(rr / sr))
        self.m_rand_seg += int(np.floor(t))
        self.m_rand_frac = F(t - np.floor(t))
        seg = self.m_rand_seg
        frac = self.m_rand_frac
        tgt = white(np.uint32(seg), RAND_SEED) if seg >= 1 else F(0.0)
        cur = white(np.uint32(seg - 1), RAND_SEED) if seg >= 2 else F(0.0)
        rand_value = F(cur + (tgt - cur) * frac)
        noise_combined = F((w + rand_value) * 0.4)
        ch1 = F(main_sine * fixed_sine)
        ch2 = F(m_tri + noise_combined)
        ch3 = F(noise_combined + gated)
        w1 = min(max(-mix_control, 0.0), 1.0)
        w2 = min(max(1.0 - abs(mix_control), 0.0), 1.0)
        w3 = min(max(mix_control, 0.0), 1.0)
        morph_out = F(ch1 * w1 + ch2 * w2 + ch3 * w3)

        mixed = F(click + tri + morph_out)

        # pitch-tracking bandpass
        color_n = p["color"] / 100.0
        filtered = self.bandpass.tick(
            mixed, *bp_coeffs(max(mod_freq, 20.0), 1.0 + color_n * color_n,
                              1.1, sr), reset)

        # membrane resonator
        q_scale = F(0.005 + (p["membrane_q"] / 100.0) * 0.015)
        gain_scale = F(0.003)
        membrane_mix = F(p["membrane"] / 100.0)
        mem_in = F(0.0) if (main_done or membrane_mix <= 0.0) \
            else F(filtered * env)
        total = F(0.0)
        for i in range(5):
            gain, freq, q = MEMBRANE_PARAMS[i]
            total = F(total + self.membrane[i].tick(
                mem_in, *bp_coeffs(float(freq),
                                   min(max(float(q) * q_scale, 0.1), 100.0),
                                   float(gain) * gain_scale, sr), reset))
        mem_out = F(np.tanh(total))
        prev_ring = F(0.0) if reset else self.ring
        self.ring = F(0.999 * prev_ring + 0.001 * abs(mem_out))
        if membrane_mix <= 0.0:
            mem_out = F(0.0)
        fade = F(min(max((self.ring - 0.0001) / (0.005 - 0.0001), 0.0), 1.0))

        vol = F(p["volume"] / 100.0)
        dry = F(filtered * env)
        mixed_out = F(dry * (1.0 - membrane_mix) + mem_out * membrane_mix)
        if main_done:
            out = F(mem_out * membrane_mix * fade * 0.7 * vol)
            if self.ring <= 0.0001:
                out = F(0.0)
        else:
            out = F(mixed_out * fade_factor * 0.7 * vol)
        if elapsed_i < 0:
            out = F(0.0)
        self.n += 1
        return float(out)
