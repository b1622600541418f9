"""HiHat v1/v2, Tom v1/v2, Bass: behavioral tests + oracles for key paths."""

import dataclasses

import numpy as np

from libgooey_tpu.core.smoother import smoothing_coeff
from libgooey_tpu.instruments import bass, hihat, hihat2, tom, tom2
import pytest

SR = 44100.0


def run_bank(mod, cfg, n, trigger_at=0, velocity=1.0, B=256, **kw):
    coeff = smoothing_coeff(SR)
    state = mod.init_state(1, cfg)
    out = []
    for start in range(0, n, B):
        off = np.full(1, B, np.int32)
        vel = np.zeros(1, np.float32)
        if start <= trigger_at < start + B:
            off[0] = trigger_at - start
            vel[0] = velocity
        state, y = mod.render_block(
            state, off, vel, np.int32(start), sample_rate=SR, block_size=B,
            smooth_coeff=coeff, **kw,
        )
        out.append(np.asarray(y[0]))
    return np.concatenate(out)[:n]


def spectrum_peak_region(x, sr=SR):
    sp = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return np.fft.rfftfreq(len(x), 1 / sr)[np.argmax(sp)]


# --- HiHat v1 ----------------------------------------------------------------


def test_hihat_closed_vs_open_decay():
    closed = run_bank(hihat, hihat.HiHatConfig.closed_default(), 30000)
    opened = run_bank(hihat, hihat.HiHatConfig.open_default(), 30000)
    rms = lambda v: np.sqrt(np.mean(v**2) + 1e-20)
    # open hat sustains (wash); closed decays to silence
    assert rms(opened[20000:]) > 10 * rms(closed[20000:])
    assert rms(closed[:2000]) > 0.01


def test_hihat_oracle_closed():
    """Blocked hi-hat vs a direct per-sample transcription."""
    from libgooey_tpu.core import rng as rng_mod

    cfg = hihat.HiHatConfig.closed_default()
    got = run_bank(hihat, cfg, 1200, trigger_at=7, velocity=0.8)

    # per-sample oracle
    from kick_oracle import _Smoother, adsr_amp, denorm

    coeff = smoothing_coeff(SR)
    p = {k: _Smoother(getattr(cfg, k), coeff) for k in hihat.PARAM_NAMES}
    vel = 0.8
    vel2 = vel * vel
    want = np.zeros(1200, np.float32)
    filt_state = 0.0
    trig = 7
    scale = 1.0 - 0.4 * vel2
    d = denorm(cfg.decay, 0.005, 0.4) * scale
    ad = denorm(cfg.amp_decay, 0.0, 4.0) * scale
    ac = denorm(cfg.amp_decay_curve, 0.1, 10.0)
    boost = 1.0 + 0.3 * vel2
    for n_i in range(1200):
        vals = {k: s.tick() for k, s in p.items()}
        e = (n_i - trig) / SR
        if n_i < trig:
            want[n_i] = 0.0
            continue
        w = float(np.asarray(rng_mod.white(np.uint32(n_i - trig))))
        noise_env = adsr_amp(e, 0.001, d, 0.0)
        bright_env = adsr_amp(e, 0.001, d * 0.2, 0.0)
        amp_env = adsr_amp(e, 0.001, ad, 0.0, 1.0, ac)
        f_env = adsr_amp(e, 0.001, d * 0.5, 0.0)
        combined = w * noise_env + w * bright_env * vals["filter"] * 0.5
        shaped = combined * amp_env * (1.0 + vals["filter"] * 0.8)
        base = denorm(vals["frequency"], 4000.0, 16000.0)
        cutoff = min(
            base + vals["filter"] * 6000.0 + f_env * 0.15 * base
            + (boost - 1.0) * f_env * base,
            SR * 0.45,
        )
        g = min(max(1.0 - np.exp(-2 * np.pi * cutoff / SR), 0.0), 1.0)
        filt_state += g * (shaped - filt_state)
        want[n_i] = filt_state * vals["volume"] * np.sqrt(vel)
    err = np.max(np.abs(got - want))
    assert err < 1e-4, err


# --- HiHat2 --------------------------------------------------------------------


@pytest.mark.slow
def test_hihat2_presets_render_and_decay():
    for preset in ["short", "loose", "dark", "soft"]:
        cfg = hihat2.PRESETS[preset]()
        out = run_bank(hihat2, cfg, 20000)
        assert np.all(np.isfinite(out)), preset
        peak = np.abs(out).max()
        assert peak > 1e-3, (preset, peak)
    # short preset decays much faster than loose
    short = run_bank(hihat2, hihat2.HiHat2Config.short(), 20000)
    loose = run_bank(hihat2, hihat2.HiHat2Config.loose(), 20000)
    rms = lambda v: np.sqrt(np.mean(v**2) + 1e-20)
    assert rms(loose[10000:]) > 5 * rms(short[10000:])


def test_hihat2_pitch_controls_spectrum():
    lo = run_bank(hihat2, dataclasses.replace(hihat2.HiHat2Config.short(), pitch=0.3, tone=0.0), 16384)
    hi = run_bank(hihat2, dataclasses.replace(hihat2.HiHat2Config.short(), pitch=1.0, tone=0.0), 16384)
    # spectral centroid rises with pitch
    def centroid(x):
        sp = np.abs(np.fft.rfft(x)) ** 2
        f = np.fft.rfftfreq(len(x), 1 / SR)
        return (sp * f).sum() / (sp.sum() + 1e-12)
    assert centroid(hi) > centroid(lo) * 1.2


def test_asym_smoother_matches_loop():
    from libgooey_tpu.ops import scan as gscan

    rs = np.random.RandomState(2)
    t = rs.uniform(0, 1, 300).astype(np.float32)
    k = 1.0 - np.exp(-1.0 / 100.0)
    got = np.asarray(gscan.asym_smooth(t[None, :], k, np.zeros(1, np.float32)))[0]
    cur = 0.0
    for n in range(300):
        if t[n] >= cur:
            cur = t[n]
        else:
            cur += k * (t[n] - cur)
        assert abs(got[n] - cur) < 1e-5, n


# --- Tom v1 -------------------------------------------------------------------


def test_tom_pitch_and_decay():
    out = run_bank(tom, tom.TomConfig.default(), 30000, max_harmonics=64)
    assert np.abs(out).max() > 0.05
    # frequency near 120 Hz after the pitch sweep settles
    peak = spectrum_peak_region(out[10000:26000])
    assert 80 < peak < 180, peak
    hi = run_bank(tom, tom.TomConfig.high_tom(), 30000, max_harmonics=64)
    assert spectrum_peak_region(hi[10000:26000]) > peak


def test_tom_velocity_scales_decay():
    soft = run_bank(tom, tom.TomConfig.default(), 16000, velocity=0.1, max_harmonics=0)
    hard = run_bank(tom, tom.TomConfig.default(), 16000, velocity=1.0, max_harmonics=0)
    rms = lambda v: np.sqrt(np.mean(v**2) + 1e-20)
    # velocity scale 0.5+0.5v: hard hits decay *slower* (longer tonal window,
    # which ends ~0.36s at v=1 but ~0.2s at v=0.1)
    assert rms(hard[12000:16000]) > 3 * rms(soft[12000:16000])


# --- Tom2 ----------------------------------------------------------------------


@pytest.mark.slow
def test_tom2_presets_render():
    for preset in ["derp", "ring", "brush", "void"]:
        out = run_bank(tom2, tom2.PRESETS[preset](), 20000)
        assert np.all(np.isfinite(out)), preset
        assert np.abs(out).max() > 1e-4, preset


def test_tom2_membrane_rings_past_vca():
    base = tom2.Tom2Config(tune=60.0, bend=20.0, tone=10.0, color=0.0, decay=5.0,
                           membrane=80.0, membrane_q=90.0, volume=100.0)
    dry = dataclasses.replace(base, membrane=0.0)
    with_mem = run_bank(tom2, base, 12000)
    without = run_bank(tom2, dry, 12000)
    rms = lambda v: np.sqrt(np.mean(v**2) + 1e-20)
    # after the short VCA decay (~205 ms ≈ sample 9000), the membrane
    # version still rings while the dry one is silent
    assert rms(with_mem[9000:]) > 100 * rms(without[9000:])
    assert rms(with_mem[4000:8000]) > 2 * rms(without[4000:8000])


def test_tom2_bend_sweeps_pitch():
    bent = run_bank(tom2, tom2.Tom2Config(tune=50.0, bend=100.0, tone=50.0,
                                          color=0.0, decay=40.0), 8192)
    flat = run_bank(tom2, tom2.Tom2Config(tune=50.0, bend=0.0, tone=50.0,
                                          color=0.0, decay=40.0), 8192)
    # early spectrum of bent version sits higher
    def centroid(x):
        sp = np.abs(np.fft.rfft(x)) ** 2
        f = np.fft.rfftfreq(len(x), 1 / SR)
        return (sp * f).sum() / (sp.sum() + 1e-12)
    assert centroid(bent[:2048]) > centroid(flat[:2048])


# --- Bass -----------------------------------------------------------------------


def test_bass_presets_and_frequency():
    out = run_bank(bass, bass.BassConfig.sub(), 30000)
    assert np.all(np.isfinite(out))
    peak = spectrum_peak_region(out[2000:28000])
    # sub preset: fundamental ~60.6 Hz
    assert 40 < peak < 90, peak


def test_bass_osc_shape_morphs_harmonics():
    saw = run_bank(bass, dataclasses.replace(bass.BassConfig.sub(), osc_shape=0.0,
                                             osc_level=1.0, sub_level=0.0,
                                             filter_cutoff=1.0, overdrive=0.0), 16384)
    sq = run_bank(bass, dataclasses.replace(bass.BassConfig.sub(), osc_shape=1.0,
                                            osc_level=1.0, sub_level=0.0,
                                            filter_cutoff=1.0, overdrive=0.0), 16384)
    # square suppresses even harmonics: compare 2nd harmonic level
    f0 = 60.63  # denorm(0.18, 30, 200)
    def h_level(x, k):
        n = len(x)
        ph = 2 * np.pi * f0 * k * np.arange(n) / SR
        return np.hypot(np.dot(x, np.cos(ph)), np.dot(x, np.sin(ph)))
    assert h_level(saw, 2) > 3 * h_level(sq, 2)


def test_bass_filter_env_sweep():
    swept = run_bank(bass, bass.BassConfig.acid(), 24000)
    assert np.all(np.isfinite(swept))
    # the attack is brighter than the tail (filter env decays over ~0.31 s)
    def centroid(x):
        sp = np.abs(np.fft.rfft(x)) ** 2
        f = np.fft.rfftfreq(len(x), 1 / SR)
        return (sp * f).sum() / (sp.sum() + 1e-12)
    assert centroid(swept[:2000]) > 1.2 * centroid(swept[18000:24000])


def test_hihat2_matches_oracle():
    """HiHat2 bank vs per-sample oracle: short (white/24dB) and a pink/12dB
    variant, plus a retrigger — <2e-4 (≈ −80 dBFS)."""
    import dataclasses

    from hihat2_oracle import HiHat2Oracle
    from libgooey_tpu.core.smoother import smoothing_coeff
    from libgooey_tpu.instruments import hihat2 as hh2

    SR, B = 44100.0, 512
    coeff = float(np.asarray(smoothing_coeff(SR)))

    def render_bank(cfg, n_samples, triggers):
        state = hh2.init_state(1, cfg)
        out = []
        for start in range(0, n_samples, B):
            off = np.full(1, B, np.int32)
            vel = np.zeros(1, np.float32)
            for t, v in triggers:
                if start <= t < start + B:
                    off[0] = t - start
                    vel[0] = v
            state, y = hh2.render_block(
                state, off, vel, np.int32(start),
                sample_rate=SR, block_size=B, smooth_coeff=coeff,
            )
            out.append(np.asarray(y[0]))
        return np.concatenate(out)[:n_samples]

    def run_oracle(cfg, n_samples, triggers):
        o = HiHat2Oracle({k: getattr(cfg, k) for k in hh2.PARAM_NAMES}, SR,
                         coeff=coeff, filter_slope=cfg.filter_slope,
                         noise_color=cfg.noise_color)
        trig = dict(triggers)
        out = np.zeros(n_samples, np.float32)
        for n in range(n_samples):
            if n in trig:
                o.trigger(trig[n])
            out[n] = o.tick()
        return out

    for cfg, trigs in (
        (hh2.HiHat2Config.short(), [(64, 1.0)]),
        (dataclasses.replace(hh2.HiHat2Config.loose(), noise_color=1,
                             filter_slope=0, tone=0.4), [(0, 0.7)]),
        (hh2.HiHat2Config.soft(), [(10, 0.9), (1500, 0.5)]),  # retrigger
    ):
        got = render_bank(cfg, 2048, trigs)
        want = run_oracle(cfg, 2048, trigs)
        err = np.abs(got - want).max()
        assert err < 1e-4, (cfg, err)
        assert np.abs(got).max() > 1e-3


def test_tom2_matches_oracle():
    """Tom2 bank vs per-sample oracle across presets (<2e-4 ≈ −80 dBFS)."""
    from libgooey_tpu.instruments import tom2 as t2
    from tom2_oracle import Tom2Oracle

    SR, B = 44100.0, 512

    def render_bank(cfg, n_samples, trigger_at):
        state = t2.init_state(1, cfg)
        out = []
        for start in range(0, n_samples, B):
            off = np.full(1, B, np.int32)
            if start <= trigger_at < start + B:
                off[0] = trigger_at - start
            state, y = t2.render_block(
                state, off, np.ones(1, np.float32), np.int32(start),
                sample_rate=SR, block_size=B,
            )
            out.append(np.asarray(y[0]))
        return np.concatenate(out)[:n_samples]

    # all presets hold the −80 dBFS bar: linrec2 runs sample-sequential on
    # CPU (scan.py LINREC2_IMPL), so the high-Q membrane/bandpass ring-up no
    # longer amplifies tree-scan reassociation (was 2.6e-4..2.7e-3; now
    # <3e-5 measured, asserted at 1e-4 with margin for platform math).
    cases = (
        (t2.Tom2Config.derp(), 1e-4, 3e-5),
        (t2.Tom2Config.ring(), 1e-4, 3e-5),
        (t2.Tom2Config.void_preset(), 1e-4, 3e-5),
        (t2.Tom2Config.brush(), 1e-4, 3e-5),
    )
    for cfg, max_tol, rms_tol in cases:
        got = render_bank(cfg, 3072, 64)
        o = Tom2Oracle({k: getattr(cfg, k) for k in t2.PARAM_NAMES}, SR)
        want = np.zeros(3072, np.float32)
        for n in range(3072):
            if n == 64:
                o.trigger()
            want[n] = o.tick()
        d = np.abs(got - want)
        assert d.max() < max_tol, (cfg, d.max())
        if rms_tol is not None:
            assert np.sqrt(np.mean(d**2)) < rms_tol, (cfg, np.sqrt(np.mean(d**2)))
        assert np.abs(got).max() > 1e-3


def test_tom_v1_matches_oracle():
    """Tom v1 bank vs per-sample transcription (<2e-4): sine + additive
    triangle punch, velocity-scaled decays, curved amp envelope."""
    import dataclasses

    from libgooey_tpu.core.smoother import smoothing_coeff
    from libgooey_tpu.instruments import tom as tom_mod

    SR, B = 44100.0, 512
    coeff = float(np.asarray(smoothing_coeff(SR)))
    F = np.float32

    def denorm(x, lo, hi):
        return F(lo + min(max(x, 0.0), 1.0) * (hi - lo))

    def env(elapsed, a, d, a_curve, d_curve):
        if elapsed < 0.0:
            return F(0.0)
        if elapsed < a:
            return F(max(elapsed / a, 0.0) ** min(max(a_curve, 0.1), 10.0))
        if elapsed < a + d:
            prog = max((elapsed - a) / d, 0.0) ** min(max(d_curve, 0.1), 10.0)
            return F(1.0 - prog)
        return F(0.0)

    def tri_additive(idx, freq, max_h):
        ny = SR / 2.0
        theta = F(idx * freq * (2.0 * np.pi / SR))
        acc = F(0.0)
        max_i = np.floor(ny / max(freq, 1e-6))
        for i in range(1, max_h + 1, 2):
            hfreq = freq * i
            if i > max_i or hfreq > ny:
                continue
            ratio = hfreq / ny
            taper = 1.0 - ((ratio - 0.75) * 4.0) ** 2 if ratio > 0.75 else 1.0
            acc = F(acc + taper / (i * i) * np.sin(F(i) * theta))
        return acc

    cfg = dataclasses.replace(tom_mod.TomConfig.mid_tom(), punch=0.6,
                              pitch_drop=0.7)
    state = tom_mod.init_state(1, cfg)
    got = []
    trig_at, velocity = 90, 0.8
    for start in range(0, 2048, B):
        off = np.full(1, B, np.int32)
        vel = np.zeros(1, np.float32)
        if start <= trig_at < start + B:
            off[0] = trig_at - start
            vel[0] = velocity
        state, y = tom_mod.render_block(state, off, vel, np.int32(start),
                                        sample_rate=SR, block_size=B,
                                        smooth_coeff=coeff)
        got.append(np.asarray(y[0]))
    got = np.concatenate(got)

    p = {k: F(getattr(cfg, k)) for k in tom_mod.PARAM_NAMES}
    scale = F(0.5 + 0.5 * velocity)
    d = denorm(p["decay"], 0.05, 2.0) * scale
    ad = max(denorm(p["amp_decay"], 0.0, 4.0) * scale, 0.001)
    ac = denorm(p["amp_decay_curve"], 0.1, 10.0)
    if abs(ac - 1.0) < 0.01:
        ac = F(1.0)
    freq = denorm(p["frequency"], 60.0, 300.0)
    want = np.zeros(2048, np.float32)
    for n in range(2048):
        el = (n - trig_at) / SR
        if el < 0:
            continue
        idx = F(n - trig_at)
        fmult = F(1.0 + p["pitch_drop"] * env(el, 0.001, d * 0.4, 1.0, 1.0))
        tonal = F(np.sin(idx * freq * fmult * F(2 * np.pi / SR))
                  * env(el, 0.001, d * 0.9, 1.0, 1.0) * p["tonal"] * p["volume"])
        pf = F(freq * 3.0 * (1.0 + (fmult - 1.0) * 0.5))
        punch = F(tri_additive(idx, pf, 128)
                  * env(el, 0.001, d * 0.3, 1.0, 1.0)
                  * p["punch"] * p["volume"] * 0.6)
        amp = env(el, 0.001, ad, 0.5, ac)
        want[n] = F((tonal + punch) * amp * np.sqrt(F(velocity)))
    err = np.abs(got - want).max()
    assert err < 1e-4, err
    assert np.abs(got).max() > 0.01
