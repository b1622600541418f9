"""Kick voice: blocked/batched implementation vs per-sample oracle, plus the
reference's behavioral assertions (volume linearity, velocity laws)."""

import numpy as np

from libgooey_tpu.core.smoother import smoothing_coeff
from libgooey_tpu.instruments import kick as kick_mod

from kick_oracle import KickOracle

SR = 44100.0
B = 128


def render_bank(config: kick_mod.KickConfig, n_samples, trigger_at, velocity,
                voices=1, max_harmonics=128, param_changes=None):
    """Render a bank voice-0 with one trigger; optional mid-render param
    target changes {sample: {param: value}} applied at block boundaries."""
    coeff = smoothing_coeff(SR)
    state = kick_mod.init_state(voices, config)
    out = []
    targets = np.broadcast_to(config.as_array(), (voices, kick_mod.NUM_PARAMS)).copy()
    for start in range(0, n_samples, B):
        if param_changes:
            for s, changes in param_changes.items():
                if start <= s < start + B:
                    for k, v in changes.items():
                        targets[:, kick_mod.PARAM_INDEX[k]] = v
                    state = state._replace(params=state.params.with_targets(targets))
        off = np.full(voices, B, np.int32)
        vel = np.zeros(voices, np.float32)
        if start <= trigger_at < start + B:
            off[0] = trigger_at - start
            vel[0] = velocity
        state, y = kick_mod.render_block(
            state, off, vel, np.int32(start),
            sample_rate=SR, block_size=B, smooth_coeff=coeff,
            max_harmonics=max_harmonics, feedback_path=False,
        )
        out.append(np.asarray(y[0]))
    return np.concatenate(out)[:n_samples]


def run_oracle(config: kick_mod.KickConfig, n_samples, trigger_at, velocity,
               param_changes=None):
    cfg = {k: getattr(config, k) for k in kick_mod.PARAM_NAMES}
    o = KickOracle(cfg, SR)
    out = np.zeros(n_samples, np.float32)
    for n in range(n_samples):
        if param_changes:
            for s, changes in param_changes.items():
                # oracle applies at the same block-boundary the bank does
                if n == (s // B) * B:
                    for k, v in changes.items():
                        o.p[k].set_target(v)
        if n == trigger_at:
            o.trigger(n, velocity)
        out[n] = o.tick(n)
    return out


def test_kick_matches_oracle_tight():
    cfg = kick_mod.KickConfig.tight()
    got = render_bank(cfg, 2000, trigger_at=37, velocity=0.8)
    want = run_oracle(cfg, 2000, trigger_at=37, velocity=0.8)
    err = np.max(np.abs(got - want))
    assert err < 1e-4, f"max err {err} ({20*np.log10(max(err,1e-12)):.1f} dBFS)"


def test_kick_matches_oracle_punch_preset():
    cfg = kick_mod.KickConfig.punch_preset()
    got = render_bank(cfg, 1500, trigger_at=0, velocity=0.5)
    want = run_oracle(cfg, 1500, trigger_at=0, velocity=0.5)
    err = np.max(np.abs(got - want))
    assert err < 1e-4, f"max err {err}"


def test_kick_matches_oracle_dirt_with_param_motion():
    cfg = kick_mod.KickConfig.dirt()
    changes = {512: {"frequency": 0.9, "noise_cutoff": 0.8}}
    got = render_bank(cfg, 1500, trigger_at=10, velocity=1.0, param_changes=changes)
    want = run_oracle(cfg, 1500, trigger_at=10, velocity=1.0, param_changes=changes)
    err = np.max(np.abs(got - want))
    assert err < 1e-4, f"max err {err}"


def test_kick_volume_linearity():
    """0.5x volume => 0.5x samples (tests/drum_volume_linearity.rs)."""
    import dataclasses

    cfg = kick_mod.KickConfig.tight()
    full = render_bank(dataclasses.replace(cfg, volume=1.0), 1200, 0, 0.7)
    half = render_bank(dataclasses.replace(cfg, volume=0.5), 1200, 0, 0.7)
    np.testing.assert_allclose(half, full * 0.5, atol=1e-5)


def test_kick_velocity_laws():
    """Higher velocity => sqrt(v) amplitude and shorter decay (kick.rs:983,1219)."""
    cfg = kick_mod.KickConfig.tight()
    soft = render_bank(cfg, 4000, 0, 0.25)
    hard = render_bank(cfg, 4000, 0, 1.0)
    assert np.abs(hard[:500]).max() > np.abs(soft[:500]).max()
    # energy later in the tail decays faster at high velocity
    tail = slice(3000, 4000)
    rms = lambda v: np.sqrt(np.mean(v**2) + 1e-20)
    assert rms(hard[tail]) / rms(hard[:1000]) < rms(soft[tail]) / rms(soft[:1000])


def test_kick_silent_before_trigger_and_volume_zero():
    import dataclasses

    cfg = kick_mod.KickConfig.tight()
    out = render_bank(cfg, 600, trigger_at=300, velocity=1.0)
    assert np.all(out[:300] == 0.0)
    silent = render_bank(dataclasses.replace(cfg, volume=0.0), 600, 0, 1.0)
    assert np.max(np.abs(silent)) == 0.0


def test_kick_retrigger_resets_phase_and_envelope():
    """A mid-block retrigger resets envelopes, phase, filters and pink noise
    (kick.rs:1082-1085).  With the waveshaper bypassed (overdrive 0) — the
    only state the reference deliberately does NOT reset — a retriggered
    voice must match a fresh voice sample-for-sample from the retrigger on."""
    import dataclasses

    cfg = dataclasses.replace(kick_mod.KickConfig.tight(), overdrive=0.0)
    coeff = smoothing_coeff(SR)

    def blockrun(triggers, nblocks, BB=512):
        st = kick_mod.init_state(1, cfg)
        out = []
        for b in range(nblocks):
            off = np.full(1, BB, np.int32)
            vel = np.zeros(1, np.float32)
            for (s, v) in triggers:
                if b * BB <= s < (b + 1) * BB:
                    off[0], vel[0] = s - b * BB, v
            st, y = kick_mod.render_block(
                st, off, vel, np.int32(b * BB), sample_rate=SR, block_size=BB,
                smooth_coeff=coeff, max_harmonics=0, feedback_path=False,
            )
            out.append(np.asarray(y[0]))
        return np.concatenate(out)

    a = blockrun([(0, 1.0), (700, 1.0)], 3)
    b = blockrun([(700, 1.0)], 3)
    assert a[700] == 0.0  # amplitude envelope restarts from zero
    np.testing.assert_allclose(a[700:1536], b[700:1536], atol=1e-5)
