"""Twin tests for the fused voice-bank instrument kernels.

The fused kernels (ops/pallas_voice.py) must agree with the stage-by-stage
XLA render_block — the path every per-sample oracle test pins — to scan-
reassociation rounding.  Every in-kernel formula is written op-for-op like
the XLA twin, so in interpret mode the only differences are the lane scans
(Hillis-Steele vs linrec) and f32 reassociation in the oversampler; measured
worst cases are ~6e-6 on the output and ~1e-4 on the (drive-scaled, up to
~30x full-scale) internal shaper states.  The high-Q recurrences (snare's
Chamberlin, bass's swept SVF) run OUTSIDE the fused kernels on the
sample-sequential bank path, so their numerics class is unchanged.

On a real TPU the same twin pairs match to 1e-6..1e-5 (tools/tpu_smoke.py
smoke_voice_fused re-checks on hardware; the suite runs CPU-only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libgooey_tpu.core.smoother import SmootherBank, smoothing_coeff
from libgooey_tpu.instruments import bass, hihat2, kick, snare
from libgooey_tpu.ops import pallas_voice as pv

SR = 44100.0
B = 128
COEFF = smoothing_coeff(SR)

#: (module, fused_fn, render kwargs, param clamps) per family.  Clamps keep
#: random configs off genuinely-unstable corners (the Chamberlin at 10 kHz
#: cutoff + max resonance rings up to inf in BOTH paths — reference math).
FAMILIES = {
    "kick": (kick, "kick_render_fused",
             dict(max_harmonics=32, feedback_path=False), {}),
    "snare": (snare, "snare_render_fused", dict(max_harmonics=32),
              {"filter_cutoff": (0.0, 0.7), "filter_resonance": (0.0, 0.6)}),
    "hihat2": (hihat2, "hihat2_render_fused", dict(), {}),
    "bass": (bass, "bass_render_fused", dict(), {}),
}


def _max_state_err(sa, sb):
    """Worst |a-b| over all state leaves.  Every compared leaf is a REAL
    carried state (the fused paths' finish steps slice pad rows and unwritten
    scratch columns away before building the state; PARITY.md Appendix C) —
    so any large error here is a genuine divergence, and the assert message
    names the offending leaf to make one-shot flakes diagnosable."""
    worst, worst_path = 0.0, None
    la_paths = jax.tree_util.tree_flatten_with_path(sa)[0]
    lb_leaves = jax.tree_util.tree_leaves(sb)
    for (path, la), lb in zip(la_paths, lb_leaves):
        if la.size:
            e = float(jnp.max(jnp.abs(
                jnp.asarray(la, jnp.float32) - jnp.asarray(lb, jnp.float32))))
            assert not np.isnan(e), f"NaN state leaf at {jax.tree_util.keystr(path)}"
            if e > worst:
                worst, worst_path = e, jax.tree_util.keystr(path)
    if worst >= 4e-4:
        raise AssertionError(
            f"state divergence {worst} at leaf {worst_path}")
    return worst


def _mk_state(mod, V, rng, clamps):
    targets = np.clip(rng.uniform(0, 1, (V, mod.NUM_PARAMS)), 0, 1).astype(np.float32)
    cur = np.clip(targets + rng.normal(0, 0.2, targets.shape), 0, 1).astype(np.float32)
    for name, (lo, hi) in clamps.items():
        i = mod.PARAM_INDEX[name]
        targets[:, i] = np.clip(targets[:, i], lo, hi)
        cur[:, i] = np.clip(cur[:, i], lo, hi)
    st = mod.init_state(V, targets=targets)
    return st._replace(params=SmootherBank(current=jnp.asarray(cur),
                                           target=jnp.asarray(targets)))


@pytest.mark.parametrize("kind", sorted(FAMILIES))
def test_fused_matches_xla_twin(kind):
    mod, fused_name, kw, clamps = FAMILIES[kind]
    V = 5
    rng = np.random.default_rng(hash(kind) % 1000)
    state_x = _mk_state(mod, V, rng, clamps)
    state_f = state_x
    if kind == "snare":
        state_x = state_x._replace(
            filter_type=jnp.asarray([0, 1, 2, 3, 1], jnp.int32))
        state_f = state_x
    if kind == "hihat2":
        state_x = state_x._replace(
            noise_color=jnp.asarray([0, 1, 0, 1, 0], jnp.int32),
            filter_slope=jnp.asarray([1, 0, 1, 0, 1], jnp.int32))
        state_f = state_x
    offs = [np.array([0, 40, B, 3, 100], np.int32),
            np.array([B, B, 17, B, B], np.int32),
            np.array([5, B, B, B, 0], np.int32)]
    vels = np.array([1.0, 0.8, 0.5, 0.3, 0.9], np.float32)
    fused = getattr(pv, fused_name)
    fused_kw = {k: v for k, v in kw.items() if k != "feedback_path"}
    prev = pv.IMPL
    try:
        pv.IMPL = "xla"
        for blk, off in enumerate(offs):
            state_x, out_x = mod.render_block(
                state_x, off, vels, np.int32(blk * B), sample_rate=SR,
                block_size=B, smooth_coeff=COEFF, **kw)
            state_f, out_f = fused(
                state_f, off, vels, np.int32(blk * B), sample_rate=SR,
                block_size=B, smooth_coeff=COEFF, interpret=True, **fused_kw)
            assert float(jnp.max(jnp.abs(out_x - out_f))) < 3e-5, (kind, blk)
            assert _max_state_err(state_x, state_f) < 4e-4, (kind, blk)
    finally:
        pv.IMPL = prev


def test_bass_fused_note_freq():
    """Per-step note overrides reach the fused path's trigger snapshot."""
    V = 3
    rng = np.random.default_rng(11)
    state_x = _mk_state(bass, V, rng, {})
    state_f = state_x
    off = np.array([0, 7, B], np.int32)
    vels = np.ones(V, np.float32)
    nfq = np.array([55.0, 110.0, 0.0], np.float32)
    prev = pv.IMPL
    try:
        pv.IMPL = "xla"
        state_x, out_x = bass.render_block(
            state_x, off, vels, np.int32(0), sample_rate=SR, block_size=B,
            smooth_coeff=COEFF, note_freq=nfq)
        state_f, out_f = pv.bass_render_fused(
            state_f, off, vels, np.int32(0), sample_rate=SR, block_size=B,
            smooth_coeff=COEFF, note_freq=nfq, interpret=True)
        assert float(jnp.max(jnp.abs(out_x - out_f))) < 3e-5
        assert float(jnp.max(jnp.abs(state_x.trig_freq - state_f.trig_freq))) == 0.0
    finally:
        pv.IMPL = prev


def test_fused_dispatch_gate():
    """The fused path only engages on TPU (or forced); CPU tests stay XLA.
    Multi-trigger [V, K] offsets and overrides fall back to XLA."""
    V = 3
    rng = np.random.default_rng(3)
    state = _mk_state(kick, V, rng, {})
    off = np.zeros(V, np.int32)
    vel = np.ones(V, np.float32)
    off_k = np.full((V, 2), B, np.int32)
    st2, out2 = kick.render_block(
        state, off_k, np.zeros((V, 2), np.float32), np.int32(0),
        sample_rate=SR, block_size=B, smooth_coeff=COEFF, max_harmonics=16,
        feedback_path=False)
    assert out2.shape == (V, B)
    prev = pv.IMPL
    try:
        pv.IMPL = "pallas"
        if jax.default_backend() != "tpu":
            st_f, out_f = kick.render_block(
                state, off, vel, np.int32(0), sample_rate=SR, block_size=B,
                smooth_coeff=COEFF, max_harmonics=16, feedback_path=False)
        pv.IMPL = "xla"
        st_x, out_x = kick.render_block(
            state, off, vel, np.int32(0), sample_rate=SR, block_size=B,
            smooth_coeff=COEFF, max_harmonics=16, feedback_path=False)
        if jax.default_backend() != "tpu":
            assert float(jnp.max(jnp.abs(out_x - out_f))) < 3e-5
    finally:
        pv.IMPL = prev


def test_tom2_fused_matches_xla_twin():
    """Tom2's single-kernel fused bank vs the stage-by-stage XLA twin.

    Tom2 params are plain 0-100 values (unsmoothed, tom2.rs); velocity is
    ignored by its trigger.  Membrane + bandpass + morph/rand state must
    round-trip bit-comparably across blocks.
    """
    from libgooey_tpu.instruments import tom2

    V = 5
    rng = np.random.default_rng(42)
    targets = (rng.uniform(0, 1, (V, tom2.NUM_PARAMS)) * 100.0).astype(np.float32)
    targets[:, tom2.PARAM_INDEX["tuning"]] /= 100.0     # tuning is 0-1
    targets[0] = tom2.Tom2Config.ring().as_array()      # membrane-heavy preset
    targets[1] = tom2.Tom2Config.brush().as_array()     # high color (fast rand~)
    state_x = tom2.init_state(V, targets=targets)
    state_f = state_x
    offs = [np.array([0, 40, B, 3, 100], np.int32),
            np.array([B, B, 17, B, B], np.int32),
            np.array([5, B, B, B, 0], np.int32)]
    vels = np.ones(V, np.float32)
    # Both paths must run JITTED: XLA's compiled exp2 differs from the
    # eager path by a few ulp, and tom2's double-mtof (rand~ rate)
    # amplifies that into ~6e-4 of rand-phase drift.  The engine always
    # runs under jit, so jit-vs-jit is the operationally meaningful
    # equality.  (The bandpass/membrane recurrences are shared code —
    # tom2's fused path only swaps the source stage.)
    twin = jax.jit(
        lambda st, off, bs: tom2.render_block(
            st, off, vels, bs, sample_rate=SR, block_size=B,
            smooth_coeff=COEFF, fused=False))
    prev = pv.IMPL
    try:
        pv.IMPL = "pallas"
        fused_fn = jax.jit(
            lambda st, off, bs: tom2.render_block(
                st, off, vels, bs, sample_rate=SR, block_size=B,
                smooth_coeff=COEFF, fused=True))
        for blk, off in enumerate(offs):
            state_x, out_x = twin(state_x, off, np.int32(blk * B))
            state_f, out_f = fused_fn(state_f, off, np.int32(blk * B))
            assert float(jnp.max(jnp.abs(out_x - out_f))) < 3e-5, blk
            assert _max_state_err(state_x, state_f) < 4e-4, blk
    finally:
        pv.IMPL = prev


def test_kit_mega_path_matches_per_family():
    """engine._render_all's merged two-call kit path (pallas_voice.
    kit_render_fused) vs the stage-by-stage XLA path, all five families +
    mix + limiter, two chained blocks."""
    from libgooey_tpu.core.smoother import SmootherBank as SB, smoothing_coeff
    from libgooey_tpu.engine import engine as eng

    per_family = {"kick": 4, "snare": 4, "hihat2": 4, "tom2": 3, "bass": 3}
    total = sum(per_family.values())
    state = {k: eng.FAMILIES[k].init_state(v) for k, v in per_family.items()}
    state["pan"] = SB.init(np.linspace(0.2, 0.8, total).astype(np.float32))
    state["gain"] = SB.init(np.full(total, 1.0 / total, np.float32))
    state["master"] = SB.init(np.float32(0.25))
    events = {"block_start": np.int32(0)}
    rng = np.random.default_rng(7)
    for k, v in per_family.items():
        off = np.full(v, B, np.int32)
        off[: max(1, v // 2)] = rng.integers(0, B, max(1, v // 2))
        events[k + "_off"] = jnp.asarray(off)
        events[k + "_vel"] = jnp.asarray(np.full(v, 0.9, np.float32))
    static = dict(
        kinds=tuple(per_family), sample_rate=SR, block_size=B,
        smooth_coeff=smoothing_coeff(SR), limiter_threshold=1.0,
        family_static=(("kick", (("feedback_path", False),
                                 ("max_harmonics", 16))),
                       ("snare", (("max_harmonics", 16),))),
    )

    def run(impl, st):
        prev = pv.IMPL
        try:
            pv.IMPL = impl
            step = jax.jit(lambda s, ev: eng._render_all(s, ev, **static))
            st, out, mono = step(st, events)
            ev2 = dict(events, block_start=np.int32(B))
            st, out2, _ = step(st, ev2)
            return st, np.asarray(out), np.asarray(out2)
        finally:
            pv.IMPL = prev

    st_x, out_x, out2_x = run("xla", state)
    st_f, out_f, out2_f = run("pallas", state)
    assert float(np.abs(out_x - out_f).max()) < 3e-5
    assert float(np.abs(out2_x - out2_f).max()) < 3e-5
    for k in per_family:
        assert _max_state_err(st_x[k], st_f[k]) < 4e-4, k


def test_triangle_additive_bank_matches_xla():
    """The gridded additive-triangle bank kernel vs the XLA fori_loop
    formulation (ops/osc.py) — shared loop body, so interpret mode agrees
    to f32 rounding; padded/ragged V exercises the tile padding."""
    import numpy as np

    from libgooey_tpu.ops import osc
    from libgooey_tpu.ops import pallas_voice as pv

    rng = np.random.RandomState(0)
    sr = 44100.0
    for V in (3, 16, 130):
        idx = np.cumsum(np.ones((V, 256), np.float32), axis=1) - 1.0
        base = rng.uniform(40.0, 2000.0, size=(V, 1)).astype(np.float32)
        wob = 1.0 + 0.1 * np.sin(idx * 0.01).astype(np.float32)
        freq = base * wob
        ref = np.asarray(osc.triangle_additive(idx, freq, sr, 64))
        got = np.asarray(pv.triangle_additive_bank(idx, freq, sr, 64,
                                                   interpret=True))
        assert np.abs(got - ref).max() < 2e-5, V
