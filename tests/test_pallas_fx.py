"""Serial Pallas bus-effect kernels vs the XLA chunked-scan paths.

The kernels (ops/pallas_fx.py) run the reference's per-sample loop in
SMEM; on CPU they execute through the Pallas interpreter.  Each test
drives both implementations through several blocks — including a
mid-stream parameter change, so the smoothed trajectories and carried
state are exercised — and requires agreement at float-noise level.
"""

import numpy as np

from libgooey_tpu.effects import reverb_spring, saturation

SR = 44100.0
B = 512


def _run_mod(mod, init_args, x, targets_seq, impl):
    st = mod.init_state(SR, *init_args)
    outs = []
    for i in range(x.shape[-1] // B):
        tg = np.asarray(targets_seq[min(i, len(targets_seq) - 1)], np.float32)
        st, y = mod.process_block(
            st, x[:, i * B:(i + 1) * B], tg, sample_rate=SR, impl=impl
        )
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1)


def _run(x, targets_seq, impl):
    return _run_mod(reverb_spring, targets_seq[0], x, targets_seq, impl)


def test_spring_serial_kernel_matches_xla():
    rs = np.random.RandomState(7)
    n = 4 * B
    x = np.zeros((2, n), np.float32)
    x[:, :200] = rs.uniform(-1, 1, (2, 200)).astype(np.float32)
    # params move mid-stream: block 0-1 at (0.5, 1.0, 0.4), then a jump
    seq = [(0.5, 1.0, 0.4), (0.5, 1.0, 0.4), (0.9, 0.6, 0.1)]
    want = _run(x, seq, "xla")
    got = _run(x, seq, "pallas")
    err = np.max(np.abs(got - want))
    assert err < 1e-5, err   # measured 6e-8


def test_saturation_fused_kernel_matches_xla():
    rs = np.random.RandomState(3)
    n = 4 * B
    x = rs.uniform(-0.8, 0.8, (2, n)).astype(np.float32)
    # params move mid-stream; final block drops mix under the bypass gate
    seq = [(0.6, 0.5, 1.0), (0.6, 0.5, 1.0), (0.2, 0.9, 0.7), (0.2, 0.9, 0.0)]
    want = _run_mod(saturation, seq[0], x, seq, "xla")
    got = _run_mod(saturation, seq[0], x, seq, "pallas")
    err = np.max(np.abs(got - want))
    assert err < 2e-5, err   # measured 1.9e-5: serial in-kernel allpasses vs the XLA path's tree scans at the 4x rate


def test_compressor_fused_kernel_matches_xla():
    from libgooey_tpu.effects import compressor

    rs = np.random.RandomState(5)
    n = 4 * B
    # loud bursts so the detector/knee/tube actually engage
    x = (rs.uniform(-1.0, 1.0, (2, n)) *
         (rs.rand(2, n) > 0.5)).astype(np.float32) * 1.5
    seq = [(-20.0, 4.0, 5.0, 80.0, 1.0), (-20.0, 4.0, 5.0, 80.0, 1.0),
           (-35.0, 10.0, 1.0, 30.0, 0.6), (-35.0, 10.0, 1.0, 30.0, 0.0)]
    want = _run_mod(compressor, seq[0], x, seq, "xla")
    got = _run_mod(compressor, seq[0], x, seq, "pallas")
    err = np.max(np.abs(got - want))
    assert err < 1e-5, err   # measured 7.2e-7


def test_smem_kernels_split_large_blocks():
    """B > 512 overflows the ~24 KB SMEM budget in one pallas_call (silent
    garbage on real TPUs); the wrappers must split + chain carries so any
    engine block_size stays correct."""
    from libgooey_tpu.ops import pallas_fx

    rs = np.random.RandomState(11)
    n = 1024 + 128  # non-multiple tail segment too
    rect = np.abs(rs.uniform(0, 1, (2, n))).astype(np.float32)
    ac = np.full((2, n), 0.9, np.float32)
    rc = np.full((2, n), 0.99, np.float32)
    byp = np.zeros((2, n), np.float32)
    env0 = np.zeros(2, np.float32)
    big_env, big_last = pallas_fx.env_follower_block(rect, ac, rc, byp, env0)
    # reference: manual 512-sample calls with chained carries
    segs, e0 = [], env0
    for s in range(0, n, 512):
        sl = slice(s, min(s + 512, n))
        seg, e0 = pallas_fx.env_follower_block(
            rect[:, sl], ac[:, sl], rc[:, sl], byp[:, sl], e0
        )
        segs.append(np.asarray(seg))
    np.testing.assert_allclose(np.asarray(big_env),
                               np.concatenate(segs, -1), atol=1e-7)
    np.testing.assert_allclose(np.asarray(big_last), np.asarray(e0), atol=1e-7)

    x = rs.uniform(-1, 1, (2, n)).astype(np.float32)
    g = np.full((2, n), 0.2, np.float32)
    fb = np.full((2, n), 1.5, np.float32)
    st = np.zeros((2, 2), np.float32)
    big_out, big_st = pallas_fx.lowpass_block(x, g, fb, st)
    segs, s0 = [], st
    for s in range(0, n, 512):
        sl = slice(s, min(s + 512, n))
        seg, s0 = pallas_fx.lowpass_block(x[:, sl], g[:, sl], fb[:, sl], s0)
        segs.append(np.asarray(seg))
    np.testing.assert_allclose(np.asarray(big_out),
                               np.concatenate(segs, -1), atol=1e-7)
    np.testing.assert_allclose(np.asarray(big_st), np.asarray(s0), atol=1e-7)


def test_waveshaper_fused_kernel_matches_xla():
    import jax.numpy as jnp

    from libgooey_tpu.ops import oversample as ovs_mod
    from libgooey_tpu.ops import pallas_fx
    from libgooey_tpu.effects import waveshaper as fx_ws

    rs = np.random.RandomState(8)
    n = 3 * B
    x = rs.uniform(-0.9, 0.9, (2, n)).astype(np.float32)
    drives = [3.0, 3.0, 5.0]
    mixes = [1.0, 0.7, 0.7]

    st_x = ovs_mod.OversamplerState.init((2,))
    st_p = st_x
    zeros = jnp.zeros(2, jnp.float32)
    outs_x, outs_p = [], []
    for i in range(n // B):
        xb = jnp.asarray(x[:, i * B:(i + 1) * B])
        wrap, box = ovs_mod.stateful(st_x, 4)
        outs_x.append(np.asarray(
            fx_ws.process(xb, drives[i], mix=mixes[i], oversample=wrap)))
        st_x = box["state"]
        packed = pallas_fx.pack_ovs4_dc(st_p, zeros, zeros)
        y, nst = pallas_fx.waveshaper_block(xb, drives[i], mixes[i], packed)
        st_p, _, _, _ = pallas_fx.unpack_ovs4_dc(nst, st_p)
        outs_p.append(np.asarray(y))
    err = np.max(np.abs(np.concatenate(outs_p, -1) - np.concatenate(outs_x, -1)))
    assert err < 1e-5, err   # measured 5.4e-7


def test_tilt_fused_kernel_matches_xla():
    from libgooey_tpu.effects import tilt

    rs = np.random.RandomState(11)
    n = 4 * B
    x = rs.uniform(-0.8, 0.8, (2, n)).astype(np.float32)
    # sweep across the center (LP region -> HP region) with resonance
    seq = [(0.25, 0.3), (0.25, 0.3), (0.75, 0.6), (0.5, 0.0)]
    want = _run_mod(tilt, seq[0], x, seq, "xla")
    got = _run_mod(tilt, seq[0], x, seq, "pallas")
    err = np.max(np.abs(got - want))
    # tan(pi*fc/sr) near Nyquist amplifies trajectory ulps ~45x and the
    # resonant SVF rings them; 2e-4 is the suite-wide oracle tolerance.
    assert err < 1e-5, err   # measured 1.8e-7 after op-for-op coefficient alignment


def test_delay_fused_kernel_matches_xla():
    from libgooey_tpu.effects import delay

    rs = np.random.RandomState(13)
    n = 4 * B
    x = rs.uniform(-0.8, 0.8, (2, n)).astype(np.float32)
    seq = [(0.02, 0.6, 0.8, 4000.0), (0.02, 0.6, 0.8, 4000.0),
           (0.05, 0.3, 0.5, 12000.0)]
    want = _run_mod(delay, seq[0], x, seq, "xla")
    got = _run_mod(delay, seq[0], x, seq, "pallas")
    err = np.max(np.abs(got - want))
    assert err < 2e-5, err   # measured 6.3e-6


def test_delay_pingpong_fused_kernel_matches_xla():
    from libgooey_tpu.effects import delay

    rs = np.random.RandomState(14)
    n = 3 * B
    x = rs.uniform(-0.8, 0.8, (2, n)).astype(np.float32)
    tg = np.asarray([0.015, 0.7, 1.0, 6000.0], np.float32)

    def run(impl):
        st = delay.init_state(44100.0, *tg)
        outs = []
        for i in range(n // B):
            st, y = delay.process_block(
                st, x[:, i * B:(i + 1) * B], tg, sample_rate=SR,
                pingpong=True, impl=impl)
            outs.append(np.asarray(y))
        return np.concatenate(outs, -1)

    err = np.max(np.abs(run("pallas") - run("xla")))
    assert err < 1e-5, err   # measured 6e-8


def test_lowpass_fused_kernel_matches_xla():
    from libgooey_tpu.effects import lowpass

    rs = np.random.RandomState(15)
    n = 4 * B
    x = rs.uniform(-0.9, 0.9, (2, n)).astype(np.float32)
    seq = [(2000.0, 0.8), (2000.0, 0.8), (12000.0, 0.3)]
    want = _run_mod(lowpass, seq[0], x, seq, "xla")
    got = _run_mod(lowpass, seq[0], x, seq, "pallas")
    err = np.max(np.abs(got - want))
    assert err < 1e-5, err   # measured 0.0


def test_fbws_fast_kernel_matches_xla():
    import jax.numpy as jnp

    from libgooey_tpu.effects import feedback_waveshaper as fbws

    rs = np.random.RandomState(17)
    n = 3 * B
    x = rs.uniform(-0.9, 0.9, (2, n)).astype(np.float32)
    drives = [8.0, 8.0, 40.0]
    mixes = [1.0, 0.6, 0.6]
    fbc = fbws.filter_coeff(2000.0, SR)

    def run(impl):
        fbws.IMPL = impl
        try:
            st = fbws.FBShaperState.init((2,))
            outs = []
            for i in range(n // B):
                st, y = fbws.process_block(
                    st, jnp.asarray(x[:, i * B:(i + 1) * B]),
                    jnp.float32(drives[i]), jnp.float32(0.0), fbc,
                    jnp.float32(mixes[i]), SR, feedback_path=False)
                outs.append(np.asarray(y))
            return np.concatenate(outs, -1)
        finally:
            fbws.IMPL = "auto"

    err = np.max(np.abs(run("pallas") - run("xla")))
    assert err < 1e-5, err   # measured 1.4e-6


def test_plate_fused_kernel_matches_xla():
    from libgooey_tpu.effects import reverb_plate

    rs = np.random.RandomState(19)
    n = 4 * B
    x = np.zeros((2, n), np.float32)
    x[:, :400] = rs.uniform(-1, 1, (2, 400)).astype(np.float32)
    # decay/mix/damping/predelay/width/size; size sweeps mid-stream so the
    # modulated-allpass one-hot windows see real trajectory travel
    seq = [(0.6, 1.0, 0.4, 0.1, 1.0, 0.5), (0.6, 1.0, 0.4, 0.1, 1.0, 0.5),
           (0.6, 1.0, 0.4, 0.1, 0.5, 0.9), (0.3, 0.8, 0.2, 0.0, 0.8, 0.2)]
    want = _run_mod(reverb_plate, seq[0], x, seq, "xla")
    got = _run_mod(reverb_plate, seq[0], x, seq, "pallas")
    err = np.max(np.abs(got - want))
    assert err < 1e-5, err   # measured 2.6e-8


def test_plate_fused_kernel_full_range_size_jump():
    """Worst-case size jump 1.0 -> 0.0: the one-hot window must still cover
    the per-chunk offset travel (the round-1 bound under-covered this —
    out-of-window reads silently selected nothing on the Pallas path)."""
    from libgooey_tpu.effects import reverb_plate

    rs = np.random.RandomState(23)
    n = 6 * B
    x = np.zeros((2, n), np.float32)
    x[:, :400] = rs.uniform(-1, 1, (2, 400)).astype(np.float32)
    # start fully large, then slam size to minimum (and back up) mid-tail
    seq = [(0.6, 1.0, 0.3, 0.0, 1.0, 1.0), (0.6, 1.0, 0.3, 0.0, 1.0, 1.0),
           (0.6, 1.0, 0.3, 0.0, 1.0, 0.0), (0.6, 1.0, 0.3, 0.0, 1.0, 0.0),
           (0.6, 1.0, 0.3, 0.0, 1.0, 1.0)]
    want = _run_mod(reverb_plate, seq[0], x, seq, "xla")
    got = _run_mod(reverb_plate, seq[0], x, seq, "pallas")
    err = np.max(np.abs(got - want))
    assert err < 1e-5, err   # measured 3e-8


def test_env_follow_bank_matches_scan():
    """Voice-bank envelope-follower kernel vs the sequential lax.scan,
    including lane padding and mid-block freezes (bit-exact: identical
    per-sample op order)."""
    import jax.numpy as jnp

    from libgooey_tpu.effects import feedback_waveshaper as fw
    from libgooey_tpu.ops import pallas_fx

    rs = np.random.RandomState(11)
    V = 3 * 128 + 17  # exercises lane padding
    rect = jnp.asarray(np.abs(rs.randn(V, B)).astype(np.float32))
    frz = jnp.asarray((rs.rand(V, B) < 0.1).astype(np.float32))
    env0 = jnp.asarray(np.abs(rs.randn(V)).astype(np.float32))
    att, rel = fw.env_coeffs(SR)

    env_k, envl_k = pallas_fx.env_follow_bank(
        rect, frz, env0, att=att, rel=rel, interpret=True)
    envl_s, env_s = fw._env_follow_scan(env0, rect, att, rel, frz)
    np.testing.assert_array_equal(np.asarray(env_k), np.asarray(env_s))
    np.testing.assert_array_equal(np.asarray(envl_k), np.asarray(envl_s))


def test_svf_bank_matches_per_sample_oracle():
    """Voice-bank TPT SVF kernel: bit-exact vs a per-sample numpy oracle
    (the kernel replicates the reference's op order,
    resonant_lowpass.rs:48-61), and within reassociation noise of the
    linrec2 scan path."""
    import jax.numpy as jnp

    from libgooey_tpu.ops import filters, pallas_fx

    rs = np.random.RandomState(12)
    V = 2 * 128 + 40
    x = jnp.asarray(rs.randn(V, B).astype(np.float32))
    cut = jnp.asarray((200 + 8000 * rs.rand(V, B)).astype(np.float32))
    g, h = filters.svf_coeffs(cut, 0.9, SR)
    reset = jnp.asarray(rs.rand(V, B) < 0.01)
    ic0 = jnp.asarray(rs.randn(V).astype(np.float32) * 0.1)

    v1k, v2k, ic1k, ic2k = pallas_fx.svf_bank(
        x, g, h, reset, ic0, ic0, interpret=True)

    xn, gn, hn, rn = map(np.asarray, (x, g, h, reset))
    ic1 = np.asarray(ic0).copy()
    ic2 = np.asarray(ic0).copy()
    v2o = np.zeros((V, B), np.float32)
    for n in range(B):
        ic1 = np.where(rn[:, n], 0.0, ic1).astype(np.float32)
        ic2 = np.where(rn[:, n], 0.0, ic2).astype(np.float32)
        v1 = ((gn[:, n] * (xn[:, n] - ic2) + ic1) * hn[:, n]).astype(np.float32)
        v2 = (ic2 + gn[:, n] * v1).astype(np.float32)
        v2o[:, n] = v2
        ic1 = (2 * v1 - ic1).astype(np.float32)
        ic2 = (2 * v2 - ic2).astype(np.float32)
    # XLA contracts mul+add chains into FMAs; numpy rounds each op — 1 ulp
    np.testing.assert_allclose(np.asarray(v2k), v2o, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ic1k), ic1, atol=1e-6)

    st = filters.SVFState(ic1=ic0, ic2=ic0)
    st2, v1s, v2s = filters.svf_tpt_block(st, x, g, h, reset=reset)
    np.testing.assert_allclose(np.asarray(v2k), np.asarray(v2s), atol=2e-5)


def test_fbws_bank_matches_scan_path():
    """Fused voice-bank feedback-waveshaper kernel vs the XLA scan fast
    path: multi-block state threading, per-sample drive/fbc trajectories
    crossing the bypass threshold.  Checks the output and EVERY carried
    state field (including the second-to-last y2/x2 captures)."""
    import jax.numpy as jnp

    from libgooey_tpu.effects import feedback_waveshaper as fw

    rs = np.random.RandomState(5)
    V, Bs = 130, 128  # small B: interpret mode runs the loop per step

    xs = [rs.randn(V, Bs).astype(np.float32) * 0.5 for _ in range(2)]
    ds = [(0.5 + 3.0 * rs.rand(V, Bs)).astype(np.float32) for _ in range(2)]
    fs = [(0.1 + 0.5 * rs.rand(V, Bs)).astype(np.float32) for _ in range(2)]

    def run(impl):
        fw.IMPL = impl
        try:
            st = fw.FBShaperState.init((V,))
            outs = []
            for x, d, f in zip(xs, ds, fs):
                st, y = fw.process_block(
                    st, jnp.asarray(x), jnp.asarray(d),
                    jnp.zeros((V, Bs), jnp.float32), jnp.asarray(f),
                    jnp.float32(1.0), SR, feedback_path=False, os_mode=4)
                outs.append(np.asarray(y))
        finally:
            fw.IMPL = "auto"
        return st, np.concatenate(outs, -1)

    st_x, out_x = run("xla")
    st_p, out_p = run("pallas")
    np.testing.assert_allclose(out_p, out_x, atol=1e-5)
    for name in ("last_out", "filter_state", "dc_x1", "dc_y1", "env"):
        np.testing.assert_allclose(
            np.asarray(getattr(st_p, name)), np.asarray(getattr(st_x, name)),
            atol=1e-5, err_msg=name)
    for hb in ("up1", "up2", "down2", "down1"):
        for f in ("ap0", "ap0x", "ap1", "ap1x", "x1",
                  "ap0y2", "ap0x2", "ap1y2", "ap1x2"):
            np.testing.assert_allclose(
                np.asarray(getattr(getattr(st_p.ovs, hb), f)),
                np.asarray(getattr(getattr(st_x.ovs, hb), f)),
                atol=1e-5, err_msg=f"{hb}.{f}")


def test_pink_bank_matches_scan():
    """Voice-bank pink-noise kernel vs the linrec1 scan path, with
    mid-block trigger resets and carried state across blocks."""
    import jax.numpy as jnp

    from libgooey_tpu.ops import filters, noise

    rs = np.random.RandomState(21)
    V = 128 + 9
    counters = jnp.asarray(
        np.cumsum(rs.randint(1, 3, (V, 2 * B)), axis=-1).astype(np.int32))
    reset = jnp.asarray(rs.rand(V, 2 * B) < 0.004)

    def run(impl):
        filters.IMPL = impl
        try:
            st = noise.PinkState.init((V,))
            outs = []
            for i in range(2):
                sl = slice(i * B, (i + 1) * B)
                st, y = noise.pink_block(
                    st, counters[:, sl], SR, reset=reset[:, sl])
                outs.append(np.asarray(y))
        finally:
            filters.IMPL = "auto"
        return st, np.concatenate(outs, -1)

    st_x, out_x = run("xla")
    st_p, out_p = run("pallas")
    np.testing.assert_allclose(out_p, out_x, atol=1e-6)
    # fstate is pre-output-gain (~9x the output scale): scale the bound
    np.testing.assert_allclose(np.asarray(st_p.fstate),
                               np.asarray(st_x.fstate), atol=1e-5)


def test_mix_bank_matches_xla_mix_stage():
    """Fused mix-stage kernel vs the engine's XLA mix stage: smoothing
    settle-snap, equal-power pan, and the three voice reductions, with
    mid-smoothing pan/gain moves and a padded (non-multiple-of-VC) V."""
    import jax.numpy as jnp

    from libgooey_tpu.core.smoother import SmootherBank, smooth_block
    from libgooey_tpu.core import dsp
    from libgooey_tpu.ops import pallas_fx

    rs = np.random.RandomState(33)
    V = 300  # forces lane padding (VC=256)
    coeff = 0.0015059
    x = jnp.asarray(rs.randn(V, B).astype(np.float32) * 0.3)
    pan_cur = jnp.asarray(rs.rand(V).astype(np.float32))
    pan_tgt = jnp.asarray(rs.rand(V).astype(np.float32))
    # include some already-settled lanes (snap path) and big moves
    pan_tgt = pan_tgt.at[:40].set(pan_cur[:40] + 5e-5)
    gain_cur = jnp.asarray(rs.rand(V).astype(np.float32))
    gain_tgt = jnp.asarray(rs.rand(V).astype(np.float32))
    gain_tgt = gain_tgt.at[100:140].set(gain_cur[100:140])

    suml, sumr, summ = pallas_fx.mix_bank(
        x, pan_cur, pan_tgt, gain_cur, gain_tgt, coeff=coeff, interpret=True)

    _, pan_traj = smooth_block(SmootherBank(pan_cur, pan_tgt), coeff, B)
    _, gain_traj = smooth_block(SmootherBank(gain_cur, gain_tgt), coeff, B)
    gl, gr = dsp.pan_gains(pan_traj)
    shaped = np.asarray(x) * np.asarray(gain_traj)
    ref_l = np.sum(shaped * np.asarray(gl), axis=0)
    ref_r = np.sum(shaped * np.asarray(gr), axis=0)
    ref_m = np.sum(shaped, axis=0)

    scale = np.abs(shaped).sum(axis=0).max() + 1e-9
    np.testing.assert_allclose(np.asarray(suml), ref_l, atol=2e-6 * scale)
    np.testing.assert_allclose(np.asarray(sumr), ref_r, atol=2e-6 * scale)
    np.testing.assert_allclose(np.asarray(summ), ref_m, atol=2e-6 * scale)


def test_smooth_advance_matches_smooth_block():
    from libgooey_tpu.core.smoother import (
        SmootherBank, smooth_advance, smooth_block)

    rs = np.random.RandomState(7)
    cur = rs.randn(64).astype(np.float32)
    tgt = rs.randn(64).astype(np.float32)
    tgt[:8] = cur[:8] + 4e-5  # settle-snap lanes
    bank = SmootherBank(np.asarray(cur), np.asarray(tgt))
    coeff = 0.0015059
    ref, _ = smooth_block(bank, coeff, B)
    got = smooth_advance(bank, coeff, B)
    np.testing.assert_array_equal(np.asarray(got.current), np.asarray(ref.current))
    np.testing.assert_array_equal(np.asarray(got.target), np.asarray(ref.target))


def test_engine_mix_impl_pallas_matches_xla():
    """The opt-in fused mix stage produces the same engine output as the
    default XLA mix (both on the CPU/interpret reference path)."""
    import jax.numpy as jnp

    from libgooey_tpu.core.smoother import SmootherBank, smoothing_coeff
    from libgooey_tpu.engine import engine as eng
    from libgooey_tpu.instruments import kick as kick_mod

    V = 12
    state = {
        "kick": kick_mod.init_state(V, kick_mod.KickConfig.tight()),
        "pan": SmootherBank.init(np.linspace(0.1, 0.9, V).astype(np.float32)),
        "gain": SmootherBank.init(np.full(V, 1.0 / V, np.float32)),
        "master": SmootherBank.init(np.float32(0.25)),
    }
    events = {
        "kick_off": jnp.asarray(np.zeros(V, np.int32)),
        "kick_vel": jnp.asarray(np.linspace(0.4, 1.0, V).astype(np.float32)),
        "block_start": jnp.asarray(np.int32(0)),
    }
    static = dict(kinds=("kick",), sample_rate=SR, block_size=B,
                  smooth_coeff=smoothing_coeff(SR), limiter_threshold=1.0,
                  family_static=(("kick", (("feedback_path", False),
                                           ("max_harmonics", 16))),))

    def run():
        st, out, mono = eng._render_all(state, events, **static)
        return np.asarray(out), np.asarray(mono), st

    out_x, mono_x, st_x = run()
    eng.MIX_IMPL = "pallas"
    try:
        out_p, mono_p, st_p = run()
    finally:
        eng.MIX_IMPL = "xla"

    np.testing.assert_allclose(out_p, out_x, atol=2e-6)
    np.testing.assert_allclose(mono_p, mono_x, atol=2e-6)
    np.testing.assert_allclose(np.asarray(st_p["pan"].current),
                               np.asarray(st_x["pan"].current), atol=1e-7)


def test_svf_and_pink_bank_tiny_v():
    """The bank kernels pad tiny banks (V=3) to one 128-lane slab and still
    match the scan path — the auto gate now engages them at any 2-D V."""
    import jax.numpy as jnp

    from libgooey_tpu.ops import filters, noise, pallas_fx

    rs = np.random.RandomState(5)
    V = 3
    x = jnp.asarray(rs.randn(V, B).astype(np.float32))
    cut = jnp.asarray((200 + 4000 * rs.rand(V, B)).astype(np.float32))
    g, h = filters.svf_coeffs(cut, 0.8, SR)
    reset = jnp.asarray(rs.rand(V, B) < 0.01)
    ic = jnp.asarray(rs.randn(V).astype(np.float32) * 0.1)

    v1k, v2k, ic1k, ic2k = pallas_fx.svf_bank(x, g, h, reset, ic, ic,
                                              interpret=True)
    st, v1x, v2x = filters.svf_tpt_block(
        filters.SVFState(ic, ic), x, g, h, reset=reset)
    np.testing.assert_allclose(np.asarray(v2k), np.asarray(v2x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ic2k), np.asarray(st.ic2), atol=2e-5)

    counters = jnp.asarray(
        np.cumsum(rs.randint(1, 3, (V, B)), axis=-1).astype(np.int32))
    st0 = noise.PinkState.init((V,))
    filters.IMPL = "pallas"
    try:
        stp, yp = noise.pink_block(st0, counters, SR)
    finally:
        filters.IMPL = "auto"
    stx, yx = noise.pink_block(st0, counters, SR)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yx), atol=1e-6)


def test_linrec2_bank_matches_scan_and_oracle():
    """Generic 2-state bank kernel vs ops.scan.linrec2 and a per-sample
    numpy oracle (biquad-shaped coefficients, V=5 padding path)."""
    import jax.numpy as jnp

    from libgooey_tpu.ops import pallas_fx
    from libgooey_tpu.ops import scan as gscan

    rs = np.random.RandomState(11)
    V = 5
    # stable biquad-ish A matrices: [[-a1, -a2], [1, 0]] with |poles| < 1
    a1 = jnp.asarray((-1.2 + 0.1 * rs.rand(V, B)).astype(np.float32))
    a2 = jnp.asarray((0.5 + 0.1 * rs.rand(V, B)).astype(np.float32))
    w = jnp.asarray(rs.randn(V, B).astype(np.float32))
    ones = jnp.ones((V, B), jnp.float32)
    zeros = jnp.zeros((V, B), jnp.float32)
    s10 = jnp.asarray(rs.randn(V).astype(np.float32) * 0.1)
    s20 = jnp.asarray(rs.randn(V).astype(np.float32) * 0.1)

    s1k, s2k, s1l, s2l = pallas_fx.linrec2_bank(
        -a1, -a2, ones, zeros, w, zeros, s10, s20, interpret=True)
    s1x, s2x = gscan.linrec2(-a1, -a2, ones, zeros, w, zeros, (s10, s20))
    np.testing.assert_allclose(np.asarray(s1k), np.asarray(s1x),
                               rtol=2e-4, atol=2e-4)

    # per-sample oracle (f32 op order identical to the kernel)
    s1o = np.asarray(s10).copy()
    s2o = np.asarray(s20).copy()
    a1n, a2n, wn = map(np.asarray, (a1, a2, w))
    ref = np.zeros((V, B), np.float32)
    for n in range(B):
        n1 = (-a1n[:, n] * s1o + -a2n[:, n] * s2o + wn[:, n]).astype(np.float32)
        n2 = s1o
        ref[:, n] = n1
        s1o, s2o = n1, n2
    # same per-sample op order; XLA may contract to FMA -> ulp-level noise
    np.testing.assert_allclose(np.asarray(s1k), ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1l), ref[:, -1], rtol=1e-5, atol=1e-5)


def test_affine1_bank_matches_linrec1_and_maxlin():
    """First-order bank kernel vs the associative-scan paths: plain
    recurrence (a = -inf) and the hihat2-style max-affine tracker."""
    import jax.numpy as jnp

    from libgooey_tpu.ops import pallas_fx
    from libgooey_tpu.ops import scan as gscan

    rs = np.random.RandomState(17)
    V = 6
    a = jnp.asarray((0.90 + 0.09 * rs.rand(V, B)).astype(np.float32))
    b = jnp.asarray((0.02 * rs.randn(V, B)).astype(np.float32))
    y0 = jnp.asarray(rs.randn(V).astype(np.float32) * 0.1)

    yk, ylk = pallas_fx.affine1_bank(
        jnp.full((V, B), -3.0e38, jnp.float32), a, b, y0, interpret=True)
    yx = gscan.linrec1(a, b, y0)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(yx),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ylk), np.asarray(yx)[:, -1],
                               rtol=1e-5, atol=1e-6)

    # max-affine: instant up / smoothed down tracker
    tgt = jnp.asarray(np.abs(rs.randn(V, B)).astype(np.float32))
    k = np.float32(0.04)
    ya = tgt
    yb = jnp.full((V, B), 1.0 - k, jnp.float32)
    yc = k * tgt
    ymk, _ = pallas_fx.affine1_bank(ya, yb, yc, jnp.zeros(V, jnp.float32),
                                    interpret=True)
    ymx = gscan.maxlin(ya, yb, yc, jnp.zeros(V, jnp.float32))
    np.testing.assert_allclose(np.asarray(ymk), np.asarray(ymx),
                               rtol=1e-5, atol=1e-6)


def test_ws4_bank_matches_xla_waveshaper():
    """The fused voice-bank 4x waveshaper (snare/bass overdrive fast path)
    vs effects/waveshaper.process through the XLA oversampler: same
    chains, lane-sequential vs scan numerics (~1e-5 class)."""
    import jax
    import jax.numpy as jnp

    from libgooey_tpu.effects import waveshaper as ws
    from libgooey_tpu.ops import pallas_fx
    from libgooey_tpu.ops.oversample import OversamplerState, stateful

    rng = np.random.RandomState(0)
    V, B = 16, 128
    x = jnp.asarray(rng.randn(V, B).astype(np.float32) * 0.4)
    drive = jnp.asarray((1.0 + rng.rand(V, B) * 8.0).astype(np.float32))
    drive = drive.at[3].set(0.5)    # a fully-bypassed voice
    st = OversamplerState.init((V,))
    wrap, box = stateful(st, 4)
    ref = ws.process(x, drive, mix=1.0, oversample=wrap)
    sat, nst = pallas_fx.ws4_bank(x, drive, pallas_fx.pack_ws4_bank(st),
                                  interpret=True)
    got = jnp.where(drive <= 1.0, x, sat)
    got = jnp.where(jnp.isfinite(x), got, 0.0)
    assert float(jnp.abs(ref - got).max()) < 3e-5
    new_ref = box["state"]
    new_got = pallas_fx.unpack_ws4_bank(nst, st)
    for a, b in zip(jax.tree_util.tree_leaves(new_ref),
                    jax.tree_util.tree_leaves(new_got)):
        assert float(jnp.abs(a - b).max()) < 3e-5
