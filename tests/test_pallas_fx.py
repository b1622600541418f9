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
