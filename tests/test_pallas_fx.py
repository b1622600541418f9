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
    assert err < 2e-5, err


def test_saturation_fused_kernel_matches_xla():
    rs = np.random.RandomState(3)
    n = 4 * B
    x = rs.uniform(-0.8, 0.8, (2, n)).astype(np.float32)
    # params move mid-stream; final block drops mix under the bypass gate
    seq = [(0.6, 0.5, 1.0), (0.6, 0.5, 1.0), (0.2, 0.9, 0.7), (0.2, 0.9, 0.0)]
    want = _run_mod(saturation, seq[0], x, seq, "xla")
    got = _run_mod(saturation, seq[0], x, seq, "pallas")
    err = np.max(np.abs(got - want))
    assert err < 5e-5, err
