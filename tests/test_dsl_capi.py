"""DSL (src/dsl.rs parity) + C-API adapter (ffi.rs integer-id surface) tests."""

import numpy as np
import pytest

from libgooey_tpu import capi, dsl

PROGRAM = """
# four on the floor with a hat
bpm 130
master 0.5
inst kick kick tight
inst hat hihat2 short
seq kick x...x...x...x...
seq hat 9.5.9.5.9.5.9.5. swing=0.2
lfo 1bar kick.frequency amt=0.4
fx lowpass 2000 0.3
fx delay 0.5 0.4 0.25 6000
"""


def test_dsl_parse_shapes():
    prog = dsl.parse(PROGRAM)
    assert prog.bpm == 130.0 and prog.master_gain == 0.5
    assert [i.family for i in prog.instruments] == ["kick", "hihat2"]
    assert prog.instruments[0].preset == "tight"
    assert prog.sequencers[1].swing == 0.2
    assert prog.lfos[0].division == 2 and prog.lfos[0].amount == 0.4
    assert [e.name for e in prog.effects] == ["lowpass", "delay"]


def test_dsl_errors():
    with pytest.raises(ValueError, match="unknown instrument family"):
        dsl.parse("inst x zither")
    with pytest.raises(ValueError, match="unknown instrument"):
        dsl.parse("seq ghost x...")
    with pytest.raises(ValueError, match="duplicate"):
        dsl.parse("inst a kick\ninst a snare")
    with pytest.raises(ValueError, match="unknown statement"):
        dsl.parse("fnord 3")


def test_dsl_build_and_render():
    engine = dsl.build_engine(PROGRAM)
    arr = np.asarray(engine.render(4096))  # stereo [2, N]
    assert np.all(np.isfinite(arr))
    assert np.abs(arr).max() > 1e-4  # sequenced kick fired


def test_capi_lifecycle_and_params():
    h = capi.engine_new(44100.0)
    try:
        # kick param id 4 = DECAY → oscillator_decay
        assert capi.engine_set_channel_param(h, 0, 4, 0.7) == 1
        assert abs(capi.engine_get_channel_param(h, 0, 4) - 0.7) < 1e-7
        # snare (channel 1 default) id 12 = FILTER_TYPE (static u8)
        assert capi.engine_set_channel_param(h, 1, 12, 2) == 1
        assert capi.engine_get_channel_param(h, 1, 12) == 2.0
        # out-of-range id rejected
        assert capi.engine_set_channel_param(h, 0, 99, 0.5) == 0
        # hot-swap then param dispatch follows the new family table
        assert capi.engine_set_channel_instrument(h, 1, 0) == 1
        assert capi.engine_get_channel_instrument(h, 1) == 0
        assert capi.engine_set_channel_param(h, 1, 5, 0.9) == 1  # PITCH_ENVELOPE
        assert abs(capi.engine_get_channel_param(h, 1, 5) - 0.9) < 1e-7
        # granulator ids
        assert capi.engine_granulator_set_param(h, 4, 0.8) == 1  # density
        assert capi.engine_granulator_set_param(h, 50, 0.8) == 0
    finally:
        capi.engine_free(h)


def test_capi_render_and_sequencer():
    h = capi.engine_new(44100.0)
    try:
        capi.engine_set_bpm(h, 160.0)
        capi.engine_sequencer_set_step(h, 0, 0, 1, 1.0)
        capi.engine_sequencer_start(h, 0)
        out = capi.engine_render(h, 2048)
        assert out.shape == (4096,) and out.dtype == np.float32
        assert np.abs(out).max() > 1e-4
        assert capi.engine_take_channel_peak(h, 0) > 0.0
        assert capi.engine_last_error(h) == ""
    finally:
        capi.engine_free(h)
