"""Every example script runs end-to-end and writes a valid, audible WAV."""

import importlib
import sys
from pathlib import Path

import numpy as np
import pytest

from libgooey_tpu.io_wav import read_wav

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"
sys.path.insert(0, str(EXAMPLES))

MODULES = [
    "drums", "bass_sequencer", "chords", "effects_lab", "granular",
    "loops_and_clips", "sampler_rack", "performance_record", "dsl_demo",
]


@pytest.mark.parametrize("name", MODULES)
def test_example_runs(name, tmp_path):
    mod = importlib.import_module(name)
    out = mod.main(seconds=0.5, out_path=str(tmp_path / f"{name}.wav"))
    audio, sr = read_wav(out)
    assert sr == 44100
    assert audio.shape[-1] >= int(0.4 * sr)
    assert np.all(np.isfinite(audio))
    if name != "loops_and_clips":  # its first half waits for the bar boundary
        assert np.abs(audio).max() > 1e-5, name
