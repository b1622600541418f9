"""Every example script runs end-to-end and writes a valid, audible WAV."""

import importlib
import sys
from pathlib import Path

import numpy as np
import pytest

from libgooey_tpu.io_wav import read_wav

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"
sys.path.insert(0, str(EXAMPLES))


@pytest.fixture(autouse=True, scope="module")
def _no_persistent_cache_writes():
    """Skip persistent compile-cache WRITES while example tests run.

    Root cause (diagnosed round 2): the full suite exhausts the kernel's
    vm.max_map_count ~94 tests in (hundreds of in-process XLA:CPU JIT
    compiles/loads, each holding many code mappings); LLVM's mmap then
    fails "Cannot allocate memory" — fatal abort (rc=134) on the cache-
    write serialize/AOT path, SIGSEGV on the cache-read path.  conftest
    raises the limit when privileged; this fixture is defense-in-depth
    for unprivileged boxes: the examples are the heaviest fresh compiles,
    and skipping their cache writes (min-compile-time threshold precedes
    serialize in jax/_src/compiler.py::_cache_write) removes the largest
    mapping spike while cache READS still hit.  tools/warm_cache.py
    pre-populates example entries from fresh subprocesses.
    """
    import jax

    old = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    yield
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old)

MODULES = [
    "drums", "bass_sequencer", "chords", "effects_lab", "granular",
    "loops_and_clips", "sampler_rack", "performance_record", "dsl_demo",
]

#: Per-reference-example scripts (round 2): main(out_path=..., quick=True)
#: renders a shortened but complete pass and writes a WAV.
QUICK_MODULES = [
    "kick", "snare", "hihat", "hihat2", "tom", "tom2", "bass",
    "delay", "reverb", "reverb_lab", "tilt_filter", "lfo_test",
    "sequencer", "membrane", "multi_channel_submix", "midi_drums",
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


@pytest.mark.parametrize("name", QUICK_MODULES)
def test_quick_example_runs(name, tmp_path):
    mod = importlib.import_module(name)
    out = mod.main(out_path=str(tmp_path / f"{name}.wav"), quick=True)
    audio, sr = read_wav(out)
    assert sr == 44100
    assert audio.shape[-1] >= 2048
    assert np.all(np.isfinite(audio))
    assert np.abs(audio).max() > 1e-5, name


def test_bounce_example(capsys):
    import bounce as bounce_example

    paths = bounce_example.main(quick=True)
    assert len(paths) == 3
    ref = None
    for p in paths:
        audio, sr = read_wav(p)
        assert sr == 44100 and np.all(np.isfinite(audio))
        mono = audio if audio.ndim == 1 else audio.mean(axis=0)
        if ref is None:
            ref = mono
        else:  # same render at every bit depth (within quantization)
            assert np.max(np.abs(mono[: len(ref)] - ref[: len(mono)])) < 2e-4
    assert "deterministic: True" in capsys.readouterr().out


def test_antialias_and_aliasing_examples(tmp_path, capsys):
    import aliasing_plots
    import antialias_validation

    antialias_validation.main(quick=True)
    out = capsys.readouterr().out
    # the reference asserts >= 20 dB alias reduction at 4x
    for line in out.splitlines():
        if line.startswith("4x known-bin alias reduction"):
            assert float(line.split(":")[1].split("dB")[0]) >= 20.0

    csv_path = aliasing_plots.main(csv_path=str(tmp_path / "alias.csv"),
                                   quick=True)
    import csv as _csv

    with open(csv_path) as fh:
        rows = list(_csv.DictReader(fh))
    assert rows and all(
        float(r["improvement_db"]) > 6.0 for r in rows
    )  # polyBLEP clearly beats naive at every probed frequency


def test_scope_example(tmp_path):
    """The realtime terminal scope example renders a frame headless."""
    import scope

    out = scope.main(out_path=str(tmp_path / "scope.txt"), quick=True)
    text = open(out).read()
    assert "┌" in text and "master" in text and "dB" in text
