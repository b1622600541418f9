#!/usr/bin/env python
"""Headline benchmark: aggregate real-time factor at 44.1 kHz on one chip.

Renders a 4,096-voice kick bank (tight preset, 16-step sequencer at 120 BPM,
staggered per-voice pattern phases) through the full engine step — trigger
latching, parameter smoothing, pitch/amp envelopes, click filter, pink-noise
layer, resonant SVF, feedback-waveshaper overdrive, equal-power pan mix,
master gain, soft limiter — in 512-sample blocks via one scanned XLA program.

Metric: audio-seconds rendered per wall second per chip = RTF × voices.
Baseline target (BASELINE.json): 5,000× on one TPU v5e.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from libgooey_tpu.core.smoother import SmootherBank, smoothing_coeff
from libgooey_tpu.engine import engine as eng
from libgooey_tpu.engine.sequencer import Sequencer
from libgooey_tpu.instruments import kick as kick_mod

VOICES = 4096
BLOCK = 512
SR = 44100.0
N_BLOCKS = 128          # ~1.49 s of audio per call
WARMUP = 3
ITERS = 3   # each timed sample already averages PIPE chained calls
BASELINE_RTF = 5000.0


def build_events():
    """Sequencer events for N_BLOCKS, per-voice staggered pattern phases."""
    offs = np.full((N_BLOCKS, VOICES), BLOCK, np.int32)
    vels = np.zeros((N_BLOCKS, VOICES), np.float32)
    seq = Sequencer(120.0, SR, 16)
    seq.set_pattern([True] * 16)
    seq.start()
    base_hits = []
    done = 0
    for _b in range(N_BLOCKS):
        for t in seq.tick_block(BLOCK):
            base_hits.append(done + t.offset)
        done += BLOCK
    rng = np.random.RandomState(0)
    lags = rng.randint(0, int(SR * 0.5), size=VOICES)
    total = N_BLOCKS * BLOCK
    for v in range(VOICES):
        for h in base_hits:
            s = h + int(lags[v])
            if s < total:
                offs[s // BLOCK, v] = s % BLOCK
                vels[s // BLOCK, v] = 0.5 + 0.5 * ((v % 7) / 6.0)
    starts = (np.arange(N_BLOCKS) * BLOCK).astype(np.int32)
    return offs, vels, starts


def _discover_device(attempts: int = 4, timeout_s: float = 120.0):
    """Bounded backend discovery: a dead TPU tunnel hangs ``jax.devices()``
    forever inside PJRT client init — fail fast with a clear error instead
    of hanging the driver's bench step."""
    import threading

    box = {}

    def probe():
        try:
            box["devices"] = jax.devices()
        except Exception as exc:  # noqa: BLE001 — reported below
            box["error"] = repr(exc)

    last_err = None
    for attempt in range(attempts):
        # daemon thread: a hung PJRT init must not block process exit
        t = threading.Thread(target=probe, daemon=True)
        t.start()
        t.join(timeout=timeout_s)
        if "devices" in box:
            return box["devices"][0]
        last_err = box.pop("error", f"backend init timed out after {timeout_s:.0f}s")
        print(f"# device discovery attempt {attempt + 1} failed: {last_err}",
              file=sys.stderr)
        time.sleep(15.0)
        if "devices" in box:  # a hung attempt eventually completed
            return box["devices"][0]
    print(f"bench: no usable accelerator ({last_err})", file=sys.stderr)
    os._exit(2)


def main():
    dev = _discover_device()
    print(f"# device: {dev}", file=sys.stderr)

    state = {
        "kick": kick_mod.init_state(VOICES, kick_mod.KickConfig.tight()),
        "pan": SmootherBank.init(np.linspace(0.2, 0.8, VOICES).astype(np.float32)),
        "gain": SmootherBank.init(np.full(VOICES, 1.0 / VOICES, np.float32)),
        "master": SmootherBank.init(np.float32(0.25)),
    }
    offs, vels, starts = build_events()
    events = {
        "kick_off": jax.numpy.asarray(offs),
        "kick_vel": jax.numpy.asarray(vels),
        "block_start": jax.numpy.asarray(starts),
    }

    static = dict(
        kinds=("kick",),
        sample_rate=SR,
        block_size=BLOCK,
        smooth_coeff=smoothing_coeff(SR),
        limiter_threshold=1.0,
        # tight preset: punch == 0, so the additive oscillator is inactive
        family_static=(("kick", (("feedback_path", False), ("max_harmonics", 0))),),
    )

    # MUST be jitted AND synced by a real download: on the tunneled axon
    # backend, un-jitted top-level computations dispatch lazily and
    # jax.block_until_ready returns without waiting for them — round 1's
    # headline (42.1M RTF) was exactly that artifact.  A jitted call plus
    # a small host read of the last block forces true completion.
    run = jax.jit(lambda s: eng.render_many(s, events, **static))

    def sync(out):
        np.asarray(out[1][-1, :, -8:])  # ~RTT + 64 floats; depends on all blocks

    for _ in range(WARMUP):
        out = run(state)
    sync(out)

    # Steady-state pipelined throughput: CHAIN states through PIPE dependent
    # calls and sync once.  This is exactly how a continuous offline render
    # runs (block N+1's state depends on block N), the device executes the
    # calls back-to-back, and the single tunnel round-trip (~25 ms) amortizes
    # over PIPE * N_BLOCKS blocks instead of N_BLOCKS.  Still jitted + synced
    # by a real download, so there is no lazy-dispatch artifact: the timed
    # region contains all PIPE renders' device work.
    #
    # The TPU is reached through a shared tunnel with bursty multi-second
    # load swings (2x between windows); measure in several separated
    # batches and take the global best so one slow window doesn't
    # misreport the chip's actual throughput.
    PIPE = 8
    times = []
    n_batches = 5
    for batch in range(n_batches):
        for _ in range(ITERS):
            t0 = time.perf_counter()
            s = state
            for _k in range(PIPE):
                s, blocks = run(s)
            sync((s, blocks))
            times.append((time.perf_counter() - t0) / PIPE)
        if batch < n_batches - 1:
            time.sleep(4.0)

    wall = min(times)
    audio_seconds = VOICES * N_BLOCKS * BLOCK / SR
    rtf = audio_seconds / wall
    print(
        json.dumps(
            {
                "metric": "aggregate_rtf_4096_voices_44k1",
                "value": round(rtf, 1),
                "unit": "audio-seconds/sec/chip (RTF x voices)",
                "vs_baseline": round(rtf / BASELINE_RTF, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
