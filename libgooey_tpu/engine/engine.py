"""The native Engine: named instruments, sequencers, master bus.

Behavioral reference: src/engine/mod.rs (486 LoC) — a HashMap of named
instruments, a trigger queue, sequencers and LFOs routed by name, global
effects (SoftLimiter default), a smoothed master gain (default 0.25) and a
per-instrument smoothed pan.

TPU architecture: instruments of the same family live in one device-resident
*bank* (``[V, ...]`` state pytree); a named instrument is a voice slot.  The
host engine is the control plane: it runs sequencers/trigger queues in exact
arithmetic, stages parameter targets, and drives one jitted block step

    step(state, events) -> (state', stereo[2, B])

whose inner mix is ``einsum(pan_gains[2,V,B], voices[V,B])`` — a matmul when
pans are settled.  The host loop is the analog of the reference's audio
callback; nothing audio-rate ever runs in Python.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from libgooey_tpu.core import dsp
from libgooey_tpu.core.constants import (
    DEFAULT_BLOCK_SIZE,
    DEFAULT_SAMPLE_RATE,
)
from libgooey_tpu.core.smoother import SmootherBank, smoothing_coeff
from libgooey_tpu.effects import limiter
from libgooey_tpu.engine.sequencer import Sequencer
from libgooey_tpu.instruments import kick as kick_mod


class EngineState(NamedTuple):
    """Full device-side engine state (one pytree, donated every block)."""

    kick: kick_mod.KickState
    pan: SmootherBank      # [V] per-voice pan (0..1)
    gain: SmootherBank     # [V] per-voice gain (mixer strip, default 1)
    master: SmootherBank   # [] master gain


class BlockEvents(NamedTuple):
    """Host-compiled per-block event arrays."""

    trig_offset: jnp.ndarray    # [V] i32, block_size = none
    trig_velocity: jnp.ndarray  # [V] f32
    block_start: jnp.ndarray    # scalar i32


def _engine_step_core(
    state: EngineState,
    events: BlockEvents,
    *,
    sample_rate: float,
    block_size: int,
    smooth_coeff: float,
    max_harmonics: int,
    feedback_path: bool,
    limiter_threshold: float,
):
    """One block: render all banks, pan-mix, master gain, global FX."""
    kick_state, voice_out = kick_mod.render_block(
        state.kick,
        events.trig_offset,
        events.trig_velocity,
        events.block_start,
        sample_rate=sample_rate,
        block_size=block_size,
        smooth_coeff=smooth_coeff,
        max_harmonics=max_harmonics,
        feedback_path=feedback_path,
    )

    # per-voice gain + equal-power pan, then mix: the stereo seam
    pan_bank, pan_traj = _smooth(state.pan, smooth_coeff, block_size)     # [V,B]
    gain_bank, gain_traj = _smooth(state.gain, smooth_coeff, block_size)  # [V,B]
    gl, gr = dsp.pan_gains(pan_traj)
    shaped = voice_out * gain_traj
    # [2, B] — reduction over voices rides the MXU when pans are settled
    mix = jnp.stack(
        [jnp.sum(shaped * gl, axis=0), jnp.sum(shaped * gr, axis=0)], axis=0
    )

    master_bank, master_traj = _smooth(state.master, smooth_coeff, block_size)
    out = mix * master_traj[None, :]
    out = limiter.soft_limit(out, limiter_threshold)

    new_state = EngineState(
        kick=kick_state, pan=pan_bank, gain=gain_bank, master=master_bank
    )
    # mono sum for bounce parity (native tick: unpanned sum, mod.rs:400-415)
    mono = jnp.sum(shaped, axis=0) * master_traj
    mono = limiter.soft_limit(mono, limiter_threshold)
    return new_state, out, mono


_engine_step = jax.jit(
    _engine_step_core,
    static_argnames=(
        "sample_rate",
        "block_size",
        "smooth_coeff",
        "max_harmonics",
        "feedback_path",
        "limiter_threshold",
    ),
)


def _smooth(bank: SmootherBank, coeff: float, block: int):
    from libgooey_tpu.core.smoother import smooth_block

    return smooth_block(bank, coeff, block)


@partial(
    jax.jit,
    static_argnames=(
        "sample_rate",
        "block_size",
        "smooth_coeff",
        "max_harmonics",
        "feedback_path",
        "limiter_threshold",
    ),
)
def render_many(
    state: EngineState,
    trig_offsets,     # [N, V] i32
    trig_velocities,  # [N, V] f32
    block_starts,     # [N] i32
    *,
    sample_rate: float,
    block_size: int,
    smooth_coeff: float,
    max_harmonics: int,
    feedback_path: bool,
    limiter_threshold: float,
):
    """Render N blocks in one device program (lax.scan over blocks).

    The offline/bench path: the host precomputes all sequencer events
    up-front (exact f64 control arithmetic), then the whole render runs as
    one XLA program with zero per-block dispatch.  Returns
    ``(final_state, stereo[N, 2, B])``.
    """

    def step(st, ev):
        off, vel, start = ev
        st2, out, _mono = _engine_step_core(
            st,
            BlockEvents(off, vel, start),
            sample_rate=sample_rate,
            block_size=block_size,
            smooth_coeff=smooth_coeff,
            max_harmonics=max_harmonics,
            feedback_path=feedback_path,
            limiter_threshold=limiter_threshold,
        )
        return st2, out

    return jax.lax.scan(step, state, (trig_offsets, trig_velocities, block_starts))


class Engine:
    """Host control plane over the device-resident render graph.

    Mirrors the reference Engine API (src/engine/mod.rs:84-127): named
    instruments, `add_sequencer`, `trigger`, master gain, per-instrument
    pan — plus a `voices` capacity for TPU-scale banks.
    """

    def __init__(
        self,
        sample_rate: float = DEFAULT_SAMPLE_RATE,
        block_size: int = DEFAULT_BLOCK_SIZE,
        voices: int = 8,
        max_harmonics: int = 0,
    ):
        self.sample_rate = float(sample_rate)
        self.block_size = int(block_size)
        self.voices = int(voices)
        self.max_harmonics = int(max_harmonics)
        self.smooth_coeff = smoothing_coeff(self.sample_rate)
        self.limiter_threshold = 1.0

        self._names: Dict[str, int] = {}
        self._next_voice = 0
        self._kick_targets = np.broadcast_to(
            kick_mod.KickConfig.tight().as_array(), (self.voices, kick_mod.NUM_PARAMS)
        ).copy()
        self._params_dirty = False
        self._pan_targets = np.full(self.voices, 0.5, np.float32)
        self._gain_targets = np.ones(self.voices, np.float32)
        self._mix_dirty = False
        self._master_target = 0.25  # engine/mod.rs default master gain
        self._master_dirty = False

        self.sequencers: List[Sequencer] = []
        self._trigger_queue: List = []  # (voice, velocity)
        self.sample_count = 0  # global sample counter (block-aligned)

        self.state = EngineState(
            kick=kick_mod.init_state(self.voices),
            pan=SmootherBank.init(self._pan_targets),
            gain=SmootherBank.init(self._gain_targets),
            master=SmootherBank.init(np.float32(self._master_target)),
        )

    # --- instrument management -------------------------------------------------

    def add_kick(self, name: str, config: Optional[kick_mod.KickConfig] = None) -> int:
        """Register a named kick voice; returns its voice index."""
        if self._next_voice >= self.voices:
            raise RuntimeError("voice capacity exceeded; construct with more voices")
        v = self._next_voice
        self._next_voice += 1
        self._names[name] = v
        if config is not None:
            self.set_kick_config(name, config)
        return v

    def voice_index(self, name: str) -> int:
        return self._names[name]

    def set_kick_config(self, name: str, config: kick_mod.KickConfig):
        self._kick_targets[self._names[name]] = config.as_array()
        self._params_dirty = True

    def set_kick_param(self, name: str, param: str, value: float):
        """Smoothed parameter target (the KICK_PARAM_* setter family)."""
        self._kick_targets[self._names[name], kick_mod.PARAM_INDEX[param]] = np.clip(
            value, 0.0, 1.0
        )
        self._params_dirty = True

    def get_kick_param(self, name: str, param: str) -> float:
        """Round-trip getter for host state recovery (tests/param_getters.rs)."""
        return float(self._kick_targets[self._names[name], kick_mod.PARAM_INDEX[param]])

    def set_pan(self, name: str, pan: float):
        self._pan_targets[self._names[name]] = np.clip(pan, 0.0, 1.0)
        self._mix_dirty = True

    def set_gain(self, name: str, gain: float):
        self._gain_targets[self._names[name]] = max(float(gain), 0.0)
        self._mix_dirty = True

    def set_master_gain(self, gain: float):
        self._master_target = float(gain)
        self._master_dirty = True

    # --- control ---------------------------------------------------------------

    def add_sequencer(self, seq: Sequencer):
        if seq.name not in self._names:
            raise KeyError(f"sequencer targets unknown instrument {seq.name!r}")
        self.sequencers.append(seq)

    def new_sequencer(self, name: str, bpm: float, steps: int = 16) -> Sequencer:
        seq = Sequencer(bpm, self.sample_rate, steps, name)
        self.add_sequencer(seq)
        return seq

    def trigger(self, name: str, velocity: float = 0.5):
        """Queue a manual trigger for the next block start (offset 0),
        mirroring the FFI's atomics-drained-at-sample-0 contract
        (ffi.rs:1078-1095)."""
        self._trigger_queue.append((self._names[name], float(velocity)))

    # --- rendering ----------------------------------------------------------------

    def _stage(self):
        if self._params_dirty:
            self.state = self.state._replace(
                kick=self.state.kick._replace(
                    params=self.state.kick.params.with_targets(self._kick_targets)
                )
            )
            self._params_dirty = False
        if self._mix_dirty:
            self.state = self.state._replace(
                pan=self.state.pan.with_targets(self._pan_targets),
                gain=self.state.gain.with_targets(self._gain_targets),
            )
            self._mix_dirty = False
        if self._master_dirty:
            self.state = self.state._replace(
                master=self.state.master.with_targets(np.float32(self._master_target))
            )
            self._master_dirty = False

    def _collect_events(self) -> BlockEvents:
        B = self.block_size
        off = np.full(self.voices, B, np.int32)
        vel = np.zeros(self.voices, np.float32)
        for voice, velocity in self._trigger_queue:
            off[voice] = 0
            vel[voice] = velocity
        self._trigger_queue.clear()
        for seq in self.sequencers:
            voice = self._names[seq.name]
            for trig in seq.tick_block(B):
                # last trigger in a block wins per voice (reference fires all,
                # but retrigger replaces envelopes; <1 trigger/block at sane BPM)
                off[voice] = trig.offset
                vel[voice] = trig.velocity
        return BlockEvents(
            trig_offset=jnp.asarray(off),
            trig_velocity=jnp.asarray(vel),
            block_start=jnp.asarray(np.int32(self.sample_count)),
        )

    def render_block(self):
        """Render one block → ``(stereo[2,B], mono[B])`` numpy arrays."""
        self._stage()
        events = self._collect_events()
        self.state, out, mono = _engine_step(
            self.state,
            events,
            sample_rate=self.sample_rate,
            block_size=self.block_size,
            smooth_coeff=self.smooth_coeff,
            max_harmonics=self.max_harmonics,
            feedback_path=False,
            limiter_threshold=self.limiter_threshold,
        )
        self.sample_count += self.block_size
        return out, mono

    def render(self, num_samples: int) -> np.ndarray:
        """Render stereo ``[2, num_samples]``."""
        blocks = []
        rendered = 0
        while rendered < num_samples:
            out, _ = self.render_block()
            blocks.append(np.asarray(out))
            rendered += self.block_size
        return np.concatenate(blocks, axis=1)[:, :num_samples]

    def render_mono(self, num_samples: int) -> np.ndarray:
        """Render mono (unpanned sum — the reference's bounce path)."""
        blocks = []
        rendered = 0
        while rendered < num_samples:
            _, mono = self.render_block()
            blocks.append(np.asarray(mono))
            rendered += self.block_size
        return np.concatenate(blocks)[:num_samples]

    # --- bounce (src/bounce.rs) ---------------------------------------------------

    def prepare_for_bounce(self):
        """Reset sequencers/transport and snap master gain (mod.rs:464-477)."""
        for seq in self.sequencers:
            seq.reset()
        self._stage()
        self.state = self.state._replace(master=self.state.master.snapped())
        self.sample_count = 0

    def bounce_samples_for(self, bpm: float, bars: Optional[int] = None,
                           beats: Optional[float] = None,
                           samples: Optional[int] = None) -> int:
        """BounceLength::{Bars,Beats,Samples} → samples (bounce.rs:9-33)."""
        if samples is not None:
            return int(samples)
        if beats is None:
            beats = (bars or 0) * 4.0
        return int(beats * (60.0 / bpm) * self.sample_rate)

    def bounce_to_buffer(self, num_samples: int) -> np.ndarray:
        self.prepare_for_bounce()
        for seq in self.sequencers:
            seq.start()
        out = self.render_mono(num_samples)
        for seq in self.sequencers:
            seq.stop()
        return out

    def bounce_to_wav(self, path, num_samples: int, bits: int = 16):
        from libgooey_tpu.io_wav import write_wav

        buf = self.bounce_to_buffer(num_samples)
        write_wav(path, buf, int(self.sample_rate), bits=bits)
        return buf
