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
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from libgooey_tpu.core import dsp
from libgooey_tpu.core.constants import DEFAULT_BLOCK_SIZE, DEFAULT_SAMPLE_RATE
from libgooey_tpu.core.smoother import SmootherBank, smoothing_coeff, smooth_block
from libgooey_tpu.effects import limiter
from libgooey_tpu.engine.sequencer import Sequencer
from libgooey_tpu.instruments import bass, hihat, hihat2, kick, snare, tom, tom2

#: Instrument family registry: kind -> module.  Every module implements
#: ``init_state(V, config)`` and ``render_block(state, off, vel, start,
#: sample_rate=, block_size=, smooth_coeff=, **static)`` plus PARAM_NAMES /
#: PARAM_INDEX / PRESETS.
FAMILIES = {
    "kick": kick,
    "snare": snare,
    "hihat": hihat,
    "hihat2": hihat2,
    "tom": tom,
    "tom2": tom2,
    "bass": bass,
}

#: Per-family extra static kwargs for render_block.
FAMILY_STATIC = {
    "kick": dict(max_harmonics=128, feedback_path=False),
    "snare": dict(max_harmonics=192),
    "hihat": dict(),
    "hihat2": dict(),
    "tom": dict(max_harmonics=128),
    "tom2": dict(),
    "bass": dict(),
}


def _render_all(
    state: dict,
    events: dict,
    *,
    kinds: Tuple[str, ...],
    sample_rate: float,
    block_size: int,
    smooth_coeff: float,
    limiter_threshold: float,
    family_static: Tuple[Tuple[str, Tuple[Tuple[str, object], ...]], ...],
):
    """One block over every instrument bank + mix + master + global FX."""
    static = {k: dict(v) for k, v in family_static}
    new_state = dict(state)
    voice_outs = []
    for kind in kinds:
        mod = FAMILIES[kind]
        bank_state, out = mod.render_block(
            state[kind],
            events[kind + "_off"],
            events[kind + "_vel"],
            events["block_start"],
            sample_rate=sample_rate,
            block_size=block_size,
            smooth_coeff=smooth_coeff,
            **static.get(kind, {}),
        )
        new_state[kind] = bank_state
        voice_outs.append(out)
    all_voices = jnp.concatenate(voice_outs, axis=0) if voice_outs else jnp.zeros(
        (0, block_size), jnp.float32
    )

    pan_bank, pan_traj = smooth_block(state["pan"], smooth_coeff, block_size)
    gain_bank, gain_traj = smooth_block(state["gain"], smooth_coeff, block_size)
    gl, gr = dsp.pan_gains(pan_traj)
    shaped = all_voices * gain_traj
    mix = jnp.stack(
        [jnp.sum(shaped * gl, axis=0), jnp.sum(shaped * gr, axis=0)], axis=0
    )

    master_bank, master_traj = smooth_block(state["master"], smooth_coeff, block_size)
    out = limiter.soft_limit(mix * master_traj[None, :], limiter_threshold)
    mono = limiter.soft_limit(jnp.sum(shaped, axis=0) * master_traj, limiter_threshold)

    new_state["pan"] = pan_bank
    new_state["gain"] = gain_bank
    new_state["master"] = master_bank
    return new_state, out, mono


_STATIC_NAMES = (
    "kinds",
    "sample_rate",
    "block_size",
    "smooth_coeff",
    "limiter_threshold",
    "family_static",
)

_render_all_jit = jax.jit(_render_all, static_argnames=_STATIC_NAMES)


@partial(jax.jit, static_argnames=_STATIC_NAMES)
def render_many(state: dict, events_stacked: dict, **static):
    """Render N blocks in one XLA program (lax.scan over blocks).

    ``events_stacked`` carries a leading block axis on every event array.
    The offline/bench path: the host precomputes all sequencer events
    up-front in exact arithmetic; the render runs with zero per-block
    dispatch.  Returns ``(final_state, stereo[N, 2, B])``.
    """

    def step(st, ev):
        st2, out, _mono = _render_all(st, ev, **static)
        return st2, out

    return jax.lax.scan(step, state, events_stacked)


class Engine:
    """Host control plane over the device-resident render graph.

    Mirrors the reference Engine API (src/engine/mod.rs:84-127): named
    instruments of any family, `add_sequencer`, `trigger`, master gain,
    per-instrument pan/gain — each named instrument occupying one voice lane
    of its family's bank.
    """

    def __init__(
        self,
        sample_rate: float = DEFAULT_SAMPLE_RATE,
        block_size: int = DEFAULT_BLOCK_SIZE,
        family_static: Optional[dict] = None,
    ):
        self.sample_rate = float(sample_rate)
        self.block_size = int(block_size)
        self.smooth_coeff = smoothing_coeff(self.sample_rate)
        self.limiter_threshold = 1.0
        self.family_static = {**FAMILY_STATIC, **(family_static or {})}

        # host mirrors
        self._names: Dict[str, Tuple[str, int]] = {}   # name -> (kind, slot)
        self._targets: Dict[str, List[np.ndarray]] = {k: [] for k in FAMILIES}
        self._configs: Dict[str, List[object]] = {k: [] for k in FAMILIES}
        self._dirty: Dict[str, bool] = {k: False for k in FAMILIES}
        self._pan: List[float] = []
        self._gain: List[float] = []
        self._mix_dirty = False
        self._master_target = 0.25   # engine/mod.rs default master gain
        self._master_dirty = False

        self.sequencers: List[Sequencer] = []
        self._trigger_queue: List = []
        self.sample_count = 0
        self._state: Optional[dict] = None  # built lazily at first render

    # --- instrument management --------------------------------------------------

    def add_instrument(self, name: str, kind: str, config=None) -> int:
        if self._state is not None:
            raise RuntimeError("add instruments before the first render")
        if kind not in FAMILIES:
            raise KeyError(f"unknown instrument family {kind!r}")
        mod = FAMILIES[kind]
        cfg = config if config is not None else mod.PRESETS["default"]()
        slot = len(self._targets[kind])
        self._targets[kind].append(cfg.as_array())
        self._configs[kind].append(cfg)
        self._names[name] = (kind, slot)
        # mixer strip slot (global voice order: family order, then slot)
        self._pan.append(0.5)
        self._gain.append(1.0)
        return slot

    def add_kick(self, name: str, config=None) -> int:
        return self.add_instrument(name, "kick", config)

    def instrument_kinds(self) -> Tuple[str, ...]:
        return tuple(k for k in FAMILIES if self._targets[k])

    def _global_voice_index(self, name: str) -> int:
        kind, slot = self._names[name]
        idx = 0
        for k in FAMILIES:
            if k == kind:
                return idx + slot
            idx += len(self._targets[k])
        raise KeyError(name)

    # --- parameters ----------------------------------------------------------------

    def set_param(self, name: str, param: str, value: float):
        """Smoothed normalized param target (the *_PARAM_* setter family)."""
        kind, slot = self._names[name]
        mod = FAMILIES[kind]
        self._targets[kind][slot][mod.PARAM_INDEX[param]] = value
        self._dirty[kind] = True
        if self._state is not None:
            self._stage_kind(kind)

    def get_param(self, name: str, param: str) -> float:
        """Round-trip getter (host mirror — realtime-safe, no device read)."""
        kind, slot = self._names[name]
        return float(self._targets[kind][slot][FAMILIES[kind].PARAM_INDEX[param]])

    def set_config(self, name: str, config):
        kind, slot = self._names[name]
        self._targets[kind][slot] = config.as_array()
        self._configs[kind][slot] = config
        self._dirty[kind] = True
        if self._state is not None:
            self._stage_kind(kind)

    def set_pan(self, name: str, pan: float):
        self._pan[self._global_voice_index(name)] = float(np.clip(pan, 0.0, 1.0))
        self._mix_dirty = True

    def set_gain(self, name: str, gain: float):
        self._gain[self._global_voice_index(name)] = max(float(gain), 0.0)
        self._mix_dirty = True

    def set_master_gain(self, gain: float):
        self._master_target = float(gain)
        self._master_dirty = True

    # --- control ----------------------------------------------------------------------

    def add_sequencer(self, seq: Sequencer):
        if seq.name not in self._names:
            raise KeyError(f"sequencer targets unknown instrument {seq.name!r}")
        self.sequencers.append(seq)

    def new_sequencer(self, name: str, bpm: float, steps: int = 16) -> Sequencer:
        seq = Sequencer(bpm, self.sample_rate, steps, name)
        self.add_sequencer(seq)
        return seq

    def trigger(self, name: str, velocity: float = 0.5):
        """Queue a manual trigger for the next block start (ffi.rs:1078-1095)."""
        self._trigger_queue.append((self._names[name], float(velocity)))

    # --- device state ---------------------------------------------------------------------

    def _build_state(self):
        state = {}
        for kind in self.instrument_kinds():
            mod = FAMILIES[kind]
            targets = np.stack(self._targets[kind])
            state[kind] = mod.init_state(len(self._targets[kind]), targets=targets)
            # non-smoothed static per-voice fields from configs
            if kind == "snare":
                state[kind] = state[kind]._replace(
                    filter_type=jnp.asarray(
                        [c.filter_type for c in self._configs[kind]], jnp.int32
                    )
                )
            if kind == "hihat":
                state[kind] = state[kind]._replace(
                    is_open=jnp.asarray(
                        [1.0 if c.is_open else 0.0 for c in self._configs[kind]],
                        jnp.float32,
                    )
                )
            if kind == "hihat2":
                state[kind] = state[kind]._replace(
                    noise_color=jnp.asarray(
                        [c.noise_color for c in self._configs[kind]], jnp.int32
                    ),
                    filter_slope=jnp.asarray(
                        [c.filter_slope for c in self._configs[kind]], jnp.int32
                    ),
                )
        state["pan"] = SmootherBank.init(np.asarray(self._pan, np.float32))
        state["gain"] = SmootherBank.init(np.asarray(self._gain, np.float32))
        state["master"] = SmootherBank.init(np.float32(self._master_target))
        self._state = state

    def _stage_kind(self, kind: str):
        if not self._dirty[kind] or self._state is None:
            return
        targets = np.stack(self._targets[kind])
        st = self._state[kind]
        if hasattr(st, "params") and isinstance(st.params, SmootherBank):
            self._state[kind] = st._replace(params=st.params.with_targets(targets))
        else:  # tom2: plain params
            self._state[kind] = st._replace(params=jnp.asarray(targets, jnp.float32))
        self._dirty[kind] = False

    def _stage(self):
        if self._state is None:
            self._build_state()
        for kind in self.instrument_kinds():
            self._stage_kind(kind)
        if self._mix_dirty:
            self._state["pan"] = self._state["pan"].with_targets(
                np.asarray(self._pan, np.float32)
            )
            self._state["gain"] = self._state["gain"].with_targets(
                np.asarray(self._gain, np.float32)
            )
            self._mix_dirty = False
        if self._master_dirty:
            self._state["master"] = self._state["master"].with_targets(
                np.float32(self._master_target)
            )
            self._master_dirty = False

    def _collect_events(self) -> dict:
        B = self.block_size
        kinds = self.instrument_kinds()
        offs = {k: np.full(len(self._targets[k]), B, np.int32) for k in kinds}
        vels = {k: np.zeros(len(self._targets[k]), np.float32) for k in kinds}
        for (kind, slot), velocity in self._trigger_queue:
            offs[kind][slot] = 0
            vels[kind][slot] = velocity
        self._trigger_queue.clear()
        for seq in self.sequencers:
            kind, slot = self._names[seq.name]
            for trig in seq.tick_block(B):
                offs[kind][slot] = trig.offset
                vels[kind][slot] = trig.velocity
        events = {"block_start": jnp.asarray(np.int32(self.sample_count))}
        for k in kinds:
            events[k + "_off"] = jnp.asarray(offs[k])
            events[k + "_vel"] = jnp.asarray(vels[k])
        return events

    def _static_key(self):
        return tuple(
            (k, tuple(sorted(self.family_static.get(k, {}).items())))
            for k in self.instrument_kinds()
        )

    # --- rendering ---------------------------------------------------------------------------

    def render_block(self):
        """Render one block → ``(stereo[2,B], mono[B])`` device arrays."""
        self._stage()
        events = self._collect_events()
        self._state, out, mono = _render_all_jit(
            self._state,
            events,
            kinds=self.instrument_kinds(),
            sample_rate=self.sample_rate,
            block_size=self.block_size,
            smooth_coeff=self.smooth_coeff,
            limiter_threshold=self.limiter_threshold,
            family_static=self._static_key(),
        )
        self.sample_count += self.block_size
        return out, mono

    def render(self, num_samples: int) -> np.ndarray:
        blocks = []
        rendered = 0
        while rendered < num_samples:
            out, _ = self.render_block()
            blocks.append(np.asarray(out))
            rendered += self.block_size
        return np.concatenate(blocks, axis=1)[:, :num_samples]

    def render_mono(self, num_samples: int) -> np.ndarray:
        """Mono (unpanned sum) — the reference's bounce path (mod.rs:400-415)."""
        blocks = []
        rendered = 0
        while rendered < num_samples:
            _, mono = self.render_block()
            blocks.append(np.asarray(mono))
            rendered += self.block_size
        return np.concatenate(blocks)[:num_samples]

    # --- bounce (src/bounce.rs) -----------------------------------------------------------------

    def prepare_for_bounce(self):
        """Reset sequencers/transport and snap master gain (mod.rs:464-477)."""
        for seq in self.sequencers:
            seq.reset()
        self._stage()
        self._state["master"] = self._state["master"].snapped()
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
