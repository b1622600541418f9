"""MIDI input: parser, SMF reader, live adapter, dispatcher.

Reference behavior: the ``midi`` feature's example handler
(/root/reference/examples/kick.rs:379-426) — first-port connect, Note On
velocity > 0 → trigger, graceful no-device fallback — plus the MIDI spec
rules (running status, velocity-0 note-off) its inline parser elides.
"""

import struct

import numpy as np
import pytest

from libgooey_tpu import midi


# --- byte-stream parser --------------------------------------------------------


def test_parse_note_on_off():
    evs = midi.parse_stream(bytes([0x90, 60, 100, 0x80, 60, 0]))
    assert [(e.kind, e.note) for e in evs] == [("on", 60), ("off", 60)]
    assert abs(evs[0].velocity - 100 / 127.0) < 1e-9


def test_running_status_and_vel0_off():
    # status 0x90 once, then three data pairs; velocity 0 is note-off
    evs = midi.parse_stream(bytes([0x92, 36, 90, 38, 80, 36, 0]))
    assert [(e.kind, e.channel, e.note) for e in evs] == [
        ("on", 2, 36), ("on", 2, 38), ("off", 2, 36)]


def test_chunked_feed_and_realtime_interleave():
    p = midi.StreamParser()
    out = []
    # 0xF8 clock bytes may appear anywhere without breaking running status
    for b in [0x90, 0xF8, 60, 0xF8, 100, 62, 0xF8, 70]:
        out += p.feed(bytes([b]))
    assert [(e.kind, e.note) for e in out] == [("on", 60), ("on", 62)]


def test_cc_and_pitchbend():
    evs = midi.parse_stream(bytes([0xB0, 74, 127, 0xE0, 0x00, 0x40]))
    assert evs[0].kind == "cc" and evs[0].note == 74 and evs[0].value == 1.0
    assert evs[1].kind == "pitchbend" and abs(evs[1].value) < 2e-4


# --- Standard MIDI File --------------------------------------------------------


def _vlq(x):
    out = [x & 0x7F]
    x >>= 7
    while x:
        out.append(0x80 | (x & 0x7F))
        x >>= 7
    return bytes(reversed(out))


def _smf(tracks, division=480, fmt=1):
    head = b"MThd" + struct.pack(">IHHH", 6, fmt, len(tracks), division)
    body = b""
    for evs in tracks:
        t = b"".join(evs) + b"\x00\xff\x2f\x00"   # end-of-track
        body += b"MTrk" + struct.pack(">I", len(t)) + t
    return head + body


def test_smf_tempo_map():
    # track 0: tempo 120 BPM (500k us/q) then 60 BPM at tick 480
    t0 = [
        _vlq(0) + b"\xff\x51\x03" + (500_000).to_bytes(3, "big"),
        _vlq(480) + b"\xff\x51\x03" + (1_000_000).to_bytes(3, "big"),
    ]
    # track 1: notes at ticks 0, 480, 960 (0.0s, 0.5s, 1.5s)
    t1 = [
        _vlq(0) + bytes([0x90, 36, 100]),
        _vlq(480) + bytes([60, 90]),          # running status
        _vlq(480) + bytes([0x80, 36, 0]),
    ]
    evs = midi.load_smf(_smf([t0, t1]))
    assert [(e.kind, e.note) for e in evs] == [
        ("on", 36), ("on", 60), ("off", 36)]
    assert abs(evs[0].time - 0.0) < 1e-9
    assert abs(evs[1].time - 0.5) < 1e-9
    assert abs(evs[2].time - 1.5) < 1e-9   # 0.5s + 480 ticks at 60 BPM


def test_smf_rejects_garbage():
    with pytest.raises(ValueError):
        midi.load_smf(b"RIFFnope")


# --- live input adapter --------------------------------------------------------


class _FakePort:
    def __init__(self, ports):
        self._ports = ports
        self._cb = None
        self.closed = False

    def get_ports(self):
        return self._ports

    def open_port(self, i):
        assert 0 <= i < len(self._ports)

    def set_callback(self, fn):
        self._cb = fn

    def close_port(self):
        self.closed = True

    def inject(self, data):
        self._cb((list(data), 0.0), None)


def test_midi_input_fake_backend():
    port = _FakePort(["Fake Pad"])
    mi = midi.MidiInput(backend=port)
    got = []
    name = mi.connect(got.append)
    assert name == "Fake Pad"
    port.inject(bytes([0x90, 36, 100]))
    port.inject(bytes([0x80, 36, 0]))
    assert [(e.kind, e.note) for e in got] == [("on", 36), ("off", 36)]
    mi.close()
    assert port.closed


def test_midi_input_no_devices():
    mi = midi.MidiInput(backend=_FakePort([]))
    with pytest.raises(RuntimeError):
        mi.connect(lambda e: None)
    assert mi.list_ports() == []


# --- dispatcher into the engine ------------------------------------------------


def test_dispatcher_drum_and_poly(tmp_path):
    from libgooey_tpu.engine.engine import Engine

    e = Engine(44100.0, 256)
    e.add_instrument("kick", "kick")
    e.add_instrument("keys", "poly")
    d = midi.MidiDispatcher(e)
    d.map_note(36, "kick")          # GM kick, any channel
    d.map_poly(1, "keys")

    t1 = [
        _vlq(0) + bytes([0x99, 36, 100]),        # drum channel note -> kick
        _vlq(240) + bytes([0x91, 64, 90]),       # poly channel note on
        _vlq(240) + bytes([0x81, 64, 0]),        # poly note off
    ]
    evs = midi.load_smf(_smf([t1], division=480))
    out = d.render_events(evs, 44100)
    assert out.shape == (2, 44100)
    assert np.isfinite(out).all()
    assert np.abs(out).max() > 1e-4, "MIDI-driven render is silent"
    # kick fires at t=0: energy in the very first block
    assert np.abs(out[:, :256]).max() > 1e-5

    # the scheduled offsets are sample-exact: 0.25s at 44.1k = 11025
    blocks = d.schedule(evs, 44100.0, 256)
    assert blocks[0][0][0] == 0
    assert blocks[11025 // 256][0][0] == 11025 % 256
