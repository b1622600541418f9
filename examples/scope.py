"""Realtime terminal scope over a sequenced kit — the TUI analog of the
reference's GLFW waveform window (waveform_display.rs) driving a live
engine through the output adapter."""

import io

import numpy as np

from libgooey_tpu.engine.output import EngineOutput
from libgooey_tpu.gooey import GooeyEngine
from libgooey_tpu.tui import TerminalScope
from libgooey_tpu.visualization import AudioBuffer


def main(out_path: str = "/tmp/gooey_scope.txt", quick: bool = False,
         live: bool = False):
    g = GooeyEngine(44100.0)
    g.sequencers[0].set_pattern_string("x...x...x...x...")
    g.sequencers[1].set_pattern_string("....x.......x...")
    g.sequencers[2].set_pattern_string("x.x.x.x.x.x.x.x.")
    for ch in range(3):
        g.sequencers[ch].start()

    out = EngineOutput(prefetch_blocks=0)
    out.initialize(44100.0)
    out.create_stream_with_engine(g)
    out.start()

    ring = AudioBuffer(8192)
    scope = TerminalScope(ring, width=72, height=10, sample_rate=44100.0)

    if live:  # animate in the real terminal
        scope.run(out, seconds=2.0 if quick else 10.0, fps=20)
        out.stop()
        return out_path

    # headless: pull a few ticks and write the last frame to a file
    sink = io.StringIO()
    n_ticks = 4 if quick else 40
    buf = np.zeros(2048 * 2, np.float32)
    for strip in range(3):
        scope.set_meter(f"strip{strip}", 0.0)
    for _ in range(n_ticks):
        out.fill(buf, 2)
        ring.push(0.5 * (buf[0::2] + buf[1::2]))
        for strip in range(3):
            scope.set_meter(f"strip{strip}", g.take_strip_peak(strip))
    frame = scope.frame()
    sink.write(frame + "\n")
    out.stop()
    with open(out_path, "w") as fh:
        fh.write(sink.getvalue())
    print(frame)
    print(f"wrote {out_path}")
    return out_path


if __name__ == "__main__":
    import sys

    main(live="--live" in sys.argv)
