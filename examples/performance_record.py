"""Record a chord performance into the looping clip and replay it
(performance_record.rs)."""

import numpy as np

from libgooey_tpu.gooey import GooeyEngine
from libgooey_tpu.io_wav import write_wav


def main(seconds: float = 4.0, out_path: str = "/tmp/gooey_perf.wav"):
    g = GooeyEngine(44100.0)
    n = int(44100 * seconds)
    g.transport_start()
    g.performance.update_clock(0.0, True)
    g.performance.set_armed(True)
    g.performance.update_clock(0.0, True)
    # play two pads while recording
    g.perf_chord_on(0, 0, 0, 0, 0, 4, 0.9)   # I chord
    first = g.render(n // 4)
    g.perf_chord_off()
    g.perf_chord_on(9, 1, 0, 0, 0, 4, 0.8)   # vi-flavored pad
    second = g.render(n // 4)
    g.perf_chord_off()
    g.performance.set_armed(False)
    # ...the recorded clip now replays by itself
    replay = g.render(n - 2 * (n // 4))
    inter = np.concatenate([first, second, replay])
    write_wav(out_path, inter.reshape(-1, 2).T, 44100)
    print(f"wrote {out_path} with {len(g.performance.events)} recorded events")
    return out_path


if __name__ == "__main__":
    main()
