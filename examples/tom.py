"""Tom v1: the high/mid/low/floor presets and a fill
(mirrors examples/tom.rs)."""

import numpy as np

from libgooey_tpu.engine.engine import Engine
from libgooey_tpu.instruments.tom import TomConfig


def main(out_path: str = "/tmp/gooey_tom.wav", quick: bool = False):
    L = (lambda n: max(n // 16, 2048)) if quick else (lambda n: n)
    engine = Engine(44100.0)
    engine.add_instrument("tom", "tom")
    sections = []

    for preset in (TomConfig.high_tom, TomConfig.mid_tom,
                   TomConfig.low_tom, TomConfig.floor_tom):
        engine.set_config("tom", preset())
        engine.trigger("tom", 0.9)
        sections.append(engine.render_mono(L(22050)))

    # a descending fill: high -> floor at 16th-note spacing
    for preset, vel in ((TomConfig.high_tom, 1.0), (TomConfig.mid_tom, 0.9),
                        (TomConfig.low_tom, 0.9), (TomConfig.floor_tom, 1.0)):
        engine.set_config("tom", preset())
        engine.trigger("tom", vel)
        sections.append(engine.render_mono(L(5513)))

    audio = np.concatenate(sections)
    from libgooey_tpu.io_wav import write_wav
    write_wav(out_path, audio, 44100)
    print(f"wrote {out_path} ({len(audio)} samples, peak {np.abs(audio).max():.3f})")
    return out_path


if __name__ == "__main__":
    main()
