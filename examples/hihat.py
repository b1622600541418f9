"""HiHat v1: open/closed presets and a choke pattern
(mirrors examples/hihat.rs)."""

import numpy as np

from libgooey_tpu.engine.engine import Engine
from libgooey_tpu.instruments.hihat import HiHatConfig


def main(out_path: str = "/tmp/gooey_hihat.wav", quick: bool = False):
    L = (lambda n: max(n // 16, 2048)) if quick else (lambda n: n)
    engine = Engine(44100.0)
    engine.add_instrument("hat", "hihat")
    sections = []

    for preset in (HiHatConfig.closed_default, HiHatConfig.closed_tight,
                   HiHatConfig.closed_dark, HiHatConfig.open_default,
                   HiHatConfig.open_bright, HiHatConfig.open_long):
        engine.set_config("hat", preset())
        engine.trigger("hat", 0.9)
        sections.append(engine.render_mono(L(22050)))

    # a closed 8th pattern with an open accent (the hihat.rs demo groove)
    engine.set_config("hat", HiHatConfig.closed_tight())
    seq = engine.new_sequencer("hat", 130.0)
    seq.set_pattern_string("9.5.9.5.9.5.9.5.")
    seq.start()
    sections.append(engine.render_mono(L(2 * 44100)))

    audio = np.concatenate(sections)
    from libgooey_tpu.io_wav import write_wav
    write_wav(out_path, audio, 44100)
    print(f"wrote {out_path} ({len(audio)} samples, peak {np.abs(audio).max():.3f})")
    return out_path


if __name__ == "__main__":
    main()
