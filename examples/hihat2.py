"""HiHat2 (the Max-derived FFI hat): presets, pitch sweep, pink vs white noise
(mirrors examples/hihat2.rs)."""

import dataclasses

import numpy as np

from libgooey_tpu.engine.engine import Engine
from libgooey_tpu.instruments.hihat2 import NOISE_PINK, HiHat2Config


def main(out_path: str = "/tmp/gooey_hihat2.wav", quick: bool = False):
    L = (lambda n: max(n // 16, 2048)) if quick else (lambda n: n)
    engine = Engine(44100.0)
    engine.add_instrument("hat", "hihat2")
    sections = []

    for preset in (HiHat2Config.short, HiHat2Config.loose,
                   HiHat2Config.dark, HiHat2Config.soft):
        engine.set_config("hat", preset())
        engine.trigger("hat", 0.9)
        sections.append(engine.render_mono(L(22050)))

    # pitch sweep (the pow^2 curve makes the top octave open up late)
    base = HiHat2Config.short()
    for pitch in (0.2, 0.5, 0.76, 1.0):
        engine.set_config("hat", dataclasses.replace(base, pitch=pitch))
        engine.trigger("hat", 0.8)
        sections.append(engine.render_mono(L(11025)))

    # pink-noise variant
    engine.set_config("hat", dataclasses.replace(base, noise_color=NOISE_PINK))
    engine.trigger("hat", 0.9)
    sections.append(engine.render_mono(L(22050)))

    audio = np.concatenate(sections)
    from libgooey_tpu.io_wav import write_wav
    write_wav(out_path, audio, 44100)
    print(f"wrote {out_path} ({len(audio)} samples, peak {np.abs(audio).max():.3f})")
    return out_path


if __name__ == "__main__":
    main()
