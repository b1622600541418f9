"""Snare tour: presets, tone/noise balance sweep, velocity response
(mirrors examples/snare.rs)."""

import dataclasses

import numpy as np

from libgooey_tpu.engine.engine import Engine
from libgooey_tpu.instruments.snare import SnareConfig


def main(out_path: str = "/tmp/gooey_snare.wav", quick: bool = False):
    L = (lambda n: max(n // 16, 2048)) if quick else (lambda n: n)
    engine = Engine(44100.0)
    engine.add_instrument("snare", "snare")
    sections = []

    for preset in (SnareConfig.tight, SnareConfig.loose,
                   SnareConfig.hiss, SnareConfig.smack):
        engine.set_config("snare", preset())
        engine.trigger("snare", 0.9)
        sections.append(engine.render_mono(L(16384)))

    # tone vs noise balance sweep on the tight preset
    base = SnareConfig.tight()
    for noise in (0.0, 0.33, 0.66, 1.0):
        engine.set_config("snare", dataclasses.replace(base, noise=noise))
        engine.trigger("snare", 0.8)
        sections.append(engine.render_mono(L(11025)))

    audio = np.concatenate(sections)
    from libgooey_tpu.io_wav import write_wav
    write_wav(out_path, audio, 44100)
    print(f"wrote {out_path} ({len(audio)} samples, peak {np.abs(audio).max():.3f})")
    return out_path


if __name__ == "__main__":
    main()
