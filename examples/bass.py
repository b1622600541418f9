"""Bass synth solo tour: presets, filter-envelope sweeps, note slides
(mirrors examples/bass.rs)."""

import dataclasses

import numpy as np

from libgooey_tpu.engine.engine import Engine
from libgooey_tpu.instruments.bass import BassConfig


def main(out_path: str = "/tmp/gooey_bass.wav", quick: bool = False):
    L = (lambda n: max(n // 16, 2048)) if quick else (lambda n: n)
    engine = Engine(44100.0)
    engine.add_instrument("bass", "bass")
    sections = []

    for preset in (BassConfig.acid, BassConfig.sub,
                   BassConfig.reese, BassConfig.stab):
        engine.set_config("bass", preset())
        engine.trigger("bass", 0.9)
        sections.append(engine.render_mono(L(22050)))

    # filter cutoff / resonance sweep on the acid preset
    base = BassConfig.acid()
    for cutoff, res in ((0.05, 0.9), (0.2, 0.7), (0.5, 0.5), (0.9, 0.2)):
        engine.set_config("bass", dataclasses.replace(
            base, filter_cutoff=cutoff, filter_resonance=res))
        engine.trigger("bass", 0.9)
        sections.append(engine.render_mono(L(11025)))

    audio = np.concatenate(sections)
    from libgooey_tpu.io_wav import write_wav
    write_wav(out_path, audio, 44100)
    print(f"wrote {out_path} ({len(audio)} samples, peak {np.abs(audio).max():.3f})")
    return out_path


if __name__ == "__main__":
    main()
