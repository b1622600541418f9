"""Poly-synth chord progression through the music layer (chords.rs)."""

from libgooey_tpu.engine.engine import Engine
from libgooey_tpu.instruments.poly import PolySynthConfig


def main(seconds: float = 4.0, out_path: str = "/tmp/gooey_chords.wav"):
    engine = Engine(44100.0)
    engine.add_instrument("poly", "poly", PolySynthConfig.pad())
    progression = (("C", "major"), ("A", "minor"), ("F", "major7"),
                   ("G", "dominant7"))
    hold = int(44100 * seconds / len(progression))
    chunks = []
    for root, quality in progression:
        engine.poly_chord_on("poly", root, quality, octave=4, velocity=0.8)
        chunks.append(engine.render(hold))
        engine.poly_chord_off("poly", root, quality, octave=4)
    import numpy as np

    from libgooey_tpu.io_wav import write_wav

    audio = np.concatenate([np.asarray(c) for c in chunks], axis=-1)
    write_wav(out_path, audio, 44100)
    print(f"wrote {out_path}")
    return out_path


if __name__ == "__main__":
    main()
