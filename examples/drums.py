"""Each drum voice solo, then a full kit groove (mirrors the reference's
kick.rs / snare.rs / hihat.rs / hihat2.rs / tom.rs / tom2.rs examples)."""

import numpy as np

from libgooey_tpu.engine.engine import Engine
from libgooey_tpu.instruments.kick import KickConfig


def main(seconds: float = 2.0, out_path: str = "/tmp/gooey_drums.wav"):
    engine = Engine(44100.0)
    engine.add_instrument("kick", "kick", KickConfig.punch_preset())
    engine.add_instrument("snare", "snare")
    engine.add_instrument("hat", "hihat2")
    engine.add_instrument("tom", "tom2")

    for name, steps in (("kick", "x...x...x...x..."),
                        ("snare", "....x.......x..."),
                        ("hat", "9.5.9.5.9.5.9.7.")):
        seq = engine.new_sequencer(name, 120.0)
        seq.set_pattern_string(steps)
        seq.start()
    engine.trigger("tom", 0.9)

    n = int(44100 * seconds)
    engine.bounce_to_wav(out_path, n)
    print(f"wrote {out_path} ({n} samples)")
    return out_path


if __name__ == "__main__":
    main()
