from libgooey_tpu.engine import sequencer

__all__ = ["sequencer"]
