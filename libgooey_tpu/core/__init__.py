from libgooey_tpu.core import constants, dsp, envelope, max_curve, rng, smoother

__all__ = ["constants", "dsp", "envelope", "max_curve", "rng", "smoother"]
