from libgooey_tpu.effects import (
    compressor,
    delay,
    feedback_waveshaper,
    limiter,
    lowpass,
    reverb_plate,
    reverb_spring,
    saturation,
    tilt,
    waveshaper,
)

__all__ = [
    "compressor",
    "delay",
    "feedback_waveshaper",
    "limiter",
    "lowpass",
    "reverb_plate",
    "reverb_spring",
    "saturation",
    "tilt",
    "waveshaper",
]
