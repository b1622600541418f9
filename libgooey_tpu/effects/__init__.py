from libgooey_tpu.effects import feedback_waveshaper, limiter

__all__ = ["feedback_waveshaper", "limiter"]
