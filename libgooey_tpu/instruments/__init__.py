from libgooey_tpu.instruments import kick

__all__ = ["kick"]
