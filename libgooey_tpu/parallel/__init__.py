from libgooey_tpu.parallel import mesh

__all__ = ["mesh"]
