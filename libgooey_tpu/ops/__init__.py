from libgooey_tpu.ops import filters, noise, osc, scan

__all__ = ["filters", "noise", "osc", "scan"]
