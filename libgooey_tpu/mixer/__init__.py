from libgooey_tpu.mixer import chain, clip_grid, graph, loop_channel, stereo_buffer

__all__ = ["chain", "clip_grid", "graph", "loop_channel", "stereo_buffer"]
