from libgooey_tpu.instruments import (
    bass,
    hihat,
    hihat2,
    kick,
    snare,
    tom,
    tom2,
)

__all__ = ["bass", "hihat", "hihat2", "kick", "snare", "tom", "tom2"]
