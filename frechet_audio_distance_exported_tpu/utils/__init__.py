from . import audio_io, weights

__all__ = ["audio_io", "weights"]
