from . import dsp, frontends, resample, stats

__all__ = ["dsp", "frontends", "resample", "stats"]
