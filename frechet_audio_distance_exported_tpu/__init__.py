"""TPU-native Fréchet Audio Distance framework.

A ground-up JAX/XLA/Pallas re-design of gibiansky/frechet-audio-distance-exported
(reference mounted at /root/reference): same seven model variants and public
API, rebuilt for TPU — batched static-shape pipelines, matmul-DFT frontends,
on-device streaming statistics, and mesh data parallelism.
"""

from .fad import FrechetAudioDistance

__version__ = "0.1.0"

__all__ = ["FrechetAudioDistance", "__version__"]
