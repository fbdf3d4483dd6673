"""Audio embedding models (JAX) + frontend re-exports.

Mirrors the reference's models/__init__.py:1-40 convenience surface, with the
JAX functional equivalents of the model classes (forward fns + param inits).
"""

from .vggish import (
    vggish_forward,
    init_vggish_params,
    EMBEDDING_SIZE as VGGISH_EMBEDDING_SIZE,
)
from .pann import (
    pann_forward,
    init_pann_params,
    EMBEDDING_SIZE as PANN_EMBEDDING_SIZE,
)
from .encodec import encodec_forward, init_encodec_params
from .clap import clap_forward, init_clap_params
from ..ops.frontends import (
    waveform_to_examples,
    waveform_to_logmel,
    PANN_CONFIGS,
    ENCODEC_CONFIGS,
    ENCODEC_MAX_AUDIO_SECONDS,
    preprocess_for_encodec,
    pad_to_fixed_length as pad_to_fixed_encodec_length,
    pad_to_valid_encodec_length,
    CLAP_SAMPLE_RATE,
    CLAP_MAX_AUDIO_SECONDS,
    CLAP_MAX_SAMPLES,
    preprocess_for_clap,
    pad_audio_to_max_length as pad_clap_audio_to_max_length,
)

ENCODEC_EMBEDDING_SIZE = 128
ENCODEC_MAX_SAMPLES_24K = ENCODEC_MAX_AUDIO_SECONDS * 24000
ENCODEC_MAX_SAMPLES_48K = ENCODEC_MAX_AUDIO_SECONDS * 48000
CLAP_EMBEDDING_SIZE = 512

__all__ = [
    "vggish_forward",
    "init_vggish_params",
    "VGGISH_EMBEDDING_SIZE",
    "pann_forward",
    "init_pann_params",
    "PANN_EMBEDDING_SIZE",
    "encodec_forward",
    "init_encodec_params",
    "clap_forward",
    "init_clap_params",
    "waveform_to_examples",
    "waveform_to_logmel",
    "PANN_CONFIGS",
    "ENCODEC_CONFIGS",
    "ENCODEC_EMBEDDING_SIZE",
    "ENCODEC_MAX_AUDIO_SECONDS",
    "ENCODEC_MAX_SAMPLES_24K",
    "ENCODEC_MAX_SAMPLES_48K",
    "preprocess_for_encodec",
    "pad_to_fixed_encodec_length",
    "pad_to_valid_encodec_length",
    "CLAP_SAMPLE_RATE",
    "CLAP_EMBEDDING_SIZE",
    "CLAP_MAX_AUDIO_SECONDS",
    "CLAP_MAX_SAMPLES",
    "preprocess_for_clap",
    "pad_clap_audio_to_max_length",
]
