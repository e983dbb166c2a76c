from .pipelines import (
    ChatterboxTTS,
    ChatterboxTurboTTS,
    ChatterboxMultilingualTTS,
    ChatterboxVC,
    Conditionals,
    SUPPORTED_LANGUAGES,
    MULTILINGUAL_T3_MODELS,
)

__all__ = [
    "ChatterboxTTS", "ChatterboxTurboTTS", "ChatterboxMultilingualTTS",
    "ChatterboxVC", "Conditionals", "SUPPORTED_LANGUAGES",
    "MULTILINGUAL_T3_MODELS",
]
