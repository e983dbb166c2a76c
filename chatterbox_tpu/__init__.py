"""chatterbox_tpu — a TPU-native JAX/XLA/Pallas re-implementation of the
Chatterbox TTS stack (reference: resemble-ai/chatterbox).

This is NOT a port: the compute path is designed for TPU from scratch —
channels-last tensors, static shapes with bucketing, on-device decode loops
(`lax.while_loop`), CFG folded into the batch dimension, matmul-DFT audio
frontends that run on the MXU, and `jax.sharding` meshes for multi-chip
serving.

Public API mirrors the reference pipeline surface
(`src/chatterbox/__init__.py` in the reference):
    ChatterboxTTS, ChatterboxTurboTTS, ChatterboxMultilingualTTS, ChatterboxVC
"""

__version__ = "0.1.0"

S3GEN_SR = 24_000   # output sample rate   (ref: models/s3gen/const.py:1)
S3_SR = 16_000      # tokenizer sample rate (ref: models/s3tokenizer/s3tokenizer.py:15)
S3_TOKEN_RATE = 25  # speech tokens/sec     (ref: models/s3tokenizer/s3tokenizer.py:18)
S3GEN_SIL = 4299    # silence token         (ref: models/s3gen/const.py:2)
SPEECH_VOCAB_SIZE = 6561  # 3**8 FSQ codes  (ref: models/s3tokenizer/s3tokenizer.py:19)


def __getattr__(name):
    # Lazy imports keep `import chatterbox_tpu` cheap (no jax trace/compile).
    if name in ("ChatterboxTTS", "ChatterboxTurboTTS", "ChatterboxMultilingualTTS",
                "ChatterboxVC", "Conditionals"):
        from . import api
        return getattr(api, name)
    raise AttributeError(f"module 'chatterbox_tpu' has no attribute {name!r}")
