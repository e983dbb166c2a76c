"""T3 model configuration.

Mirrors the reference's hyperparameters (ref: models/t3/modules/t3_config.py
and models/t3/llama_configs.py) under one dataclass covering both backbone
families (llama-style and gpt2-style).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class BackboneConfig:
    family: str                 # "llama" | "gpt2"
    hidden_size: int
    num_layers: int
    num_heads: int
    head_dim: int
    intermediate_size: int
    # llama-only
    num_kv_heads: int = 0
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    rope_scaling_factor: float = 8.0       # llama3 rope scaling (ref: llama_configs.py:23-29)
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_pos: int = 8192
    # gpt2-only
    layer_norm_eps: float = 1e-5
    max_positions: int = 8196
    vocab_size: int = 0         # gpt2 keeps its own wte/wpe (wte deleted for turbo)

    @property
    def is_gpt(self) -> bool:
        return self.family == "gpt2"


LLAMA_520M = BackboneConfig(
    family="llama", hidden_size=1024, num_layers=30, num_heads=16,
    head_dim=64, intermediate_size=4096, num_kv_heads=16,
)

GPT2_MEDIUM = BackboneConfig(
    family="gpt2", hidden_size=1024, num_layers=24, num_heads=16,
    head_dim=64, intermediate_size=4096, vocab_size=50276,
)

GPT2_SMALL = BackboneConfig(
    family="gpt2", hidden_size=768, num_layers=12, num_heads=12,
    head_dim=64, intermediate_size=3072, vocab_size=50276,
)

GPT2_TINY_TEST = BackboneConfig(
    family="gpt2", hidden_size=64, num_layers=2, num_heads=4,
    head_dim=16, intermediate_size=256, vocab_size=96,
)

LLAMA_TINY_TEST = BackboneConfig(
    family="llama", hidden_size=64, num_layers=2, num_heads=4,
    head_dim=16, intermediate_size=256, num_kv_heads=4,
)

# smallest shape satisfying the fused decode-layer kernel tile constraints
# (ops/fused_layer.py: D % 512 == 0, I/2 % 512 == 0) — CPU interpret tests
GPT2_FUSED_TEST = BackboneConfig(
    family="gpt2", hidden_size=512, num_layers=2, num_heads=8,
    head_dim=64, intermediate_size=2048, vocab_size=96,
)

# smallest llama shape satisfying the int8 fused kernel tiles
# (ops/fused_layer.py: D % 512 == 0, qkv-N % 512 == 0, I % 512 == 0)
LLAMA_FUSED_TEST = BackboneConfig(
    family="llama", hidden_size=512, num_layers=2, num_heads=8,
    head_dim=64, intermediate_size=1024, num_kv_heads=8,
)

BACKBONES = {
    "Llama_520M": LLAMA_520M,
    "GPT2_medium": GPT2_MEDIUM,
    "GPT2_small": GPT2_SMALL,
    "GPT2_tiny_test": GPT2_TINY_TEST,
    "Llama_tiny_test": LLAMA_TINY_TEST,
    "GPT2_fused_test": GPT2_FUSED_TEST,
    "Llama_fused_test": LLAMA_FUSED_TEST,
}


@dataclass(frozen=True)
class T3Config:
    # token ids (ref: t3_config.py:6-12)
    start_text_token: int = 255
    stop_text_token: int = 0
    text_tokens_dict_size: int = 704
    max_text_tokens: int = 2048
    start_speech_token: int = 6561
    stop_speech_token: int = 6562
    speech_tokens_dict_size: int = 8194
    max_speech_tokens: int = 4096

    backbone_name: str = "Llama_520M"
    input_pos_emb: Optional[str] = "learned"
    speech_cond_prompt_len: int = 150

    encoder_type: str = "voice_encoder"
    speaker_embed_size: int = 256
    use_perceiver_resampler: bool = True
    emotion_adv: bool = True

    @property
    def backbone(self) -> BackboneConfig:
        return BACKBONES[self.backbone_name]

    @property
    def n_channels(self) -> int:
        return self.backbone.hidden_size

    @property
    def is_multilingual(self) -> bool:
        return self.text_tokens_dict_size == 2454

    # --- factory configs matching the reference model zoo -----------------

    @classmethod
    def english_only(cls) -> "T3Config":
        return cls()

    @classmethod
    def multilingual(cls) -> "T3Config":
        return cls(text_tokens_dict_size=2454)

    @classmethod
    def turbo(cls) -> "T3Config":
        """GPT2-medium Turbo (ref: tts_turbo.py:153-159)."""
        return cls(
            text_tokens_dict_size=50276, backbone_name="GPT2_medium",
            speech_tokens_dict_size=6563, input_pos_emb=None,
            speech_cond_prompt_len=375, use_perceiver_resampler=False,
            emotion_adv=False,
        )

    @classmethod
    def nano(cls) -> "T3Config":
        """GPT2-small Nano (ref: tts_turbo.py:154)."""
        return cls(
            text_tokens_dict_size=50276, backbone_name="GPT2_small",
            speech_tokens_dict_size=6563, input_pos_emb=None,
            speech_cond_prompt_len=375, use_perceiver_resampler=False,
            emotion_adv=False,
        )

    @classmethod
    def tiny_test(cls, family: str = "gpt2") -> "T3Config":
        """A CPU-fast config for tests (not in the reference zoo)."""
        # dict_size must cover the REAL special-token ids (6561/6562, which
        # the serving/vocoder filters hardcode as the S3 vocab boundary) —
        # a smaller table made every BOS embed an out-of-bounds jnp.take,
        # i.e. NaN, silently degenerating all tiny-model token streams
        if family == "gpt2":
            return cls(
                text_tokens_dict_size=64, backbone_name="GPT2_tiny_test",
                speech_tokens_dict_size=6564, input_pos_emb=None,
                speech_cond_prompt_len=8, use_perceiver_resampler=False,
                emotion_adv=False, max_text_tokens=64, max_speech_tokens=128,
            )
        return cls(
            text_tokens_dict_size=64, backbone_name="Llama_tiny_test",
            speech_tokens_dict_size=6564, input_pos_emb="learned",
            speech_cond_prompt_len=8, use_perceiver_resampler=True,
            emotion_adv=True, max_text_tokens=64, max_speech_tokens=128,
        )
