from .ar import CodecLMConfig, codeclm_forward, codeclm_prefill, init_codeclm, spk_embedding
from .nar import ResidualTransformerConfig, init_nar, nar_forward, nar_spk_embedding

__all__ = [
    "CodecLMConfig",
    "ResidualTransformerConfig",
    "codeclm_forward",
    "codeclm_prefill",
    "init_codeclm",
    "init_nar",
    "nar_forward",
    "nar_spk_embedding",
    "spk_embedding",
]
