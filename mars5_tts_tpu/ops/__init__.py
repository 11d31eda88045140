from .attention import banded_causal_mask, linear, sdpa, torch_mha
from .embeddings import add_sine_pe, chunked_embed, sine_pe_table, timestep_embedding
from .norms import layer_norm, rms_norm
from .rope import apply_rope, rope_angles

__all__ = [
    "add_sine_pe", "apply_rope", "banded_causal_mask", "chunked_embed",
    "layer_norm", "linear", "rms_norm", "rope_angles", "sdpa",
    "sine_pe_table", "timestep_embedding", "torch_mha",
]
