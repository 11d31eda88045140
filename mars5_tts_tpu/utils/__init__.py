from .masks import construct_padding_mask, length_to_mask

__all__ = ["construct_padding_mask", "length_to_mask"]
