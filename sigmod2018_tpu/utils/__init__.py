from .padding import size_class, pad_to

__all__ = ["size_class", "pad_to"]
