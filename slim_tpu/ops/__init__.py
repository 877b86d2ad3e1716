from .gram import compute_gram, gram_device, gram_host

__all__ = ["compute_gram", "gram_device", "gram_host"]
