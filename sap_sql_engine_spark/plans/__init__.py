from . import dialect

__all__ = ["dialect"]
