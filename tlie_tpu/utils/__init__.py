from . import cplx

__all__ = ["cplx"]
