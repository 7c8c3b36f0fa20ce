"""Serving / autoregressive decode (beyond-reference capability).

``Decoder`` turns any per-position-LM checkpoint of the six model families
into an O(1)-state-per-token generator; see ``decode.py``.
"""

from .decode import Decoder

__all__ = ["Decoder"]
