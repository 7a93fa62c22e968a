"""IO layer: trajectory visualization and (de)serialization helpers."""

from pobrax_tpu.io import html

__all__ = ["html"]
