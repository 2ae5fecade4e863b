from .parser import parse_pbrt_file, parse_pbrt_string
from .api import RenderSetup

__all__ = ["parse_pbrt_file", "parse_pbrt_string", "RenderSetup"]
