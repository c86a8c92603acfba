from .legs import Legs
from . import frames

__all__ = ["Legs", "frames"]
