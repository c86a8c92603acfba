from .heightmap import GridHeightMap, heightmap_from_fn, lookup_nearest
from .tamols import TamolsPlanner, make_tamols_scorer

__all__ = [
    "GridHeightMap",
    "heightmap_from_fn",
    "lookup_nearest",
    "TamolsPlanner",
    "make_tamols_scorer",
]
