from .wb_interface import WBInterface
from .controller_interface import SRBDControllerInterface, SRBDBatchedControllerInterface
from .wrapper import QuadrupedPyMPCWrapper

__all__ = [
    "WBInterface",
    "SRBDControllerInterface",
    "SRBDBatchedControllerInterface",
    "QuadrupedPyMPCWrapper",
]
