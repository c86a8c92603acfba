from .srbd import SRBDParams, fd, integrate_euler, integrate_rk4, make_params

__all__ = ["SRBDParams", "fd", "integrate_euler", "integrate_rk4", "make_params"]
