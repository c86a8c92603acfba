from .splines import make_spline_basis, num_params_per_leg
from .sampling_mpc import SamplingMPC, SamplingState, SolveOutput, make_sampling_solver
from .gait_adaptive import GaitAdaptiveSamplingMPC, make_gait_adaptive_solver

__all__ = [
    "make_spline_basis",
    "num_params_per_leg",
    "SamplingMPC",
    "SamplingState",
    "make_sampling_solver",
    "SolveOutput",
    "GaitAdaptiveSamplingMPC",
    "make_gait_adaptive_solver",
]
