from .ocp import (
    OCPDims,
    build_feet_trajectory,
    condense,
    friction_cone_rows,
    linearize_dynamics,
    q_diag_gradient,
    r_diag_gradient,
)
from .ddp import make_ddp_solver, project_cone
from .parallel_riccati import lqr_backward_associative, lqr_backward_sequential
from .qp import QPSolution, pdip_solve, pdip_solve_mehrotra, soft_qp_solve
from .sqp import (
    BatchedGradientMPC,
    GradientMPC,
    PrepState,
    RTISolution,
    make_rti_solver,
    make_rti_solver_split,
)
from .variants import (
    VariantGradientMPC,
    VariantSpec,
    make_collaborative_spec,
    make_foothold_spec,
    make_input_rates_spec,
    make_kinodynamic_spec,
    make_lyapunov_spec,
    make_nominal_spec,
    make_variant_solver,
)

__all__ = [
    "OCPDims",
    "build_feet_trajectory",
    "condense",
    "friction_cone_rows",
    "linearize_dynamics",
    "q_diag_gradient",
    "r_diag_gradient",
    "QPSolution",
    "pdip_solve",
    "pdip_solve_mehrotra",
    "soft_qp_solve",
    "lqr_backward_associative",
    "lqr_backward_sequential",
    "make_ddp_solver",
    "project_cone",
    "BatchedGradientMPC",
    "GradientMPC",
    "RTISolution",
    "make_rti_solver",
    "make_rti_solver_split",
    "PrepState",
    "VariantGradientMPC",
    "VariantSpec",
    "make_collaborative_spec",
    "make_foothold_spec",
    "make_input_rates_spec",
    "make_kinodynamic_spec",
    "make_lyapunov_spec",
    "make_nominal_spec",
    "make_variant_solver",
]
