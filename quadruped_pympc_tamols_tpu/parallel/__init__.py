from .scenario_engine import ScenarioState, make_scenario_step, init_scenario_state
from .sharded import (
    make_sharded_sampling_solver,
    make_multichip_step,
    scenario_mesh,
)

__all__ = [
    "ScenarioState",
    "make_scenario_step",
    "init_scenario_state",
    "make_sharded_sampling_solver",
    "make_multichip_step",
    "scenario_mesh",
]
