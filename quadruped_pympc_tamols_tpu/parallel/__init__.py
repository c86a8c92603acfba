from .scenario_engine import (
    ScenarioState,
    init_scenario_state,
    make_scenario_step,
    make_terrain_adapter,
    make_terrain_generator,
)
from .sharded import (
    make_sharded_sampling_solver,
    make_multichip_step,
    scenario_mesh,
)

__all__ = [
    "ScenarioState",
    "make_scenario_step",
    "init_scenario_state",
    "make_terrain_adapter",
    "make_terrain_generator",
    "make_sharded_sampling_solver",
    "make_multichip_step",
    "scenario_mesh",
]
