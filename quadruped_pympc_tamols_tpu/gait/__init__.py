from .periodic import (
    GaitState,
    advance_phase,
    contact_from_phase,
    contact_sequence,
    make_timer_dts,
    PeriodicGaitGenerator,
)
from .foothold_reference import FootholdReferenceGenerator, raibert_footholds
from .swing import bezier_swing_refs, SwingTrajectoryController
from .terrain import TerrainEstimator, estimate_terrain

__all__ = [
    "GaitState",
    "advance_phase",
    "contact_from_phase",
    "contact_sequence",
    "make_timer_dts",
    "PeriodicGaitGenerator",
    "FootholdReferenceGenerator",
    "raibert_footholds",
    "bezier_swing_refs",
    "SwingTrajectoryController",
    "TerrainEstimator",
    "estimate_terrain",
]
