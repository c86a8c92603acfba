from .leg_ik import LegKinematics

__all__ = ["LegKinematics"]
