"""Safety modulation helpers: velocity modulator and early-stance (reflex) detector.

Velocity modulator (reference helpers/velocity_modulator.py:6-45): zero the commanded
velocities whenever any foot is farther than 0.2 m (xy) from its hip — prevents leg
overextension. Early-stance detector (reference helpers/early_stance_detector.py:6-128):
flags a swing leg whose tracking error exploded (it hit something) and records the
hitpoint/hitmoment so the swing generator can re-plan from there.
"""
from __future__ import annotations

import numpy as np

from ..utils.legs import Legs


def modulate_velocities(ref_base_lin_vel, ref_base_ang_vel, feet_pos, hips_pos,
                        max_distance: float = 0.2):
    """Pure velocity modulation. feet_pos/hips_pos: (4,3) arrays or Legs."""
    feet = np.asarray(feet_pos.data if hasattr(feet_pos, "data") else feet_pos)
    hips = np.asarray(hips_pos.data if hasattr(hips_pos, "data") else hips_pos)
    if ref_base_lin_vel[0] < 0.01 and ref_base_lin_vel[1] < 0.01:
        return ref_base_lin_vel, ref_base_ang_vel
    dist = np.linalg.norm(feet[:, :2] - hips[:, :2], axis=1)
    if np.any(dist > max_distance):
        return ref_base_lin_vel * 0.0, ref_base_ang_vel * 0.0
    return ref_base_lin_vel, ref_base_ang_vel


class VelocityModulator:
    def __init__(self, activated: bool = True, max_distance: float = 0.2):
        self.activated = activated
        self.max_distance = max_distance

    def modulate_velocities(self, ref_base_lin_vel, ref_base_ang_vel, feet_pos, hips_pos):
        return modulate_velocities(ref_base_lin_vel, ref_base_ang_vel, feet_pos, hips_pos,
                                   self.max_distance)


class EarlyStanceDetector:
    """Tracking-error-based reflex trigger (reference early_stance_detector.py:59-88).

    The 'geom_contact' mode of the reference inspects MuJoCo contact points; here the
    simulation layer can pass per-leg contact points through ``contact_points``.
    """

    def __init__(self, trigger_mode: str = "tracking", activated: bool = True):
        self.trigger_mode = trigger_mode
        self.activated = activated and trigger_mode in ("tracking", "geom_contact")
        self.early_stance = [False] * 4
        self.hitmoments = [-1.0] * 4
        self.hitpoints: list = [None] * 4
        self.relative_tracking_error_threshold = 0.3
        self.absolute_min_distance_error_threshold = 0.1
        self.early_stance_time_threshold = 0.07

    def reset(self):
        self.early_stance = [False] * 4
        self.hitmoments = [-1.0] * 4
        self.hitpoints = [None] * 4

    def update_detection(self, feet_pos: Legs, des_feet_pos: Legs, lift_off: Legs,
                         touch_down: Legs, swing_time, swing_period, current_contact,
                         previous_contact=None, contact_points=None):
        if not self.activated:
            self.reset()
            return
        feet = np.asarray(feet_pos.data)
        des = np.asarray(des_feet_pos.data)
        lo = np.asarray(lift_off.data)
        td = np.asarray(touch_down.data)
        for leg in range(4):
            if current_contact[leg] == 1:
                self.early_stance[leg] = False
            elif (not self.early_stance[leg]
                  and swing_time[leg] > swing_period - self.early_stance_time_threshold):
                self.early_stance[leg] = False
            elif not self.early_stance[leg]:
                # geom_contact without contact data (e.g. the runtime controller
                # node, which has no physics engine) falls back to the
                # tracking-error trigger rather than silently disarming.
                if self.trigger_mode == "geom_contact" and contact_points is not None:
                    # Physical-contact trigger (reference early_stance_detector.py:
                    # 90-115): a swing-leg contact whose normal opposes the swing
                    # direction within 60 degrees is a hit.
                    pts = contact_points[leg] if contact_points is not None else None
                    if pts is not None and len(pts) > 0:
                        swing_dir = td[leg] - feet[leg]
                        n_sd = np.linalg.norm(swing_dir)
                        if n_sd > 1e-6:
                            swing_dir = swing_dir / n_sd
                            for pos, normal in pts:
                                nn = np.linalg.norm(normal)
                                if nn < 1e-9:
                                    continue
                                # Contact normal points INTO the foot; the obstacle
                                # blocks the swing when it opposes the motion.
                                cosang = -np.dot(normal / nn, swing_dir)
                                if cosang > 0.5:  # < 60 deg
                                    self.hitpoints[leg] = np.asarray(pos, float).copy()
                                    self.hitmoments[leg] = float(swing_time[leg])
                                    self.early_stance[leg] = True
                                    break
                    if self.early_stance[leg]:
                        continue
                else:
                    disp = td[leg] - lo[leg]
                    local = (des[leg] - feet[leg]).squeeze()
                    nd = np.linalg.norm(disp)
                    nl = np.linalg.norm(local)
                    if nd > 0 and (nl / nd) > self.relative_tracking_error_threshold \
                            and nl > self.absolute_min_distance_error_threshold:
                        self.hitpoints[leg] = feet[leg].copy()
                        self.hitmoments[leg] = float(swing_time[leg])
                        self.early_stance[leg] = True
                        continue
            if not self.early_stance[leg]:
                self.hitmoments[leg] = -1.0
                self.hitpoints[leg] = None
