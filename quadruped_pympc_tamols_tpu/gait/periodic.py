"""Periodic gait generation as pure phase arithmetic.

The reference's PeriodicGaitGenerator (helpers/periodic_gait_generator.py:8-118) is a
stateful per-leg Python loop; computing a contact sequence runs the timer H times and
restores state. Here the same semantics are closed-form: a leg's contact at elapsed
time t is ``((phase0 + f*t) mod 1) < duty``, so the whole (4, H) sequence is one
broadcasted comparison — jittable, batchable over scenarios and over candidate step
frequencies (which is exactly what the gait-adaptive controllers need).

A thin stateful host wrapper (PeriodicGaitGenerator) mirrors the reference's API for
the whole-body layer, including energy-saving start/stop
(periodic_gait_generator.py:128-196).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GAIT_PHASE_OFFSETS, GaitParams, GaitType, MPCParams


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class GaitState:
    """Per-leg phase signal in [0,1). A pytree; batch dims allowed."""

    phase: Any  # (..., 4)

    def tree_flatten(self):
        return (self.phase,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


def advance_phase(phase, dt, step_freq):
    """Advance the per-leg phase: (phase + dt*f) mod 1
    (reference periodic_gait_generator.py:53-56)."""
    return jnp.mod(phase + dt * step_freq, 1.0)


def contact_from_phase(phase, duty_factor):
    """Stance mask: phase < duty (reference periodic_gait_generator.py:71-74)."""
    return (phase < duty_factor).astype(jnp.float32)


def make_timer_dts(mpc: MPCParams) -> np.ndarray:
    """Per-column elapsed-time offsets of the contact-sequence timer.

    Matches reference compute_contact_sequence (periodic_gait_generator.py:104-117):
    column 0 is the current contact (t=0); stepping into column i uses dt_fine while
    i < horizon_fine_grained else dt. Returns t_i offsets, shape (H,), t_0 = 0.
    """
    H = mpc.horizon
    steps = np.zeros(H, dtype=np.float32)
    for i in range(1, H):
        if mpc.use_nonuniform_discretization and i < mpc.horizon_fine_grained:
            steps[i] = mpc.dt_fine_grained
        else:
            steps[i] = mpc.dt
    return np.cumsum(steps).astype(np.float32)


def contact_sequence(phase, step_freq, duty_factor, t_offsets, full_stance=False):
    """(.., 4, H) stance sequence over the horizon, closed form.

    Args:
        phase: (..., 4) current per-leg phase.
        step_freq: scalar or batched step frequency [Hz].
        duty_factor: scalar or batched duty factor.
        t_offsets: (H,) elapsed time at each column (from make_timer_dts).
        full_stance: static flag — all-ones sequence
            (reference periodic_gait_generator.py:95-98).
    """
    if full_stance:
        shape = jnp.shape(phase)[:-1] + (4, jnp.shape(t_offsets)[0])
        return jnp.ones(shape, dtype=jnp.float32)
    ph = jnp.mod(
        phase[..., :, None] + jnp.asarray(step_freq)[..., None, None] * t_offsets, 1.0
    )
    return (ph < jnp.asarray(duty_factor)[..., None, None]).astype(jnp.float32)


class PeriodicGaitGenerator:
    """Stateful host-side wrapper mirroring the reference class API."""

    def __init__(self, gait: GaitParams, horizon: int):
        self.gait_params = gait
        self.previous_gait_type = gait.gait_type
        self.gait_type = gait.gait_type
        self.duty_factor = gait.duty_factor
        self.step_freq = gait.step_freq
        self.horizon = horizon
        self.start_and_stop_activated = False
        self.reset()

    def reset(self):
        self.phase_offset = np.asarray(GAIT_PHASE_OFFSETS[GaitType(self.gait_type)], np.float64)
        self._phase = self.phase_offset.copy()

    @property
    def phase_signal(self) -> np.ndarray:
        return self._phase.copy()

    def set_phase_signal(self, phase: np.ndarray):
        self._phase = np.asarray(phase, np.float64).copy()

    def run(self, dt: float, step_freq: float) -> np.ndarray:
        """Advance the timer one tick; returns current stance mask."""
        self._phase = np.mod(self._phase + dt * step_freq, 1.0)
        return (self._phase < self.duty_factor).astype(np.float64)

    def compute_contact_sequence(self, t_offsets: np.ndarray) -> np.ndarray:
        """(4, H) sequence; does not mutate the timer state."""
        if self.gait_type == GaitType.FULL_STANCE:
            self.reset()
            return np.ones((4, len(t_offsets)))
        ph = np.mod(self._phase[:, None] + self.step_freq * np.asarray(t_offsets)[None, :], 1.0)
        return (ph < self.duty_factor).astype(np.float64)

    def set_full_stance(self):
        self.gait_type = GaitType.FULL_STANCE
        self.reset()

    def restore_previous_gait(self):
        self.gait_type = self.previous_gait_type
        self.reset()

    def update_start_and_stop(
        self,
        feet_pos,  # Legs (4,3) world
        hip_pos,  # Legs (4,3) world
        hip_offset: float,
        base_pos,
        base_ori_euler_xyz,
        base_lin_vel,
        base_ang_vel,
        ref_base_lin_vel,
        ref_base_ang_vel,
        current_contact,
    ):
        """Energy-saving start/stop (reference periodic_gait_generator.py:128-196):
        switch to full stance when idle, level, all feet in stance and under hips."""
        yaw = base_ori_euler_xyz[2]
        R = np.array([[np.cos(yaw), np.sin(yaw)], [-np.sin(yaw), np.cos(yaw)]])
        feet_h = (R @ (np.asarray(feet_pos.data)[:, :2] - base_pos[:2]).T).T
        # Stance-width offset per leg (left legs -, right legs +), as the reference does.
        feet_h[:, 1] += np.array([-hip_offset, hip_offset, -hip_offset, hip_offset])
        hips_h = (R @ (np.asarray(hip_pos.data)[:, :2] - base_pos[:2]).T).T
        dist = np.linalg.norm(feet_h - hips_h, axis=1)

        idle = (
            np.linalg.norm(ref_base_lin_vel) == 0.0
            and np.linalg.norm(ref_base_ang_vel) == 0.0
            and np.linalg.norm(base_lin_vel) < 0.1
            and np.linalg.norm(base_ang_vel) < 0.1
            and abs(base_ori_euler_xyz[0]) < 0.05
            and abs(base_ori_euler_xyz[1]) < 0.05
            and np.sum(current_contact) == 4
            and np.all(dist < 0.06)
        )
        if idle:
            self.set_full_stance()
        elif self.gait_type == GaitType.FULL_STANCE:
            self.restore_previous_gait()
