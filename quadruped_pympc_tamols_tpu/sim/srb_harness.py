"""Idealized SRB closed-loop harness: the full control stack walking, no MuJoCo.

Plays the role of the reference's simulation-as-integration-test
(simulation/simulation.py run interactively; SURVEY 4.2) in a deterministic,
dependency-free form: the "plant" is the same single-rigid-body model the MPC
predicts (dynamics/srbd.py), feet are kinematic — stance feet pin to their touch-down
points, swing feet follow the commanded swing trajectory and land on the MPC
footholds. This closes the loop through the REAL planner + controller stack
(WBInterface gait/foothold/terrain pipeline + sampling or gradient MPC), so a test
can assert "the robot walks": tracks a commanded velocity, keeps height, stays level.

Also the template for on-device batched scenario datagen (parallel/), where thousands
of these loops run vmapped across chips.
"""
from __future__ import annotations

import numpy as np

from ..config import Config, GAITS, LEGS
from ..dynamics.srbd import integrate_euler, make_params
from ..gait.swing import bezier_swing_refs_jit
from ..interfaces.controller_interface import SRBDControllerInterface
from ..interfaces.wb_interface import WBInterface
from ..utils.frames import euler_xyz_to_rot
from ..utils.legs import Legs

import jax.numpy as jnp


class SRBClosedLoopHarness:
    def __init__(self, cfg: Config, seed: int = 0, terrain_fn=None):
        self.cfg = cfg
        self.params = make_params(cfg)
        self.terrain_fn = terrain_fn  # z = f(x, y) or None for flat ground

        rp = cfg.robot
        self.default_feet = np.array([
            [rp.hip_x, rp.hip_y + 0.1, 0.0],
            [rp.hip_x, -rp.hip_y - 0.1, 0.0],
            [-rp.hip_x, rp.hip_y + 0.1, 0.0],
            [-rp.hip_x, -rp.hip_y - 0.1, 0.0],
        ])
        import jax

        dt = cfg.sim.dt
        params = self.params
        self._integrate = jax.jit(
            lambda x, feet, grfs, contact: integrate_euler(x, feet, grfs, contact, params, dt))
        self.reset(seed)

    def reset(self, seed: int = 0):
        cfg = self.cfg
        self.x = np.zeros(12)
        self.x[2] = cfg.sim.ref_z
        self.feet = self.default_feet.copy()
        self.wb = WBInterface(cfg, Legs(self.feet.copy()))
        self.ctrl = SRBDControllerInterface(cfg, seed=seed)
        self.grfs = Legs.zeros((3,))
        self.footholds = Legs(self.feet.copy())
        self.best_freq = cfg.gait_params.step_freq
        self.t = 0.0
        self._mpc_every = max(1, int(round(1.0 / (cfg.sim.mpc_frequency * cfg.sim.dt))))
        self._step = 0
        self._swing_start = self.feet.copy()

    # ------------------------------------------------------------------
    def hips_world(self):
        R = np.asarray(euler_xyz_to_rot(jnp.asarray(self.x[6:9])))
        return self.x[0:3] + self.wb.ik.hip_offsets_b @ R.T

    def step(self, ref_base_lin_vel, ref_base_ang_vel=None, heightmaps=None):
        cfg = self.cfg
        ref_base_ang_vel = np.zeros(3) if ref_base_ang_vel is None else ref_base_ang_vel
        hips = self.hips_world()

        state_current, ref_state, contact_seq, step_height, optimize_swing = \
            self.wb.update_state_and_reference(
                com_pos=self.x[0:3], base_pos=self.x[0:3], base_lin_vel=self.x[3:6],
                base_ori_euler_xyz=self.x[6:9], base_ang_vel=self.x[9:12],
                feet_pos=Legs(self.feet.copy()), hip_pos=Legs(hips),
                joints_pos=Legs.zeros((3,)), heightmaps=heightmaps,
                simulation_dt=cfg.sim.dt, ref_base_lin_vel=np.asarray(ref_base_lin_vel),
                ref_base_ang_vel=ref_base_ang_vel)

        if self._step % self._mpc_every == 0:
            self.grfs, self.footholds, self.best_freq, _ = self.ctrl.compute_control(
                state_current, ref_state, contact_seq,
                current_contact=self.wb.current_contact,
                previous_contact=self.wb.previous_contact,
                phase_signal=self.wb.pgg.phase_signal,
                optimize_swing=optimize_swing)
        self._step += 1
        if optimize_swing and self.cfg.mpc.optimize_step_freq:
            self.wb.pgg.step_freq = float(self.best_freq)

        # Plant update: SRB dynamics under the commanded GRFs.
        self.x = np.asarray(self._integrate(
            jnp.asarray(self.x, jnp.float32), jnp.asarray(self.feet, jnp.float32),
            jnp.asarray(np.asarray(self.grfs.data), jnp.float32),
            jnp.asarray(self.wb.current_contact, jnp.float32)), dtype=np.float64)

        # Kinematic feet: swing feet follow the swing curve toward the MPC foothold.
        self.wb.stc.update_swing_time(self.wb.current_contact, cfg.sim.dt)
        for leg, leg_name in enumerate(LEGS):
            prev_c = self.wb.previous_contact[leg]
            cur_c = self.wb.current_contact[leg]
            if cur_c == 0:
                pos, _, _ = bezier_swing_refs_jit(
                    jnp.float32(self.wb.stc.swing_time[leg]),
                    jnp.float32(self.wb.stc.swing_period),
                    jnp.float32(self.wb.step_height),
                    jnp.asarray(self.wb.frg.lift_off_positions[leg_name], jnp.float32),
                    jnp.asarray(np.asarray(self.footholds[leg_name]), jnp.float32))
                self.feet[leg] = np.asarray(pos)
            elif prev_c == 0 and cur_c == 1:
                # Touch-down: land on the commanded foothold, snapped to terrain.
                td = np.asarray(self.footholds[leg_name], np.float64).copy()
                if self.terrain_fn is not None:
                    td[2] = float(self.terrain_fn(td[0], td[1]))
                else:
                    td[2] = 0.0
                self.feet[leg] = td

        self.t += cfg.sim.dt
        return self.x.copy()

    def run(self, duration: float, ref_base_lin_vel, ref_base_ang_vel=None):
        """Run the loop; returns the state history (T, 12)."""
        n = int(round(duration / self.cfg.sim.dt))
        hist = np.zeros((n, 12))
        for i in range(n):
            hist[i] = self.step(ref_base_lin_vel, ref_base_ang_vel)
        return hist
