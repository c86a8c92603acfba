"""Fully-jittable closed-loop scenario engine for on-device batched simulation.

The reference generates data by forking 4 OS processes, each running a full MuJoCo
sim + MPC (simulation/batched_simulations.py:22-58 — "thousands of scenarios" at 4 at
a time). On TPU the scenario loop itself becomes a pure function: gait timing,
foothold reference, sampling MPC solve, SRB physics and kinematic swing feet are all
jnp, so ONE vmap runs thousands of scenarios per chip and shard_map spreads them
across a mesh (see parallel/sharded.py). This is the "training step" of this
framework: massively parallel MPC control loops.

Simplifications vs the host WBInterface (wb_interface.py), chosen to keep the state
pytree small while preserving the control structure: the base-velocity moving average
uses the instantaneous velocity, terrain is flat (z=0) with perfect state knowledge,
and reflexes/VFA are off (terrain-aware variants plug in via the TAMOLS kernel).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GAIT_PHASE_OFFSETS, Config
from ..controllers.sampling.sampling_mpc import SamplingState, make_sampling_solver
from ..dynamics.srbd import integrate_euler, make_params
from ..gait.foothold_reference import raibert_footholds
from ..gait.periodic import contact_sequence, make_timer_dts
from ..gait.swing import bezier_swing_refs
from ..kinematics.leg_ik import LegKinematics
from ..utils.frames import euler_xyz_to_rot


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ScenarioState:
    """One scenario's full closed-loop state (a pytree; vmap over leading dims)."""

    x: Any  # (12,) base state
    feet: Any  # (4, 3)
    phase: Any  # (4,) gait phase
    swing_time: Any  # (4,)
    liftoff: Any  # (4, 3)
    prev_contact: Any  # (4,)
    mpc: SamplingState

    def tree_flatten(self):
        return (self.x, self.feet, self.phase, self.swing_time, self.liftoff,
                self.prev_contact, self.mpc), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def init_scenario_state(cfg: Config, num_params: int, key) -> ScenarioState:
    rp = cfg.robot
    x = jnp.zeros(12, jnp.float32).at[2].set(cfg.sim.ref_z)
    feet = jnp.asarray(
        [[rp.hip_x, rp.hip_y + 0.1, 0.0], [rp.hip_x, -rp.hip_y - 0.1, 0.0],
         [-rp.hip_x, rp.hip_y + 0.1, 0.0], [-rp.hip_x, -rp.hip_y - 0.1, 0.0]],
        jnp.float32)
    return ScenarioState(
        x=x, feet=feet,
        phase=jnp.asarray(GAIT_PHASE_OFFSETS[cfg.gait_params.gait_type], jnp.float32),
        swing_time=jnp.zeros(4, jnp.float32),
        liftoff=feet,
        prev_contact=jnp.ones(4, jnp.float32),
        mpc=SamplingState(jnp.zeros(num_params, jnp.float32), key,
                          jnp.full(num_params, cfg.mpc.sampling.sigma_cem_mppi, jnp.float32)),
    )


def make_scenario_step(cfg: Config, num_samples: int | None = None):
    """Build one pure control tick: (ScenarioState, cmd_vel (3,)) -> (state', metrics).

    The tick runs at the MPC rate (1/mpc_frequency); physics substeps at sim dt.
    Returns the step function and the parameter count (for state init).
    """
    solve, P = make_sampling_solver(cfg, num_samples)
    srbd = make_params(cfg)
    kin = LegKinematics(cfg.robot)
    gait = cfg.gait_params
    t_off = make_timer_dts(cfg.mpc)
    dt_ctrl = 1.0 / cfg.sim.mpc_frequency
    n_sub = max(1, int(round(dt_ctrl / cfg.sim.dt)))
    dt_sub = dt_ctrl / n_sub
    hip_offsets = kin.hip_offsets_b  # numpy constant

    def step(s: ScenarioState, cmd_vel):
        phase = jnp.mod(s.phase + dt_ctrl * gait.step_freq, 1.0)
        seq = contact_sequence(phase, gait.step_freq, gait.duty_factor, t_off)
        cur = seq[:, 0]
        prev = s.prev_contact

        # Lift-off tracking (stance -> swing edge).
        liftoff_edge = (prev == 1.0) & (cur == 0.0)
        liftoff = jnp.where(liftoff_edge[:, None], s.feet, s.liftoff)

        # Swing clocks.
        swing_time = jnp.where(cur == 0.0, s.swing_time + dt_ctrl, 0.0)

        # Raibert reference footholds on flat ground.
        R = euler_xyz_to_rot(s.x[6:9])
        hips = s.x[0:3] + hip_offsets @ R.T
        ref_feet = raibert_footholds(
            s.x[0:3], s.x[6:9], s.x[3:5], cmd_vel[:2], hips,
            jnp.zeros(4), gait.stance_time, cfg.robot.hip_height, cfg.sim.ref_z)

        ref12 = jnp.concatenate([
            jnp.asarray([0.0, 0.0, cfg.sim.ref_z], jnp.float32), cmd_vel,
            jnp.zeros(6, jnp.float32)])

        out, mpc_state = solve(s.x, s.feet, ref12, ref_feet, seq, cur, prev, s.mpc)

        # Physics substeps under the commanded GRFs (contacts held over the tick).
        def sub(x, _):
            return integrate_euler(x, s.feet, out.grfs, cur, srbd, dt_sub), None
        x_next, _ = jax.lax.scan(sub, s.x, None, length=n_sub)

        # Kinematic feet: swing follows the Bezier toward the reference foothold;
        # touch-down lands on it (flat terrain -> z=0).
        swing_period = gait.swing_period
        pos, _, _ = bezier_swing_refs(swing_time, swing_period, cfg.sim.step_height,
                                      liftoff, ref_feet)
        touchdown_edge = (prev == 0.0) & (cur == 1.0)
        feet = jnp.where(cur[:, None] == 0.0, pos, s.feet)
        feet = jnp.where(touchdown_edge[:, None],
                         ref_feet.at[:, 2].set(0.0), feet)

        metrics = dict(
            best_cost=out.best_cost,
            vel_error=jnp.linalg.norm(x_next[3:5] - cmd_vel[:2]),
            height_error=jnp.abs(x_next[2] - cfg.sim.ref_z),
            grf_total=jnp.sum(out.grfs[:, 2]),
        )
        s_next = ScenarioState(x_next, feet, phase, swing_time, liftoff, cur, mpc_state)
        return s_next, metrics

    return step, P
