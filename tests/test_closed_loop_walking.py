"""The end-to-end slice: the full stack (gait generator -> foothold reference ->
MPC -> kinematic feet) WALKS on the SRB plant — tracks velocity, keeps height,
stays level. This is the framework's integration test, the counterpart of running
the reference's simulation.py and watching the robot walk (SURVEY 4.2)."""
import numpy as np
import pytest

from quadruped_pympc_tamols_tpu import make_config, replace_config
from quadruped_pympc_tamols_tpu.sim import SRBClosedLoopHarness


def _walk(cfg, duration=3.0, vel=(0.3, 0.0, 0.0)):
    h = SRBClosedLoopHarness(cfg, seed=0)
    hist = h.run(duration, np.asarray(vel))
    return h, hist


def _assert_walking(cfg, hist, vel, duration):
    z = hist[:, 2]
    assert np.all(np.isfinite(hist)), "state diverged"
    assert np.all(z > 0.15), f"robot collapsed: min z {z.min():.3f}"
    assert np.all(np.abs(hist[:, 6]) < 0.5) and np.all(np.abs(hist[:, 7]) < 0.5), \
        "robot tipped over"
    # Travelled roughly the commanded distance (within 40%).
    dist = hist[-1, 0] - hist[0, 0]
    expect = vel[0] * duration
    assert dist > 0.5 * expect, f"tracked {dist:.2f} m of {expect:.2f} m commanded"
    # Mean height near the reference.
    assert abs(np.mean(z[len(z) // 2:]) - cfg.sim.ref_z) < 0.08


def test_sampling_mpc_walks():
    cfg = make_config("aliengo", mpc_type="sampling")
    cfg = replace_config(cfg, **{"mpc.sampling.num_samples": 2000,
                                 "sim.visual_foothold_adaptation": "blind"})
    duration, vel = 3.0, (0.3, 0.0, 0.0)
    _, hist = _walk(cfg, duration, vel)
    _assert_walking(cfg, hist, vel, duration)


def test_gradient_mpc_walks():
    cfg = make_config("aliengo", mpc_type="nominal")
    cfg = replace_config(cfg, **{"sim.visual_foothold_adaptation": "blind"})
    duration, vel = 3.0, (0.3, 0.0, 0.0)
    _, hist = _walk(cfg, duration, vel)
    _assert_walking(cfg, hist, vel, duration)


def test_sampling_pipelined_walks():
    """Async-dispatch pipelining (sampling.pipelined / ControllerNode 'pipelined'
    mode): each tick consumes the PREVIOUS tick's solution while this tick's
    solve is in flight — the sampling twin of the RTI split. One-tick-stale
    GRFs at 100 Hz must still walk the trot."""
    cfg = make_config("aliengo", mpc_type="sampling")
    cfg = replace_config(cfg, **{"mpc.sampling.num_samples": 2000,
                                 "mpc.sampling.pipelined": True,
                                 "sim.visual_foothold_adaptation": "blind"})
    duration, vel = 3.0, (0.3, 0.0, 0.0)
    _, hist = _walk(cfg, duration, vel)
    _assert_walking(cfg, hist, vel, duration)


def test_stand_still_stays_put():
    cfg = make_config("aliengo", mpc_type="sampling")
    cfg = replace_config(cfg, **{"mpc.sampling.num_samples": 1000,
                                 "sim.visual_foothold_adaptation": "blind"})
    h = SRBClosedLoopHarness(cfg, seed=0)
    hist = h.run(2.0, np.zeros(3))
    assert np.linalg.norm(hist[-1, 0:2]) < 0.15, "drifted while standing"
    assert abs(hist[-1, 2] - cfg.sim.ref_z) < 0.05


@pytest.mark.parametrize("mpc_type", ["nominal", "sampling"])
def test_reference_course_uphill_with_tamols(mpc_type):
    """The reference's six-section stepping-stones course (docs/
    STEPPING_STONES_TERRAIN.md:9-46), built to spec in sim/mjcf.py: BOTH MPC
    families with TAMOLS climb the 15 deg uphill without falling. Round 2's
    sampling-family incline stall is gone — the slope-invariant support mask +
    swing liftoff boost fixed it, and ``sampling.equilibrium_share``
    (rollout.equilibrium_share: per-leg static-equilibrium gravity centering,
    the slope-correct exploration center, reference
    centroidal_nmpc_jax.py:377-402) is enabled on the sampling row so the
    production slope configuration is what regresses here. The SAMPLING row
    runs the longer window and PINS THE CREST (uphill spans x=1.0-3.9;
    measured: x=4.52 at 26 s, well onto the crest flat, no fall); the nominal
    family's crest transition is pinned by test_full_course_single_episode,
    so its row keeps the fast 15 s slope check (measured 2.64 m)."""
    pytest.importorskip("mujoco")
    from quadruped_pympc_tamols_tpu.sim.simulation import run_simulation

    cfg = make_config("aliengo", mpc_type=mpc_type,
                      **{"sim.visual_foothold_adaptation": "tamols"})
    duration = 15.0
    if mpc_type == "sampling":
        cfg = replace_config(cfg, **{"mpc.sampling.num_samples": 2000,
                                     "mpc.sampling.equilibrium_share": True})
        duration = 26.0
    res = run_simulation(cfg, num_episodes=1, episode_duration_s=duration,
                         ref_base_lin_vel=(0.3, 0.0), scene="stepping_stones",
                         seed=0)[0]
    assert not res.fell, f"fell after {res.duration}s at {res.distance:.2f} m"
    assert res.distance > 2.0, f"only travelled {res.distance:.2f} m (uphill stall)"
    if mpc_type == "sampling":
        # The uphill's top edge sits at x = 1 + 3*cos(15deg) = 3.898
        # (measured at 26 s: x=3.94 on the CPU backend, 4.52 on TPU — the
        # fixed-iteration solvers differ slightly per backend near the crest).
        x_end = res.state_history[-1][0]
        assert x_end > 3.898, f"crest not topped: x={x_end:.2f} of 3.898"


def _stone_field_cfg(**extra):
    return make_config("aliengo", mpc_type="nominal",
                       **{"sim.visual_foothold_adaptation": "tamols",
                          "sim.velocity_modulator": False,
                          "mpc.gradient.use_zmp_stability": True,
                          "tamols.heightmap_cols": 13,
                          "tamols.support_margin": 0.015,
                          "tamols.trigger_phase": 0.05,
                          "tamols.lateral_margin": 0.05,
                          "tamols.weight_deviation": 6.0,
                          "tamols.search_radius_forward": 0.2,
                          "tamols.search_radius_back": 0.1,
                          "tamols.foot_separation": 0.1,
                          **extra})


def test_stone_field_crossed_end_to_end():
    """Plum-blossom stone-field CROSSING (the reference's headline TAMOLS demo,
    docs/STEPPING_STONES_TERRAIN.md:9-46). Spawned on the deck before the field,
    the nominal MPC + TAMOLS (sparse-terrain constraint set: full-foot support
    mask, lateral lane, foot separation, anisotropic search ellipse) + the ZMP
    band stability constraint crosses ALL TEN stone columns, the flat exit, and
    starts down the downhill: measured on this config 55 s upright, x 4.35 ->
    10.54, 208 touchdowns at 78% on stone interiors / 96% clean. The ZMP band
    (reference centroidal_nmpc_nominal.py:914-921) is what killed round 2's
    roll-oscillation failure mode — roll stays within +-0.07 rad through the
    alternating narrow/wide stances. Steady 0.15 m/s with centerline steering
    (no pulsing needed). Thresholds below carry margin at 45 s."""
    pytest.importorskip("mujoco")
    from quadruped_pympc_tamols_tpu.sim.simulation import run_simulation

    ang = np.radians(15.0)
    z_top = 3.0 * np.sin(ang)
    x_f1 = 1.0 + 3.0 * np.cos(ang) + 1.0  # stone field start (4.898)
    stones = np.array([(x_f1 + 0.2 + 0.4 * ix, y)
                       for ix in range(10)
                       for y in ((-0.4, 0.0, 0.4) if ix % 2 == 0
                                 else (-0.2, 0.2, 0.6))])

    cfg = _stone_field_cfg()

    class TDProbe:
        def __init__(self):
            self.prev = np.ones(4)
            self.dstones = []
            self.max_x = 0.0

        def log(self, t, env, wrapper):
            c = wrapper.wb_interface.current_contact
            feet = np.asarray(env.feet_pos().data)
            self.max_x = max(self.max_x, float(env.base_pos[0]))
            for leg in range(4):
                if self.prev[leg] == 0 and c[leg] == 1:
                    f = feet[leg]
                    if x_f1 - 0.1 < f[0] < x_f1 + 4.1:
                        self.dstones.append(
                            float(np.min(np.linalg.norm(stones - f[:2], axis=1))))
            self.prev = c.copy()

    def vel(t, base_pos):
        vy = float(np.clip(-0.5 * base_pos[1], -0.1, 0.1))  # hold the centerline
        return (0.15, vy)

    probe = TDProbe()
    res = run_simulation(cfg, num_episodes=1, episode_duration_s=45.0,
                         ref_base_lin_vel=vel, scene="stepping_stones",
                         seed=0, spawn=(4.35, 0.0, z_top), logger=probe)[0]
    assert res.duration > 44.0, f"fell at {res.duration:.1f}s ({res.distance:.2f} m)"
    assert probe.max_x > 9.0, \
        f"field not crossed: reached x={probe.max_x:.2f} of 8.9 (field end)"
    d = np.asarray(probe.dstones)
    assert len(d) >= 100, "too few in-field touchdowns to judge"
    clean = np.mean((d <= 0.11) | (d >= 0.19))
    on_stone = np.mean(d <= 0.11)
    assert clean >= 0.85, f"rim landings: only {clean:.0%} clean"
    assert on_stone >= 0.6, f"only {on_stone:.0%} of touchdowns on stone interiors"


def test_full_course_single_episode():
    """THE reference headline demo, in ONE continuous episode (docs/
    STEPPING_STONES_TERRAIN.md:9-46; README.md:58): spawn at the course start
    (0, 0) and traverse flat -> 15 deg uphill -> crest flat -> all ten
    plum-blossom stone columns -> exit flat -> 15 deg downhill, no fall, one
    run. Config is the stone-crossing set (ZMP band + sparse-terrain TAMOLS);
    the velocity schedule is position-based: 0.3 m/s on the approach/uphill,
    ramped down across the crest flat to 0.15 m/s for the stones, 0.2 m/s on
    the downhill, with centerline steering throughout. Measured (seed 0, CPU):
    100 s upright, x=12.57 of the 12.8 m course, 220 in-field touchdowns at
    75% stone-interior / 95% clean; the 92 s window here reaches x~11.8
    (well down the downhill) with margin over every bar below."""
    pytest.importorskip("mujoco")
    from quadruped_pympc_tamols_tpu.sim.simulation import run_simulation

    ang = np.radians(15.0)
    x_f1 = 1.0 + 3.0 * np.cos(ang) + 1.0  # stone field start (4.898)
    stones = np.array([(x_f1 + 0.2 + 0.4 * ix, y)
                       for ix in range(10)
                       for y in ((-0.4, 0.0, 0.4) if ix % 2 == 0
                                 else (-0.2, 0.2, 0.6))])
    cfg = _stone_field_cfg()

    class TDProbe:
        def __init__(self):
            self.prev = np.ones(4)
            self.dstones = []
            self.max_x = 0.0

        def log(self, t, env, wrapper):
            self.max_x = max(self.max_x, float(env.base_pos[0]))
            c = wrapper.wb_interface.current_contact
            feet = np.asarray(env.feet_pos().data)
            for leg in range(4):
                if self.prev[leg] == 0 and c[leg] == 1:
                    f = feet[leg]
                    if x_f1 - 0.1 < f[0] < x_f1 + 4.1:
                        self.dstones.append(
                            float(np.min(np.linalg.norm(stones - f[:2], axis=1))))
            self.prev = c.copy()

    def vel(t, base_pos):
        x, y = float(base_pos[0]), float(base_pos[1])
        if x < 3.6:
            vx = 0.30  # flat approach + uphill
        elif x < 4.6:
            vx = 0.30 - 0.15 * (x - 3.6)  # ramp down across the crest flat
        elif x < 9.2:
            vx = 0.15  # stone field + exit flat
        else:
            vx = 0.20  # downhill
        vy = float(np.clip(-0.5 * y, -0.1, 0.1))  # hold the centerline
        return (vx, vy)

    probe = TDProbe()
    res = run_simulation(cfg, num_episodes=1, episode_duration_s=92.0,
                         ref_base_lin_vel=vel, scene="stepping_stones",
                         seed=0, logger=probe)[0]
    assert res.duration > 91.0, \
        f"fell at {res.duration:.1f}s (x={probe.max_x:.2f})"
    # Past the crest (x=3.9), across the whole field (ends 8.9), the exit flat
    # (ends 9.9) and onto the downhill.
    assert probe.max_x > 10.5, \
        f"course not completed: reached x={probe.max_x:.2f} of 12.8"
    d = np.asarray(probe.dstones)
    assert len(d) >= 120, f"too few in-field touchdowns to judge ({len(d)})"
    clean = np.mean((d <= 0.11) | (d >= 0.19))
    on_stone = np.mean(d <= 0.11)
    assert clean >= 0.85, f"rim landings: only {clean:.0%} clean"
    assert on_stone >= 0.6, f"only {on_stone:.0%} of touchdowns on stone interiors"


def test_chasm_field_entered_with_clean_stone_landings():
    """Measured attempt on the harder-than-reference ``stepping_stones_chasm``
    stress variant (square 0.4 m grid of r=0.15 stones over 0.3 m deep gaps, +-3 cm
    jitter — here a missed landing is terminal, unlike the reference-spec course's
    5 cm step-down). Pinned frontier (round 4, crawl + overdrive + widened
    forward search + slack_l1=100 re-tune for the accurate soft-QP path): the
    robot leaves the platform, works COLUMN 1 with repeated clean stone
    landings — BOTH front feet and a HIND leg within 1-4 cm of stone centers
    (measured: FR d=0.011, FL d=0.017, FR d=0.042, RL d=0.015) — and reaches
    base x=0.77 upright through the 9 s window, attempting column 2 (the two
    far landings the assertions allow are those attempts, ~18-20 cm off in
    flight). The full crossing remains open; the measured attempt ladder and
    the execution-level diagnosis are in README 'Known issues / roadmap'."""
    pytest.importorskip("mujoco")
    from quadruped_pympc_tamols_tpu.sim.simulation import run_simulation

    cfg = make_config("aliengo", mpc_type="nominal", gait="crawl",
                      **{"sim.visual_foothold_adaptation": "tamols",
                         "sim.velocity_modulator": False,
                         "sim.touchdown_overdrive": 0.02,
                         "mpc.gradient.use_zmp_stability": True,
                         # Tuned for the f64-ACCURATE soft path (qp.py w_cap/
                         # lam0 fix): at the reference's zl=1000 the crawl's
                         # ZMP band is near-hard and deck walking destabilizes
                         # (the round-3 recipe was tuned against the old
                         # under-enforced solver); at 100 the band is a real
                         # but soft preference — measured: base x=0.77 at 9 s,
                         # BETTER than the round-3 frontier's 0.52-0.58.
                         "mpc.gradient.slack_l1": 100.0,
                         "tamols.heightmap_cols": 13,
                         "tamols.support_margin": 0.03,
                         "tamols.trigger_phase": 0.05,
                         "tamols.lateral_margin": 0.05,
                         "tamols.weight_deviation": 6.0,
                         "tamols.search_radius_forward": 0.3,
                         "tamols.search_radius_back": 0.1,
                         "tamols.foot_separation": 0.1})

    class TDProbe:
        def __init__(self):
            self.prev = np.ones(4)
            self.max_x = -10.0
            self.dstones = []
            self.stones = None

        def log(self, t, env, wrapper):
            import mujoco
            if self.stones is None:
                m = env.model
                self.stones = np.array(
                    [m.geom_pos[i][:2] for i in range(m.ngeom)
                     if m.geom_type[i] == mujoco.mjtGeom.mjGEOM_CYLINDER])
            self.max_x = max(self.max_x, float(env.base_pos[0]))
            c = wrapper.wb_interface.current_contact
            feet = np.asarray(env.feet_pos().data)
            for leg in range(4):
                if self.prev[leg] == 0 and c[leg] == 1:
                    f = feet[leg]
                    if 0.55 < f[0] < 3.0:
                        self.dstones.append(float(np.min(
                            np.linalg.norm(self.stones - f[:2], axis=1))))
            self.prev = c.copy()

    def vel(t, base_pos):
        vy = float(np.clip(-0.5 * (base_pos[1] - 0.2), -0.1, 0.1))
        return (0.15, vy)

    probe = TDProbe()
    res = run_simulation(cfg, num_episodes=1, episode_duration_s=9.0,
                         ref_base_lin_vel=vel, scene="stepping_stones_chasm",
                         seed=0, spawn=(-0.3, 0.2, 0.0), logger=probe)[0]
    assert not res.fell, f"fell at {res.duration:.1f}s (x={probe.max_x:.2f})"
    # The BASE leaves the start platform (ends at x=0.5) and presses well into
    # column 1 (measured 0.77 at 9 s; round 3's frontier was 0.52-0.58).
    assert probe.max_x > 0.7, \
        f"base did not press into the field: x={probe.max_x:.2f}"
    d = np.asarray(probe.dstones)
    assert len(d) >= 4, f"too few in-field touchdowns to judge ({len(d)})"
    # At least four CLEAN stone landings (covers both front feet + a hind).
    assert np.sum(d <= 0.05) >= 4, f"too few clean chasm landings: {d}"


def test_sampling_reflex_trips_on_bar_and_recovers():
    """Reflexes run under the SAMPLING family too (reference wb_interface.py:362-365
    runs the early-stance detector regardless of controller): a swing foot striking
    the low bar triggers geom_contact early stance, the swing re-plans from the
    hitpoint, and the robot stays upright."""
    pytest.importorskip("mujoco")
    from quadruped_pympc_tamols_tpu.sim.simulation import run_simulation

    class ReflexProbe:
        def __init__(self):
            self.trips = 0
            self.legs = set()

        def log(self, t, env, wrapper):
            es = wrapper.wb_interface.esd.early_stance
            if any(es):
                self.trips += 1
                self.legs |= {i for i, e in enumerate(es) if e}

    cfg = make_config("aliengo", mpc_type="sampling",
                      **{"sim.visual_foothold_adaptation": "blind",
                         "mpc.sampling.num_samples": 1000,
                         "sim.reflex_trigger_mode": "geom_contact",
                         # Re-planning from the hitpoint is the scipy generator's
                         # contract (reference scipy_swing_trajectory_generator.py:
                         # 25-47; bezier ignores hitpoints).
                         "sim.swing_generator": "scipy",
                         "sim.scene": "trip_bar"})
    probe = ReflexProbe()
    r = run_simulation(cfg, num_episodes=1, episode_duration_s=3.0,
                       ref_base_lin_vel=(0.3, 0.0), seed=0, logger=probe)[0]
    assert probe.trips > 0, "early-stance reflex never triggered on the bar"
    assert not r.fell, f"fell at {r.distance:.2f} m despite reflexes"


def test_turning_with_yaw_rate_command():
    """Yaw-rate commands steer the trot: 0.3 rad/s commanded for 3 s yields most of
    the expected heading change while walking forward (both solver families, full
    physics)."""
    pytest.importorskip("mujoco")
    from quadruped_pympc_tamols_tpu.sim.simulation import run_simulation

    for mpc_type in ("sampling", "nominal"):
        cfg = make_config("aliengo", mpc_type=mpc_type,
                          **{"sim.visual_foothold_adaptation": "blind",
                             "mpc.sampling.num_samples": 500})
        res = run_simulation(cfg, num_episodes=1, episode_duration_s=3.0,
                             ref_base_lin_vel=(0.2, 0.0), ref_base_ang_vel=0.3,
                             seed=0)[0]
        assert not res.fell, mpc_type
        yaw = res.state_history[-1][8]
        assert yaw > 0.45, f"{mpc_type}: only {yaw:.2f} rad of 0.9 expected"


def test_lateral_walking_and_low_friction():
    """Lateral velocity commands and low-friction ground both work closed-loop."""
    pytest.importorskip("mujoco")
    from quadruped_pympc_tamols_tpu.sim.simulation import run_simulation

    cfg = make_config("aliengo", mpc_type="sampling",
                      **{"sim.visual_foothold_adaptation": "blind",
                         "mpc.sampling.num_samples": 500})
    r = run_simulation(cfg, num_episodes=1, episode_duration_s=2.5,
                       ref_base_lin_vel=(0.0, 0.2), seed=0)[0]
    assert not r.fell
    assert r.state_history[-1][1] > 0.15  # moved sideways
    r = run_simulation(cfg, num_episodes=1, episode_duration_s=2.5,
                       ref_base_lin_vel=(0.25, 0.0), friction_range=(0.45, 0.45),
                       seed=0)[0]
    assert not r.fell
    assert r.distance > 0.25


def test_push_recovery():
    """The trot survives a 60 N lateral shove on the trunk for 0.2 s mid-walk."""
    pytest.importorskip("mujoco")
    from quadruped_pympc_tamols_tpu.interfaces.wrapper import QuadrupedPyMPCWrapper
    from quadruped_pympc_tamols_tpu.sim.mujoco_env import QuadrupedEnv
    from quadruped_pympc_tamols_tpu.utils.legs import Legs

    cfg = make_config("aliengo", mpc_type="sampling",
                      **{"sim.visual_foothold_adaptation": "blind",
                         "mpc.sampling.num_samples": 500})
    env = QuadrupedEnv(cfg, scene="flat", seed=0)
    w = QuadrupedPyMPCWrapper(cfg, env.feet_pos(), seed=0)
    tau_max = np.asarray(env.model.actuator_ctrlrange[:, 1]).reshape(4, 3)
    trunk = env.model.body("trunk").id
    kp = cfg.sim.impedance_joint_position_gain
    kd = cfg.sim.impedance_joint_velocity_gain
    for t in range(1200):
        env.data.xfrc_applied[trunk, 1] = 60.0 if 600 <= t < 700 else 0.0
        tau = w.compute_actions(
            com_pos=env.com_pos, base_pos=env.base_pos, base_lin_vel=env.base_lin_vel,
            base_ori_euler_xyz=env.base_ori_euler_xyz, base_ang_vel=env.base_ang_vel,
            feet_pos=env.feet_pos(), hip_pos=env.hip_positions(),
            joints_pos=env.joints_pos(), heightmaps=None,
            ref_base_lin_vel=np.array([0.25, 0, 0]), ref_base_ang_vel=np.zeros(3),
            simulation_dt=env.sim_dt, qpos_js=env.joints_pos(),
            qvel_js=env.joints_vel(), feet_jac=env.feet_jacobians(),
            feet_jac_dot=env.feet_jacobians_dot(), feet_vel=env.feet_vel(),
            legs_qfrc_bias=env.legs_qfrc_bias(),
            legs_mass_matrix=env.legs_mass_matrix(),
            legs_qfrc_passive=env.legs_qfrc_passive())
        tt = np.asarray(tau.data)
        qe = np.asarray(w.des_joints_pos.data) - np.asarray(env.joints_pos().data)
        qde = np.asarray(w.des_joints_vel.data) - np.asarray(env.joints_vel().data)
        env.step(Legs(np.clip(tt + kp * qe + kd * qde, -0.9 * tau_max, 0.9 * tau_max)))
        assert env.base_pos[2] > 0.5 * cfg.sim.ref_z, f"fell at t={t * 0.002:.2f}s"
        assert abs(env.base_ori_euler_xyz[0]) < 0.8


def test_chasm_three_columns_crossed_round5():
    """Round-5 chasm frontier regression (supersedes the round-4 combo pin
    below in scope; VERDICT r4 asks #1/#2). The full mechanism stack —
    velocity-matched retargets (always on with retarget_swing), the
    flight-time reach gate, the physical-reach swing clamp, the predicted-hip
    reach band, the widened hind sensing window, the lattice progression
    gate widened past the stone radius, the late-touchdown hold with its
    lateral companion, and the lattice-consistent 0.2 m/s command
    (pitch 0.4 m x 0.5 Hz crawl = 0.2 m/s — round 4's 0.15 m/s mathematically
    could not keep the Raibert seeds up with the lattice) — walks the robot
    ONTO the chasm lattice with clean stone landings on THREE columns.
    Measured (seed 0, TPU-tunnel backend): upright to 9.5 s, base x=1.295,
    10 in-field touchdowns, 9 within 5 cm of stone centers, clean landings on
    columns 1 (x~0.8), 2 (x~1.2) and 3 (x~1.6) including both hinds on
    column 1 and a hind on column 2. Root-caused fixes this round: the
    knee-limit fling at over-extension (reach clamp), the current-hip reach
    band blocking every hind column advance (predicted hip), the 13-row
    window ending 0.26 m ahead of mid-gap hind seeds (21 rows), and the
    progression gate blind at stone centers (0.22 m radius). The remaining
    blocker (full crossing) is the same-lane stone time-sharing conflict:
    every reference crawl swings a hind leg BEFORE its front vacates the
    shared stone, so the hind's target is rim-squeezed by the
    foot-separation exclusion once per cycle (measured: the d=0.09-0.125
    rim targets at t=8.1-8.5); the direct-register crawl built for it
    (gait 'crawl_register', alternating-side order FL->FR->RL->RR) walks
    and advances the hinds every cycle (measured x=1.458, a clean column-3
    landing) but trades landing precision — README Known issues carries the
    full ladder; this pin keeps the standard-crawl combo's precision."""
    pytest.importorskip("mujoco")
    from quadruped_pympc_tamols_tpu.sim.simulation import run_simulation

    cfg = make_config("aliengo", mpc_type="nominal", gait="crawl",
                      **{"sim.visual_foothold_adaptation": "tamols",
                         "sim.velocity_modulator": False,
                         "sim.touchdown_overdrive": 0.02,
                         "mpc.gradient.use_zmp_stability": True,
                         "mpc.gradient.slack_l1": 100.0,
                         "tamols.heightmap_cols": 13,
                         "tamols.support_margin": 0.03,
                         "tamols.trigger_phase": 0.05,
                         "tamols.lateral_margin": 0.05,
                         "tamols.weight_deviation": 6.0,
                         "tamols.search_radius_forward": 0.42,
                         "tamols.search_radius_back": 0.1,
                         "tamols.foot_separation": 0.1,
                         "tamols.min_advance": 0.35,
                         "tamols.fallback": "foot",
                         "tamols.max_foot_speed": 1.5,
                         "tamols.retarget_velocity_match": True,
                         "tamols.predict_hip_at_touchdown": True,
                         "tamols.progression_foot_radius": 0.22,
                         "tamols.heightmap_rows": 21,
                         "sim.late_touchdown_hold": 0.06,
                         "sim.late_touchdown_hold_xy": 0.07,
                         "sim.swing_reach_clamp": 0.95})

    class TDProbe:
        def __init__(self):
            self.prev = np.ones(4)
            self.max_x = -10.0
            self.dstones = []  # (x, dstone)
            self.stones = None

        def log(self, t, env, wrapper):
            import mujoco
            if self.stones is None:
                m = env.model
                self.stones = np.array(
                    [m.geom_pos[i][:2] for i in range(m.ngeom)
                     if m.geom_type[i] == mujoco.mjtGeom.mjGEOM_CYLINDER])
            self.max_x = max(self.max_x, float(env.base_pos[0]))
            c = wrapper.wb_interface.current_contact
            feet = np.asarray(env.feet_pos().data)
            for leg in range(4):
                if self.prev[leg] == 0 and c[leg] == 1:
                    f = feet[leg]
                    if 0.55 < f[0] < 3.0:
                        self.dstones.append((float(f[0]), float(np.min(
                            np.linalg.norm(self.stones - f[:2], axis=1)))))
            self.prev = c.copy()

    def vel(t, base_pos):
        vy = float(np.clip(-0.5 * (base_pos[1] - 0.2), -0.1, 0.1))
        return (0.2, vy)

    probe = TDProbe()
    res = run_simulation(cfg, num_episodes=1, episode_duration_s=9.0,
                         ref_base_lin_vel=vel, scene="stepping_stones_chasm",
                         seed=0, spawn=(-0.3, 0.2, 0.0), logger=probe)[0]
    assert not res.fell, f"fell at {res.duration:.1f}s (x={probe.max_x:.2f})"
    assert probe.max_x > 1.1, \
        f"base did not press past column 2: x={probe.max_x:.2f}"
    d = np.asarray([x[1] for x in probe.dstones])
    assert len(d) >= 8, f"too few in-field touchdowns to judge ({len(d)})"
    assert np.sum(d <= 0.06) >= 7, f"too few clean chasm landings: {d}"
    # Clean landings on >= 3 distinct columns (0.4 m pitch from x=0.8).
    cols = {int(round((x - 0.8) / 0.4)) for x, dd in probe.dstones if dd <= 0.06}
    assert len(cols) >= 3, f"clean landings only on columns {sorted(cols)}"


def test_sampling_family_stone_field_entry():
    """SAMPLING-family stepping stones (VERDICT r4 ask #3 — TAMOLS is
    controller-agnostic in the reference, wb_interface.py:230-246). Pinned
    MEASURED FRONTIER, not a crossing: from the crest flat the sampling MPC +
    TAMOLS (sparse-terrain constraint set + equilibrium_share) walks INTO the
    plum-blossom field with stone precision — CPU backend, seed 0, vx 0.10:
    upright 8.04 s, base x=5.42 (field starts 4.90), 25 in-field touchdowns at
    56% stone-interior / 96% clean (identical numbers measured on the TPU
    backend). The sampling family HOLDS the +-3 cm foothold precision the
    stones demand. The measured attempt ladder: N=2000 baseline 6.5 s /
    x=5.23 / 62% interior (attitude oscillation on mixed stone/deck stances
    — vx collapses, the base rears to pitch -0.36 then rolls); N=16384
    WORSE (6.0 s — a null result for exploration capacity: 8x the samples
    does not move the binding constraint); mppi 5.1 s; equilibrium_share
    OFF 5.6 s (the share helps); step_height 0.15 + overdrive 7.0 s;
    roll/pitch cost x4 4.9 s and +rate damping 5.0 s (stiffer attitude
    costs destabilize). Diagnosis: the regime that required the nominal
    family's ZMP band CONSTRAINT (round 2) — a stability surface the
    sampling formulation lacked. Round 5 builds it as a rollout COST
    (sampling.zmp_weight, the 2-stance support-segment band): at weight 500
    the run nearly doubles to 13.3 s upright, 53 in-field touchdowns at
    55% interior / 98% clean, x=5.43 — sharply peaked in weight (800:
    6.6 s; 2000: 6.8 s with distorted landings; the band must be a
    preference, not a straitjacket). The remaining blocker is a re-stepping
    stall: at the 0.07 m/cycle Raibert step the deviation-dominated argmin
    re-lands the same stones for cycles while the base reaches its support
    edge, then rolls — the same seed-progression regime the chasm's
    min_advance addresses on lattices. The thresholds below pin the
    ZMP-cost frontier with margin."""
    pytest.importorskip("mujoco")
    from quadruped_pympc_tamols_tpu.sim.simulation import run_simulation

    cfg = make_config("aliengo", mpc_type="sampling",
                      **{"sim.visual_foothold_adaptation": "tamols",
                         "sim.velocity_modulator": False,
                         "mpc.sampling.num_samples": 2000,
                         "mpc.sampling.equilibrium_share": True,
                         "mpc.sampling.zmp_weight": 500.0,
                         "tamols.heightmap_cols": 13,
                         "tamols.support_margin": 0.015,
                         "tamols.trigger_phase": 0.05,
                         "tamols.lateral_margin": 0.05,
                         "tamols.weight_deviation": 6.0,
                         "tamols.search_radius_forward": 0.2,
                         "tamols.search_radius_back": 0.1,
                         "tamols.foot_separation": 0.1})
    ang = np.radians(15.0)
    z_top = 3.0 * np.sin(ang)
    x_f1 = 1.0 + 3.0 * np.cos(ang) + 1.0  # field start (4.898)
    stones = np.array([(x_f1 + 0.2 + 0.4 * ix, y)
                       for ix in range(10)
                       for y in ((-0.4, 0.0, 0.4) if ix % 2 == 0
                                 else (-0.2, 0.2, 0.6))])

    class TDProbe:
        def __init__(self):
            self.prev = np.ones(4)
            self.dstones = []
            self.max_x = 0.0

        def log(self, t, env, wrapper):
            c = wrapper.wb_interface.current_contact
            feet = np.asarray(env.feet_pos().data)
            self.max_x = max(self.max_x, float(env.base_pos[0]))
            for leg in range(4):
                if self.prev[leg] == 0 and c[leg] == 1:
                    f = feet[leg]
                    if x_f1 - 0.1 < f[0] < x_f1 + 4.1:
                        self.dstones.append(float(np.min(
                            np.linalg.norm(stones - f[:2], axis=1))))
            self.prev = c.copy()

    def vel(t, base_pos):
        return (0.10, float(np.clip(-0.5 * base_pos[1], -0.1, 0.1)))

    probe = TDProbe()
    res = run_simulation(cfg, num_episodes=1, episode_duration_s=30.0,
                         ref_base_lin_vel=vel, scene="stepping_stones",
                         seed=0, spawn=(4.35, 0.0, z_top), logger=probe)[0]
    assert res.duration > 6.5, f"fell too early: {res.duration:.1f}s"
    assert probe.max_x > 5.25, \
        f"did not press into the field: x={probe.max_x:.2f} (field at 4.90)"
    d = np.asarray(probe.dstones)
    assert len(d) >= 18, f"too few in-field touchdowns ({len(d)})"
    clean = np.mean((d <= 0.11) | (d >= 0.19))
    assert clean >= 0.88, f"rim landings: only {clean:.0%} clean"
    assert np.mean(d <= 0.11) >= 0.45, \
        f"only {np.mean(d <= 0.11):.0%} of touchdowns on stone interiors"
