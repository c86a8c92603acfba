"""Solver-accuracy verification ladder.

BASELINE.md sets a <=1e-3 control-parity bar against acados, but acados/CasADi are
not installable here; what CAN be measured exactly is the gap between the
production fixed-iteration f32 interior point and a trusted high-accuracy
reference on the SAME QP matrices. This module provides that reference — a
float64 numpy Mehrotra predictor-corrector run to machine-precision
complementarity (200 iterations with early convergence) — plus the harness that
captures REAL tick QPs from a closed-loop walk and reports the gap. Used by
tests/test_f64_ladder.py and ``bench.py`` (the ``qp_gap_vs_f64`` field).

The QPs come from sqp.make_rti_solver_split(..., return_assembler=True), so they
are byte-for-byte the matrices the production feedback phase solves (same
linearization, condensing, warm-start shift and contact bounds).
"""
from __future__ import annotations

import numpy as np


def pdip_solve_np_f64(Hm, g, C, d, iters: int = 200, tol: float = 1e-12):
    """Reference-grade dense QP solve: min 0.5 z'Hz + g'z s.t. Cz <= d.

    Float64 Mehrotra predictor-corrector (the same algorithm family as the
    production qp.pdip_solve_mehrotra and HPIPM) run until the complementarity
    and primal residuals fall below ``tol`` (or ``iters``, whichever first).
    Host numpy — no f32 rounding, no iteration cap pressure. Returns (z, mu).
    """
    Hm = np.asarray(Hm, np.float64)
    g = np.asarray(g, np.float64)
    C = np.asarray(C, np.float64)
    d = np.asarray(d, np.float64)
    n, m = g.shape[0], d.shape[0]
    z = np.zeros(n)
    s = np.maximum(d - C @ z, 1.0)
    lam = np.ones(m)
    I = np.eye(n) * 1e-12

    def max_step(v, dv):
        neg = dv < 0
        if not np.any(neg):
            return 1.0
        return min(1.0, 0.995 * np.min(-v[neg] / dv[neg]))

    for _ in range(iters):
        r_d = Hm @ z + g + C.T @ lam
        r_p = C @ z + s - d
        mu = float(lam @ s) / m
        if mu < tol and np.max(np.maximum(r_p, 0.0), initial=0.0) < tol \
                and np.max(np.abs(r_d)) < 1e-8:
            break
        w = lam / s
        K = Hm + (C.T * w[None, :]) @ C + I
        L = np.linalg.cholesky(K)

        def kkt(r_c):
            rhs = -r_d - C.T @ ((lam * r_p - r_c) / s)
            dz = np.linalg.solve(L.T, np.linalg.solve(L, rhs))
            ds = -r_p - C @ dz
            dlam = -(r_c + lam * ds) / s
            return dz, ds, dlam

        dz_a, ds_a, dlam_a = kkt(lam * s)
        a_aff = min(max_step(s, ds_a), max_step(lam, dlam_a))
        mu_aff = float((lam + a_aff * dlam_a) @ (s + a_aff * ds_a)) / m
        sigma = np.clip((mu_aff / max(mu, 1e-300)) ** 3, 0.0, 1.0)
        dz, ds, dlam = kkt(lam * s - sigma * mu + dlam_a * ds_a)
        alpha = min(max_step(s, ds), max_step(lam, dlam))
        z = z + alpha * dz
        s = np.maximum(s + alpha * ds, 1e-300)
        lam = np.maximum(lam + alpha * dlam, 1e-300)
    return z, float(lam @ s) / m


def capture_tick_qps(cfg, n_ticks: int = 20, duration: float = 3.0,
                     vel=(0.3, 0.0, 0.0), seed: int = 0):
    """Record the condensed-QP inputs of ``n_ticks`` REAL closed-loop MPC ticks.

    Runs the SRB closed-loop harness (full stack: gait -> footholds -> MPC ->
    plant) with the nominal gradient MPC and intercepts every ``solve`` call's
    inputs. Returns a list of dicts with keys x0, feet_traj, seq, Xref, Uref,
    U_warm. Skips the first 5 ticks (standing start — trivially interior QPs).
    """
    from ..sim.srb_harness import SRBClosedLoopHarness

    h = SRBClosedLoopHarness(cfg, seed=seed)
    mpc = h.ctrl.controller
    orig_solve = mpc.solve
    records = []

    def recording_solve(x0, feet_traj, seq, Xref, Uref, U_warm, wrench, srbd_rt):
        records.append(dict(
            x0=np.array(x0, np.float32), feet_traj=np.array(feet_traj, np.float32),
            seq=np.array(seq, np.float32), Xref=np.array(Xref, np.float32),
            Uref=np.array(Uref, np.float32), U_warm=np.array(U_warm, np.float32)))
        return orig_solve(x0, feet_traj, seq, Xref, Uref, U_warm, wrench, srbd_rt)

    mpc.solve = recording_solve
    n_steps = int(duration / cfg.sim.dt)
    v = np.asarray(vel, np.float64)
    for _ in range(n_steps):
        h.step(v)
        if len(records) >= n_ticks + 5:
            break
    mpc.solve = orig_solve
    return records[5:5 + n_ticks]


def qp_ladder_report(cfg, ticks=None, n_ticks: int = 20):
    """Quantify the production-f32 vs reference-f64 gap on real tick QPs.

    Returns a dict: max/mean first-stage GRF deviation [N], max relative
    deviation vs the total vertical load, and the f64 residual quality.
    """
    import jax

    from ..controllers.gradient.sqp import make_rti_solver_split, qp_solver_for

    if ticks is None:
        ticks = capture_tick_qps(cfg, n_ticks=n_ticks)
    *_, assemble_qp = make_rti_solver_split(cfg, return_assembler=True)
    qp_fn, iters = qp_solver_for(cfg.mpc.gradient)
    qp_jit = jax.jit(lambda Hm, g, C, d: qp_fn(Hm, g, C, d, iters=iters).z)

    grf_dev = []
    mu_ref = []
    for t in ticks:
        Hm, g, C, d = jax.device_get(assemble_qp(
            t["x0"], t["feet_traj"], t["seq"], t["Xref"], t["Uref"], t["U_warm"]))
        z32 = np.asarray(jax.device_get(qp_jit(Hm, g, C, d)))
        z64, mu = pdip_solve_np_f64(Hm, g, C, d)
        mu_ref.append(mu)
        # First-stage GRFs are the control the plant sees.
        u0_32 = t["U_warm"][0] + z32[:12]
        u0_64 = t["U_warm"][0].astype(np.float64) + z64[:12]
        grf_dev.append(np.max(np.abs(u0_32 - u0_64)))
    total_load = float(cfg.robot.mass * cfg.gravity)
    return {
        "n_ticks": len(ticks),
        "qp_gap_vs_f64_max_N": float(np.max(grf_dev)),
        "qp_gap_vs_f64_mean_N": float(np.mean(grf_dev)),
        "qp_gap_vs_f64_rel": float(np.max(grf_dev) / total_load),
        "f64_mu_max": float(np.max(mu_ref)),
    }
