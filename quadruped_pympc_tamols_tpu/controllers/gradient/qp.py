"""Dense primal-dual interior-point QP solver, fixed iteration count, batched.

TPU-native replacement for HPIPM (the reference's QP engine,
centroidal_nmpc_nominal.py:202, :242-251): the condensed QP's dense Hessian
(N*nu = 144 square) is factorized with one Cholesky per IP iteration on the MXU; a
fixed iteration budget mirrors HPIPM's mode caps (10 for 'speed', 5 for
'crazy_speed'). Everything is jnp with static shapes, so the solver vmaps over gait
candidates (replacing AcadosOcpBatchSolver's OpenMP threads,
centroidal_nmpc_gait_adaptive.py:56-71) and over scenarios across chips.

Problem form:  min 0.5 z^T H z + g^T z   s.t.  C z <= d.
Infeasible-start primal-dual path following with slack variables:
  C z + s = d,  s > 0,  lam > 0,  s o lam -> 0.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QPSolution(NamedTuple):
    z: jnp.ndarray
    lam: jnp.ndarray
    s: jnp.ndarray
    gap: jnp.ndarray  # final complementarity mu
    primal_res: jnp.ndarray  # max(C z - d, 0) infinity norm


def pdip_solve(Hm, g, C, d, iters: int = 18, reg: float = 1e-7, sigma: float = 0.2,
               z0=None, mu_floor: float = 1e-4, sl_min: float = 1e-6):
    """Solve one dense QP. Shapes: Hm (n, n), g (n,), C (m, n), d (m,).

    Fixed ``iters`` Newton steps on the perturbed KKT system with fraction-to-boundary
    step sizes; returns the final iterate (no early exit — static control flow for
    XLA). Float32-safe: the barrier target is floored at ``mu_floor`` and slack/dual
    magnitudes at ``sl_min`` so the iteration stays finite once converged (a raw IP
    collapses below f32 precision after ~11 iterations). For batches, vmap this
    function.
    """
    n = g.shape[0]
    m = d.shape[0]

    z = jnp.zeros(n) if z0 is None else z0
    # Strictly positive initialization.
    s = jnp.maximum(d - C @ z, 1.0)
    lam = jnp.ones(m)

    I = jnp.eye(n) * reg

    def body(carry, _):
        z, lam, s = carry
        r_d = Hm @ z + g + C.T @ lam
        r_p = C @ z + s - d
        mu = jnp.dot(lam, s) / m
        r_c = lam * s - sigma * jnp.maximum(mu, mu_floor)

        s_safe = jnp.maximum(s, sl_min)
        # Clamp the active-constraint stiffness: keeps K's conditioning within f32
        # Cholesky range (unbounded lam/s produces NaN pivots once converged).
        w = jnp.clip(lam / s_safe, 0.0, 1e4)  # (m,)
        rhs = -r_d - C.T @ ((lam * r_p - r_c) / s_safe)
        K = Hm + (C.T * w[None, :]) @ C + I
        L = jnp.linalg.cholesky(K)
        dz = jax.scipy.linalg.cho_solve((L, True), rhs)
        ds = -r_p - C @ dz
        dlam = -(r_c + lam * ds) / s_safe

        # Fraction-to-boundary.
        def max_step(v, dv):
            ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
            return jnp.minimum(1.0, 0.995 * jnp.min(ratio))

        alpha = jnp.minimum(max_step(s, ds), max_step(lam, dlam))
        z = z + alpha * dz
        s = jnp.maximum(s + alpha * ds, sl_min)
        lam = jnp.maximum(lam + alpha * dlam, sl_min)
        return (z, lam, s), None

    (z, lam, s), _ = jax.lax.scan(body, (z, lam, s), None, length=iters)
    gap = jnp.dot(lam, s) / m
    primal_res = jnp.max(jnp.maximum(C @ z - d, 0.0))
    return QPSolution(z, lam, s, gap, primal_res)


def pdip_solve_mehrotra(Hm, g, C, d, iters: int = 8, reg: float = 1e-7,
                        z0=None, mu_floor: float = 1e-5, sl_min: float = 1e-6):
    """Mehrotra predictor-corrector variant of :func:`pdip_solve`.

    One Cholesky factorization serves BOTH the affine predictor and the corrector
    solve, and the adaptive centering sigma = (mu_aff/mu)^3 reaches the same
    complementarity gap in roughly half the iterations — on TPU the sequential
    144x144 factorizations dominate the solve, so fewer iterations is the lever
    (HPIPM itself is a Mehrotra-style IPM)."""
    n = g.shape[0]
    m = d.shape[0]
    z = jnp.zeros(n) if z0 is None else z0
    s = jnp.maximum(d - C @ z, 1.0)
    lam = jnp.ones(m)
    I = jnp.eye(n) * reg

    def max_step(v, dv):
        ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
        return jnp.minimum(1.0, 0.995 * jnp.min(ratio))

    def body(carry, _):
        z, lam, s = carry
        r_d = Hm @ z + g + C.T @ lam
        r_p = C @ z + s - d
        mu = jnp.dot(lam, s) / m

        s_safe = jnp.maximum(s, sl_min)
        w = jnp.clip(lam / s_safe, 0.0, 1e4)
        K = Hm + (C.T * w[None, :]) @ C + I
        L = jnp.linalg.cholesky(K)

        def kkt_solve(r_c):
            rhs = -r_d - C.T @ ((lam * r_p - r_c) / s_safe)
            dz = jax.scipy.linalg.cho_solve((L, True), rhs)
            ds = -r_p - C @ dz
            dlam = -(r_c + lam * ds) / s_safe
            return dz, ds, dlam

        # Predictor: pure Newton on complementarity (sigma = 0).
        dz_a, ds_a, dlam_a = kkt_solve(lam * s)
        a_aff = jnp.minimum(max_step(s, ds_a), max_step(lam, dlam_a))
        mu_aff = jnp.dot(lam + a_aff * dlam_a, s + a_aff * ds_a) / m
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, mu_floor)) ** 3, 0.0, 1.0)

        # Corrector: centered + second-order term, same factorization.
        r_c = lam * s - sigma * jnp.maximum(mu, mu_floor) + dlam_a * ds_a
        dz, ds, dlam = kkt_solve(r_c)
        alpha = jnp.minimum(max_step(s, ds), max_step(lam, dlam))
        # Freeze once converged: further f32 Mehrotra steps at the mu floor drift
        # the iterate instead of polishing it.
        alpha = alpha * (mu > 2.0 * mu_floor)
        z = z + alpha * dz
        s = jnp.maximum(s + alpha * ds, sl_min)
        lam = jnp.maximum(lam + alpha * dlam, sl_min)
        return (z, lam, s), None

    (z, lam, s), _ = jax.lax.scan(body, (z, lam, s), None, length=iters)
    gap = jnp.dot(lam, s) / m
    primal_res = jnp.max(jnp.maximum(C @ z - d, 0.0))
    return QPSolution(z, lam, s, gap, primal_res)
