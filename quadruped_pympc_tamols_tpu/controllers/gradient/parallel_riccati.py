"""Parallel-in-time LQR: the Riccati backward pass as an associative scan.

SURVEY 2.7 / P5: the reference's HPIPM is sequential in the horizon; the one
parallelism dimension with no precedent there is the stage axis. For the H=12
production OCP the dense condensed QP wins (ocp.py docstring), but for LONG-horizon
variants the O(H) sequential Riccati becomes the critical path. This module
implements the temporal-parallel formulation (Sarkka & Garcia-Fernandez,
"Temporal Parallelization of Dynamic Programming and Linear Quadratic Control",
2021): conditional value functions between stages form a monoid, so the backward
pass runs in O(log H) depth with `jax.lax.associative_scan`.

Element representation for stages i..j of the LTV problem

    x_{k+1} = F_k x_k + c_k + G_k u_k,
    cost    = sum_k 0.5 (x_k - xr_k)' Q_k (x_k - xr_k) + 0.5 u_k' R_k u_k
              + 0.5 (x_N - xr_N)' Q_N (x_N - xr_N)

is the 5-tuple (A, b, C, eta, J) encoding the conditional value function

    V_{i->j}(x_i, x_j) = const + 0.5 x_i' J x_i - eta' x_i   [given optimal play,
    with (A, b, C) the conditional-mean/covariance-like terms of x_j given x_i].

Correctness is pinned against the sequential Riccati recursion on random LTV
systems (tests/test_parallel_riccati.py), not trusted from the derivation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def lqr_backward_sequential(F, c, G, Q, q, R, QN, qN):
    """Standard backward Riccati for the tracking LQR above.

    Args (H = horizon, n = state dim, m = input dim):
        F (H, n, n), c (H, n), G (H, n, m): dynamics.
        Q (H, n, n), q (H, n): stage state cost 0.5 x'Qx - q'x (set q = Q @ xref).
        R (H, m, m): input cost.
        QN (n, n), qN (n,): terminal cost.

    Returns (K (H, m, n), kff (H, m), S (H+1, n, n), s (H+1, n)) with the control
    law u_k = -K_k x_k + kff_k and value V_k(x) = 0.5 x'S_k x - s_k'x + const.
    """
    def body(carry, inp):
        S, s = carry
        Fk, ck, Gk, Qk, qk, Rk = inp
        GS = Gk.T @ S
        M = Rk + GS @ Gk
        K = jnp.linalg.solve(M, GS @ Fk)
        kff = jnp.linalg.solve(M, Gk.T @ (s - S @ ck))
        FGK = Fk - Gk @ K
        S_new = Qk + Fk.T @ S @ FGK
        S_new = 0.5 * (S_new + S_new.T)
        s_new = qk + FGK.T @ (s - S @ ck)
        return (S_new, s_new), (K, kff, S_new, s_new)

    (S0, s0), (K, kff, Ss, ss) = jax.lax.scan(
        body, (QN, qN), (F, c, G, Q, q, R), reverse=True)
    S_all = jnp.concatenate([Ss, QN[None]], axis=0)
    s_all = jnp.concatenate([ss, qN[None]], axis=0)
    return K, kff, S_all, s_all


def _combine(e2, e1):
    """Associative combination of conditional-value elements.

    Ordering note: with `associative_scan(reverse=True)` the operator receives
    (later, earlier) element pyramids; e1 spans stages i..k, e2 spans k..j, and the
    result spans i..j.
    """
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    n = A1.shape[-1]
    I = jnp.eye(n)
    # (I + C1 J2)^{-1} via one LU solve reused for both occurrences.
    L = I + C1 @ J2
    Li_A1 = jnp.linalg.solve(L, A1)
    Li_b = jnp.linalg.solve(L, b1[..., None] + C1 @ eta2[..., None])[..., 0]
    Lt = I + J2 @ C1
    Lti_eta = jnp.linalg.solve(Lt, eta2[..., None] - J2 @ b1[..., None])[..., 0]
    Lti_J2A1 = jnp.linalg.solve(Lt, J2 @ A1)
    A = A2 @ Li_A1
    b = (A2 @ Li_b[..., None])[..., 0] + b2
    C = A2 @ jnp.linalg.solve(L, C1) @ A2.swapaxes(-1, -2) + C2
    eta = A1.swapaxes(-1, -2) @ Lti_eta[..., None]
    eta = eta[..., 0] + eta1
    J = A1.swapaxes(-1, -2) @ Lti_J2A1 + J1
    J = 0.5 * (J + J.swapaxes(-1, -2))
    return (A, b, C, eta, J)


def lqr_backward_associative(F, c, G, Q, q, R, QN, qN):
    """O(log H)-depth Riccati via associative_scan; same returns as sequential.

    Each stage element: A = F, b = c, C = G R^{-1} G', eta = q, J = Q; terminal
    element (0, 0, 0, qN, QN). The suffix combination of elements k..N yields
    (eta_k, J_k) = (s_k, S_k), from which gains follow stage-wise in parallel.
    """
    H, n, m = F.shape[0], F.shape[1], G.shape[2]
    Rinv_Gt = jnp.linalg.solve(R, G.swapaxes(-1, -2))
    C = G @ Rinv_Gt
    elems = (
        jnp.concatenate([F, jnp.zeros((1, n, n))], axis=0),
        jnp.concatenate([c, jnp.zeros((1, n))], axis=0),
        jnp.concatenate([C, jnp.zeros((1, n, n))], axis=0),
        jnp.concatenate([q, qN[None]], axis=0),
        jnp.concatenate([Q, QN[None]], axis=0),
    )
    scanned = jax.lax.associative_scan(_combine, elems, reverse=True)
    S_all = scanned[4]  # (H+1, n, n): J of the suffix k..N
    s_all = scanned[3]

    # Stage-wise gains from V_{k+1} — all stages in parallel (vmap).
    def gains(Fk, ck, Gk, Rk, S1, s1):
        GS = Gk.T @ S1
        M = Rk + GS @ Gk
        K = jnp.linalg.solve(M, GS @ Fk)
        kff = jnp.linalg.solve(M, Gk.T @ (s1 - S1 @ ck))
        return K, kff

    K, kff = jax.vmap(gains)(F, c, G, R, S_all[1:], s_all[1:])
    return K, kff, S_all, s_all
