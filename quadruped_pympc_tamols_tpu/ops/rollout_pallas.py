"""Fully-fused Pallas TPU kernel for the sampling-MPC iteration.

One kernel invocation per 1024-sample tile performs, entirely in VMEM:

  on-core PRNG (pltpu.prng_random_bits + Box-Muller) -> exploration noise with the
  reference's three-distribution mixture (centroidal_nmpc_jax.py:644-677) ->
  candidate parameters -> spline-basis GEMM on the MXU (raw force trajectories) ->
  H-step SRB rollout with the gravity-share/contact/friction force model fused in ->
  quadratic state cost -> per-tile argmin + one-hot winner extraction.

Only (num_tiles,) best costs and (num_tiles, P) winner parameters leave the chip's
VMEM per iteration — no (N, P) noise tensor or (H, 12, N) force tensor ever touches
HBM, which is the difference between this kernel and the XLA pipeline in
controllers/sampling (where each stage round-trips through HBM).

The kernel runs in interpret mode on CPU for tests; on TPU it compiles via Mosaic.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..controllers.sampling.splines import make_step_major_basis, num_params_per_leg
from ..dynamics.srbd import make_params

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

TILE = 1024  # samples per kernel instance, laid out (8, 128)
_SUB, _LANE = 8, 128


def pallas_available() -> bool:
    return _HAS_PALLAS


def _u01(shape):
    """Uniform [0, 1) from on-core PRNG bits (explicit uint32 bitcast, top 24 bits
    as the mantissa — the float conversion of raw int32 bits is unreliable on the
    compiled path)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # uint32->f32 is unsupported in Mosaic; the top-24-bit value fits int32 exactly.
    top24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return top24.astype(jnp.float32) * (1.0 / 16777216.0)


def _normals(shape):
    """Standard normals via Box-Muller over on-core PRNG bits."""
    u1 = 1.0 - _u01(shape)  # (0, 1]: log is finite
    u2 = _u01(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * np.pi * u2)


def _uniforms(shape, lo, hi):
    return lo + (hi - lo) * _u01(shape)


class PallasIterationFn(NamedTuple):
    fn: object  # jitted (best_params, seed, state12, feet12, ref12, contact, share) -> (costs, winners)
    num_tiles: int
    P: int


def make_pallas_iteration(cfg: Config, num_samples: int | None = None,
                          interpret: bool = False) -> PallasIterationFn:
    """Build the fused random-sampling iteration.

    Returns a jitted function
        (best_params (P,), seed (int32), state12 (12,), feet12 (12,), ref12 (12,),
         contact_seq (4, H), share (H,)) -> (tile_costs (T,), tile_winners (T, P))
    where T = num_samples // TILE. The global winner is the argmin over tiles.
    """
    if not _HAS_PALLAS:
        raise RuntimeError("pallas unavailable")
    sp = cfg.mpc.sampling
    H = cfg.mpc.horizon
    P_leg = num_params_per_leg(sp.parametrization, H, sp.num_splines)
    P = 4 * P_leg
    N = num_samples or sp.num_samples
    num_tiles = max(1, N // TILE)

    W_big = make_step_major_basis(sp.parametrization, H, sp.num_splines)  # (H*12, P)
    Wt = np.ascontiguousarray(W_big.T)  # (P, H*12) for params^T @ .. layout
    srbd = make_params(cfg)
    q_diag = cfg.mpc.cost.as_vector()
    dts = cfg.mpc.dts()
    m = float(srbd.mass)
    g = float(srbd.gravity)
    I = np.asarray(srbd.inertia)
    Iinv = np.asarray(srbd.inertia_inv)
    mu = cfg.mpc.mu
    grf_min, grf_max = cfg.mpc.grf_min, cfg.mpc.grf_max
    kx = sp.max_force_x / sp.max_force_z
    ky = sp.max_force_y / sp.max_force_z
    s1, s2, s3 = sp.sigma_random

    # Sample-mixture boundaries (reference :650-677): [0]=incumbent,
    # [1, 1+N/3) gauss*s1, [1+N/3, 1+2N/3) gauss*s2, rest uniform(+-s3).
    b1 = 1 + N // 3
    b2 = 1 + 2 * (N // 3)

    def kernel(seed_ref, W_ref, best_ref, state_ref, feet_ref, ref_ref, contact_ref,
               share_ref, cost_out, win_out):
        tile = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0, 0] + tile)

        # Global column index of each sample in this tile: one (1, TILE) row of
        # masks broadcasts over the whole (P, TILE) noise matrix.
        gcol = tile * TILE + jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
        sig_gauss = jnp.where(gcol < b1, s1, s2).astype(jnp.float32)
        use_unif = gcol >= b2
        is_incumbent = gcol == 0

        # Noise + candidate parameters in one (P, TILE) block.
        z = _normals((P, TILE)) * sig_gauss
        u = _uniforms((P, TILE), -s3, s3)
        noise = jnp.where(use_unif, u, z)
        noise = jnp.where(is_incumbent, 0.0, noise)
        params = best_ref[0, :].reshape(P, 1) + noise  # (P, TILE)

        # Raw force trajectories on the MXU: (H*12, P) @ (P, 1024).
        raw = jnp.dot(W_ref[:, :], params, preferred_element_type=jnp.float32)  # (H*12, 1024)
        raw = raw.reshape(H * 12, _SUB, _LANE)

        # Rollout, all rows (8, 128).
        px = jnp.full((_SUB, _LANE), state_ref[0, 0])
        py = jnp.full((_SUB, _LANE), state_ref[0, 1])
        pz = jnp.full((_SUB, _LANE), state_ref[0, 2])
        vx = jnp.full((_SUB, _LANE), state_ref[0, 3])
        vy = jnp.full((_SUB, _LANE), state_ref[0, 4])
        vz = jnp.full((_SUB, _LANE), state_ref[0, 5])
        rr = jnp.full((_SUB, _LANE), state_ref[0, 6])
        pp = jnp.full((_SUB, _LANE), state_ref[0, 7])
        yy = jnp.full((_SUB, _LANE), state_ref[0, 8])
        wx = jnp.full((_SUB, _LANE), state_ref[0, 9])
        wy = jnp.full((_SUB, _LANE), state_ref[0, 10])
        wz = jnp.full((_SUB, _LANE), state_ref[0, 11])
        cost = jnp.zeros((_SUB, _LANE), jnp.float32)

        for n in range(H):
            dt = float(dts[n])
            sh = share_ref[0, n]
            Fx = Fy = Fz = 0.0
            Tx = Ty = Tz = 0.0
            for leg in range(4):
                cl = contact_ref[0, leg * H + n]
                fx = raw[n * 12 + leg * 3 + 0] * (cl * kx)
                fy = raw[n * 12 + leg * 3 + 1] * (cl * ky)
                fz = (sh + raw[n * 12 + leg * 3 + 2]) * cl
                fz = jnp.clip(fz, grf_min, grf_max)
                lim = mu * fz
                fx = jnp.clip(fx, -lim, lim)
                fy = jnp.clip(fy, -lim, lim)
                rx = feet_ref[0, leg * 3 + 0] - px
                ry = feet_ref[0, leg * 3 + 1] - py
                rz = feet_ref[0, leg * 3 + 2] - pz
                Fx = Fx + fx
                Fy = Fy + fy
                Fz = Fz + fz
                Tx = Tx + (ry * fz - rz * fy)
                Ty = Ty + (rz * fx - rx * fz)
                Tz = Tz + (rx * fy - ry * fx)

            ax, ay, az = Fx / m, Fy / m, Fz / m - g
            sr, cr = jnp.sin(rr), jnp.cos(rr)
            sp_, cp = jnp.sin(pp), jnp.cos(pp)
            sy, cy = jnp.sin(yy), jnp.cos(yy)
            tp = sp_ / cp
            r_dot = wx + sr * tp * wy + cr * tp * wz
            p_dot = cr * wy - sr * wz
            y_dot = (sr * wy + cr * wz) / cp
            tbx = cp * cy * Tx + cp * sy * Ty - sp_ * Tz
            tby = (sr * sp_ * cy - cr * sy) * Tx + (sr * sp_ * sy + cr * cy) * Ty + sr * cp * Tz
            tbz = (cr * sp_ * cy + sr * sy) * Tx + (cr * sp_ * sy - sr * cy) * Ty + cr * cp * Tz
            Iwx = I[0, 0] * wx + I[0, 1] * wy + I[0, 2] * wz
            Iwy = I[1, 0] * wx + I[1, 1] * wy + I[1, 2] * wz
            Iwz = I[2, 0] * wx + I[2, 1] * wy + I[2, 2] * wz
            gx = wy * Iwz - wz * Iwy
            gy = wz * Iwx - wx * Iwz
            gz = wx * Iwy - wy * Iwx
            mx, my, mz = tbx - gx, tby - gy, tbz - gz
            wdx = Iinv[0, 0] * mx + Iinv[0, 1] * my + Iinv[0, 2] * mz
            wdy = Iinv[1, 0] * mx + Iinv[1, 1] * my + Iinv[1, 2] * mz
            wdz = Iinv[2, 0] * mx + Iinv[2, 1] * my + Iinv[2, 2] * mz

            px, py, pz = px + vx * dt, py + vy * dt, pz + vz * dt
            vx, vy, vz = vx + ax * dt, vy + ay * dt, vz + az * dt
            rr, pp, yy = rr + r_dot * dt, pp + p_dot * dt, yy + y_dot * dt
            wx, wy, wz = wx + wdx * dt, wy + wdy * dt, wz + wdz * dt

            rows = (px, py, pz, vx, vy, vz, rr, pp, yy, wx, wy, wz)
            for i in range(12):
                w_i = float(q_diag[i])
                if w_i != 0.0:
                    e = rows[i] - ref_ref[0, i]
                    cost = cost + w_i * e * e

        bad = jnp.isnan(cost) | jnp.isinf(cost)
        cost = jnp.where(bad, 1.0e6, cost)

        # Per-tile winner: min + one-hot matvec over the flattened tile.
        cflat = cost.reshape(1, TILE)
        cmin = jnp.min(cflat)
        onehot = (cflat == cmin).astype(jnp.float32)
        onehot = onehot / jnp.sum(onehot)  # ties averaged
        winner = jnp.dot(params, onehot.reshape(TILE, 1),
                         preferred_element_type=jnp.float32)  # (P, 1)
        # Outputs are (8, 128)-padded per tile (TPU block-shape constraint):
        # cost broadcast over its tile slot, winner vector in row-major order.
        cost_out[:, :] = jnp.full((_SUB, _LANE), cmin)
        win_out[:, :] = jnp.pad(winner[:, 0], (0, _SUB * _LANE - P)).reshape(_SUB, _LANE)

    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((H * 12, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
    )

    call = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles * _SUB, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles * _SUB, _LANE), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=(pltpu.InterpretParams() if interpret else False),
    )

    @jax.jit
    def iteration(best_params, seed, state12, feet12, ref12, contact_seq, share):
        costs, winners = call(
            seed.astype(jnp.int32).reshape(1, 1), jnp.asarray(W_big, jnp.float32),
            best_params[None, :], state12[None, :], feet12[None, :], ref12[None, :],
            contact_seq.reshape(1, 4 * H), share[None, :],
        )
        tile_costs = costs.reshape(num_tiles, _SUB * _LANE)[:, 0]
        tile_winners = winners.reshape(num_tiles, _SUB * _LANE)[:, :P]
        return tile_costs, tile_winners

    return PallasIterationFn(iteration, num_tiles, P)


def make_pallas_sampling_solver(cfg: Config, num_samples: int | None = None,
                                interpret: bool = False):
    """Full sampling-MPC solve around the fused kernel (random_sampling method).

    Same signature/outputs as controllers.sampling.make_sampling_solver: only the
    per-iteration heavy lifting (noise -> rollout -> winner) runs in the Pallas
    kernel; warm-start reset, GRF extraction and the one-step prediction are a few
    scalar-sized XLA ops.
    """
    from ..controllers.sampling.rollout import ForceModelParams, apply_force_model_rows
    from ..controllers.sampling.sampling_mpc import SamplingState, SolveOutput
    from ..dynamics.srbd import integrate_euler

    it = make_pallas_iteration(cfg, num_samples, interpret=interpret)
    sp = cfg.mpc.sampling
    H = cfg.mpc.horizon
    P = it.P
    P_leg = P // 4
    W_big = make_step_major_basis(sp.parametrization, H, sp.num_splines)
    srbd = make_params(cfg)
    dts = cfg.mpc.dts()
    fm = ForceModelParams(sp.max_force_x / sp.max_force_z, sp.max_force_y / sp.max_force_z,
                          cfg.mpc.grf_min, cfg.mpc.grf_max, cfg.mpc.mu)

    def solve(state12, feet, ref12, ref_feet, contact_seq, current_contact,
              previous_contact, sstate: SamplingState):
        best_params = sstate.best_parameters
        liftoff_edge = (previous_contact == 1.0) & (current_contact == 0.0)
        best_params = best_params * jnp.repeat(~liftoff_edge, P_leg).astype(jnp.float32)
        feet_eff = jnp.where(current_contact[:, None] == 0.0, ref_feet, feet)

        key, sub = jax.random.split(sstate.key)
        seed = jax.random.randint(sub, (), 0, 2**31 - 1, dtype=jnp.int32)

        n_stance = jnp.sum(contact_seq, axis=0)
        share = (srbd.mass * 9.81 / jnp.maximum(n_stance, 1.0)).astype(jnp.float32)

        costs_t, winners_t = it.fn(best_params, seed, state12,
                                   feet_eff.reshape(12), ref12, contact_seq, share)
        i_best = jnp.argmin(costs_t)
        onehot = (jnp.arange(costs_t.shape[0]) == i_best).astype(jnp.float32)
        new_params = onehot @ winners_t
        best_cost = costs_t[i_best]

        raw0 = W_big[0:12] @ new_params
        rows = apply_force_model_rows(raw0, contact_seq[:, 0], share[0], fm)
        grfs = jnp.stack(rows).reshape(4, 3)
        predicted = integrate_euler(state12, feet_eff, grfs, contact_seq[:, 0], srbd, dts[0])

        out = SolveOutput(grfs=grfs, footholds=jnp.zeros((4, 3), jnp.float32),
                          predicted_state=predicted, best_parameters=new_params,
                          best_cost=best_cost, costs=costs_t, sigma=sstate.sigma,
                          best_freq=jnp.asarray(cfg.gait_params.step_freq, jnp.float32))
        return out, SamplingState(new_params, key, sstate.sigma)

    return jax.jit(solve), P
