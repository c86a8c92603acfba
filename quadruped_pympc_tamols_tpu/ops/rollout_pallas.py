"""Fully-fused Pallas TPU kernels for the sampling-MPC iteration (all methods).

One kernel instance per sample tile performs, entirely in VMEM:

  on-core PRNG (pltpu.prng_random_bits + Box-Muller) -> exploration noise (the
  method's distribution: reference three-mixture for random_sampling
  [centroidal_nmpc_jax.py:644-677], sigma_mppi gaussians for MPPI [:804-812],
  per-parameter-sigma gaussians for CEM [:951-958]) -> candidate parameters ->
  spline-basis GEMM on the MXU (raw force trajectories) -> H-step SRB rollout with
  the gravity-share/contact/friction force model fused in -> quadratic state cost ->
  per-tile optimizer partials:

  * random_sampling: tile argmin + one-hot winner extraction;
  * mppi: tile min + softmax partials (Z_t, S_t) relative to the tile's own min,
    combined exactly across tiles with the log-sum-exp shift (mppi_combine);
  * cem_mppi: mppi partials + the tile's top-K elites — under fuse_combine the
    EXACT global top-K merge and the elite sigma refit also run in-kernel
    (column-slab elites in the sequential-grid accumulator, one
    lane-contracting matmul gathers all K elite vectors).

fuse_combine works for BOTH the single-group solvers and the gait-adaptive
GROUP axis: each group owns a resident accumulator block (output index map
depends on the group id only), the cross-TILE reduction rides it in-kernel,
and only the tiny cross-GROUP combine (G elements: argmin / log-sum-exp /
top-K over G*K elites — _combine) runs in XLA after the kernel.

Only O(tiles) scalars and O(tiles * P) vectors leave VMEM per iteration — no
(N, P) noise tensor or (H, 12, N) force tensor ever touches HBM, which is the
difference between these kernels and the XLA pipeline in controllers/sampling
(where each stage round-trips through HBM).

A leading GROUP axis supports the gait-adaptive solver (reference
centroidal_nmpc_jax_gait_adaptive.py): each group carries its own contact
sequence, gravity share, spline-basis operator (stance-counter phase advance,
built in-trace) and scalar cost offset (the frequency-regularization term), so
all candidate step frequencies run in the same kernel launch.

The kernels run in interpret mode on CPU for tests; on TPU they compile via Mosaic.
"""
from __future__ import annotations

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

TILE = 1024  # default samples per kernel instance, laid out (TILE/128, 128)
_LANE = 128
_WSUB = 8  # sublane count of the (8, 128) winner/partial output blocks
_BIG = 3.0e38  # f32-safe +inf stand-in for masked minima


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
    """Standard normals via Box-Muller over on-core PRNG bits.

    Uses BOTH outputs of each Box-Muller pair (cos and sin branches), so the
    expensive log/sqrt/trig work runs on half the rows."""
    rows, cols = shape
    half = (rows + 1) // 2
    u1 = 1.0 - _u01((half, cols))  # (0, 1]: log is finite
    u2 = _u01((half, cols))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    ang = (2.0 * np.pi) * u2
    z = jnp.concatenate([r * jnp.cos(ang), r * jnp.sin(ang)], axis=0)
    return z[:rows]


def _uniforms(shape, lo, hi):
    return lo + (hi - lo) * _u01(shape)


class IterationOutputs(NamedTuple):
    """Per-tile optimizer partials, flat over (group, tile)."""

    costs: object  # (GT,) per-tile min cost (cost offset included)
    winners: object  # (GT, P) per-tile argmin parameters
    z: object  # (GT,) sum of exp(-(c - cmin_t)/temp) per tile, or None
    s: object  # (GT, P) softmax-weighted parameter sums per tile, or None
    ecosts: object  # (GT, K) per-tile elite costs ascending, or None
    eparams: object  # (GT, K, P) per-tile elite parameters, or None
    ext: object  # (GT, 24) winner step-0 [grf12, next_state12] per tile, or None


class FusedIterationOutputs(NamedTuple):
    """GLOBAL optimizer result, combined across tiles inside the kernel
    (fuse_combine=True): the cross-tile reduction rides the sequential TPU grid
    in VMEM instead of a tail of tiny XLA ops after the kernel."""

    costs: object  # (GT,) per-tile min costs (observability only)
    best_cost: object  # scalar: global min cost (random_sampling) / beta (mppi)
    winner: object  # (P,) global argmin params (random_sampling) / softmax mean
    ext: object  # (24,) winner step-0 [grf12, next_state12], or None
    ecosts: object  # (GT, K) per-tile elite costs, or None (cem_mppi)
    eparams: object  # (GT, K, P) per-tile elite params, or None (cem_mppi)
    sigma: object = None  # (P,) in-kernel CEM elite sigma refit (cem_mppi)


class PallasIterationFn(NamedTuple):
    fn: object
    num_tiles: int  # total tiles (groups * tiles_per_group)
    tiles_per_group: int
    P: int
    samples_per_group: int
    fused: bool = False


def advance_seed(key):
    """(kernel seed int32, advanced key) with a 2-op LCG on the raw key words.

    Replaces jax.random.split + randint — ~15 sequential threefry ops, a
    measurable share of the solve's fixed overhead (BENCH_r02 roofline: the
    ~0.13 ms N-independent intercept) — for per-solve kernel seeding. Stream
    quality comes from the on-core PRNG that re-hashes ``seed + tile_id``
    (pltpu.prng_seed), not from the seed sequence, but the raw low word of a
    mod-2^32 LCG has short-period low bits and successive-solve seed ranges
    [s, s + num_chained*T) could collide, so the extracted seed gets a murmur3
    finalizing mix (5 ops, still far cheaper than a threefry split)."""
    typed = jnp.issubdtype(key.dtype, jax.dtypes.prng_key)
    kd = jax.random.key_data(key) if typed else key
    word = kd.ravel()[-1]
    # murmur3 fmix32: full-avalanche output permutation of the LCG state word.
    word = word ^ (word >> 16)
    word = word * np.uint32(0x7FEB352D)
    word = word ^ (word >> 15)
    word = word * np.uint32(0x846CA68B)
    word = word ^ (word >> 16)
    seed = jax.lax.bitcast_convert_type(word, jnp.int32)
    new_kd = kd * np.uint32(747796405) + np.uint32(2891336453)
    if typed:
        new_key = jax.random.wrap_key_data(new_kd, impl=jax.random.key_impl(key))
    else:
        new_key = new_kd
    return seed, new_key


def make_pallas_iteration(cfg: Config, num_samples: int | None = None,
                          interpret: bool = False, method: str = "random_sampling",
                          num_groups: int = 1, tile: int = TILE,
                          fuse_combine: bool = False,
                          num_chained: int = 1) -> PallasIterationFn:
    """Build the fused sampling iteration for ``num_groups`` candidate groups.

    Returns a jitted function

        (best_params (P,), seed i32, state12 (12,), feet12 (12,), ref12 (12,),
         contact_groups (G, 4, H), share_groups (G, H), W_groups (G, H*12, P),
         cost_offsets (G,), sigma (P,)) -> IterationOutputs

    with T = samples_per_group // tile tiles per group, flat tile index
    i = g*T + t. The sample mixture / incumbent column indexing is GLOBAL over all
    G * samples_per_group samples, matching the XLA solvers' partition of one
    (P, N) noise matrix into per-frequency groups (gait_adaptive.py:196-202).

    With ``fuse_combine=True`` (single-group only) the CROSS-TILE optimizer
    reduction also happens inside the kernel and the function returns
    FusedIterationOutputs: TPU Pallas grids execute sequentially, so an output
    block whose index map is constant stays resident in VMEM across the whole
    grid and acts as an accumulator — tile t merges its (cmin, winner, ext) or
    (beta, Z, S) partials into it with a handful of vector ops, and the block is
    flushed to HBM once. This removes the post-kernel argmin / one-hot-matmul /
    log-sum-exp combine (a tail of ~10 tiny XLA ops whose launch latency
    dominated the solve's fixed overhead at production sample counts).

    With ``num_chained > 1`` (requires fuse_combine; all three methods) ALL
    optimizer iterations run inside ONE kernel launch over an outer grid
    axis: the first tile of iteration i reads the previous iteration's global
    result from the accumulator (the argmin winner, or the softmax mean S/Z —
    plus, for cem_mppi, the refitted elite sigma), publishes it to an incumbent
    scratch block, and re-initializes the accumulator; the remaining tiles
    sample around that incumbent. Each extra iteration would otherwise pay the
    full kernel-invocation cost (~45 us measured, the launch-bound intercept of
    the roofline) — chained, it pays only its compute.

    cem_mppi under fuse_combine keeps the GLOBAL top-K elite set in the
    accumulator too: each tile inserts its K sorted elites by replace-max into
    the running unsorted top-K set (exact — an element belongs to the global
    top-K iff it survives every replace-max pass), and the LAST tile refits
    sigma from the merged elites (variance, ddof=1, clip) entirely in VMEM.
    This removes the per-tile elite outputs and the host-side
    top-k/one-hot-matmul tail that made cem_mppi ~50% slower than mppi.
    """
    if not _HAS_PALLAS:
        raise RuntimeError("pallas unavailable")
    if method not in ("random_sampling", "mppi", "cem_mppi"):
        raise ValueError(f"unknown sampling method {method!r}")
    if num_chained > 1 and not fuse_combine:
        raise ValueError("num_chained needs fuse_combine")
    if num_chained > 1 and num_groups != 1:
        # Chained iterations publish ONE incumbent per iteration; a multi-group
        # chain would need the cross-GROUP combine at every iteration boundary
        # (the production gait-adaptive config runs num_iterations=1).
        raise ValueError("num_chained needs a single group")
    sp = cfg.mpc.sampling
    H = cfg.mpc.horizon
    P_leg = num_params_per_leg(sp.parametrization, H, sp.num_splines)
    P = 4 * P_leg
    if P > _WSUB * _LANE:
        raise ValueError(f"P={P} exceeds the {_WSUB * _LANE} output-block capacity")
    G = num_groups
    N = num_samples or sp.num_samples
    sub = tile // _LANE
    # Ceil division: never evaluate FEWER samples than requested (a floor here
    # silently dropped up to tile-1 samples per group when tile did not divide
    # N/G — a hidden cap). The last tile's surplus columns are extra exploration.
    T = max(1, -((N // G) // -tile))
    Ng = T * tile  # samples per group actually evaluated (>= N // G)
    Ntot = G * Ng

    srbd = make_params(cfg)
    q_diag = cfg.mpc.cost.as_vector()
    dts = cfg.mpc.dts()
    m = float(srbd.mass)
    g_const = float(srbd.gravity)
    I = np.asarray(srbd.inertia)
    Iinv = np.asarray(srbd.inertia_inv)
    mu = cfg.mpc.mu
    grf_min, grf_max = cfg.mpc.grf_min, cfg.mpc.grf_max
    kx = sp.max_force_x / sp.max_force_z
    ky = sp.max_force_y / sp.max_force_z
    s1, s2, s3 = sp.sigma_random
    sigma_mppi = sp.sigma_mppi
    temp = sp.mppi_temperature
    K_elite = sp.cem_elite
    sig_min, sig_max = sp.cem_sigma_min, sp.cem_sigma_max

    # Sample-mixture boundaries (reference :650-677): [0]=incumbent,
    # [1, 1+N/3) gauss*s1, [1+N/3, 1+2N/3) gauss*s2, rest uniform(+-s3).
    b1 = 1 + Ntot // 3
    b2 = 1 + 2 * (Ntot // 3)

    want_mppi = method in ("mppi", "cem_mppi")
    want_cem = method == "cem_mppi"
    # For random_sampling the new incumbent IS a sample, so its step-0 GRFs and
    # one-step state (what the XLA solver recomputes with ~80 tiny sequential ops
    # costing ~0.5 ms of launch latency) are extracted inside the kernel instead.
    want_extract = method == "random_sampling"

    pad = _WSUB * _LANE - P
    # Packed-elite geometry (fused cem_mppi). Two layouts:
    # * COLUMN slab (P <= 128, the production case): elites live as LANES of
    #   one (P8, 128) slab — parameters along sublanes, elite index along
    #   lanes. ALL K elite extractions collapse into ONE lane-contracting
    #   dot_general (params (P, tile) x one-hots (K16, tile) -> (P, K16)),
    #   each merge insertion is one vector select, and the sigma refit is two
    #   lane reductions.
    # * ROW slab (P > 128): sub_p rows of 128 lanes per elite, stacked.
    sub_p = -(-P // _LANE)
    use_col_slab = sub_p == 1
    P8 = -(-P // _WSUB) * _WSUB
    K16 = -(-K_elite // _WSUB) * _WSUB
    ep_rows = K_elite * sub_p
    ep_rows_pad = -(-ep_rows // _WSUB) * _WSUB
    slab_rows = P8 if use_col_slab else ep_rows_pad
    sigma_rows = P8 if use_col_slab else _WSUB

    # Accumulator row offsets for the fused cem_mppi elite set:
    # [beta | Z | S | elite-cost row | elite slab | sigma(G=1 only)] (see the
    # slab-layout note at the factory constants). Shared by the kernel and the
    # wrapper's per-group accumulator reads.
    ec_off = 3 * _WSUB
    ep_off = 4 * _WSUB
    sg_off = ep_off + slab_rows

    def kernel(seed_ref, W_ref, best_ref, state_ref, feet_ref, ref_ref, contact_ref,
               share_ref, off_ref, sigma_ref, *out_refs):
        it_id = pl.program_id(0)
        grp = pl.program_id(1)
        tile_id = pl.program_id(2)
        flat = grp * T + tile_id
        pltpu.prng_seed(seed_ref[0, 0] + it_id * (G * T) + flat)

        if num_chained > 1:
            # Chained iterations: the incumbent comes from the PREVIOUS
            # iteration's accumulator (published by this iteration's first tile
            # into a persistent VMEM scratch block before the accumulator is
            # re-initialized below), except at iteration 0 where it is the
            # caller's warm start. For cem_mppi the previous iteration's
            # refitted sigma is published alongside (second scratch block).
            inc_ref = out_refs[-1]
            acc_pre = out_refs[-2]

            @pl.when(tile_id == 0)
            def _publish():
                best_blk = jnp.pad(best_ref[0, :], (0, pad)).reshape(_WSUB, _LANE)
                if method == "random_sampling":
                    prev_blk = acc_pre[_WSUB:2 * _WSUB, :]
                else:  # mppi/cem: softmax mean S/Z (pad lanes: 0/Z = 0, harmless)
                    prev_blk = (acc_pre[2 * _WSUB:3 * _WSUB, :]
                                / acc_pre[_WSUB:2 * _WSUB, :])
                inc_ref[0:_WSUB, :] = jnp.where(it_id == 0, best_blk, prev_blk)
                if want_cem and use_col_slab:
                    # Sigma rides the scratch as a lane-broadcast COLUMN
                    # (parameters along sublanes) — the noise path consumes a
                    # (P, 1) column directly, no relayout per tile.
                    sig0_col = jnp.pad(
                        jax.lax.transpose(sigma_ref[0:1, :], (1, 0)),
                        ((0, P8 - P), (0, 0)))  # (P8, 1)
                    col = jnp.where(it_id == 0, sig0_col,
                                    acc_pre[sg_off:sg_off + P8, 0:1])
                    inc_ref[_WSUB:_WSUB + P8, :] = jnp.broadcast_to(
                        col, (P8, _LANE))
                elif want_cem:
                    sig0_blk = jnp.pad(sigma_ref[0, :], (0, pad)).reshape(
                        _WSUB, _LANE)
                    inc_ref[_WSUB:2 * _WSUB, :] = jnp.where(
                        it_id == 0, sig0_blk, acc_pre[sg_off:sg_off + _WSUB, :])

        # Global column index of each sample in this tile: one (1, tile) row of
        # masks broadcasts over the whole (P, tile) noise matrix.
        gcol = flat * tile + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        is_incumbent = gcol == 0

        if method == "random_sampling":
            sig_gauss = jnp.where(gcol < b1, s1, s2).astype(jnp.float32)
            use_unif = gcol >= b2
            z_n = _normals((P, tile)) * sig_gauss
            u_n = _uniforms((P, tile), -s3, s3)
            noise = jnp.where(use_unif, u_n, z_n)
        elif method == "mppi":
            noise = _normals((P, tile)) * sigma_mppi
        else:  # cem_mppi: per-parameter sigma rows broadcast over lanes
            if num_chained > 1:  # per-iteration sigma from the publish scratch
                if use_col_slab:
                    sig_col = out_refs[-1][_WSUB:_WSUB + P8, 0:1][:P]  # (P, 1)
                else:
                    sig_col = out_refs[-1][_WSUB:2 * _WSUB, :].reshape(
                        _WSUB * _LANE)[:P].reshape(P, 1)
            else:
                sig_col = sigma_ref[0, :].reshape(P, 1)
            noise = _normals((P, tile)) * sig_col
        noise = jnp.where(is_incumbent, 0.0, noise)
        if num_chained > 1:
            best_vec = out_refs[-1][0:_WSUB, :].reshape(_WSUB * _LANE)[:P]
        else:
            best_vec = best_ref[0, :]
        params = best_vec.reshape(P, 1) + noise  # (P, tile)

        # Raw force trajectories on the MXU: (H*12, P) @ (P, tile).
        raw = jnp.dot(W_ref[0], params, preferred_element_type=jnp.float32)
        raw = raw.reshape(H * 12, sub, _LANE)

        # Rollout, all rows (sub, 128).
        px = jnp.full((sub, _LANE), state_ref[0, 0])
        py = jnp.full((sub, _LANE), state_ref[0, 1])
        pz = jnp.full((sub, _LANE), state_ref[0, 2])
        vx = jnp.full((sub, _LANE), state_ref[0, 3])
        vy = jnp.full((sub, _LANE), state_ref[0, 4])
        vz = jnp.full((sub, _LANE), state_ref[0, 5])
        rr = jnp.full((sub, _LANE), state_ref[0, 6])
        pp = jnp.full((sub, _LANE), state_ref[0, 7])
        yy = jnp.full((sub, _LANE), state_ref[0, 8])
        wx = jnp.full((sub, _LANE), state_ref[0, 9])
        wy = jnp.full((sub, _LANE), state_ref[0, 10])
        wz = jnp.full((sub, _LANE), state_ref[0, 11])
        cost = jnp.zeros((sub, _LANE), jnp.float32)
        f0_rows = []  # step-0 clamped forces (12 rows), for in-kernel extraction
        s1_rows = ()  # state after step 0 (12 rows)

        for n in range(H):
            dt = float(dts[n])
            sh = share_ref[0, 0, n]
            Fx = Fy = Fz = 0.0
            Tx = Ty = Tz = 0.0
            for leg in range(4):
                cl = contact_ref[0, 0, leg * H + n]
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
                if n == 0 and want_extract:
                    f0_rows += [fx, fy, fz]

            ax, ay, az = Fx / m, Fy / m, Fz / m - g_const
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
            if n == 0 and want_extract:
                s1_rows = rows
            for i in range(12):
                w_i = float(q_diag[i])
                if w_i != 0.0:
                    e = rows[i] - ref_ref[0, i]
                    cost = cost + w_i * e * e

        bad = jnp.isnan(cost) | jnp.isinf(cost)
        cost = jnp.where(bad, 1.0e6, cost) + off_ref[0, 0, 0]

        refs = list(out_refs[:-1]) if num_chained > 1 else list(out_refs)
        cost_out = refs[0]
        cflat = cost.reshape(1, tile)
        cmin = jnp.min(cflat)
        onehot = (cflat == cmin).astype(jnp.float32)
        onehot = onehot / jnp.sum(onehot)  # ties averaged
        winner = jnp.dot(params, onehot.reshape(tile, 1),
                         preferred_element_type=jnp.float32)  # (P, 1)
        # Outputs are (8, 128)-padded per tile (TPU block-shape constraint):
        # cost broadcast over its tile slot, winner vector in row-major order.
        cost_out[:, :] = jnp.full((_WSUB, _LANE), cmin)
        win_blk = jnp.pad(winner[:, 0], (0, pad)).reshape(_WSUB, _LANE)

        if want_extract:
            # Winner's step-0 GRFs + one-step state: 24 masked reductions packed
            # into one (1, 128) row (lanes 0..23).
            oh2 = (cost == cmin).astype(jnp.float32)
            denom = jnp.sum(oh2)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
            ext_row = jnp.zeros((1, _LANE), jnp.float32)
            for i, r in enumerate(f0_rows + list(s1_rows)):
                val = jnp.sum(r * oh2) / denom
                ext_row = jnp.where(lane == i, val, ext_row)
            ext_blk = jnp.broadcast_to(ext_row, (_WSUB, _LANE))

        if want_mppi:
            # Softmax partials relative to THIS tile's min; the exact global
            # softmax is recovered via the log-sum-exp shift
            # exp(-(c-beta)/T) = exp(-(cmin_t-beta)/T) * exp(-(c-cmin_t)/T).
            w_soft = jnp.exp(-(cflat - cmin) * (1.0 / temp))  # (1, tile), <= 1
            z_t = jnp.sum(w_soft)
            s_vec = jnp.dot(params, w_soft.reshape(tile, 1),
                            preferred_element_type=jnp.float32)  # (P, 1)
            s_blk = jnp.pad(s_vec[:, 0], (0, pad)).reshape(_WSUB, _LANE)

        if fuse_combine:
            # Sequential-grid accumulator (constant block index): merge this
            # tile's partials into the running global result. All selects are
            # full-block vector ops — the comparison operands are lane-uniform,
            # so no scalar loads from VMEM are needed.
            acc = refs[1]
            if method == "random_sampling":
                scal_blk = jnp.full((_WSUB, _LANE), cmin)

                @pl.when(tile_id == 0)
                def _init():
                    acc[0:_WSUB, :] = scal_blk
                    acc[_WSUB:2 * _WSUB, :] = win_blk
                    acc[2 * _WSUB:3 * _WSUB, :] = ext_blk

                @pl.when(tile_id > 0)
                def _merge():
                    prev = acc[0:_WSUB, :]
                    better = cmin < prev  # (8,128), lane-uniform
                    acc[0:_WSUB, :] = jnp.where(better, scal_blk, prev)
                    acc[_WSUB:2 * _WSUB, :] = jnp.where(
                        better, win_blk, acc[_WSUB:2 * _WSUB, :])
                    acc[2 * _WSUB:3 * _WSUB, :] = jnp.where(
                        better, ext_blk, acc[2 * _WSUB:3 * _WSUB, :])
            else:
                z_blk = jnp.full((_WSUB, _LANE), z_t)
                beta_blk = jnp.full((_WSUB, _LANE), cmin)

                @pl.when(tile_id == 0)
                def _init():
                    acc[0:_WSUB, :] = beta_blk
                    acc[_WSUB:2 * _WSUB, :] = z_blk
                    acc[2 * _WSUB:3 * _WSUB, :] = s_blk

                @pl.when(tile_id > 0)
                def _merge():
                    prev_beta = acc[0:_WSUB, :]
                    prev_z = acc[_WSUB:2 * _WSUB, :]
                    prev_s = acc[2 * _WSUB:3 * _WSUB, :]
                    nb = jnp.minimum(prev_beta, cmin)
                    so = jnp.exp(-(prev_beta - nb) * (1.0 / temp))
                    sn = jnp.exp(-(cmin - nb) * (1.0 / temp))
                    acc[0:_WSUB, :] = nb
                    acc[_WSUB:2 * _WSUB, :] = prev_z * so + z_blk * sn
                    acc[2 * _WSUB:3 * _WSUB, :] = prev_s * so + s_blk * sn
        else:
            refs[1][:, :] = win_blk
            if want_extract:
                refs[2][:, :] = ext_blk
            if want_mppi:
                refs[2][:, :] = jnp.full((_WSUB, _LANE), z_t)
                refs[3][:, :] = s_blk

        if want_cem and fuse_combine and use_col_slab:
            # COLUMN-slab fast path (P <= 128). Tile-local top-K: the K
            # sequential masked mins only COLLECT one-hot rows; all K elite
            # parameter vectors are then gathered by a single lane-contracting
            # dot_general on the MXU (the per-elite GEMV loop measured ~1.5 us
            # per elite per tile — the whole cem-vs-mppi gap). Ties (mass ties
            # are REAL at the 1e6 cost saturation) break EXACTLY
            # lexicographically on (cost, lane) like XLA top_k: among the
            # equal-cost lanes the lowest lane wins and only that one is
            # removed per round. (A multiplicative per-lane epsilon was
            # measured reordering genuinely distinct near-equal costs at
            # 5120-lane tiles — 1.5e-3 relative at the far lane; ADVICE r4.)
            lane_f = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1).astype(
                jnp.float32)
            masked = cflat
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
            tile_ec = []
            oh_rows = []
            for k in range(K_elite):
                ck = jnp.min(masked)
                at_min = masked == ck
                slot = jnp.min(jnp.where(at_min, lane_f, jnp.float32(tile)))
                oh = (at_min & (lane_f == slot)).astype(jnp.float32)  # one lane
                oh_rows.append(oh)
                tile_ec.append(ck)
                masked = jnp.where(oh > 0.0, _BIG, masked)
            ohs = jnp.concatenate(
                oh_rows + [jnp.zeros((K16 - K_elite, tile), jnp.float32)],
                axis=0)  # (K16, tile)
            eks = jax.lax.dot_general(params, ohs, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            tile_slab = jnp.pad(eks, ((0, P8 - P), (0, _LANE - K16)))

            # Global elite merge riding the sequential-grid accumulator: the
            # running top-K lives as an UNSORTED set (cost row lanes 0..K-1,
            # parameters as LANES of one (P8, 128) slab). Replace-max
            # insertion is exact for the top-K set; each insertion is one
            # lane-masked column gather + one vector select.
            acc = refs[1]
            valid = lane < K_elite

            @pl.when(tile_id == 0)
            def _einit():
                row = jnp.full((1, _LANE), _BIG)
                for k in range(K_elite):
                    row = jnp.where(lane == k, tile_ec[k], row)
                acc[ec_off:ep_off, :] = jnp.broadcast_to(row, (_WSUB, _LANE))
                acc[ep_off:ep_off + P8, :] = tile_slab

            @pl.when(tile_id > 0)
            def _emerge():
                ec = acc[ec_off:ec_off + _WSUB, :][0:1, :]  # (1, _LANE)
                slab = acc[ep_off:ep_off + P8, :]
                for k in range(K_elite):
                    cand_c = tile_ec[k]
                    cmax = jnp.max(jnp.where(valid, ec, -_BIG))
                    is_max = (ec == cmax) & valid
                    slot = jnp.min(jnp.where(is_max, lane, 2 * _LANE))
                    better = cand_c < cmax
                    ec = jnp.where(better & is_max & (lane == slot), cand_c, ec)
                    cand_col = jnp.sum(jnp.where(lane == k, tile_slab, 0.0),
                                       axis=1, keepdims=True)  # (P8, 1)
                    slab = jnp.where(better & (lane == slot), cand_col, slab)
                acc[ec_off:ep_off, :] = jnp.broadcast_to(ec, (_WSUB, _LANE))
                acc[ep_off:ep_off + P8, :] = slab

            if G == 1:
                # Multi-group accumulators have no sigma section: the
                # cross-GROUP elite merge + refit runs in the wrapper
                # (cem_sigma_update over G x K elites).
                @pl.when(tile_id == T - 1)
                def _esigma():
                    # Sigma refit from the merged global elites (reference
                    # centroidal_nmpc_jax.py:1075-1081: std of the top-K
                    # parameters, clamped) — two lane reductions. Stored as a
                    # lane-broadcast COLUMN (parameters along sublanes);
                    # readers use lane 0.
                    slab = acc[ep_off:ep_off + P8, :]
                    vm = valid.astype(jnp.float32)
                    mean = jnp.sum(slab * vm, axis=1, keepdims=True) / K_elite
                    dev = (slab - mean) * vm
                    var = jnp.sum(dev * dev, axis=1, keepdims=True) \
                        / (K_elite - 1.0) + 1e-8
                    sig = jnp.clip(jnp.sqrt(var), sig_min, sig_max)  # (P8, 1)
                    acc[sg_off:sg_off + P8, :] = jnp.broadcast_to(
                        sig, (P8, _LANE))

        elif want_cem:
            # Tile-local top-K by iterative masked min (K one-hot matvecs).
            # Ties (mass ties are REAL at the 1e6 cost saturation) break
            # EXACTLY lexicographically on (cost, lane) like XLA top_k — among
            # equal-cost lanes the lowest lane wins, and each masked min
            # removes exactly that one sample (no epsilon perturbation of the
            # costs; ADVICE r4).
            lane_f = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1).astype(
                jnp.float32)
            masked = cflat
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
            p_pad = sub_p * _LANE - P
            tile_ec = []  # K scalar elite costs, ascending
            tile_ep = []  # K packed (sub_p, _LANE) elite parameter slabs
            for k in range(K_elite):
                ck = jnp.min(masked)
                at_min = masked == ck
                slot = jnp.min(jnp.where(at_min, lane_f, jnp.float32(tile)))
                oh = (at_min & (lane_f == slot)).astype(jnp.float32)  # one lane
                ek = jnp.dot(params, oh.reshape(tile, 1),
                             preferred_element_type=jnp.float32)  # (P, 1)
                tile_ec.append(ck)
                tile_ep.append(jnp.pad(ek[:, 0], (0, p_pad)).reshape(sub_p,
                                                                     _LANE))
                masked = jnp.where(oh > 0.0, _BIG, masked)

            if not fuse_combine:
                ec_out, ep_out = refs[4], refs[5]
                ec_row = jnp.zeros((1, _LANE), jnp.float32)
                for k in range(K_elite):
                    blk = jnp.pad(tile_ep[k].reshape(-1)[:P], (0, pad))
                    ep_out[k * _WSUB:(k + 1) * _WSUB, :] = blk.reshape(_WSUB,
                                                                       _LANE)
                    ec_row = jnp.where(lane == k, tile_ec[k], ec_row)
                ec_out[:, :] = jnp.broadcast_to(ec_row, (_WSUB, _LANE))
            else:
                # Global elite merge riding the sequential-grid accumulator:
                # the running top-K lives as an UNSORTED set (cost row lanes
                # 0..K-1 + packed param slab). Each tile inserts its K sorted
                # elites by replace-max — a candidate enters iff it beats the
                # current worst member, which is exactly membership in the
                # global top-K — and each insertion updates the slab with ONE
                # row-group-keyed vector select.
                acc = refs[1]
                valid = lane < K_elite
                tile_stack = jnp.concatenate(tile_ep, axis=0)  # (ep_rows, 128)
                stack_pad = jnp.pad(tile_stack,
                                    ((0, ep_rows_pad - ep_rows), (0, 0)))
                row_group = jax.lax.broadcasted_iota(
                    jnp.int32, (ep_rows_pad, 1), 0) // sub_p

                @pl.when(tile_id == 0)
                def _einit():
                    row = jnp.full((1, _LANE), _BIG)
                    for k in range(K_elite):
                        row = jnp.where(lane == k, tile_ec[k], row)
                    acc[ec_off:ep_off, :] = jnp.broadcast_to(row, (_WSUB, _LANE))
                    acc[ep_off:ep_off + ep_rows_pad, :] = stack_pad

                @pl.when(tile_id > 0)
                def _emerge():
                    ec = acc[ec_off:ec_off + _WSUB, :][0:1, :]  # (1, _LANE)
                    eps = acc[ep_off:ep_off + ep_rows_pad, :]
                    for k in range(K_elite):
                        cand_c = tile_ec[k]
                        cmax = jnp.max(jnp.where(valid, ec, -_BIG))
                        is_max = (ec == cmax) & valid
                        slot = jnp.min(jnp.where(is_max, lane, 2 * _LANE))
                        better = cand_c < cmax
                        ec = jnp.where(better & is_max & (lane == slot),
                                       cand_c, ec)
                        cand_rows = jnp.concatenate([tile_ep[k]] * K_elite,
                                                    axis=0)
                        cand_rows = jnp.pad(cand_rows,
                                            ((0, ep_rows_pad - ep_rows),
                                             (0, 0)))
                        eps = jnp.where(better & (row_group == slot),
                                        cand_rows, eps)
                    acc[ec_off:ep_off, :] = jnp.broadcast_to(ec, (_WSUB, _LANE))
                    acc[ep_off:ep_off + ep_rows_pad, :] = eps

                if G == 1:  # multi-group: wrapper refits from per-group elites
                    @pl.when(tile_id == T - 1)
                    def _esigma():
                        # Sigma refit from the merged global elites (reference
                        # centroidal_nmpc_jax.py:1075-1081: std of the top-K
                        # parameters, clamped). Pad lanes hold zeros in every
                        # elite, so their variance is 0 -> clipped to sig_min;
                        # the wrapper reads only the first P entries.
                        eps = acc[ep_off:ep_off + ep_rows_pad, :]
                        ps = [eps[j * sub_p:(j + 1) * sub_p, :]
                              for j in range(K_elite)]
                        mean = ps[0]
                        for j in range(1, K_elite):
                            mean = mean + ps[j]
                        mean = mean * (1.0 / K_elite)
                        var = (ps[0] - mean) * (ps[0] - mean)
                        for j in range(1, K_elite):
                            var = var + (ps[j] - mean) * (ps[j] - mean)
                        var = var * (1.0 / (K_elite - 1)) + 1e-8
                        sig = jnp.clip(jnp.sqrt(var), sig_min, sig_max)
                        acc[sg_off:sg_off + _WSUB, :] = jnp.pad(
                            sig, ((0, _WSUB - sub_p), (0, 0)))

    # Per-tile costs are iteration-indexed (chained grids may not revisit an
    # output block non-consecutively); the wrapper reads the last iteration.
    out_shapes = [
        jax.ShapeDtypeStruct((num_chained * G * T * _WSUB, _LANE), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((_WSUB, _LANE), lambda i, g, t: (i * G * T + g * T + t, 0),
                     memory_space=pltpu.VMEM),
    ]
    if fuse_combine:
        # One resident accumulator block PER GROUP (index map depends on g
        # only, so each group's block stays in VMEM across its tiles):
        # [scalars | winner-or-S | ext-or-Z], extended for cem_mppi with
        # [elite costs | elite slab] (+ the in-kernel sigma refit, G=1 only —
        # the gait-adaptive wrapper refits across groups instead).
        acc_rows = (4 * _WSUB + slab_rows + (sigma_rows if G == 1 else 0)
                    if method == "cem_mppi" else 3 * _WSUB)
        out_shapes += [
            jax.ShapeDtypeStruct((G * acc_rows, _LANE), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((acc_rows, _LANE), lambda i, g, t: (g, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        out_shapes += [
            jax.ShapeDtypeStruct((G * T * _WSUB, _LANE), jnp.float32),  # winner
        ]
        out_specs += [
            pl.BlockSpec((_WSUB, _LANE), lambda i, g, t: (g * T + t, 0),
                         memory_space=pltpu.VMEM),
        ]
        if want_extract:
            out_shapes += [
                jax.ShapeDtypeStruct((G * T * _WSUB, _LANE), jnp.float32),  # ext
            ]
            out_specs += [
                pl.BlockSpec((_WSUB, _LANE), lambda i, g, t: (g * T + t, 0),
                             memory_space=pltpu.VMEM),
            ]
        if want_mppi:
            out_shapes += [
                jax.ShapeDtypeStruct((G * T * _WSUB, _LANE), jnp.float32),  # Z
                jax.ShapeDtypeStruct((G * T * _WSUB, _LANE), jnp.float32),  # S
            ]
            out_specs += [
                pl.BlockSpec((_WSUB, _LANE), lambda i, g, t: (g * T + t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_WSUB, _LANE), lambda i, g, t: (g * T + t, 0),
                             memory_space=pltpu.VMEM),
            ]
    if want_cem and not fuse_combine:
        out_shapes += [
            jax.ShapeDtypeStruct((G * T * _WSUB, _LANE), jnp.float32),  # ecosts
            jax.ShapeDtypeStruct((G * T * K_elite * _WSUB, _LANE), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((_WSUB, _LANE), lambda i, g, t: (g * T + t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K_elite * _WSUB, _LANE), lambda i, g, t: (g * T + t, 0),
                         memory_space=pltpu.VMEM),
        ]

    grid_spec = pl.GridSpec(
        grid=(num_chained, G, T),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, g, t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H * 12, P), lambda i, g, t: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda i, g, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12), lambda i, g, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12), lambda i, g, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12), lambda i, g, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4 * H), lambda i, g, t: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda i, g, t: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, g, t: (g, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, P), lambda i, g, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        # Incumbent block for chained iterations: VMEM scratch persists across
        # the sequential grid, so iteration i's tiles read what iteration i's
        # first tile published ([incumbent] — plus [sigma] for cem_mppi).
        scratch_shapes=([pltpu.VMEM((_WSUB + (sigma_rows if method == "cem_mppi"
                                              else 0), _LANE), jnp.float32)]
                        if num_chained > 1 else []),
    )

    call = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=grid_spec,
        interpret=(pltpu.InterpretParams() if interpret else False),
    )

    @jax.jit
    def iteration(best_params, seed, state12, feet12, ref12, contact_groups,
                  share_groups, W_groups, cost_offsets, sigma):
        outs = call(
            seed.astype(jnp.int32).reshape(1, 1),
            W_groups.astype(jnp.float32),
            best_params[None, :], state12[None, :], feet12[None, :], ref12[None, :],
            contact_groups.reshape(G, 1, 4 * H), share_groups.reshape(G, 1, H),
            cost_offsets.astype(jnp.float32).reshape(G, 1, 1),
            sigma.astype(jnp.float32).reshape(1, P),
        )
        GT = G * T
        costs = outs[0].reshape(num_chained, GT, _WSUB * _LANE)[-1, :, 0]
        if fuse_combine and G > 1:
            # Per-GROUP fused partials: the cross-TILE combine ran in-kernel
            # per group; the tiny cross-GROUP combine (G elements — argmin /
            # log-sum-exp / top-K over G*K elites) runs in XLA via _combine,
            # identical to the non-fused downstream path but over G rows
            # instead of G*T tiles.
            acc = outs[1].reshape(G, -1, _LANE)  # (G, acc_rows, _LANE)
            costs_g = acc[:, 0, 0]
            if method == "random_sampling":
                win = acc[:, _WSUB:2 * _WSUB, :].reshape(G, -1)[:, :P]
                ext = acc[:, 2 * _WSUB:3 * _WSUB, :].reshape(G, -1)[:, :24]
                return IterationOutputs(costs_g, win, None, None, None, None,
                                        ext)
            z = acc[:, _WSUB, 0]
            s = acc[:, 2 * _WSUB:3 * _WSUB, :].reshape(G, -1)[:, :P]
            ec = ep = None
            if want_cem:
                ec = acc[:, ec_off, :K_elite]  # (G, K)
                if use_col_slab:
                    # Column slab: parameters along sublanes, elites along
                    # lanes -> (G, K, P).
                    ep = acc[:, ep_off:ep_off + P8, :K_elite].transpose(
                        0, 2, 1)[:, :, :P]
                else:
                    ep = acc[:, ep_off:ep_off + ep_rows, :].reshape(
                        G, K_elite, sub_p * _LANE)[:, :, :P]
            return IterationOutputs(costs_g, None, z, s, ec, ep, None)
        if fuse_combine:
            acc = outs[1]  # (acc_rows, _LANE)
            beta = acc[0, 0]
            if method == "random_sampling":
                win = acc[_WSUB:2 * _WSUB].reshape(-1)[:P]
                ext = acc[2 * _WSUB:3 * _WSUB].reshape(-1)[:24]
                return FusedIterationOutputs(costs, beta, win, ext, None, None)
            # mppi/cem: acc = [beta | Z | S | ...]; the softmax mean is S/Z and
            # the reported best cost is the global min beta (mppi_combine's
            # outputs). For cem the merged-elite sigma refit sits in the last
            # accumulator slot (packed sub_p rows).
            z_all = acc[_WSUB, 0]
            s_vec = acc[2 * _WSUB:3 * _WSUB].reshape(-1)[:P]
            sigma_out = None
            if want_cem:
                sg0 = 4 * _WSUB + slab_rows
                if use_col_slab:
                    sigma_out = acc[sg0:sg0 + P8, 0][:P]
                else:
                    sigma_out = acc[sg0:sg0 + _WSUB].reshape(-1)[:P]
            return FusedIterationOutputs(costs, beta, s_vec / z_all, None,
                                         None, None, sigma_out)
        winners = outs[1].reshape(GT, _WSUB * _LANE)[:, :P]
        z = s = ec = ep = ext = None
        k = 2
        if want_extract:
            ext = outs[k].reshape(GT, _WSUB, _LANE)[:, 0, :24]
            k += 1
        if want_mppi:
            z = outs[k].reshape(GT, _WSUB * _LANE)[:, 0]
            s = outs[k + 1].reshape(GT, _WSUB * _LANE)[:, :P]
            k += 2
        if want_cem:
            ec = outs[k].reshape(GT, _WSUB, _LANE)[:, 0, :K_elite]
            ep = outs[k + 1].reshape(GT, K_elite, _WSUB * _LANE)[:, :, :P]
        return IterationOutputs(costs, winners, z, s, ec, ep, ext)

    return PallasIterationFn(iteration, G * T, T, P, Ng, fuse_combine)


def mppi_combine(tile_cmins, tile_z, tile_s, temperature):
    """Exact global MPPI softmax update from per-tile partials.

    Each tile reports (cmin_t, Z_t = sum_i exp(-(c_i - cmin_t)/T),
    S_t = sum_i exp(-(c_i - cmin_t)/T) * params_i). With beta = min_t cmin_t the
    true weight of sample i is exp(-(cmin_t - beta)/T) * its in-tile weight, so the
    softmax-weighted parameter mean (reference centroidal_nmpc_jax.py:827-836 —
    incumbent + noise @ w == weighted mean of params) is recovered exactly.
    """
    beta = jnp.min(tile_cmins)
    scale = jnp.exp(-(tile_cmins - beta) / temperature)  # (GT,), <= 1
    num = jnp.sum(scale[:, None] * tile_s, axis=0)  # (P,)
    den = jnp.sum(scale * tile_z)
    return num / den, beta


def cem_sigma_update(tile_ecosts, tile_eparams, n_elite, sigma_min, sigma_max):
    """Exact global top-K elite sigma refit from per-tile elites.

    Each tile's K_elite best samples are a superset of its contribution to the
    global top-K, so selecting the K best among all tiles' elites equals selecting
    them among all samples. Parameter variance equals noise variance (shift by the
    incumbent), matching the reference refit (centroidal_nmpc_jax.py:1075-1081).
    """
    flat_c = tile_ecosts.reshape(-1)
    flat_p = tile_eparams.reshape(flat_c.shape[0], -1)
    idx = jax.lax.top_k(-flat_c, n_elite)[1]
    onehot = (idx[:, None] == jnp.arange(flat_c.shape[0])[None, :]).astype(jnp.float32)
    elite = onehot @ flat_p  # (K, P) gather-as-matmul (TPU-friendly)
    var = jnp.var(elite, axis=0, ddof=1) + 1e-8
    return jnp.clip(jnp.sqrt(var), sigma_min, sigma_max)


def _combine(outs: IterationOutputs, method: str, best_params, sigma, sp):
    """Global optimizer update from per-tile partials. Returns
    (new_params, best_cost, new_sigma, best_flat_tile)."""
    i_best = jnp.argmin(outs.costs)
    best_cost = outs.costs[i_best]
    if method == "random_sampling":
        onehot = (jnp.arange(outs.costs.shape[0]) == i_best).astype(jnp.float32)
        new_params = onehot @ outs.winners
        new_sigma = sigma
    else:
        new_params, best_cost = mppi_combine(outs.costs, outs.z, outs.s,
                                             sp.mppi_temperature)
        if method == "cem_mppi":
            new_sigma = cem_sigma_update(outs.ecosts, outs.eparams, sp.cem_elite,
                                         sp.cem_sigma_min, sp.cem_sigma_max)
        else:
            new_sigma = sigma
    return new_params, best_cost, new_sigma, i_best


def make_pallas_sampling_solver(cfg: Config, num_samples: int | None = None,
                                interpret: bool = False, method: str | None = None,
                                tile: int = TILE):
    """Full sampling-MPC solve around the fused kernel (all three methods).

    Same signature/outputs as controllers.sampling.make_sampling_solver: only the
    per-iteration heavy lifting (noise -> rollout -> optimizer partials) runs in
    the Pallas kernel; the cross-tile combine, warm-start reset, GRF extraction and
    the one-step prediction are a few scalar-sized XLA ops.
    """
    from ..controllers.sampling.rollout import ForceModelParams, apply_force_model_rows
    from ..controllers.sampling.sampling_mpc import SamplingState, SolveOutput
    from ..dynamics.srbd import integrate_euler

    sp = cfg.mpc.sampling
    method = method or sp.method
    # ALL methods chain their iterations INSIDE the kernel (one launch for all
    # of them): cem_mppi's elite-sigma refit merges per-tile top-Ks in the
    # sequential-grid accumulator, so no host round-trip is needed between
    # iterations.
    chain_iters = sp.num_iterations
    it = make_pallas_iteration(cfg, num_samples, interpret=interpret, method=method,
                               tile=tile, fuse_combine=True,
                               num_chained=chain_iters)
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

        n_stance = jnp.sum(contact_seq, axis=0)
        share = (srbd.mass * 9.81 / jnp.maximum(n_stance, 1.0)).astype(jnp.float32)
        Wg = jnp.asarray(W_big, jnp.float32)[None]  # (1, H*12, P)
        offs = jnp.zeros((1,), jnp.float32)

        # Single kernel call: ALL iterations chain inside the kernel grid
        # (num_chained) — no scan wrapper (a lax.scan lowers to a while loop
        # and blocks fusion, and each scan step would pay the full
        # kernel-invocation cost).
        seed, key = advance_seed(sstate.key)
        outs = it.fn(best_params, seed, state12, feet_eff.reshape(12), ref12,
                     contact_seq[None], share[None], Wg, offs, sstate.sigma)
        # The cross-tile combine already ran inside the kernel (fuse_combine):
        # the global winner / softmax mean, best cost, winner extraction — and
        # for cem_mppi the merged-elite sigma refit — come straight out of the
        # accumulator block.
        new_params, best_cost = outs.winner, outs.best_cost
        sigma = outs.sigma if method == "cem_mppi" else sstate.sigma
        last_tile_costs = outs.costs
        ext = outs.ext if outs.ext is not None else jnp.zeros(24, jnp.float32)

        if method == "random_sampling":
            # The new incumbent is a sample: its step-0 GRFs and one-step state
            # were extracted inside the kernel (identical math to the XLA
            # apply_force_model_rows + integrate_euler path, which costs ~0.5 ms
            # of tiny-op launch latency per solve).
            grfs = ext[:12].reshape(4, 3)
            predicted = ext[12:24]
        else:
            # MPPI/CEM incumbents are weighted means (not samples): recompute.
            raw0 = W_big[0:12] @ new_params
            rows = apply_force_model_rows(raw0, contact_seq[:, 0], share[0], fm)
            grfs = jnp.stack(rows).reshape(4, 3)
            predicted = integrate_euler(state12, feet_eff, grfs, contact_seq[:, 0],
                                        srbd, dts[0])

        out = SolveOutput(grfs=grfs, footholds=jnp.zeros((4, 3), jnp.float32),
                          predicted_state=predicted, best_parameters=new_params,
                          best_cost=best_cost, costs=last_tile_costs, sigma=sigma,
                          best_freq=jnp.asarray(cfg.gait_params.step_freq, jnp.float32))
        return out, SamplingState(new_params, key, sigma)

    return jax.jit(solve), P


def make_pallas_gait_adaptive_solver(cfg: Config, num_samples: int | None = None,
                                     interpret: bool = False, method: str | None = None,
                                     tile: int = TILE):
    """Gait-adaptive sampling MPC on the fused kernel.

    Mirrors controllers.sampling.gait_adaptive.make_gait_adaptive_solver: the
    sample batch is partitioned into one group per candidate step frequency; each
    group's contact sequence, stance-counter spline basis and frequency
    regularization (the per-group cost offset) are built in-trace and handed to the
    group-aware kernel, so all candidates run in one launch.
    """
    from ..controllers.sampling.gait_adaptive import (
        _timer_sequence,
        _traced_leg_basis,
    )
    from ..controllers.sampling.rollout import ForceModelParams, apply_force_model_rows
    from ..controllers.sampling.sampling_mpc import SamplingState, SolveOutput
    from ..dynamics.srbd import integrate_euler

    sp = cfg.mpc.sampling
    method = method or sp.method
    K = len(cfg.mpc.step_freq_available)
    # fuse_combine with a GROUP axis: each group's cross-tile reduction rides
    # its own resident accumulator block in-kernel; only the tiny cross-GROUP
    # combine (K elements) runs in XLA (_combine) — removing the per-tile
    # outputs + argmin/one-hot/log-sum-exp tail that kept gait-adaptive ~18%
    # slower than the single-group headline (VERDICT r4 ask #6).
    it = make_pallas_iteration(cfg, num_samples, interpret=interpret, method=method,
                               num_groups=K, tile=tile, fuse_combine=True)
    H = cfg.mpc.horizon
    S = sp.num_splines
    P = it.P
    P_leg = P // 4
    T = it.tiles_per_group
    duty = cfg.gait_params.duty_factor
    mpc_dt = cfg.mpc.dt
    srbd = make_params(cfg)
    dts = cfg.mpc.dts()
    fm = ForceModelParams(sp.max_force_x / sp.max_force_z, sp.max_force_y / sp.max_force_z,
                          cfg.mpc.grf_min, cfg.mpc.grf_max, cfg.mpc.mu)
    freq_avail = np.asarray(cfg.mpc.step_freq_available, np.float32)
    eye4 = np.eye(4, dtype=np.float32)

    def _group_operator(freq, phase):
        """(contact (4,H), share (H,), W (H*12, P)) for one candidate frequency."""
        seq = _timer_sequence(phase, freq, duty, mpc_dt, H)
        counters = jnp.cumsum(seq, axis=1) - 1.0
        horizon_legs = jnp.sum(seq, axis=1) + 1.0
        Wleg = _traced_leg_basis(sp.parametrization, counters, horizon_legs, H, S,
                                 P_leg)  # (4, H, 3, P_leg)
        # Step-major block-diagonal embed: W[n*12 + leg*3 + a, leg*P_leg + p].
        W = (Wleg.transpose(1, 0, 2, 3)[:, :, :, None, :]
             * eye4[None, :, None, :, None]).reshape(H * 12, 4 * P_leg)
        share = srbd.mass * 9.81 / jnp.maximum(jnp.sum(seq, axis=0), 1.0)
        return seq, share, W

    def solve(state12, feet, ref12, ref_feet, phase, nominal_freq, optimize_swing,
              contact_seq0, current_contact, previous_contact, sstate: SamplingState):
        best_params = sstate.best_parameters
        liftoff_edge = (previous_contact == 1.0) & (current_contact == 0.0)
        best_params = best_params * jnp.repeat(~liftoff_edge, P_leg).astype(jnp.float32)
        feet_eff = jnp.where(current_contact[:, None] == 0.0, ref_feet, feet)

        # Candidate frequencies (reference gait_adaptive :688-692).
        freqs = jnp.where(optimize_swing, freq_avail, jnp.full((K,), 1.0) * nominal_freq)
        seqs, shares, Ws = jax.vmap(_group_operator, in_axes=(0, None))(freqs, phase)
        offs = (freqs - 1.3) ** 2 * 100.0  # frequency regularization (reference :500)

        seed, key = advance_seed(sstate.key)
        outs = it.fn(best_params, seed, state12, feet_eff.reshape(12), ref12,
                     seqs, shares, Ws, offs, sstate.sigma)
        new_params, best_cost, new_sigma, i_best = _combine(outs, method, best_params,
                                                            sstate.sigma, sp)
        # Fused: _combine ran over per-GROUP partials, so i_best IS the group.
        best_freq = freqs[i_best if it.fused else i_best // T]

        # First-step GRF under the CURRENT contact state (reference :705-760).
        leg_params = new_params.reshape(4, P_leg)
        w0 = _traced_leg_basis(sp.parametrization, jnp.zeros((4, 1)), jnp.ones((4,)),
                               H, S, P_leg)[:, 0]  # (4, 3, P_leg)
        raw0 = jnp.einsum("lap,lp->la", w0, leg_params).reshape(12)
        share0 = srbd.mass * 9.81 / jnp.maximum(jnp.sum(contact_seq0[:, 0]), 1.0)
        rows = apply_force_model_rows(raw0, contact_seq0[:, 0], share0, fm)
        grfs = jnp.stack(rows).reshape(4, 3)
        predicted = integrate_euler(state12, feet_eff, grfs, contact_seq0[:, 0],
                                    srbd, dts[0])

        out = SolveOutput(grfs=grfs, footholds=jnp.zeros((4, 3), jnp.float32),
                          predicted_state=predicted, best_parameters=new_params,
                          best_cost=best_cost, costs=outs.costs, sigma=new_sigma,
                          best_freq=best_freq)
        return out, SamplingState(new_params, key, new_sigma)

    return jax.jit(solve), P
