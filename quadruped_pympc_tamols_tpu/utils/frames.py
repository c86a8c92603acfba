"""Frame/rotation utilities shared by every layer.

All functions are pure jnp and batch-friendly (leading batch dims broadcast).
Conventions follow the reference: euler angles are intrinsic xyz (roll, pitch, yaw);
the "horizontal frame" is the world frame yawed to the base heading
(reference foothold_reference_generator.py:87-90).
"""
from __future__ import annotations

import jax.numpy as jnp


def yaw_rot2(yaw):
    """(.., 2, 2) world->horizontal rotation R_W2H (reference frg:88-90)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack([jnp.stack([c, s], -1), jnp.stack([-s, c], -1)], -2)


def yaw_rot3(yaw):
    """(.., 3, 3) world->horizontal rotation about z."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, s, z], -1),
            jnp.stack([-s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        -2,
    )


def euler_xyz_to_rot(rpy):
    """Body->world rotation matrix from intrinsic xyz euler angles.

    Matches scipy's ``Rotation.from_euler('xyz', rpy).as_matrix()`` used by the
    reference (wb_interface.py:262, foothold_reference_generator.py:141).
    """
    roll, pitch, yaw = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    # R = Rz(yaw) @ Ry(pitch) @ Rx(roll)
    r00 = cy * cp
    r01 = cy * sp * sr - sy * cr
    r02 = cy * sp * cr + sy * sr
    r10 = sy * cp
    r11 = sy * sp * sr + cy * cr
    r12 = sy * sp * cr - cy * sr
    r20 = -sp
    r21 = cp * sr
    r22 = cp * cr
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], -1),
            jnp.stack([r10, r11, r12], -1),
            jnp.stack([r20, r21, r22], -1),
        ],
        -2,
    )


def world_to_body_rot(rpy):
    """World->body rotation b_R_w (ZYX composition), as used inside the SRB torque
    dynamics (reference centroidal_model_jax.py:141-155)."""
    return jnp.swapaxes(euler_xyz_to_rot(rpy), -1, -2)


def skew(v):
    """(.., 3) -> (.., 3, 3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], -1),
            jnp.stack([z, o, -x], -1),
            jnp.stack([-y, x, o], -1),
        ],
        -2,
    )


def conj_euler_rates_inv(roll, pitch):
    """Inverse of the euler-rate conjugation matrix E where omega = E @ rpy_dot.

    The reference builds E (centroidal_model_jax.py:124-129) and inverts it with a
    closed-form 3x3 inverse. We use the known analytic inverse directly:
        rpy_dot = Einv @ omega,
    with Einv = [[1, sin(r)tan(p), cos(r)tan(p)],
                 [0, cos(r),       -sin(r)     ],
                 [0, sin(r)/cos(p), cos(r)/cos(p)]].
    """
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp = jnp.cos(pitch)
    tp = jnp.tan(pitch)
    o = jnp.ones_like(roll)
    z = jnp.zeros_like(roll)
    return jnp.stack(
        [
            jnp.stack([o, sr * tp, cr * tp], -1),
            jnp.stack([z, cr, -sr], -1),
            jnp.stack([z, sr / cp, cr / cp], -1),
        ],
        -2,
    )


def inv3(A):
    """Closed-form 3x3 inverse (batched); avoids LU dispatch for tiny matrices
    (reference centroidal_model_jax.py:67-91 uses the same trick)."""
    a = A[..., 0, 0]; b = A[..., 0, 1]; c = A[..., 0, 2]
    d = A[..., 1, 0]; e = A[..., 1, 1]; f = A[..., 1, 2]
    g = A[..., 2, 0]; h = A[..., 2, 1]; i = A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    cof = jnp.stack(
        [
            jnp.stack([A11, A12, A13], -1),
            jnp.stack([A21, A22, A23], -1),
            jnp.stack([A31, A32, A33], -1),
        ],
        -2,
    )
    return cof / det[..., None, None]


# -- numpy twins for per-tick host code ---------------------------------------
# Eager jnp math on the host dispatches one device op per primitive; the stateful
# per-tick layers (foothold reference, terrain estimator) use these instead so the
# only device traffic per control step is the fused kernels' calls.

def euler_xyz_to_rot_np(rpy):
    """numpy twin of euler_xyz_to_rot (scipy 'xyz' convention)."""
    import numpy as np

    roll, pitch, yaw = float(rpy[0]), float(rpy[1]), float(rpy[2])
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    return np.array([
        [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
        [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
        [-sp, cp * sr, cp * cr],
    ])


def yaw_rot3_np(yaw):
    """numpy twin of yaw_rot3 (world->horizontal)."""
    import numpy as np

    c, s = np.cos(float(yaw)), np.sin(float(yaw))
    return np.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])
