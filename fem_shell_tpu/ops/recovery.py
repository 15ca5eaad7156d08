"""Stress/strain recovery and von Mises fields.

Post-processing from the displacement solution: per-element membrane
strains/stresses, bending moments/curvatures, surface stresses and von
Mises — quantities the thesis derives from the same B-matrices used in
assembly (reference doc/shellelements.tex; the reference executable
itself only writes displacements, fem-shell.cpp:1240-1251 — recovery is
an extension the validation study performed offline).

Evaluation point: the element center (centroid l1=l2=1/3 for Specht
triangles, xi=eta=0 for DKQ quads) — the optimal (superconvergent)
stress point for these low-order elements.

Conventions:
- membrane stress sigma_m = Dm @ eps           [force/area]
- bending moments    M    = Dp @ kappa         [force]
- surface bending stress  sigma_b = 6 M / t^2  (z = +-t/2)
- von Mises on each surface from sigma_m +- sigma_b; `vm` is the
  pointwise max of the two surfaces.

All functions are jit/vmap-composable; the per-element chain reuses the
assembly kernels' frames and B-matrices (ops/elements.py) so recovered
fields are consistent with the assembled operator.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fem_shell_tpu.materials import Material
from fem_shell_tpu.ops.elements import (
    _eval_b_quad,
    _eval_b_tri,
    _quad_frame,
    _quad_shape_derivs,
    _tri_frame,
)


@dataclasses.dataclass
class StressField:
    """Per-element center recovery (concatenated tri-then-quad order).

    sigma_m [E,3]  membrane stress (sx, sy, txy), local frame
    moments [E,3]  bending moments (Mx, My, Mxy)
    vm_top/vm_bot [E]  surface von Mises
    vm [E]         max(vm_top, vm_bot)
    """

    sigma_m: np.ndarray
    moments: np.ndarray
    vm_top: np.ndarray
    vm_bot: np.ndarray

    @property
    def vm(self) -> np.ndarray:
        return np.maximum(self.vm_top, self.vm_bot)


def _von_mises(sig):
    sx, sy, txy = sig[..., 0], sig[..., 1], sig[..., 2]
    return jnp.sqrt(jnp.maximum(sx * sx - sx * sy + sy * sy + 3.0 * txy * txy, 0.0))


def _local_dofs(trafo, u_elem):
    """Rotate nodal dofs into the element frame. u_elem [m, 6] ->
    (membrane [2m] interleaved (u_i, v_i), plate [3m] (w_i, tx_i, ty_i))."""
    disp = u_elem[:, :3] @ trafo.T  # rows = local (u, v, w)
    rot = u_elem[:, 3:] @ trafo.T  # local (tx, ty, tz)
    mem = jnp.stack([disp[:, 0], disp[:, 1]], axis=1).reshape(-1)
    plate = jnp.stack([disp[:, 2], rot[:, 0], rot[:, 1]], axis=1).reshape(-1)
    return mem, plate


def _tri_recover(xyz, u_elem, dm, dp, thickness):
    trafo, dphi, area = _tri_frame(xyz)
    mem, plate = _local_dofs(trafo, u_elem)

    x12, y12 = dphi[0, 0], dphi[0, 1]
    x31, y31 = dphi[1, 0], dphi[1, 1]
    x23, y23 = dphi[2, 0], dphi[2, 1]
    z = jnp.zeros((), dphi.dtype)
    b_m = jnp.array(
        [
            [y23, z, y31, z, y12, z],
            [z, -x23, z, -x31, z, -x12],
            [-x23, y23, -x31, y31, -x12, y12],
        ]
    ) / (2.0 * area)  # CST B, fem-shell.cpp:445-468
    eps = b_m @ mem
    sigma_m = dm @ eps

    side_sq = jnp.array(
        [x12**2 + y12**2, x31**2 + y31**2, x23**2 + y23**2]
    )
    y_mat = jnp.array(
        [
            [dphi[2, 1] ** 2, dphi[1, 1] ** 2, dphi[2, 1] * dphi[1, 1]],
            [dphi[2, 0] ** 2, dphi[1, 0] ** 2, dphi[1, 0] * dphi[2, 0]],
            [
                -2.0 * dphi[2, 0] * dphi[2, 1],
                -2.0 * dphi[1, 0] * dphi[1, 0],  # Y[2,1] quirk, fem-shell.cpp:586
                -dphi[2, 0] * dphi[1, 1] - dphi[1, 0] * dphi[2, 1],
            ],
        ]
    ) / (4.0 * area**2)
    third = jnp.asarray(1.0 / 3.0, dphi.dtype)
    kappa = (y_mat @ _eval_b_tri(side_sq, third, third, dphi)) @ plate
    moments = dp @ kappa
    return sigma_m, moments


def _quad_recover(xyz, u_elem, dm, dp, thickness):
    trafo, local_xy, dphi = _quad_frame(xyz)
    mem, plate = _local_dofs(trafo, u_elem)
    lx, ly = local_xy[0], local_xy[1]

    zero = jnp.zeros((), dphi.dtype)
    dhdr, dhds = _quad_shape_derivs(zero, zero)
    j00 = jnp.dot(dhdr, lx)
    j01 = jnp.dot(dhdr, ly)
    j10 = jnp.dot(dhds, lx)
    j11 = jnp.dot(dhds, ly)
    det = j00 * j11 - j01 * j10
    b3x4 = jnp.array(
        [
            [j11, -j01, zero, zero],
            [zero, zero, -j10, j00],
            [-j10, j00, j11, -j01],
        ]
    ) / det
    g = jnp.zeros((4, 8), dhdr.dtype)
    g = g.at[0, 0::2].set(dhdr)
    g = g.at[1, 0::2].set(dhds)
    g = g.at[2, 1::2].set(dhdr)
    g = g.at[3, 1::2].set(dhds)
    eps = (b3x4 @ g) @ mem
    sigma_m = dm @ eps

    side_sq = jnp.sum(dphi**2, axis=1)
    h = jnp.stack(
        [
            -dphi[:, 0] / side_sq,
            0.75 * dphi[:, 0] * dphi[:, 1] / side_sq,
            (0.25 * dphi[:, 0] ** 2 - 0.5 * dphi[:, 1] ** 2) / side_sq,
            -dphi[:, 1] / side_sq,
            (0.25 * dphi[:, 1] ** 2 - 0.5 * dphi[:, 0] ** 2) / side_sq,
        ]
    )  # DKQ Hcoeffs, fem-shell.cpp:613-621
    # Jacobian of the DKQ parametrization at the center (r = s = 0)
    j00 = 0.25 * (-dphi[0, 0] + dphi[2, 0])
    j01 = 0.25 * (-dphi[0, 1] + dphi[2, 1])
    j10 = 0.25 * (-dphi[1, 0] + dphi[3, 0])
    j11 = 0.25 * (-dphi[1, 1] + dphi[3, 1])
    det = j00 * j11 - j01 * j10
    jinv = jnp.array([[j11, -j01], [-j10, j00]]) / det
    kappa = _eval_b_quad(h, zero, zero, jinv) @ plate
    moments = dp @ kappa
    return sigma_m, moments


def recover_stresses(mesh, material: Material, u, dtype=jnp.float64) -> StressField:
    """Element-center stress recovery for the whole mesh.

    ``u`` [N, 6] nodal displacements (global frame). Elements are
    reported tri-first then quad, matching ``mesh.tri`` / ``mesh.quad``
    row order."""
    dm, dp = material.matrices()
    dm = jnp.asarray(dm, dtype)
    dp = jnp.asarray(dp, dtype)
    coords = jnp.asarray(mesh.coords, dtype)
    u = jnp.asarray(u, dtype)
    t = material.thickness

    outs = []
    for conn, fn in ((mesh.tri, _tri_recover), (mesh.quad, _quad_recover)):
        if len(conn) == 0:
            continue
        c = jnp.asarray(conn)

        def one(e, fn=fn, c=c):
            return fn(coords[c[e]], u[c[e]], dm, dp, t)

        sig, mom = jax.vmap(one)(jnp.arange(len(conn)))
        outs.append((sig, mom))
    sigma_m = jnp.concatenate([o[0] for o in outs])
    moments = jnp.concatenate([o[1] for o in outs])

    sigma_b = 6.0 * moments / (t * t)
    vm_top = _von_mises(sigma_m + sigma_b)
    vm_bot = _von_mises(sigma_m - sigma_b)
    return StressField(
        sigma_m=np.asarray(sigma_m),
        moments=np.asarray(moments),
        vm_top=np.asarray(vm_top),
        vm_bot=np.asarray(vm_bot),
    )


# ----------------------------------------------------------------------
# Gauss-point recovery + extrapolated nodal fields
# ----------------------------------------------------------------------
# The assembly quadrature points (ops/elements.py: _TRI_QPS interior
# points for Specht, 2x2 Gauss for DKQ/membrane) are the element's
# optimal sampling points; nodal fields are recovered by evaluating
# stress there and extrapolating the qp values to the element corners
# with the inverse of the (bi)linear map qp -> corners, then averaging
# contributions across elements sharing each node (the classical
# Hinton-Campbell local projection; the reference validation study
# performed the same projection offline, doc/validation.tex).

_TRI_QPS_R = np.array([[1 / 6, 1 / 6], [2 / 3, 1 / 6], [1 / 6, 2 / 3]])
# corners in (l1, l2): node1 = (1,0), node2 = (0,1), node3 = (0,0)
_TRI_CORNERS_R = np.array([[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]])
# linear extrapolation: value(l) = [1, l1, l2] @ coeff, coeff from qps
_TRI_EXTRAP = np.hstack([np.ones((3, 1)), _TRI_CORNERS_R]) @ np.linalg.inv(
    np.hstack([np.ones((3, 1)), _TRI_QPS_R])
)

# quad corners (r,s) in connectivity order (see _quad_shape_derivs):
# node1 (-1,-1), node2 (1,-1), node3 (1,1), node4 (-1,1); Gauss points
# at signs _QUAD_QPS = ((+,+),(+,-),(-,+),(-,-)) scaled by 1/sqrt(3).
_QUAD_CORNER_SIGNS = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], np.float64)
_QUAD_QP_SIGNS = np.array([[1, 1], [1, -1], [-1, 1], [-1, -1]], np.float64)
_QUAD_EXTRAP = 0.25 * (
    (1.0 + math.sqrt(3.0) * np.outer(_QUAD_CORNER_SIGNS[:, 0], _QUAD_QP_SIGNS[:, 0]))
    * (1.0 + math.sqrt(3.0) * np.outer(_QUAD_CORNER_SIGNS[:, 1], _QUAD_QP_SIGNS[:, 1]))
)


def _tri_recover_qp(xyz, u_elem, dm, dp, thickness):
    """Per-quadrature-point recovery for one Specht/CST triangle.

    Returns (sigma_m [3,3], moments [3,3]) at the three interior
    quadrature points (CST membrane strain is constant; it is replicated
    per qp so tri/quad downstream handling is uniform)."""
    trafo, dphi, area = _tri_frame(xyz)
    mem, plate = _local_dofs(trafo, u_elem)

    x12, y12 = dphi[0, 0], dphi[0, 1]
    x31, y31 = dphi[1, 0], dphi[1, 1]
    x23, y23 = dphi[2, 0], dphi[2, 1]
    z = jnp.zeros((), dphi.dtype)
    b_m = jnp.array(
        [
            [y23, z, y31, z, y12, z],
            [z, -x23, z, -x31, z, -x12],
            [-x23, y23, -x31, y31, -x12, y12],
        ]
    ) / (2.0 * area)
    sigma_m = jnp.broadcast_to(dm @ (b_m @ mem), (3, 3))

    side_sq = jnp.array(
        [x12**2 + y12**2, x31**2 + y31**2, x23**2 + y23**2]
    )
    y_mat = jnp.array(
        [
            [dphi[2, 1] ** 2, dphi[1, 1] ** 2, dphi[2, 1] * dphi[1, 1]],
            [dphi[2, 0] ** 2, dphi[1, 0] ** 2, dphi[1, 0] * dphi[2, 0]],
            [
                -2.0 * dphi[2, 0] * dphi[2, 1],
                -2.0 * dphi[1, 0] * dphi[1, 0],  # Y[2,1] quirk, fem-shell.cpp:586
                -dphi[2, 0] * dphi[1, 1] - dphi[1, 0] * dphi[2, 1],
            ],
        ]
    ) / (4.0 * area**2)

    def one_qp(lq):
        kappa = (y_mat @ _eval_b_tri(side_sq, lq[0], lq[1], dphi)) @ plate
        return dp @ kappa

    moments = jax.vmap(one_qp)(jnp.asarray(_TRI_QPS_R, dphi.dtype))
    return sigma_m, moments


def _quad_recover_qp(xyz, u_elem, dm, dp, thickness):
    """Per-Gauss-point recovery for one DKQ/bilinear quad.

    Returns (sigma_m [4,3], moments [4,3]) at the 2x2 Gauss points in
    _QUAD_QPS order."""
    from fem_shell_tpu.ops.elements import _GAUSS_ROOT, _QUAD_QPS

    trafo, local_xy, dphi = _quad_frame(xyz)
    mem, plate = _local_dofs(trafo, u_elem)
    lx, ly = local_xy[0], local_xy[1]

    side_sq = jnp.sum(dphi**2, axis=1)
    h = jnp.stack(
        [
            -dphi[:, 0] / side_sq,
            0.75 * dphi[:, 0] * dphi[:, 1] / side_sq,
            (0.25 * dphi[:, 0] ** 2 - 0.5 * dphi[:, 1] ** 2) / side_sq,
            -dphi[:, 1] / side_sq,
            (0.25 * dphi[:, 1] ** 2 - 0.5 * dphi[:, 0] ** 2) / side_sq,
        ]
    )

    def one_qp(rs):
        r = rs[0] * _GAUSS_ROOT
        s = rs[1] * _GAUSS_ROOT
        # membrane: bilinear isoparametric B at (r, s)
        dhdr, dhds = _quad_shape_derivs(r, s)
        j00 = jnp.dot(dhdr, lx)
        j01 = jnp.dot(dhdr, ly)
        j10 = jnp.dot(dhds, lx)
        j11 = jnp.dot(dhds, ly)
        det = j00 * j11 - j01 * j10
        zero = jnp.zeros((), det.dtype)
        b3x4 = jnp.array(
            [
                [j11, -j01, zero, zero],
                [zero, zero, -j10, j00],
                [-j10, j00, j11, -j01],
            ]
        ) / det
        g = jnp.zeros((4, 8), dhdr.dtype)
        g = g.at[0, 0::2].set(dhdr)
        g = g.at[1, 0::2].set(dhds)
        g = g.at[2, 1::2].set(dhdr)
        g = g.at[3, 1::2].set(dhds)
        sig = dm @ ((b3x4 @ g) @ mem)
        # plate: DKQ Jacobian at (r, s) (same expressions as _quad_plate)
        pj00 = 0.25 * ((dphi[0, 0] + dphi[2, 0]) * s - dphi[0, 0] + dphi[2, 0])
        pj01 = 0.25 * ((dphi[0, 1] + dphi[2, 1]) * s - dphi[0, 1] + dphi[2, 1])
        pj10 = 0.25 * ((dphi[0, 0] + dphi[2, 0]) * r - dphi[1, 0] + dphi[3, 0])
        pj11 = 0.25 * ((dphi[0, 1] + dphi[2, 1]) * r - dphi[1, 1] + dphi[3, 1])
        pdet = pj00 * pj11 - pj01 * pj10
        jinv = jnp.array([[pj11, -pj01], [-pj10, pj00]]) / pdet
        kappa = _eval_b_quad(h, r, s, jinv) @ plate
        return sig, dp @ kappa

    qps = jnp.asarray(np.array(_QUAD_QPS), dphi.dtype)
    sigma_m, moments = jax.vmap(one_qp)(qps)
    return sigma_m, moments


@dataclasses.dataclass
class NodalStressField:
    """Extrapolated nodal recovery (local element frames averaged per
    node — exact for coplanar meshes, the usual caveat for folded
    shells).

    sigma_m [N,3]  membrane stress, moments [N,3] bending moments,
    vm_top/vm_bot/vm [N]  surface von Mises from the nodal components.
    """

    sigma_m: np.ndarray
    moments: np.ndarray
    vm_top: np.ndarray
    vm_bot: np.ndarray

    @property
    def vm(self) -> np.ndarray:
        return np.maximum(self.vm_top, self.vm_bot)


def recover_stresses_nodal(mesh, material: Material, u, dtype=jnp.float64):
    """Gauss-point stress recovery extrapolated to nodes.

    Evaluates membrane stress and bending moments at each element's
    assembly quadrature points, extrapolates them to the element's
    corner nodes ((bi)linear inverse map), and averages over all
    elements sharing the node. Superconvergent-sampling projection: one
    order more accurate at nodes than evaluating the element fields
    there directly."""
    dm, dp = material.matrices()
    dm = jnp.asarray(dm, dtype)
    dp = jnp.asarray(dp, dtype)
    coords = jnp.asarray(mesh.coords, dtype)
    u = jnp.asarray(u, dtype)
    t = material.thickness

    acc = np.zeros((mesh.n_nodes, 6), np.float64)  # sigma(3) + moments(3)
    cnt = np.zeros(mesh.n_nodes, np.float64)
    for conn, fn, extrap in (
        (mesh.tri, _tri_recover_qp, _TRI_EXTRAP),
        (mesh.quad, _quad_recover_qp, _QUAD_EXTRAP),
    ):
        if len(conn) == 0:
            continue
        c = jnp.asarray(conn)

        def one(e, fn=fn, c=c):
            return fn(coords[c[e]], u[c[e]], dm, dp, t)

        sig_qp, mom_qp = jax.vmap(one)(jnp.arange(len(conn)))  # [E,Q,3]
        ex = jnp.asarray(extrap, dtype)
        sig_n = jnp.einsum("cq,eqk->eck", ex, sig_qp)  # [E,corners,3]
        mom_n = jnp.einsum("cq,eqk->eck", ex, mom_qp)
        vals = np.asarray(jnp.concatenate([sig_n, mom_n], axis=-1), np.float64)
        idx = np.asarray(conn).ravel()
        np.add.at(acc, idx, vals.reshape(-1, 6))
        np.add.at(cnt, idx, 1.0)

    acc /= np.maximum(cnt, 1.0)[:, None]
    sigma_m, moments = acc[:, :3], acc[:, 3:]
    sigma_b = 6.0 * moments / (t * t)
    vm_top = np.asarray(_von_mises(jnp.asarray(sigma_m + sigma_b)))
    vm_bot = np.asarray(_von_mises(jnp.asarray(sigma_m - sigma_b)))
    return NodalStressField(
        sigma_m=sigma_m, moments=moments, vm_top=vm_top, vm_bot=vm_bot
    )


def nodal_average(mesh, elem_field: np.ndarray) -> np.ndarray:
    """Average a per-element field to nodes (tri-then-quad element
    order), for point-data export."""
    acc = np.zeros(mesh.n_nodes, np.float64)
    cnt = np.zeros(mesh.n_nodes, np.float64)
    e0 = 0
    for conn in (mesh.tri, mesh.quad):
        if len(conn) == 0:
            continue
        vals = np.asarray(elem_field[e0 : e0 + len(conn)], np.float64)
        np.add.at(acc, np.asarray(conn).ravel(), np.repeat(vals, conn.shape[1]))
        np.add.at(cnt, np.asarray(conn).ravel(), 1.0)
        e0 += len(conn)
    return acc / np.maximum(cnt, 1.0)


def to_mesh_order(mesh, elem_field: np.ndarray) -> np.ndarray:
    """Reorder a tri-then-quad per-element field into the mesh's element
    order (what VTU cell data expects)."""
    from fem_shell_tpu.mesh import XDA_TRI3

    elem_field = np.asarray(elem_field)
    out = np.empty(mesh.n_elems, dtype=elem_field.dtype) if elem_field.ndim == 1 else np.empty(
        (mesh.n_elems,) + elem_field.shape[1:], dtype=elem_field.dtype
    )
    tri_idx = np.where(mesh.elem_types == XDA_TRI3)[0]
    quad_idx = np.where(mesh.elem_types != XDA_TRI3)[0]
    out[tri_idx] = elem_field[: len(tri_idx)]
    out[quad_idx] = elem_field[len(tri_idx) :]
    return out
