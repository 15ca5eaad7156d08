"""Flat-shell element stiffness kernels (Tri-3 and Quad-4), pure JAX.

Each shell element is the superposition of a membrane element and a plate
bending element plus a stabilized drilling DOF, evaluated in a local frame
and congruence-transformed back to global axes. The math reproduces the
reference implementation bit-for-bit in exact arithmetic:

- local frame + edge-difference table: fem-shell.cpp:306-433 (initElement)
- Tri-3 membrane (CST):               fem-shell.cpp:445-468 (calcPlane)
- Quad-4 membrane (bilinear, 2x2 GQ): fem-shell.cpp:469-541
- Tri-3 plate (Specht 1988 basis):    fem-shell.cpp:555-603, 698-891
- Quad-4 plate (DKQ, Batoz 1982):     fem-shell.cpp:604-688, 901-990
- superposition + drilling DOF:       fem-shell.cpp:999-1053
- local->global congruence:           fem-shell.cpp:1061-1102

Design notes (TPU):
- Element DOF layout here is *node-major*: [u,v,w,tx,ty,tz] per node, i.e.
  the natural layout for a 6-dof block-sparse operator. The reference
  permutes to libMesh's variable-major order (fem-shell.cpp:1104-1109);
  we never need that permutation because we own the DOF numbering
  (dof = 6*node + var).
- Everything is shape-static and vmap-friendly; `batched_*_stiffness`
  vmaps over the element axis so XLA fuses the whole kernel chain into one
  element-parallel program (the analog of the per-element assembly loop at
  fem-shell.cpp:1200-1221, minus the serialization).
- Known reference quirk preserved on purpose: the Specht auxiliary matrix
  entry Y(2,1) uses x31*x31 (fem-shell.cpp:586); golden values depend on it.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# ----------------------------------------------------------------------
# Quadrature constants
# ----------------------------------------------------------------------

# 2x2 Gauss points at +-sqrt(1/3), w = 1 — a host-side float (not jnp) so
# importing this module never initializes a JAX backend; the literal
# matches the C++ `sqrt(1.0/3.0)` (fem-shell.cpp:472) bit-for-bit.
_GAUSS_ROOT = math.sqrt(1.0 / 3.0)
# Reference loops ii,jj over pow(-1,ii)*root: (+,+), (+,-), (-,+), (-,-)
_QUAD_QPS = ((1.0, 1.0), (1.0, -1.0), (-1.0, 1.0), (-1.0, -1.0))
# Specht plate interior points, weight 1/6 (fem-shell.cpp:557-562)
_TRI_QPS = ((1.0 / 6.0, 1.0 / 6.0), (2.0 / 3.0, 1.0 / 6.0), (1.0 / 6.0, 2.0 / 3.0))


# ----------------------------------------------------------------------
# Local frames (initElement)
# ----------------------------------------------------------------------


def _tri_frame(xyz):
    """Local frame, local node coords, edge table and area for a TRI3.

    Returns (trafo [3,3], dphi [3,2], area). dphi rows hold the local
    edge differences ((x12,y12),(x31,y31),(x23,y23)); fem-shell.cpp:403-411.
    """
    a, b, c = xyz[0], xyz[1], xyz[2]
    u_vec = b - a
    v_vec = c - a
    w_vec = jnp.cross(u_vec, v_vec)
    area = 0.5 * jnp.linalg.norm(w_vec)
    e_x = u_vec / jnp.linalg.norm(u_vec)
    e_z = w_vec / jnp.linalg.norm(w_vec)
    e_y = jnp.cross(e_z, e_x)
    trafo = jnp.stack([e_x, e_y, e_z])  # rows are local axes
    lb = trafo @ u_vec  # local coords of node B (A at origin)
    lc = trafo @ v_vec  # local coords of node C
    dphi = jnp.array(
        [
            [-lb[0], -lb[1]],  # x12, y12  (y12 == 0 exactly)
            [lc[0], lc[1]],  # x31, y31
            [lb[0] - lc[0], lb[1] - lc[1]],  # x23, y23
        ]
    )
    return trafo, dphi, area


def _quad_frame(xyz):
    """Local frame and local node coords for a QUAD4 (fem-shell.cpp:342-432).

    Returns (trafo [3,3], local_xy [2,4], dphi [4,2]).
    """
    a, b, c, d = xyz[0], xyz[1], xyz[2], xyz[3]
    mid_ab = a + 0.5 * (b - a)
    mid_bc = b + 0.5 * (c - b)
    mid_cd = c + 0.5 * (d - c)
    mid_da = d + 0.5 * (a - d)
    e_x = mid_bc - mid_da
    e_x = e_x / jnp.linalg.norm(e_x)
    v_r = mid_cd - mid_ab
    e_z = jnp.cross(e_x, v_r)
    e_z = e_z / jnp.linalg.norm(e_z)
    e_y = jnp.cross(e_z, e_x)
    trafo = jnp.stack([e_x, e_y, e_z])
    local = trafo @ jnp.stack([a, b, c, d], axis=1)  # [3,4]
    lx, ly = local[0], local[1]
    dphi = jnp.stack(
        [
            jnp.array([lx[0] - lx[1], ly[0] - ly[1]]),  # x12, y12
            jnp.array([lx[1] - lx[2], ly[1] - ly[2]]),  # x23, y23
            jnp.array([lx[2] - lx[3], ly[2] - ly[3]]),  # x34, y34
            jnp.array([lx[3] - lx[0], ly[3] - ly[0]]),  # x41, y41
        ]
    )
    return trafo, local[:2], dphi


# ----------------------------------------------------------------------
# Membrane kernels (calcPlane)
# ----------------------------------------------------------------------


def _tri_membrane(dphi, area, dm, thickness):
    """CST membrane, 6x6 over (u1,v1,u2,v2,u3,v3); fem-shell.cpp:445-468."""
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
    return thickness * area * (b_m.T @ dm @ b_m)


def _quad_shape_derivs(r, s):
    """Bilinear shape-function derivatives wrt (r,s); fem-shell.cpp:494-502."""
    dhdr = jnp.array(
        [-0.25 * (1 - s), 0.25 * (1 - s), 0.25 * (1 + s), -0.25 * (1 + s)]
    )
    dhds = jnp.array(
        [-0.25 * (1 - r), -0.25 * (1 + r), 0.25 * (1 + r), 0.25 * (1 - r)]
    )
    return dhdr, dhds


def _quad_membrane(local_xy, dm, thickness):
    """Bilinear isoparametric membrane, 8x8 interleaved (u_i, v_i);
    2x2 Gauss loop of fem-shell.cpp:469-541."""
    lx, ly = local_xy[0], local_xy[1]

    def qp_contrib(rs):
        r, s = rs
        r = r * _GAUSS_ROOT
        s = s * _GAUSS_ROOT
        dhdr, dhds = _quad_shape_derivs(r, s)
        j00 = jnp.dot(dhdr, lx)
        j01 = jnp.dot(dhdr, ly)
        j10 = jnp.dot(dhds, lx)
        j11 = jnp.dot(dhds, ly)
        det = j00 * j11 - j01 * j10
        z = jnp.zeros((), det.dtype)
        b3x4 = jnp.array(
            [
                [j11, -j01, z, z],
                [z, z, -j10, j00],
                [-j10, j00, j11, -j01],
            ]
        ) / det
        g = jnp.zeros((4, 8), dhdr.dtype)
        g = g.at[0, 0::2].set(dhdr)
        g = g.at[1, 0::2].set(dhds)
        g = g.at[2, 1::2].set(dhdr)
        g = g.at[3, 1::2].set(dhds)
        b_m = b3x4 @ g
        return det * thickness * (b_m.T @ dm @ b_m)

    qps = jnp.array(_QUAD_QPS, local_xy.dtype)
    return jnp.sum(jax.vmap(qp_contrib)(qps), axis=0)


# ----------------------------------------------------------------------
# Tri-3 plate kernel (Specht element; calcPlate TRI3 branch + evalBTri)
# ----------------------------------------------------------------------


def _eval_b_tri(side_sq, l1, l2, dphi):
    """Second-derivative strain matrix B [3,9] of the 9-dof Specht triangle
    at area coordinates (l1, l2); literal behavioral port of
    fem-shell.cpp:698-891 (expressions re-derived from the thesis basis
    doc/shellelements.tex:1014-1031, matching the code's algebra)."""
    mu1 = (side_sq[0] - side_sq[1]) / side_sq[2]
    mu2 = (side_sq[2] - side_sq[0]) / side_sq[1]
    mu3 = (side_sq[1] - side_sq[2]) / side_sq[0]

    l3 = 1.0 - l1 - l2
    f13mu1 = 1 + 3 * mu1
    f13mu2 = 1 + 3 * mu2
    f13mu3 = 1 + 3 * mu3
    f1m3mu3 = 1 - 3 * mu3
    fm13mu2 = -1 + 3 * mu2
    fm1m3mu3 = -1 - 3 * mu3
    f1mmu1 = 1 - mu1
    f1mmu2 = 1 - mu2
    f1mmu3 = 1 - mu3

    a = 3 * f1mmu3 * l1 - f13mu3 * l2 + f13mu3 * l3
    b = 3 * f1mmu2 * l3 - f13mu2 * l1 + f13mu2 * l2
    c = 3 * f1mmu1 * l2 - f13mu1 * l3 + f13mu1 * l1

    d00, d01 = dphi[0, 0], dphi[0, 1]  # x12, y12
    d10, d11 = dphi[1, 0], dphi[1, 1]  # x31, y31
    d20, d21 = dphi[2, 0], dphi[2, 1]  # x23, y23

    # row 0: d2/dL1^2 terms
    r0c0 = 6 + l2 * (-4 - 2 * a) + 4 * f1m3mu3 * (l2 * l3 - l1 * l2) - 12 * l1 \
        + 2 * l2 * b + 8 * (l2 * l3 - l1 * l2)
    t_b = -2 + 6 * l1 + 4 * l2 - l2 * b - 4 * l2 * l3 + 4 * l1 * l2
    t_a = 2 * l2 - l2 * a + l2 * l3 * 2 * f1m3mu3 - l1 * l2 * 2 * f1m3mu3
    r0c1 = -d11 * t_b - d01 * t_a
    r0c2 = d10 * t_b + d00 * t_a
    r0c3 = -2 * l2 * c + 4 * f13mu1 * (l2 * l3 - l1 * l2) - 4 * l2 + 2 * l2 * a \
        + 4 * f1m3mu3 * (-l2 * l3 + l1 * l2)
    t_c = -l2 * c + l2 * l3 * 2 * f13mu1 - l1 * l2 * 2 * f13mu1
    r0c4 = -d01 * t_a - d21 * t_c
    r0c5 = d00 * t_a + d20 * t_c
    r0c6 = -6 + 12 * l1 + 8 * l2 - 2 * l2 * b + 8 * (l1 * l2 - l2 * l3) \
        + 2 * l2 * c + 4 * f13mu1 * (l1 * l2 - l2 * l3)
    t_b4 = -4 + 6 * l1 + 4 * l2 - l2 * b - 4 * l2 * l3 + 4 * l1 * l2
    r0c7 = -d21 * t_c - d11 * t_b4
    r0c8 = d20 * t_c + d10 * t_b4

    # row 1: d2/dL2^2 terms
    r1c0 = -2 * l1 * a + 2 * l1 * l3 * 2 * fm1m3mu3 - 2 * l1 * l2 * 2 * fm1m3mu3 \
        - 4 * l1 + 2 * l1 * b - 2 * l1 * l3 * 2 * fm13mu2 + 2 * l1 * l2 * 2 * fm13mu2
    s_b = 2 * l1 - l1 * b + l1 * l3 * 2 * fm13mu2 - l1 * l2 * 2 * fm13mu2
    s_a = -l1 * a + l1 * l3 * 2 * fm1m3mu3 - l1 * l2 * 2 * fm1m3mu3
    r1c1 = -d11 * s_b - d01 * s_a
    r1c2 = d10 * s_b + d00 * s_a
    r1c3 = 6 - 12 * l2 - 4 * l1 - 2 * l1 * c + 8 * l3 * l1 - 8 * l1 * l2 \
        + 2 * l1 * a - 2 * l1 * l3 * 2 * fm1m3mu3 + 2 * l1 * l2 * 2 * fm1m3mu3
    s_c2 = -6 * l2 + 2 - 2 * l1 - l1 * c + 4 * l3 * l1 - 4 * l1 * l2
    r1c4 = -d01 * s_a - d21 * s_c2
    r1c5 = d00 * s_a + d20 * s_c2
    r1c6 = -6 + 8 * l1 - 2 * l1 * b + 2 * l1 * l3 * 2 * fm13mu2 \
        - 2 * l1 * l2 * 2 * fm13mu2 + 12 * l2 + 2 * l1 * c - 8 * l3 * l1 + 8 * l1 * l2
    s_c4 = -6 * l2 + 4 - 2 * l1 - l1 * c + 4 * l3 * l1 - 4 * l1 * l2
    r1c7 = -d21 * s_c4 - d11 * s_b
    r1c8 = d20 * s_c4 + d10 * s_b

    # row 2: mixed d2/dL1dL2 terms (doubled at the end, fem-shell.cpp:888-890)
    r2c0 = 2 - 4 * l1 + l3 * a - l2 * a + l2 * l3 * 2 * fm1m3mu3 - l1 * a \
        - l1 * l2 * 2 * fm1m3mu3 + l1 * l3 * 2 * f1m3mu3 - l1 * l2 * 2 * f1m3mu3 \
        - 4 * l2 - l3 * b + l2 * b - l2 * l3 * 2 * fm13mu2 + l1 * b \
        + l1 * l2 * 2 * fm13mu2 + 4 * l3 * l1 - 4 * l1 * l2
    m_b = -1 + 4 * l1 + 2 * l2 + 0.5 * l3 * b - 0.5 * l2 * b \
        + 0.5 * l2 * l3 * 2 * fm13mu2 - 0.5 * l1 * b - 0.5 * l1 * l2 * 2 * fm13mu2 \
        - 2 * l3 * l1 + 2 * l1 * l2
    m_a = 2 * l1 + 0.5 * l3 * a - 0.5 * l2 * a + 0.5 * l2 * l3 * 2 * fm1m3mu3 \
        - 0.5 * l1 * a - 0.5 * l1 * l2 * 2 * fm1m3mu3 + 0.5 * l1 * l3 * 2 * f1m3mu3 \
        - 0.5 * l1 * l2 * 2 * f1m3mu3
    r2c1 = -d11 * m_b - d01 * m_a
    r2c2 = d10 * m_b + d00 * m_a
    r2c3 = 2 - 4 * l2 + l3 * c - l2 * c + 4 * l2 * l3 - l1 * c - 4 * l1 * l2 \
        + l1 * l3 * 2 * f13mu1 - l1 * l2 * 2 * f13mu1 - 4 * l1 - l3 * a + l2 * a \
        + l1 * a - l2 * l3 * 2 * fm1m3mu3 + l1 * l2 * 2 * fm1m3mu3 \
        - l1 * l3 * 2 * f1m3mu3 + l1 * l2 * 2 * f1m3mu3
    m_c = -2 * l2 + 0.5 * l3 * c - 0.5 * l2 * c + 2 * l2 * l3 - 0.5 * l1 * c \
        - 2 * l1 * l2 + 0.5 * l1 * l3 * 2 * f13mu1 - 0.5 * l1 * l2 * 2 * f13mu1
    r2c4 = -d01 * (m_a - 1) - d21 * m_c
    r2c5 = d00 * (m_a - 1) + d20 * m_c
    r2c6 = -4 + 8 * l1 + 8 * l2 + l3 * b - l2 * b + l2 * l3 * 2 * fm13mu2 \
        - l1 * b - l1 * l2 * 2 * fm13mu2 - 4 * l3 * l1 + 8 * l1 * l2 - l3 * c \
        + l2 * c - 4 * l2 * l3 + l1 * c - l1 * l3 * 2 * f13mu1 + l1 * l2 * 2 * f13mu1
    m_b2 = -2 + 4 * l1 + 2 * l2 + 0.5 * l3 * b - 0.5 * l2 * b \
        + 0.5 * l2 * l3 * 2 * fm13mu2 - 0.5 * l1 * b - 0.5 * l1 * l2 * 2 * fm13mu2 \
        - 2 * l3 * l1 + 2 * l1 * l2
    r2c7 = -d21 * (m_c + 1) - d11 * m_b2
    r2c8 = d20 * (m_c + 1) + d10 * m_b2

    row0 = jnp.stack([r0c0, r0c1, r0c2, r0c3, r0c4, r0c5, r0c6, r0c7, r0c8])
    row1 = jnp.stack([r1c0, r1c1, r1c2, r1c3, r1c4, r1c5, r1c6, r1c7, r1c8])
    row2 = 2.0 * jnp.stack([r2c0, r2c1, r2c2, r2c3, r2c4, r2c5, r2c6, r2c7, r2c8])
    return jnp.stack([row0, row1, row2])


def _tri_plate(dphi, area, dp):
    """Specht plate bending, 9x9 over (w_i, tx_i, ty_i); fem-shell.cpp:555-603."""
    side_sq = jnp.array(
        [
            dphi[0, 0] ** 2 + dphi[0, 1] ** 2,  # AB
            dphi[1, 0] ** 2 + dphi[1, 1] ** 2,  # AC
            dphi[2, 0] ** 2 + dphi[2, 1] ** 2,  # BC
        ]
    )
    # auxiliary matrix mapping area-coordinate 2nd derivatives to physical
    # curvatures. NOTE: Y[2,1] matches the reference literally
    # (fem-shell.cpp:586 uses dphi(1,0)*dphi(1,0)).
    y = jnp.array(
        [
            [dphi[2, 1] ** 2, dphi[1, 1] ** 2, dphi[2, 1] * dphi[1, 1]],
            [dphi[2, 0] ** 2, dphi[1, 0] ** 2, dphi[1, 0] * dphi[2, 0]],
            [
                -2.0 * dphi[2, 0] * dphi[2, 1],
                -2.0 * dphi[1, 0] * dphi[1, 0],
                -dphi[2, 0] * dphi[1, 1] - dphi[1, 0] * dphi[2, 1],
            ],
        ]
    ) / (4.0 * area**2)

    def qp_contrib(rs):
        l1, l2 = rs
        b = _eval_b_tri(side_sq, l1, l2, dphi)
        yb = y @ b
        return (1.0 / 6.0) * (yb.T @ dp @ yb)

    qps = jnp.array(_TRI_QPS, dphi.dtype)
    ke = jnp.sum(jax.vmap(qp_contrib)(qps), axis=0)
    return 2.0 * area * ke


# ----------------------------------------------------------------------
# Quad-4 plate kernel (DKQ; calcPlate QUAD4 branch + evalBQuad)
# ----------------------------------------------------------------------


def _eval_b_quad(h, xi, eta, jinv):
    """DKQ strain matrix B [3,12] at (xi, eta); fem-shell.cpp:901-990.
    ``h`` is the 5x4 coefficient table [a,b,c,d,e] x sides (5,6,7,8)."""
    n_xi = jnp.stack(
        [
            0.25 * (2 * xi + eta) * (1 - eta),
            0.25 * (2 * xi - eta) * (1 - eta),
            0.25 * (2 * xi + eta) * (1 + eta),
            0.25 * (2 * xi - eta) * (1 + eta),
            -xi * (1 - eta),
            0.5 * (1 - eta**2),
            -xi * (1 + eta),
            -0.5 * (1 - eta**2),
        ]
    )
    n_eta = jnp.stack(
        [
            0.25 * (2 * eta + xi) * (1 - xi),
            0.25 * (2 * eta - xi) * (1 + xi),
            0.25 * (2 * eta + xi) * (1 + xi),
            0.25 * (2 * eta - xi) * (1 - xi),
            -0.5 * (1 - xi**2),
            -eta * (1 + xi),
            0.5 * (1 - xi**2),
            -eta * (1 - xi),
        ]
    )

    a, b, c, d, e = 0, 1, 2, 3, 4

    def h_vectors(n):
        """Hx and Hy 12-vectors for one derivative direction (n = N_xi|N_eta)."""
        # side k couples mid-side nodes m=4+k and its predecessor; the dof
        # triplets cycle (w_i, tx_i, ty_i) for corners 1..4.
        hx = []
        hy = []
        for i in range(4):
            m = 4 + i  # mid-side node on side i (5,6,7,8 in Batoz numbering)
            p = 4 + ((i + 3) % 4)  # preceding mid-side node (8,5,6,7)
            im, ip = i, (i + 3) % 4
            # For corner i: contributions of sides (im) and (ip)
            hx.append(1.5 * (h[a, im] * n[m] - h[a, ip] * n[p]))
            hx.append(h[b, im] * n[m] + h[b, ip] * n[p])
            hx.append(n[i] - h[c, im] * n[m] - h[c, ip] * n[p])
            hy.append(1.5 * (h[d, im] * n[m] - h[d, ip] * n[p]))
            hy.append(-n[i] + h[e, im] * n[m] + h[e, ip] * n[p])
            hy.append(-(h[b, im] * n[m] + h[b, ip] * n[p]))
        return jnp.stack(hx), jnp.stack(hy)

    hx_xi, hy_xi = h_vectors(n_xi)
    hx_eta, hy_eta = h_vectors(n_eta)

    row0 = jinv[0, 0] * hx_xi + jinv[0, 1] * hx_eta
    row1 = jinv[1, 0] * hy_xi + jinv[1, 1] * hy_eta
    row2 = (
        jinv[0, 0] * hy_xi
        + jinv[0, 1] * hy_eta
        + jinv[1, 0] * hx_xi
        + jinv[1, 1] * hx_eta
    )
    return jnp.stack([row0, row1, row2])


def _quad_plate(dphi, dp):
    """DKQ plate bending, 12x12 over (w_i, tx_i, ty_i); fem-shell.cpp:604-688."""
    side_sq = jnp.sum(dphi**2, axis=1)  # squared side lengths AB,BC,CD,DA
    h = jnp.stack(
        [
            -dphi[:, 0] / side_sq,  # a_k
            0.75 * dphi[:, 0] * dphi[:, 1] / side_sq,  # b_k
            (0.25 * dphi[:, 0] ** 2 - 0.5 * dphi[:, 1] ** 2) / side_sq,  # c_k
            -dphi[:, 1] / side_sq,  # d_k
            (0.25 * dphi[:, 1] ** 2 - 0.5 * dphi[:, 0] ** 2) / side_sq,  # e_k
        ]
    )

    def qp_contrib(rs):
        r, s = rs
        r = r * _GAUSS_ROOT
        s = s * _GAUSS_ROOT
        j00 = 0.25 * ((dphi[0, 0] + dphi[2, 0]) * s - dphi[0, 0] + dphi[2, 0])
        j01 = 0.25 * ((dphi[0, 1] + dphi[2, 1]) * s - dphi[0, 1] + dphi[2, 1])
        j10 = 0.25 * ((dphi[0, 0] + dphi[2, 0]) * r - dphi[1, 0] + dphi[3, 0])
        j11 = 0.25 * ((dphi[0, 1] + dphi[2, 1]) * r - dphi[1, 1] + dphi[3, 1])
        det = j00 * j11 - j01 * j10
        jinv = jnp.array([[j11, -j01], [-j10, j00]]) / det
        b = _eval_b_quad(h, r, s, jinv)
        return det * (b.T @ dp @ b)

    qps = jnp.array(_QUAD_QPS, dphi.dtype)
    return jnp.sum(jax.vmap(qp_contrib)(qps), axis=0)


# ----------------------------------------------------------------------
# Superposition, drilling DOF, and local->global transform
# ----------------------------------------------------------------------


def _superpose(ke_m, ke_p, n_nodes):
    """Interleave membrane/plate blocks into the 6n x 6n shell matrix and add
    the stabilized drilling DOF (max submatrix diagonal / 1000);
    fem-shell.cpp:999-1053."""
    n = n_nodes
    k = jnp.zeros((6 * n, 6 * n), dtype=ke_m.dtype)
    base = 6 * jnp.arange(n)
    mem_ids = (base[:, None] + jnp.array([0, 1])[None, :]).reshape(-1)
    plate_ids = (base[:, None] + jnp.array([2, 3, 4])[None, :]).reshape(-1)
    k = k.at[jnp.ix_(mem_ids, mem_ids)].set(ke_m)
    k = k.at[jnp.ix_(plate_ids, plate_ids)].set(ke_p)
    # drilling stabilization: per (i,j) node pair, max over the diagonal
    # entries of the 6x6 sub-block's membrane/plate contributions, / 1000.
    drill = jnp.maximum(ke_m[0::2, 0::2], ke_m[1::2, 1::2])
    drill = jnp.maximum(drill, ke_p[0::3, 0::3])
    drill = jnp.maximum(drill, ke_p[1::3, 1::3])
    drill = jnp.maximum(drill, ke_p[2::3, 2::3])
    drill = drill / 1000.0
    drill_ids = base + 5
    k = k.at[jnp.ix_(drill_ids, drill_ids)].set(drill)
    return k


def _to_global(ke, trafo, n_nodes):
    """Blockwise congruence K_global = T6^T K_local T6 per 6x6 node pair,
    with T6 = blockdiag(trafo, trafo); fem-shell.cpp:1061-1102."""
    t6 = jnp.zeros((6, 6), dtype=ke.dtype)
    t6 = t6.at[:3, :3].set(trafo)
    t6 = t6.at[3:, 3:].set(trafo)
    k4 = ke.reshape(n_nodes, 6, n_nodes, 6)
    kg = jnp.einsum("ca,icjd,db->iajb", t6, k4, t6)
    return kg.reshape(6 * n_nodes, 6 * n_nodes)


# ----------------------------------------------------------------------
# Public per-element kernels
# ----------------------------------------------------------------------


def tri_shell_stiffness(xyz, dm, dp, thickness):
    """Global-axes 18x18 stiffness of one TRI3 flat shell element.

    ``xyz``: [3,3] node coordinates. DOF order: node-major
    (u,v,w,tx,ty,tz) per node.
    """
    trafo, dphi, area = _tri_frame(xyz)
    ke_m = _tri_membrane(dphi, area, dm, thickness)
    ke_p = _tri_plate(dphi, area, dp)
    ke = _superpose(ke_m, ke_p, 3)
    return _to_global(ke, trafo, 3)


def quad_shell_stiffness(xyz, dm, dp, thickness):
    """Global-axes 24x24 stiffness of one QUAD4 flat shell element."""
    trafo, local_xy, dphi = _quad_frame(xyz)
    ke_m = _quad_membrane(local_xy, dm, thickness)
    ke_p = _quad_plate(dphi, dp)
    ke = _superpose(ke_m, ke_p, 4)
    return _to_global(ke, trafo, 4)


def batched_tri_stiffness(coords, tri_conn, dm, dp, thickness):
    """[Et,18,18] element stiffnesses for all TRI3 elements at once."""
    xyz = coords[tri_conn]  # [Et,3,3]
    return jax.vmap(lambda p: tri_shell_stiffness(p, dm, dp, thickness))(xyz)


def batched_quad_stiffness(coords, quad_conn, dm, dp, thickness):
    """[Eq,24,24] element stiffnesses for all QUAD4 elements at once."""
    xyz = coords[quad_conn]  # [Eq,4,3]
    return jax.vmap(lambda p: quad_shell_stiffness(p, dm, dp, thickness))(xyz)
