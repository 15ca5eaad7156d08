"""ShellSystem — orchestration layer (the EquationSystems/LinearImplicitSystem
analog, fem-shell.cpp:70-138): owns the device mesh arrays, the sparsity
pattern, BC masks, and exposes assemble/solve as jitted pipelines.

The full pipeline (element kernels -> block scatter -> BC masking -> PCG)
is one ``jax.jit`` program: XLA sees the entire solve and fuses the
element-parallel assembly with the iterative solve setup.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fem_shell_tpu.materials import Material
from fem_shell_tpu.mesh import ShellMesh
from fem_shell_tpu.ops.assemble import (
    BlockEllMatrix,
    apply_dirichlet_to_ell,
    build_ell_pattern,
    element_stiffnesses,
    scatter_to_ell,
)
from fem_shell_tpu.solver import CGResult, dense_solve, pcg


class ShellSystem:
    """Linear-elastic flat-shell system on one device.

    Usage::

        sys = ShellSystem(mesh, Material(nu=0.3, em=1e7, thickness=0.5))
        u = sys.solve(forces)          # [N,6] displacements (+ rotations)
    """

    def __init__(
        self,
        mesh: ShellMesh,
        material: Material,
        dtype=jnp.float64,
        k_max: Optional[int] = None,
    ):
        self.mesh = mesh
        self.material = material
        self.dtype = dtype
        dm, dp = material.matrices()
        self.dm = jnp.asarray(dm, dtype)
        self.dp = jnp.asarray(dp, dtype)
        self.thickness = dtype(material.thickness) if callable(dtype) else material.thickness

        self.coords = jnp.asarray(mesh.coords, dtype)
        self.tri_conn = jnp.asarray(mesh.tri, jnp.int32)
        self.quad_conn = jnp.asarray(mesh.quad, jnp.int32)

        self.pattern = build_ell_pattern(mesh, k_max=k_max)
        self.adj = jnp.asarray(self.pattern.adj)
        self.tri_slot = jnp.asarray(self.pattern.tri_slot)
        self.quad_slot = jnp.asarray(self.pattern.quad_slot)

        constrained = mesh.dirichlet_mask()  # [N,6] bool
        self.free_mask = jnp.asarray(~constrained, dtype)

        self._assemble_jit = jax.jit(self._assemble_impl)
        self._solve_pcg_jit = jax.jit(self._solve_pcg_impl, static_argnums=(2, 3, 4, 5))
        self._solve_dense_jit = jax.jit(self._solve_dense_impl)

    # ------------------------------------------------------------------
    def _assemble_impl(self, coords) -> BlockEllMatrix:
        ke_tri, ke_quad = element_stiffnesses(
            (coords, self.tri_conn, self.quad_conn), self.dm, self.dp, self.thickness
        )
        blocks = scatter_to_ell(ke_tri, ke_quad, self.pattern, self.tri_slot, self.quad_slot)
        blocks = apply_dirichlet_to_ell(blocks, self.adj, self.free_mask)
        return BlockEllMatrix(blocks, self.adj)

    def assemble(self) -> BlockEllMatrix:
        """Assembled, BC-constrained block-ELL operator."""
        return self._assemble_jit(self.coords)

    # ------------------------------------------------------------------
    def _solve_pcg_impl(
        self, coords, forces, rtol, maxiter, precond="block_jacobi", differentiable=False
    ) -> Tuple[jnp.ndarray, CGResult]:
        a = self._assemble_impl(coords)
        b = forces * self.free_mask
        if precond == "block_jacobi":
            # factor the 6x6 node-diagonal blocks once; far stronger than
            # scalar Jacobi for the badly scaled shell operator (drilling
            # dofs are ~1000x softer than bending dofs by construction)
            from fem_shell_tpu.ops.blockprec import cholesky6, cholesky6_solve

            l_blocks = cholesky6(a.diagonal_blocks())
            apply_prec = lambda r: cholesky6_solve(l_blocks, r)  # noqa: E731
        else:
            diag = a.diagonal()
            inv_diag = jnp.where(diag != 0, 1.0 / diag, 1.0)
            apply_prec = lambda r: inv_diag * r  # noqa: E731

        if not differentiable:
            res = pcg(a.matvec, b, rtol=rtol, maxiter=maxiter, apply_prec=apply_prec)
            return res.x, res

        # implicit differentiation: lax.custom_linear_solve makes the CG
        # solve reverse-differentiable (adjoint solve with the same SPD
        # operator) — gradients flow through the operator's dependence on
        # coords/material via the matvec closure, so jax.grad through
        # assemble+solve works (load and shape sensitivities). The
        # reference C++ stack has no analog of this capability. Iteration
        # stats cannot escape the inner solve scope; the residual is
        # recomputed with one extra matvec and iters reported as -1.
        def solve_fn(mv, rhs):
            return pcg(mv, rhs, rtol=rtol, maxiter=maxiter, apply_prec=apply_prec).x

        x = jax.lax.custom_linear_solve(a.matvec, b, solve=solve_fn, symmetric=True)
        r = b - a.matvec(x)
        rel = jnp.sqrt(jnp.sum(r * r)) / jnp.maximum(jnp.sqrt(jnp.sum(b * b)), 1e-300)
        return x, CGResult(x, jnp.asarray(-1, jnp.int32), rel)

    def _solve_dense_impl(self, coords, forces) -> jnp.ndarray:
        a = self._assemble_impl(coords)
        n = self.mesh.n_nodes
        dense = a.to_dense()
        b = (forces * self.free_mask).reshape(-1)
        return dense_solve(dense, b).reshape(n, 6)

    def solve(
        self,
        forces,
        method: str = "pcg",
        rtol: float = 1e-12,
        maxiter: int = 20000,
        precond: str = "block_jacobi",
    ) -> jnp.ndarray:
        """Solve K u = f. ``forces``: [N,6] nodal loads. Returns [N,6].

        Traced under HIGHEST matmul precision: on TPU the default f32
        matmul path feeds the MXU bf16 inputs, which destroys both the
        element stiffness accuracy and CG convergence. HIGHEST uses the
        multi-pass f32 MXU mode (and is a no-op on CPU/f64).
        """
        forces = jnp.asarray(forces, self.dtype)
        with jax.default_matmul_precision("highest"):
            if method == "dense":
                return self._solve_dense_jit(self.coords, forces)
            x, res = self._solve_pcg_jit(self.coords, forces, rtol, maxiter, precond)
        self.last_cg = res
        return x

    # ------------------------------------------------------------------
    def make_repeat_solver(
        self,
        rtol: float = 1e-10,
        maxiter: int = 20000,
        precond: str = "block_jacobi",
    ):
        """For repeated solves with FIXED geometry (the coupling loop case,
        fem-shell_precice.cpp:271 re-solves per coupling iteration):
        assemble + factor the preconditioner once, return a jitted
        ``forces [N,6] -> (u [N,6], iters, residual)`` closure."""
        with jax.default_matmul_precision("highest"):
            a = self._assemble_jit(self.coords)
            if precond == "block_jacobi":
                from fem_shell_tpu.ops.blockprec import cholesky6, cholesky6_solve

                l_blocks = cholesky6(a.diagonal_blocks())
                apply_prec = lambda r: cholesky6_solve(l_blocks, r)  # noqa: E731
            else:
                diag = a.diagonal()
                inv_diag = jnp.where(diag != 0, 1.0 / diag, 1.0)
                apply_prec = lambda r: inv_diag * r  # noqa: E731

            @jax.jit
            def solve(forces):
                b = jnp.asarray(forces, self.dtype) * self.free_mask
                res = pcg(a.matvec, b, rtol=rtol, maxiter=maxiter, apply_prec=apply_prec)
                return res.x, res.iters, res.residual

        return solve

    # ------------------------------------------------------------------
    def solution_vector(self, u) -> np.ndarray:
        """Flat [6N] solution ordered like the reference's
        build_solution_vector (6 values per node; fem-shell.cpp:163-169)."""
        return np.asarray(u).reshape(-1)
