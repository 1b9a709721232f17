"""Pallas TPU kernel: fused ADMM iteration loop for the MPCC QP.

Why a kernel: one ADMM iteration is three small matvecs (K^-1, A, A^T) plus
elementwise updates.  Under XLA each while-loop iteration re-streams the
~1.3 MB of per-scenario matrices from HBM — at hundreds of iterations per QP
this is purely HBM-bandwidth-bound.  This kernel pins K^-1, A, A^T and all
iterate vectors in VMEM once and runs the whole iteration loop on-chip;
per-iteration cost drops to the VPU/MXU latency of the matvecs themselves.

Layout: problem dims are padded to MXU-friendly tiles
(n: 179 -> 256, m: 479 -> 512).  Padding is constructed so iterates stay
exactly zero in padded slots (zero matrix pads; l = u = 0 and rho = 1 on
padded rows).  Vectors are carried as (1, n) / (1, m) rows.

The kernel runs `check_every`-iteration chunks inside a while loop with the
OSQP termination test evaluated in-kernel (unscaled residuals via the
equilibration vectors).  Early exit is per scenario: under `jax.vmap` the
pallas_call grid grows a batch dimension and each grid step stops
independently — unlike the XLA while_loop under vmap, which runs every lane
to the max.

Used by `solver/qp_admm.solve_qp(backend="pallas")`; numerics match the XLA
path to float tolerance (tested in interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_PAD = 256   # padded primal dim (N_VAR = 179)
M_PAD = 512   # padded constraint dim (N_CONSTR = 479)


def _admm_kernel(kinv_ref, p_ref, a_ref, at_ref, q_ref, rho_ref, l_ref, u_ref,
                 dscl_ref, escl_ref, cscl_ref, x0_ref, z0_ref, y0_ref,
                 x_out, z_out, y_out, it_out,
                 *, sigma, alpha, eps_abs, eps_rel, max_iter, check_every):
    kinv = kinv_ref[:]
    p = p_ref[:]
    a = a_ref[:]
    at = at_ref[:]
    q = q_ref[:]          # (1, N_PAD)
    rho = rho_ref[:]      # (1, M_PAD)
    l = l_ref[:]
    u = u_ref[:]
    dscl = dscl_ref[:]
    escl = escl_ref[:]
    cscl = cscl_ref[0, 0]
    inv_rho = 1.0 / rho

    q_abs_d = jnp.max(jnp.abs(dscl * q))

    def one_iter(_, carry):
        x, z, y = carry
        rhs = sigma * x - q + jnp.dot(rho * z - y, a,
                                      preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        x1 = jnp.dot(rhs, kinv, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        zt = jnp.dot(x1, at, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        z_relax = alpha * zt + (1.0 - alpha) * z
        z1 = jnp.clip(z_relax + y * inv_rho, l, u)
        y1 = y + rho * (z_relax - z1)
        return x1, z1, y1

    def converged(x, z, y):
        # identical residual definitions to the XLA path (solver/qp_admm.py)
        ax = jnp.dot(x, at, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        px = jnp.dot(x, p, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        aty = jnp.dot(y, a, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        r_prim = jnp.max(jnp.abs((ax - z) / escl))
        r_dual = jnp.max(jnp.abs(dscl * (px + q + aty) / cscl))
        s_prim = jnp.maximum(jnp.max(jnp.abs(ax / escl)),
                             jnp.max(jnp.abs(z / escl)))
        s_dual = jnp.maximum(jnp.maximum(
            jnp.max(jnp.abs(dscl * px)), jnp.max(jnp.abs(dscl * aty))),
            q_abs_d) / cscl
        ok_p = r_prim <= eps_abs + eps_rel * s_prim
        ok_d = r_dual <= eps_abs + eps_rel * s_dual
        # int32 flag: scalar-bool while carries are fragile in Mosaic
        return jnp.where(jnp.logical_and(ok_p, ok_d),
                         jnp.int32(1), jnp.int32(0))

    def while_cond(carry):
        x, z, y, it, done = carry
        return jnp.logical_and(done == 0, it < max_iter)

    def while_body(carry):
        x, z, y, it, _ = carry
        x, z, y = jax.lax.fori_loop(0, check_every, one_iter, (x, z, y))
        return x, z, y, it + check_every, converged(x, z, y)

    x0, z0, y0 = x0_ref[:], z0_ref[:], y0_ref[:]
    # entry convergence check: a warm start that is already optimal (or a
    # phase-2 call whose phase-1 already converged) exits with 0 iterations
    x, z, y, it, _ = jax.lax.while_loop(
        while_cond, while_body,
        (x0, z0, y0, jnp.asarray(0, jnp.int32), converged(x0, z0, y0)))

    x_out[:] = x
    z_out[:] = z
    y_out[:] = y
    it_out[0, 0] = it


def fused_admm(kinv, p, a, q, rho, l, u, dscl, escl, cscl, x0, z0, y0,
               *, max_iter: int = 400, check_every: int = 25,
               sigma: float = 1e-6, alpha: float = 1.6,
               eps_abs: float = 1e-4, eps_rel: float = 1e-5,
               interpret: bool = False):
    """Run the fused ADMM loop on one (scaled) QP.

    All inputs are in the Ruiz-equilibrated space, unpadded
    (n = kinv.shape[0], m = a.shape[0]).  Returns (x, y, iters).
    """
    n = kinv.shape[0]
    m = a.shape[0]
    f32 = jnp.float32

    def pad_mat(mat, rows, cols):
        return jnp.zeros((rows, cols), f32).at[:mat.shape[0], :mat.shape[1]].set(
            mat.astype(f32))

    def pad_row(vec, cols, fill=0.0):
        out = jnp.full((1, cols), fill, f32)
        return out.at[0, :vec.shape[0]].set(vec.astype(f32))

    kinv_p = pad_mat(kinv, N_PAD, N_PAD)
    p_p = pad_mat(p, N_PAD, N_PAD)
    a_p = pad_mat(a, M_PAD, N_PAD)
    at_p = a_p.T
    q_p = pad_row(q, N_PAD)
    rho_p = pad_row(rho, M_PAD, fill=1.0)
    l_p = pad_row(l, M_PAD)
    u_p = pad_row(u, M_PAD)
    dscl_p = pad_row(dscl, N_PAD, fill=1.0)
    escl_p = pad_row(escl, M_PAD, fill=1.0)
    cscl_p = jnp.full((1, 1), cscl, f32)
    x0_p = pad_row(x0, N_PAD)
    z0_p = pad_row(z0, M_PAD)
    y0_p = pad_row(y0, M_PAD)

    kernel = functools.partial(
        _admm_kernel, sigma=sigma, alpha=alpha, eps_abs=eps_abs,
        eps_rel=eps_rel, max_iter=max_iter, check_every=check_every)

    x_p, z_p, y_p, it = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, N_PAD), f32),
            jax.ShapeDtypeStruct((1, M_PAD), f32),
            jax.ShapeDtypeStruct((1, M_PAD), f32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 14,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=interpret,
    )(kinv_p, p_p, a_p, at_p, q_p, rho_p, l_p, u_p, dscl_p, escl_p, cscl_p,
      x0_p, z0_p, y0_p)

    return x_p[0, :n], z_p[0, :m], y_p[0, :m], it[0, 0]
