"""Reduced-physics batched VSFM column solver — TEST FIXTURE.

DEMOTED (round 4): the production path is ``driver/alm.py`` on the
compiled full-physics stepper (``batched/vsfm_compiled.py``) — TGDPB01
density with dden/dP, every CLM saturation function, seepage, per-column
heterogeneous soils via the dyn contract.  This module keeps the
original constant-density van-Genuchten-only column Newton as a small,
self-contained fixture for solver-mechanics tests (test_batched_vsfm,
test_f32_accuracy, test_nan_debug) and as the analytic cross-check for
the UGDM lateral-flux tests; nothing in ``mpp_tpu/driver`` or
``mpp_tpu/batched`` imports it.

Structure: state [ncol, nz], batched Thomas inner solves, Newton with
per-column convergence masks (the same batching model the production
stepper uses, SURVEY §2.8).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from mpp_tpu.constants import PRESSURE_REF, GRAVITY_CONSTANT, FMWH2O, DENH2O
from mpp_tpu.ops.tridiag import thomas


class ColumnParams(NamedTuple):
    """Per-level van Genuchten / Darcy parameters, broadcastable to
    [ncol, nz]."""
    vg_alpha: jnp.ndarray
    vg_m: jnp.ndarray
    sat_res: jnp.ndarray
    perm: jnp.ndarray
    por: jnp.ndarray
    dz: jnp.ndarray
    area: jnp.ndarray

    @staticmethod
    def uniform(nz, dtype=jnp.float32, alpha=3.4257e-4, m=0.5, sat_res=0.2772,
                perm=8.3913e-12, por=0.368, depth=1.0):
        dz = depth / nz
        f = lambda v: jnp.asarray(v, dtype)
        return ColumnParams(vg_alpha=f(alpha), vg_m=f(m), sat_res=f(sat_res),
                            perm=f(perm), por=f(por), dz=f(dz), area=f(1.0))


def vg_sat_kr(P, p: ColumnParams):
    """Van Genuchten saturation + Mualem kr and d/dP (closed forms,
    SaturationFunction.F90:747-857), plus constant-density water EOS.

    Returns (sat, dsat, kr, dkr)."""
    pc = P - PRESSURE_REF
    n = 1.0 / (1.0 - p.vg_m)
    m = p.vg_m
    unsat = pc < 0.0
    pcs = jnp.where(unsat, pc, -1.0)
    pan = (-p.vg_alpha * pcs) ** n
    one_p = 1.0 + pan
    Se = one_p ** (-m)
    AA = pan / one_p
    dSe = -m * n * Se * AA / pcs
    sat = jnp.where(unsat, p.sat_res + (1.0 - p.sat_res) * Se, 1.0)
    dsat = jnp.where(unsat, (1.0 - p.sat_res) * dSe, 0.0)
    BB = 1.0 - AA ** m
    kr_u = jnp.sqrt(Se) * BB * BB
    dkr_dSe = 0.5 * kr_u / Se + 2.0 * Se ** (1.0 / m - 0.5) * AA ** (m - 1.0) * BB
    kr = jnp.where(unsat, kr_u, 1.0)
    dkr = jnp.where(unsat, dkr_dSe * dSe, 0.0)
    return sat, dsat, kr, dkr


_VIS = 8.904156e-4
_DEN = DENH2O / FMWH2O  # constant density [kmol/m^3]


def _face_flux(P_up, P_dn, kr_up, kr_dn, dkr_up, dkr_dn, dz, perm, area):
    """Vertical two-point Darcy flux between level k (up, lower z) and k+1
    (dn, upper z); unit vector +z.  Returns (flux, dflux_dP_up, dflux_dP_dn)
    — same math as models/richards.py darcy_flux with constant density."""
    dist_gravity = dz * (-GRAVITY_CONSTANT)
    den_ave = _DEN
    dphi = P_up - P_dn + den_ave * FMWH2O * dist_gravity
    Dq = perm / dz
    up_wind = dphi >= 0.0
    ukvr = jnp.where(up_wind, kr_up, kr_dn) / _VIS
    dukvr_up = jnp.where(up_wind, dkr_up / _VIS, 0.0)
    dukvr_dn = jnp.where(up_wind, 0.0, dkr_dn / _VIS)
    q = -Dq * ukvr * dphi * area
    flux = q * den_ave
    dflux_up = -Dq * (dukvr_up * dphi + ukvr) * area * den_ave
    dflux_dn = -Dq * (dukvr_dn * dphi - ukvr) * area * den_ave
    return flux, dflux_up, dflux_dn


def accumulation(P, p: ColumnParams, dt):
    sat, dsat, _, _ = vg_sat_kr(P, p)
    vol = p.area * p.dz
    return p.por * _DEN * sat * vol / dt, p.por * _DEN * dsat * vol / dt


def residual_and_jac(P, accum_prev, dt, bc_top, bc_bot, p: ColumnParams,
                     ss=0.0):
    """F [ncol, nz] and tridiagonal Jacobian diagonals (dl, d, du).

    ``ss`` is an optional per-cell source/sink mass rate [kmol/s]
    (positive = source), the batched analog of the reference's
    COND_MASS_RATE source-sink conditions and of the operator-split
    lateral flux staged as a source (SystemOfEquationsVSFMType.F90:
    848-891)."""
    # params may be scalars, [nz], or [ncol, nz]; normalize to P's shape so
    # boundary-level slicing below is uniform
    p = ColumnParams(*(jnp.broadcast_to(jnp.asarray(v, P.dtype), P.shape)
                       for v in p))
    sat, dsat, kr, dkr = vg_sat_kr(P, p)
    acc, dacc = accumulation(P, p, dt)
    F = acc - accum_prev - ss
    d = dacc
    dl = jnp.zeros_like(P)
    du = jnp.zeros_like(P)

    # internal faces k <-> k+1: distance-weighted face quantities use the
    # upper cell's dz/perm/area (uniform-grid semantics of the reference's
    # structured column meshes)
    flux, dfu, dfd = _face_flux(P[..., :-1], P[..., 1:], kr[..., :-1],
                                kr[..., 1:], dkr[..., :-1], dkr[..., 1:],
                                p.dz[..., :-1], p.perm[..., :-1],
                                p.area[..., :-1])
    F = F.at[..., :-1].add(-flux).at[..., 1:].add(flux)
    # F_k -= flux  -> dF_k/dP_k -= dfu ; dF_k/dP_{k+1} -= dfd
    d = d.at[..., :-1].add(-dfu)
    du = du.at[..., :-1].add(-dfd)
    d = d.at[..., 1:].add(dfd)
    dl = dl.at[..., 1:].add(dfu)

    # Dirichlet boundaries: bottom face of level 0, top face of level nz-1.
    # BC treatment per RichardsFlux: upweight=0, Dq = perm_cell/(dz/2),
    # BC auxvar kr evaluated at the BC pressure.
    def bc_flux(P_bc, P_cell, kr_cell, dkr_cell, unit_z, lev):
        pl = ColumnParams(*(v[..., lev] for v in p))
        sat_b, _, kr_b, _ = vg_sat_kr(P_bc, pl)
        dist_gravity = (pl.dz / 2.0) * unit_z * (-GRAVITY_CONSTANT)
        dphi = P_bc - P_cell + _DEN * FMWH2O * dist_gravity
        Dq = pl.perm / (pl.dz / 2.0)
        up_wind = dphi >= 0.0
        ukvr = jnp.where(up_wind, kr_b, kr_cell) / _VIS
        dukvr_dn = jnp.where(up_wind, 0.0, dkr_cell / _VIS)
        q = -Dq * ukvr * dphi * pl.area
        flux = q * _DEN
        dflux_dn = -Dq * (dukvr_dn * dphi - ukvr) * pl.area * _DEN
        return flux, dflux_dn

    fb, dfb = bc_flux(bc_bot, P[..., 0], kr[..., 0], dkr[..., 0], +1.0, 0)
    F = F.at[..., 0].add(fb)
    d = d.at[..., 0].add(dfb)
    ft, dft = bc_flux(bc_top, P[..., -1], kr[..., -1], dkr[..., -1], -1.0, -1)
    F = F.at[..., -1].add(ft)
    d = d.at[..., -1].add(dft)
    return F, (dl, d, du)


REASON_FNORM_ABS = 1       # fnorm < atol        (SNES_CONVERGED_FNORM_ABS)
REASON_FNORM_RELATIVE = 2  # fnorm < rtol*fnorm0 (SNES_CONVERGED_FNORM_RELATIVE)
REASON_SNORM_RELATIVE = 4  # snorm < stol*xnorm  (SNES_CONVERGED_SNORM_RELATIVE)


def newton_solve(P0, accum_prev, dt, bc_top, bc_bot, p: ColumnParams,
                 rtol=1e-6, atol=1e-10, stol=1e-8, max_it=30, ss=0.0):
    """Masked batched Newton: every column iterates until its own
    convergence; converged columns freeze (no wasted updates propagate).

    Returns (P, iters, converged_mask, reason) where reason mirrors the
    SNES converged-reason ids per column (REASON_* above)."""

    F0, _ = residual_and_jac(P0, accum_prev, dt, bc_top, bc_bot, p, ss)
    fnorm0 = jnp.linalg.norm(F0, axis=-1)

    def cond(state):
        P, fnorm, it, done, reason = state
        return jnp.logical_and(it < max_it, ~jnp.all(done))

    def body(state):
        P, fnorm, it, done, reason = state
        F, (dl, d, du) = residual_and_jac(P, accum_prev, dt, bc_top, bc_bot,
                                          p, ss)
        dP = thomas(dl, d, du, F)

        # Backtracking line search, batched per column (the BT linesearch
        # of SOEBaseStepDT_SNES): halve each column's step until its
        # residual stops growing, up to 10 halvings.  Converged columns
        # keep a zero step.
        def ls_body(ls_state):
            scale, fprev, _ = ls_state
            P_try = P - jnp.where(done[..., None], 0.0, scale[..., None] * dP)
            F_try, _ = residual_and_jac(P_try, accum_prev, dt, bc_top,
                                        bc_bot, p, ss)
            f_try = jnp.linalg.norm(F_try, axis=-1)
            shrink = (f_try > fnorm) & (scale > 2.0 ** -10) & ~done
            return (jnp.where(shrink, 0.5 * scale, scale), f_try,
                    jnp.any(shrink))

        def ls_cond(ls_state):
            return ls_state[2]

        scale0 = jnp.ones_like(fnorm)
        # initial "keep searching" flag derived from the (possibly
        # device-varying) state so shard_map's varying-axes check accepts
        # the while_loop carry
        keep0 = jnp.any(fnorm >= 0.0) | jnp.isnan(fnorm).any()
        scale, _, _ = lax.while_loop(
            ls_cond, ls_body, (scale0, fnorm, keep0))
        P_new = P - jnp.where(done[..., None], 0.0, scale[..., None] * dP)
        dP = scale[..., None] * dP
        F_new, _ = residual_and_jac(P_new, accum_prev, dt, bc_top, bc_bot,
                                    p, ss)
        fnorm_new = jnp.linalg.norm(F_new, axis=-1)
        snorm = jnp.linalg.norm(dP, axis=-1)
        xnorm = jnp.linalg.norm(P_new, axis=-1)
        hit_frel = fnorm_new <= rtol * fnorm0
        hit_fabs = fnorm_new < atol
        hit_srel = snorm < stol * xnorm
        newly_done = (hit_frel | hit_fabs | hit_srel) & ~done
        new_reason = jnp.where(
            hit_fabs, REASON_FNORM_ABS,
            jnp.where(hit_frel, REASON_FNORM_RELATIVE, REASON_SNORM_RELATIVE))
        reason = jnp.where(newly_done, new_reason, reason)
        return (P_new, fnorm_new, it + 1, done | newly_done, reason)

    done0 = fnorm0 < atol
    reason0 = jnp.where(done0, REASON_FNORM_ABS, 0)
    P, fnorm, iters, done, reason = lax.while_loop(
        cond, body, (P0, fnorm0, jnp.zeros((), jnp.int32), done0, reason0))
    return P, iters, done, reason


def step_dt_snes(P_prev, dt, bc_top, bc_bot, p: ColumnParams, max_cuts=20,
                 **kw):
    """One implicit timestep with the SOEBaseStepDT_SNES failure ladder
    (soe/SystemOfEquationsBaseType.F90:368-552), batched: each column
    carries its OWN dt ladder — on divergence a column halves its dt (up
    to ``max_cuts`` times, restoring its previous solution) and sub-steps
    until it has integrated the full ``dt``; converged columns never wait
    on stiff ones (SURVEY §7.3 per-column dt ladders).

    Returns (P, total_newton_iters, success_mask, last_reason).
    """
    dtype = P_prev.dtype
    ncol = P_prev.shape[0]
    # every per-column carry derives from P_prev so its device-varying
    # type matches the loop body under shard_map
    zcol = P_prev[:, 0] * 0.0
    dt_total = jnp.asarray(dt, dtype) + zcol

    def cond(state):
        P, t, dtc, ncuts, failed, iters, reason = state
        return jnp.any((t < dt_total) & ~failed)

    def body(state):
        P, t, dtc, ncuts, failed, iters, reason = state
        active = (t < dt_total) & ~failed
        dte = jnp.minimum(dtc, dt_total - t)
        dte = jnp.where(active, dte, dt_total)        # benign dt when idle
        acc_prev, _ = accumulation(P, p, dte[:, None])
        P_new, it, done, rsn = newton_solve(P, acc_prev, dte[:, None],
                                            bc_top, bc_bot, p, **kw)
        ok = active & done
        div = active & ~done
        P = jnp.where(ok[:, None], P_new, P)          # diverged: restore
        t = jnp.where(ok, t + dte, t)
        ncuts = jnp.where(div, ncuts + 1, ncuts)
        dtc = jnp.where(div, 0.5 * dtc, dtc)
        failed = failed | (ncuts > max_cuts)
        reason = jnp.where(ok, rsn, reason)
        return (P, t, dtc, ncuts, failed, iters + it, reason)

    state0 = (P_prev, zcol, dt_total, zcol.astype(jnp.int32),
              zcol < -1.0, jnp.zeros((), jnp.int32),
              zcol.astype(jnp.int32))
    P, t, dtc, ncuts, failed, iters, reason = lax.while_loop(
        cond, body, state0)
    return P, iters, (t >= dt_total) & ~failed, reason


def step_dt(P_prev, dt, bc_top, bc_bot, p: ColumnParams, **kw):
    """One implicit timestep over all columns: accum at previous state,
    batched Newton with the per-column dt-cut ladder."""
    P, iters, done, _ = step_dt_snes(P_prev, dt, bc_top, bc_bot, p, **kw)
    return P, iters, done
