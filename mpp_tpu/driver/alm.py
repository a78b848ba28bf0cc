"""ELM/ALM host-model coupling layer, TPU-native.

Re-implements the production coupling path of the reference
(``src/driver/alm/MPPVSFMALM_Driver.F90``, ``MPPVSFMALM_Initialize.F90``):
the land model hands the framework a batch of soil columns with CLM-style
state and fluxes each timestep; the framework stages unit-converted
source/sink terms, exchanges ghost-column data for lateral connectivity,
solves VSFM, audits per-column mass balance, and unpacks results back to
CLM arrays.

Reference semantics reproduced here (file:line citations):

* flux unit conversion mm/s -> kg/s via ``area * denh2o * 1e-3``
  (MPPVSFMALM_Driver.F90:298 flux_unit_conversion).
* ET sink per layer ``-qflx_tran_veg * rootr(j)`` and infiltration source
  into the top cell (ibid:301-315).
* lateral ghost exchange of pressure before the solve (ibid:479-490,
  ``ExchangeColumnLevelGhostData``) and the operator-split 'source_sink'
  lateral model: explicit lateral Darcy flux from ghosted states fed as a
  source term to the implicit vertical solve, with ``qflx_lateral``
  returned in mm/s (ibid:465-532).
* retry loop, max 10 attempts (ibid:620-930): on divergence switch
  ``stol`` to the alternate 1e-10 and, after a second divergence, reset
  ``frac_liq=1`` (ibid:650-667); on convergence audit the per-column mass
  balance ``|mass_beg - mass_end + total_flux*dt| < max_abs_mass_error_col
  = 1e-5`` kg (ibid:140,861-863) and if violated tighten rtol or stol by
  10x according to the converged reason (ibid:886-905) and re-solve; hard
  error after ``max_iter_count`` attempts (ibid:919-922).
* unpacking: ``h2osoi_liq/ice`` from cell mass split by ``frac_ice``
  (ibid:840-843), ``smp_l`` in mm from matrix potential in m (ibid:851),
  water-table depth ``zwt`` interpolated at the first unsaturated layer
  (ibid:866-873), ``qcharge = 0`` (ibid:864).

TPU-native mapping: each MPI rank's ``begc:endc`` column loop becomes a
batched [ncol, nz] state solved by one masked Newton
(models/vsfm_batched); host-model MPI ghost exchange becomes ppermute
halos inside shard_map over the device-mesh column axis
(parallel/sharding).  The retry ladder stays host-side Python around the
jitted solve, exactly where the reference keeps it (driver, not library).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from mpp_tpu.constants import DENH2O, FMWH2O, GRAVITY_CONSTANT, PRESSURE_REF
from mpp_tpu.models import vsfm_batched as vb

MAX_ITER_COUNT = 10              # MPPVSFMALM_Driver.F90:116 max_iter_count
STOL_ALTERNATE = 1e-10           # ibid:122 stol_alternate
MAX_ABS_MASS_ERROR_COL = 1e-5    # ibid:140 [kg]


@dataclasses.dataclass
class ALMVSFMProblem:
    """State of the coupled VSFM problem owned by the host model.

    Built once by :func:`alm_vsfm_initialize` (the
    ``MPPVSFMALM_Initialize.F90`` analog); advanced every land-model step
    by :func:`alm_vsfm_solve`.
    """
    params: vb.ColumnParams          # per-level soil params, [ncol, nz]
    P: jnp.ndarray                   # soil liquid pressure [Pa], [ncol, nz]
    frac_liq: jnp.ndarray            # liquid fraction, [ncol, nz]
    area: np.ndarray                 # column area [m^2], [ncol]
    dz: np.ndarray                   # layer thickness [m], [ncol, nz]
    zi: np.ndarray                   # interface depth below surface [m],
                                     # [ncol, nz+1] (zi[:,0]=0)
    lateral_connectivity: bool = False
    lateral_conductance: float = 0.0  # [kmol/s/Pa] per column pair (ring)
    mesh_axis: Optional[str] = None   # shard_map axis name when sharded
    device_mesh: Optional[jax.sharding.Mesh] = None
    # general-graph lateral connectivity (ldomain adjacency analog,
    # MPPVSFMALM_Initialize.F90:588-795): when set, the lateral source is
    # the per-connection, per-level lateral Darcy flux over the UGDM
    # (replacing the 1-D ring + scalar-conductance model)
    ugrid: Optional[object] = None    # parallel.ugrid.UGrid
    ugdm: Optional[object] = None     # parallel.ugrid.UGDM
    # defaults mirror SNESSetTolerances in MPPSetupProblemSNES
    atol: float = 1e-10
    rtol: float = 1e-8
    stol: float = 1e-10

    @property
    def ncol(self) -> int:
        return int(self.P.shape[0])

    @property
    def nz(self) -> int:
        return int(self.P.shape[1])


def alm_vsfm_initialize(watsat, hksat, bsw, sucsat, residual_sat, dz, area,
                        P0=None, lateral_connectivity=False,
                        lateral_conductance=0.0, device_mesh=None,
                        ugrid=None, dtype=jnp.float64):
    """Build the batched VSFM problem from CLM column data
    (MPPVSFMALM_Initialize.F90:588-795 analog).

    CLM Clapp-Hornberger inputs are converted to van Genuchten form the
    same way VSFMMPPSetSoilsCLM does (lambda = 1/bsw, alpha =
    1/(sucsat_mm_of_water -> Pa)).
    """
    watsat = np.asarray(watsat, np.float64)
    ncol, nz = watsat.shape
    dz = np.broadcast_to(np.asarray(dz, np.float64), (ncol, nz)).copy()
    area = np.broadcast_to(np.asarray(area, np.float64), (ncol,)).copy()
    vish2o = 8.904156e-4
    perm = np.asarray(hksat, np.float64) * 1e-3 * vish2o / (
        DENH2O * GRAVITY_CONSTANT)  # mm/s -> m^2 (VSFMMPPSetSoilsCLM)
    lam = 1.0 / np.asarray(bsw, np.float64)
    alpha = 1.0 / (np.asarray(sucsat, np.float64) * GRAVITY_CONSTANT)
    f = lambda v: jnp.asarray(np.broadcast_to(v, (ncol, nz)), dtype)
    params = vb.ColumnParams(
        vg_alpha=f(alpha), vg_m=f(lam), sat_res=f(residual_sat),
        perm=f(perm), por=f(watsat), dz=f(dz),
        area=f(area[:, None]))
    if P0 is None:
        P0 = np.full((ncol, nz), 3.5355e3)
    # interface depths below the surface, ordered top (0) -> bottom (nz);
    # model levels are ordered bottom (0) -> top (nz-1), hence the reverse
    zi = np.zeros((ncol, nz + 1))
    zi[:, 1:] = np.cumsum(dz[:, ::-1], axis=1)
    ugdm = None
    if ugrid is not None:
        ndev = (len(device_mesh.devices.ravel())
                if device_mesh is not None else 1)
        ugdm = ugrid.partition(ndev)
        if ugdm.ndev * ugdm.n_own != ncol:
            raise ValueError(
                f"ugrid padding ({ugdm.ndev}x{ugdm.n_own}) must match the "
                f"staged column count {ncol}; stage CLM arrays through "
                "ugdm.natural_to_sharded")
    return ALMVSFMProblem(
        params=params, P=jnp.asarray(P0, dtype),
        frac_liq=jnp.ones((ncol, nz), dtype), area=area, dz=dz, zi=zi,
        lateral_connectivity=lateral_connectivity,
        lateral_conductance=lateral_conductance, device_mesh=device_mesh,
        ugrid=ugrid, ugdm=ugdm,
        mesh_axis="col" if device_mesh is not None else None)


def _cell_mass_kg(P, params):
    """Per-cell liquid water mass [kg] (VAR_MASS analog)."""
    sat, _, _, _ = vb.vg_sat_kr(P, params)
    vol = params.area * params.dz
    return sat * params.por * vol * DENH2O


def _lateral_source(prob: ALMVSFMProblem, P):
    """Operator-split lateral flux [kmol/s] per cell via ghost halos.

    MPPVSFMALM_Driver.F90:465-532 'source_sink' lateral model: exchange
    ghosted pressures, explicit lateral Darcy flux, staged as a source for
    the next implicit vertical solve.
    """
    from mpp_tpu.parallel.sharding import lateral_flux_op_split
    if prob.ugdm is not None:
        # general-graph per-level lateral Darcy flux over the UGDM
        _, _, kr, _ = vb.vg_sat_kr(P, prob.params)
        perm = jnp.broadcast_to(jnp.asarray(prob.params.perm, P.dtype),
                                P.shape)
        dz = jnp.broadcast_to(jnp.asarray(prob.params.dz, P.dtype), P.shape)
        dm = prob.ugdm
        if prob.device_mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as PS
            spec = PS(prob.mesh_axis, None)
            fn = shard_map(
                lambda p_, k_, pe_, dz_: dm.lateral_darcy_source(
                    p_, k_, pe_, dz_, axis_name=prob.mesh_axis),
                mesh=prob.device_mesh, in_specs=(spec,) * 4,
                out_specs=spec)
            return fn(P, kr, perm, dz)
        from mpp_tpu.parallel.ugrid import lateral_darcy_source_global
        # 1-device: same math over the global (padded-petsc) layout via
        # the natural-order reference implementation
        P_nat = dm.sharded_to_natural(np.asarray(P))
        kr_nat = dm.sharded_to_natural(np.asarray(kr))
        perm_nat = dm.sharded_to_natural(np.asarray(perm))
        dz_nat = dm.sharded_to_natural(np.asarray(dz))
        src_nat = lateral_darcy_source_global(prob.ugrid, P_nat, kr_nat,
                                              perm_nat, dz_nat)
        return jnp.asarray(dm.natural_to_sharded(np.asarray(src_nat)),
                           P.dtype)
    g = jnp.asarray(prob.lateral_conductance, P.dtype)
    if prob.device_mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as PS
        spec = PS(prob.mesh_axis, None)
        fn = shard_map(
            lambda x: lateral_flux_op_split(x, g, axis_name=prob.mesh_axis),
            mesh=prob.device_mesh, in_specs=(spec,), out_specs=spec)
        return fn(P)
    # single-shard: same stencil without collectives
    left = jnp.concatenate([P[:1], P[:-1]], axis=0)
    right = jnp.concatenate([P[1:], P[-1:]], axis=0)
    return -g * ((P - left) + (P - right))


def alm_vsfm_solve(prob: ALMVSFMProblem, dtime,
                   qflx_infl=None, qflx_tran_veg=None, rootr=None,
                   bc_top=None, bc_bot=None, frac_ice=None):
    """One host-model timestep (MPPVSFMALM_Solve analog).

    Fluxes in CLM units: ``qflx_infl`` [mm/s, ncol] infiltration,
    ``qflx_tran_veg`` [mm/s, ncol] transpiration with per-layer root
    fractions ``rootr`` [ncol, nz].  Returns a dict of CLM-facing outputs:
    h2osoi_liq/ice [kg/m^2], smp_l [mm], zwt [m], qflx_lateral [mm/s],
    soilp [Pa], plus solver diagnostics (attempts, diverged_count,
    mass_bal_err_count, abs_mass_error_col).
    """
    ncol, nz = prob.ncol, prob.nz
    dtype = prob.P.dtype
    area = jnp.asarray(prob.area, dtype)

    # [mm/s] -> [kg/s]: area * denh2o * 1e-3 (Driver:298); kg/s -> kmol/s
    flux_conv_kg = area * DENH2O * 1e-3
    ss = jnp.zeros((ncol, nz), dtype)
    total_flux_col = jnp.zeros((ncol,), dtype)   # [kg/s]
    if qflx_tran_veg is not None:
        et = (-jnp.asarray(qflx_tran_veg, dtype) * flux_conv_kg)[:, None] \
            * jnp.asarray(rootr, dtype)          # [kg/s] per layer, sink<0
        ss = ss + et / FMWH2O
        total_flux_col = total_flux_col + et.sum(axis=1)
    if qflx_infl is not None:
        infl = jnp.asarray(qflx_infl, dtype) * flux_conv_kg  # [kg/s]
        ss = ss.at[:, -1].add(infl / FMWH2O)     # top cell = last level
        total_flux_col = total_flux_col + infl

    qflx_lateral = jnp.zeros((ncol,), dtype)
    if prob.lateral_connectivity:
        mflx_lat = _lateral_source(prob, prob.P)         # [kmol/s] per cell
        ss = ss + mflx_lat
        lat_kg = mflx_lat.sum(axis=1) * FMWH2O
        total_flux_col = total_flux_col + lat_kg
        # qflx_lateral = -sum(mflx)/conv (Driver:522-523), mm/s
        qflx_lateral = -lat_kg / flux_conv_kg

    if bc_top is None:
        bc_top = prob.P[:, -1]
    if bc_bot is None:
        bc_bot = prob.P[:, 0]
    # Dirichlet BCs contribute boundary fluxes the audit must include;
    # default above makes them no-flow-like for the balance bookkeeping.

    mass_beg_col = _cell_mass_kg(prob.P, prob.params).sum(axis=1)

    P_prev = prob.P

    rtol, stol = prob.rtol, prob.stol
    attempts = diverged_count = mass_bal_err_count = 0
    abs_mass_error = np.inf
    P = P_prev
    while True:
        attempts += 1
        P, iters, done, reason = vb.step_dt_snes(
            P_prev, dtime, bc_top, bc_bot, prob.params,
            rtol=rtol, atol=prob.atol, stol=stol, ss=ss, max_it=50)
        converged = bool(jnp.all(done))
        if not converged:
            # Driver:650-667: alternate stol, after 2nd divergence reset
            # frac_liq to 1
            stol = STOL_ALTERNATE
            diverged_count += 1
            if diverged_count > 1:
                prob.frac_liq = jnp.ones_like(prob.frac_liq)
        else:
            mass_end_col = _cell_mass_kg(P, prob.params).sum(axis=1)
            # boundary Dirichlet fluxes at the converged state enter the
            # audit (the reference's VSFM residual is exactly balanced, so
            # its flux bookkeeping includes BC fluxes staged by CLM; here
            # we recompute them from the converged solution)
            bflux = _bc_flux_kg(P, bc_top, bc_bot, prob.params)
            err = jnp.abs(mass_beg_col - mass_end_col
                          + (total_flux_col + bflux) * dtime)
            abs_mass_error = float(err.max())
            if abs_mass_error >= MAX_ABS_MASS_ERROR_COL:
                mass_bal_err_count += 1
                # Driver:886-905: tighten the criterion that fired
                r = np.asarray(reason)
                if (r == vb.REASON_FNORM_RELATIVE).any():
                    rtol = rtol / 10.0
                if (r == vb.REASON_SNORM_RELATIVE).any():
                    stol = stol / 10.0
            else:
                break
        if attempts >= MAX_ITER_COUNT:
            raise RuntimeError(
                "ALM VSFM failed to converge after multiple attempts "
                f"(diverged {diverged_count}, mass-bal errors "
                f"{mass_bal_err_count}, last error {abs_mass_error:.3e} kg)")

    prob.P = P

    # ---- unpack to CLM arrays (Driver:700-900) ----
    mass_cell = _cell_mass_kg(P, prob.params)            # [kg]
    if frac_ice is None:
        frac_ice = jnp.zeros((ncol, nz), dtype)
    h2osoi_liq = (1.0 - frac_ice) * mass_cell / area[:, None]   # [kg/m^2]
    h2osoi_ice = frac_ice * mass_cell / area[:, None]
    # matrix potential [m] -> smp_l [mm] (Driver:851)
    smp_m = (P - PRESSURE_REF) / (DENH2O * GRAVITY_CONSTANT)
    smp_l = smp_m * 1000.0

    zwt = _water_table_depth(np.asarray(smp_l), prob.zi)

    return {
        "h2osoi_liq": h2osoi_liq, "h2osoi_ice": h2osoi_ice,
        "smp_l": smp_l, "soilp": P, "zwt": zwt,
        "qflx_lateral": qflx_lateral, "qcharge": jnp.zeros((ncol,), dtype),
        "attempts": attempts, "diverged_count": diverged_count,
        "mass_bal_err_count": mass_bal_err_count,
        "abs_mass_error_col": abs_mass_error,
        "newton_iters": int(iters),
    }


def _bc_flux_kg(P, bc_top, bc_bot, p: vb.ColumnParams):
    """Net Dirichlet boundary mass flux into each column [kg/s] at state P,
    matching the residual's BC flux terms (models/vsfm_batched.bc_flux)."""
    p = vb.ColumnParams(*(jnp.broadcast_to(jnp.asarray(v, P.dtype), P.shape)
                          for v in p))
    _, _, kr, dkr = vb.vg_sat_kr(P, p)

    def one(P_bc, P_cell, kr_cell, unit_z, lev):
        pl = vb.ColumnParams(*(v[..., lev] for v in p))
        _, _, kr_b, _ = vb.vg_sat_kr(P_bc, pl)
        dist_gravity = (pl.dz / 2.0) * unit_z * (-GRAVITY_CONSTANT)
        dphi = P_bc - P_cell + vb._DEN * FMWH2O * dist_gravity
        Dq = pl.perm / (pl.dz / 2.0)
        ukvr = jnp.where(dphi >= 0.0, kr_b, kr_cell) / vb._VIS
        return -Dq * ukvr * dphi * pl.area * vb._DEN

    fb = one(bc_bot, P[:, 0], kr[:, 0], +1.0, 0)
    ft = one(bc_top, P[:, -1], kr[:, -1], -1.0, -1)
    # residual adds +flux at the boundary cells, so net mass INFLOW per
    # column is -(fb+ft); summing the converged residual over levels gives
    # (mass_end-mass_beg)/dt = ss_sum - (fb+ft) in kmol/s.
    return -(fb + ft) * FMWH2O


def _water_table_depth(smp_l, zi):
    """zwt from the first unsaturated layer (Driver:853-873).

    Levels are ordered bottom (index 0) to top (index nz-1); CLM's j=1 is
    the surface, so scan from the top of the column downward.
    """
    ncol, nz = smp_l.shape
    zwt = np.zeros(ncol)
    for c in range(ncol):
        depth_col = zi[c, -1]
        jwt = -1
        for j in range(nz):
            clm_j = nz - 1 - j        # top first
            if smp_l[c, clm_j] < 0.0:
                jwt = j
                break
        if jwt in (-1, nz - 1):
            zwt[c] = depth_col
        else:
            # midpoints of interfaces around the first unsaturated layer
            z_dn = 0.5 * (zi[c, jwt] + zi[c, jwt + 1])
            z_up = 0.5 * (zi[c, jwt + 1] + zi[c, jwt + 2])
            s0 = smp_l[c, nz - 1 - jwt]
            s1 = smp_l[c, nz - 1 - (jwt + 1)]
            denom = s0 - s1
            zwt[c] = depth_col if denom == 0.0 else (
                (0.0 - s0) / denom * (z_dn - z_up) + z_dn)
            zwt[c] = min(max(zwt[c], 0.0), depth_col)
    return zwt
