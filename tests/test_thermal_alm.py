"""MPPThermalTBasedALM analog: CLM staging -> 3-media solve -> tvector.

The reference driver runs only inside E3SM (no golden); asserts the
coupling-layer physics: equilibrium invariance, snow-layer activation by
snl, flux-driven warming, and the tvector packing contract.
"""
import numpy as np
import pytest

from mpp_tpu import constants as C
from mpp_tpu.driver.thermal_alm import thermal_alm_solve
from mpp_tpu.problems.thermal_3media import (NLEVGRND, NLEVSNO,
                                             ThreeMediaProblem)

NCOL = 3


def _clm_state(ncol=NCOL, snl=-3, T0=270.0, frac_sno=0.9, frac_h2osfc=0.05):
    nlev = NLEVSNO + NLEVGRND
    st = dict(
        t_soisno=np.full((ncol, nlev), T0),
        t_h2osfc=np.full(ncol, T0),
        snl=np.full(ncol, snl),
        dz_snow=np.full((ncol, NLEVSNO), 0.04),
        dz_soil=np.tile(0.025 * 1.35 ** np.arange(NLEVGRND), (ncol, 1)),
        h2osoi_liq=np.concatenate(
            [np.full((ncol, NLEVSNO), 1.0),
             np.full((ncol, NLEVGRND), 8.0)], axis=1),
        h2osoi_ice=np.concatenate(
            [np.full((ncol, NLEVSNO), 6.0),
             np.zeros((ncol, NLEVGRND))], axis=1),
        h2osno=np.full(ncol, 21.0),
        h2osfc=np.full(ncol, 10.0),
        frac_sno_eff=np.full(ncol, frac_sno),
        frac_h2osfc=np.full(ncol, frac_h2osfc),
        sabg_lyr=np.zeros((ncol, NLEVSNO + 1)),
        dhsdT=np.zeros(ncol),
        hs_soil=np.zeros(ncol),
        hs_top_snow=np.zeros(ncol),
        hs_h2osfc=np.zeros(ncol))
    return st


def test_equilibrium_is_invariant():
    """Uniform T, no fluxes: one step leaves every medium at T0."""
    prob = ThreeMediaProblem(ncol=NCOL)
    tv = thermal_alm_solve(prob, 1800.0, **_clm_state(T0=269.0))
    active = ~np.isnan(tv)
    assert np.allclose(tv[active], 269.0, atol=1e-8)


def test_snl_masks_inactive_layers():
    """snl=-2: only the last 2 snow slots return temperatures."""
    prob = ThreeMediaProblem(ncol=NCOL)
    tv = thermal_alm_solve(prob, 1800.0, **_clm_state(snl=-2))
    assert np.all(np.isnan(tv[:, :NLEVSNO - 2]))
    assert np.all(np.isfinite(tv[:, NLEVSNO - 2:NLEVSNO]))
    assert np.all(np.isfinite(tv[:, NLEVSNO + 1:]))


def test_surface_flux_warms_from_top():
    """Positive hs on every medium warms the tops most."""
    prob = ThreeMediaProblem(ncol=NCOL)
    st = _clm_state(T0=270.0)
    st["hs_top_snow"] = np.full(NCOL, 80.0)
    st["hs_h2osfc"] = np.full(NCOL, 80.0)
    st["hs_soil"] = np.full(NCOL, 80.0)
    tv = thermal_alm_solve(prob, 1800.0, **st)
    top_snow = tv[:, NLEVSNO - 3]            # snl=-3 -> first active slot
    bot_snow = tv[:, NLEVSNO - 1]
    assert np.all(top_snow > 270.0)
    assert np.all(top_snow > bot_snow)
    assert np.all(tv[:, NLEVSNO + 1] > tv[:, -1])   # soil warms from top
    deep = tv[:, -1]
    assert np.allclose(deep, 270.0, atol=0.5)


def test_dhsdT_damps_warming():
    """A negative dhsdT (radiative feedback) reduces the top warming."""
    prob1 = ThreeMediaProblem(ncol=NCOL)
    st = _clm_state()
    st["hs_top_snow"] = np.full(NCOL, 80.0)
    tv1 = thermal_alm_solve(prob1, 1800.0, **st)
    prob2 = ThreeMediaProblem(ncol=NCOL)
    st["dhsdT"] = np.full(NCOL, -20.0)
    tv2 = thermal_alm_solve(prob2, 1800.0, **st)
    i_top = NLEVSNO - 3
    assert np.all(tv2[:, i_top] < tv1[:, i_top])
    assert np.all(tv2[:, i_top] > 270.0)


def test_sabg_layer_source():
    """Absorbed solar staged into non-top snow layers heats them."""
    prob = ThreeMediaProblem(ncol=NCOL)
    st = _clm_state()
    st["sabg_lyr"][:, NLEVSNO - 2] = 30.0    # a non-top active layer
    tv = thermal_alm_solve(prob, 1800.0, **st)
    assert np.all(tv[:, NLEVSNO - 2] > 270.0)


def test_dhsdT_alone_is_neutral():
    """hs=0, dhsdT<0: the linearized surface flux is dhsdT*(T-T_prev),
    which vanishes at the uniform initial state — T must not move
    (pins the H - dhsdT*T_prev RHS staging,
    GoveqnThermalKSPTemperatureSoilType.F90:344-348)."""
    prob = ThreeMediaProblem(ncol=NCOL)
    st = _clm_state(T0=271.0)
    st["dhsdT"] = np.full(NCOL, -25.0)
    tv = thermal_alm_solve(prob, 1800.0, **st)
    active = ~np.isnan(tv)
    assert np.allclose(tv[active], 271.0, atol=1e-8)
