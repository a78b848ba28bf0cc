"""vsfm_vchannel operator-split vs monolithic cross-check.

The op-split driver has no golden; VERDICT round 1 asked for a
cross-check against vsfm_vchannel.  ``run_vsfm_vchannel_problem`` takes
``ic_offset`` so both drivers can start from the identical 10-m-offset
water-table IC; one implicit step of the monolithic 3-D problem and one
vertical+lateral split step must agree to the splitting error.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from mpp_tpu.constants import AuxVarKind, Var
from mpp_tpu.problems.vsfm_vchannel import NX, NY, run_vsfm_vchannel_problem
from mpp_tpu.problems.vsfm_vchannel_operator_split import (
    run_vsfm_vchannel_operator_split_problem)

NZ = 10
DT = 8640.0


def _press_ic():
    n = NX * NY * NZ
    press_ic = np.empty(n)
    icell = 0
    for jz in range(1, NZ + 1):
        for c in range(NX * NY):
            press_ic[icell] = ((18.75 - 0.5 * (jz - 1) - 10.0)
                               * 997.18 * 9.8 + 101325.0)
            icell += 1
    return press_ic


def _total_mass(g, P):
    """por*den(P)*sat(P)*vol — the quantity the accumulation term
    integrates (density is TGDPB01, so it must be included)."""
    return float(jnp.sum(g.accum(jnp.asarray(P))))


@pytest.fixture(scope="module")
def runs():
    vert, lat = run_vsfm_vchannel_operator_split_problem(
        nz=NZ, dtime=DT, nstep=1, with_seepage_bc=False)
    full = run_vsfm_vchannel_problem(nz=NZ, dtime=DT, nstep=1,
                                     with_seepage_bc=False, ic_offset=10.0)
    return vert, lat, full


def test_split_matches_monolithic(runs):
    _, lat, full = runs
    P_split = np.asarray(lat.get_data(AuxVarKind.INTERNAL, Var.PRESSURE))
    P_full = np.asarray(full.get_data(AuxVarKind.INTERNAL, Var.PRESSURE))
    dP_step = np.abs(P_full - _press_ic()).max()
    split_err = np.abs(P_split - P_full).max()
    assert dP_step > 1.0e4            # the step actually moved water
    # first-order Lie splitting of a stiff drainage step: the split
    # solution tracks the monolithic one well inside the step's range
    assert split_err < 0.35 * dP_step, (split_err, dP_step)


def test_split_stays_in_sync(runs):
    """After the copy-back protocol the two half-problems hold the same
    state (F90:104-115)."""
    vert, lat, _ = runs
    assert np.array_equal(np.asarray(vert.soe.soln),
                          np.asarray(lat.soe.soln))


def test_split_conserves_mass(runs):
    """No BCs or sources: both the split pair and the monolithic solve
    must conserve por*den*sat*vol to solver tolerance."""
    vert, lat, full = runs
    g = vert.soe.goveqns[0]
    m0 = _total_mass(g, _press_ic())
    m_split = _total_mass(g, np.asarray(lat.soe.soln))
    gf = full.soe.goveqns[0]
    m_full = _total_mass(gf, np.asarray(full.soe.soln))
    assert abs(m_split - m0) / m0 < 1e-9
    assert abs(m_full - m0) / m0 < 1e-9
