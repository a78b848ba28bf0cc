"""Lane-for-lane parity: batched (jnp) canopy turbulence vs the serial
numpy golden path (models/canopy_turbulence.py, itself verified against
the mlc suite goldens).  Exercises stable + unstable Obukhov lanes,
varied canopy/forcing parameters, wind + conductance profiles."""
import numpy as np
import pytest

from mpp_tpu.models.canopy_turbulence import (
    CanopyTurbulenceAuxVar, obukhov_length, wind_profile,
    aerodynamic_conductances)
from mpp_tpu.batched import turbulence as bt


def _make_cases():
    """A spread of canopy-air columns: the mlc-suite values plus stable,
    strongly-unstable, sparse-canopy and short-canopy variants."""
    ncair = 6
    ct = CanopyTurbulenceAuxVar(ncair)
    hc = [21.0, 21.0, 21.0, 10.0, 21.0, 15.0]
    pai = [5.051612734794617, 5.05, 5.05, 2.0, 0.5, 3.0]
    uref = [5.169, 2.0, 8.0, 4.0, 3.0, 1.0]
    tref = [295.9349938964844, 290.0, 300.0, 285.0, 298.0, 280.0]
    # tcan > tref -> unstable; tcan < tref -> stable
    tcan = [295.9349938964844, 294.0, 295.0, 283.0, 301.0, 279.5]
    qref = [0.0, 0.008, 0.012, 0.005, 0.010, 0.003]
    qcan = [0.0, 0.010, 0.011, 0.005, 0.013, 0.004]
    for p in range(ncair):
        ct.hc[p] = hc[p]
        ct.pai[p] = pai[p]
        ct.zref[p] = 46.0
        ct.pref[p] = 98620.0
        ct.uref[p] = uref[p]
        ct.tref[p] = tref[p]
        ct.tcan[p] = tcan[p]
        ct.qref[p] = qref[p]
        ct.compute_derived_atm_inputs(p)
        ct.qcan[p] = qcan[p]
    return ct


def test_batched_turbulence_matches_serial():
    ct = _make_cases()
    obukhov_length(ct)
    wind_profile(ct)
    aerodynamic_conductances(ct)

    tab = bt.load_psihat_jnp()
    inp = bt.derive_inputs(
        hc=ct.hc, zref=ct.zref, pref=ct.pref, uref=ct.uref, qref=ct.qref,
        tref=ct.tref, tcan=ct.tcan, qcan=ct.qcan, pai=ct.pai)
    np.testing.assert_allclose(np.asarray(inp.Lc), ct.Lc, rtol=1e-14)

    aux, wind, ga = bt.presolve(tab, inp, ct.zs, int(ct.ntop[0]))

    for name in ("beta", "disp", "PrSc", "ustar", "tstar", "qstar",
                 "gac", "obu"):
        got = np.asarray(getattr(aux, name))
        want = getattr(ct, name)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12,
                                   err_msg=name)

    np.testing.assert_allclose(np.asarray(wind), ct.wind,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ga), ct.ga_prof,
                               rtol=1e-9, atol=1e-12)


def test_batched_turbulence_jit_vmap_shapes():
    """The presolve must be jittable with lanes of any width."""
    import jax

    ct = _make_cases()
    tab = bt.load_psihat_jnp()
    inp = bt.derive_inputs(
        hc=ct.hc, zref=ct.zref, pref=ct.pref, uref=ct.uref, qref=ct.qref,
        tref=ct.tref, tcan=ct.tcan, qcan=ct.qcan, pai=ct.pai)
    fn = jax.jit(lambda i, zs: bt.presolve(tab, i, zs, int(ct.ntop[0])))
    aux, wind, ga = fn(inp, ct.zs)
    assert wind.shape == ct.zs.shape
    assert ga.shape == ct.zs.shape
    assert np.all(np.isfinite(np.asarray(aux.obu)))
