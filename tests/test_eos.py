"""EOS unit tests against the reference's hard-coded benchmark values.

Benchmark values and thresholds from ``src/tests/test_eos_constant_density.F90``,
``test_eos_tgdp01_density.F90``, ``test_eos_ifc67_density.F90``.
"""
import jax.numpy as jnp
import pytest

from mpp_tpu.ops import eos

P = 120000.0
T_K = 300.0


def test_density_constant():
    den, ddp, ddt = eos.density(P, T_K, eos.DENSITY_CONSTANT)
    assert abs(float(den) - 55.508250191225926) < 1e-11
    assert abs(float(ddp)) < 1e-16
    assert abs(float(ddt)) < 1e-15


def test_density_tgdpb01():
    den, ddp, ddt = eos.density(P, T_K, eos.DENSITY_TGDPB01)
    assert abs(float(den) - 55.317560635066179) < 1e-11
    assert abs(float(ddp) - 2.4884914247886521e-8) < 1e-16
    assert abs(float(ddt) - (-1.5203176216371761e-2)) < 1e-15


def test_density_ifc67():
    den, ddp, ddt = eos.density(P, T_K, eos.DENSITY_IFC67)
    assert abs(float(den) - 55.323696656461536) < 1e-11
    assert abs(float(ddp) - 2.4854904480147891e-008) < 1e-16
    assert abs(float(ddt) - (-1.5298638598102345e-002)) < 1e-15


def test_density_vectorized_shapes():
    p = jnp.full((4, 3), P)
    t = jnp.full((4, 3), T_K)
    for itype in (eos.DENSITY_CONSTANT, eos.DENSITY_TGDPB01, eos.DENSITY_IFC67):
        den, ddp, ddt = eos.density(p, t, itype)
        assert den.shape == (4, 3)
        assert bool(jnp.all(jnp.isfinite(den)))


def test_density_derivatives_fd():
    """Analytic derivatives consistent with finite differences."""
    for itype in (eos.DENSITY_TGDPB01, eos.DENSITY_IFC67):
        den, ddp, ddt = eos.density(P, T_K, itype)
        dp = 1.0
        denp, _, _ = eos.density(P + dp, T_K, itype)
        denm, _, _ = eos.density(P - dp, T_K, itype)
        assert float(ddp) == pytest.approx(float(denp - denm) / (2 * dp), rel=1e-6)
        dT = 1e-3
        denp, _, _ = eos.density(P, T_K + dT, itype)
        denm, _, _ = eos.density(P, T_K - dT, itype)
        assert float(ddt) == pytest.approx(float(denp - denm) / (2 * dT), rel=1e-6)


def test_viscosity():
    vis, dvp, dvt = eos.viscosity(P, T_K)
    assert float(vis) == pytest.approx(8.904156e-4)
    assert float(dvp) == 0.0 and float(dvt) == 0.0


def test_enthalpy_ifc67_consistency():
    """H, U relationships and FD-consistency of the IFC67 enthalpy derivs."""
    den, ddp, ddt = eos.density(P, T_K, eos.DENSITY_IFC67)
    from mpp_tpu.constants import FMWH2O
    den_kg = float(den) * FMWH2O
    U, H, dU_dT, dH_dT, dU_dP, dH_dP = eos.internal_energy_and_enthalpy(
        P, T_K, eos.INT_ENERGY_ENTHALPY_IFC67, den_kg,
        float(ddt) * FMWH2O, float(ddp) * FMWH2O)
    # U = H - P/den_mol
    assert float(U) == pytest.approx(float(H) - P / float(den), rel=1e-12)
    # FD check on dH/dT
    dT = 1e-3
    Hp, _, _ = eos.enthalpy_ifc67(T_K - 273.15 + dT, P)
    Hm, _, _ = eos.enthalpy_ifc67(T_K - 273.15 - dT, P)
    assert float(dH_dT) == pytest.approx(float(Hp - Hm) / (2 * dT), rel=1e-6)
    dp = 10.0
    Hp, _, _ = eos.enthalpy_ifc67(T_K - 273.15, P + dp)
    Hm, _, _ = eos.enthalpy_ifc67(T_K - 273.15, P - dp)
    assert float(dH_dP) == pytest.approx(float(Hp - Hm) / (2 * dp), rel=1e-6)
