"""Compiled batched KSP path (batched/ksp_compiled.py).

The KSP analog of test_vsfm_compiled: facade-built thermal problems
(SOEBaseStepDT_KSP semantics, SystemOfEquationsBaseType.F90:555-647)
frozen into one jitted batched assemble+solve and verified against

* the reference golden baselines (thermal_mms 1/2/3-D through the
  compiled path at ncol=1, "petsc" GMRES+ILU(0) replication), and
* the serial host-side KSP path (coupled 3-media, multi-step), and
* per-column batched dynamic state (heterogeneous liq/ice, per-column
  BC values) against per-column serial solves.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import REFERENCE_ROOT, reference_available
from mpp_tpu.io.regression import compare_to_baseline, load_suite_tolerances

SUITE = os.path.join(REFERENCE_ROOT, "regression_tests", "thermal")


@pytest.mark.parametrize("ptype,name", [(1, "thermal_mms"),
                                        (2, "thermal_mms_2d"),
                                        (3, "thermal_mms_3d")])
def test_thermal_mms_golden_via_compiled(tmp_path, ptype, name):
    """The reference thermal_mms goldens pass through the compiled
    batched KSP path at ncol=1."""
    if not reference_available():
        pytest.skip("reference tree not available")
    from mpp_tpu.problems import thermal_mms as tm
    from mpp_tpu.config import read_namelist

    nml = read_namelist(os.path.join(SUITE, f"{name}.namelist"))
    opts = nml.get("problem_options", {})
    num_cells = nml["regression_test"]["num_cells"]
    mpp, soln = tm.run_thermal_mms_problem(
        ptype, nx=opts.get("nx"), ny=opts.get("ny"), nz=opts.get("nz"),
        use_compiled=True)
    base = str(tmp_path / name)
    fname = tm.output_regression(base, num_cells=num_cells, soln=soln)
    ours = open(fname).read()
    baseline = open(os.path.join(SUITE,
                                 f"{name}.regression.baseline")).read()
    tols = load_suite_tolerances(os.path.join(SUITE, "thermal.cfg"), name)
    failures = compare_to_baseline(ours, baseline, tols)
    assert not failures, "\n".join(failures)


def _three_media(compiled, nsteps=3):
    from mpp_tpu.problems.thermal_3media import ThreeMediaProblem
    prob = ThreeMediaProblem(ncol=3)
    prob.set_initial_temperature(260.0, 272.0, 278.0)
    prob.set_top_fluxes(-30.0, 0.0, 5.0)
    if compiled:
        from mpp_tpu.batched.ksp_compiled import compile_ksp
        compile_ksp(prob.mpp, linear_solver="petsc").install()
    for _ in range(nsteps):
        prob.step(1800.0)
    return np.asarray(prob.mpp.soe.soln)


def test_three_media_coupled_via_compiled():
    """Snow ⊕ ssw ⊕ soil with inter-GE Dirichlet coupling
    (SystemOfEquationsThermalType.F90:546-763): the compiled pure-gather
    exchange and block assembly match the serial host GMRES path."""
    ref = _three_media(False)
    cmp_ = _three_media(True)
    np.testing.assert_allclose(cmp_, ref, rtol=0, atol=1e-10)


def test_batched_heterogeneous_thermal_columns():
    """Batched dynamic state: ncol columns with different moisture and
    per-column Dirichlet BCs solved in ONE compiled step match
    per-column serial solves (the reference's rank-per-column model)."""
    from mpp_tpu.problems import thermal_mms as tm
    from mpp_tpu.batched.ksp_compiled import compile_ksp

    # template: the 1-D MMS problem (tridiagonal -> batched Thomas)
    mpp, _ = tm.run_thermal_mms_problem(1, use_compiled=False)
    comp = compile_ksp(mpp, linear_solver="petsc")
    g = comp.goveqns[0]
    n = comp.n
    ncol = 5
    rng = np.random.default_rng(1)

    T0 = jnp.asarray(280.0 + 10.0 * rng.random((ncol, n)))
    bc = jnp.asarray(
        np.broadcast_to(np.asarray(g.bc_value), (ncol,) + g.bc_value.shape)
        + rng.random((ncol, g.bc_value.shape[0])))
    ss = jnp.asarray(np.broadcast_to(np.asarray(g.ss_values),
                                     (ncol,) + g.ss_values.shape).copy())
    liq = jnp.asarray(5.0 * rng.random((ncol, n)))
    dyn = ({"liq": liq},)

    Tn, ok, _ = comp.step_batched(T0, (bc,), (ss,), 1.0, dyn=dyn)
    assert bool(ok.all())
    for c in range(ncol):
        Tc, okc, _ = comp.step_batched(T0[c:c + 1], (bc[c:c + 1],),
                                    (ss[c:c + 1],), 1.0,
                                    dyn=({"liq": liq[c:c + 1]},))
        np.testing.assert_array_equal(np.asarray(Tc[0]),
                                      np.asarray(Tn[c]))
    # heterogeneity is live: different columns end at different states
    assert float(np.abs(np.asarray(Tn[0] - Tn[1])).max()) > 1e-3
