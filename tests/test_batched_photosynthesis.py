"""Cell-for-cell parity: batched (jnp) photosynthesis vs the serial
numpy golden path (models/photosynthesis.py, itself verified against the
photosynthesis suite goldens)."""
import jax
import numpy as np
import pytest

from mpp_tpu.batched import photosynthesis as bp
from mpp_tpu.models import photosynthesis as ph
from mpp_tpu.problems.photosynthesis import run_photosynthesis_problem


CASES = [
    # (pathway, scm, x tolerance): quadratically-converging systems agree
    # to the root; the WUE/Bonan14 family converges linearly through an
    # FD-noise-limited map (KNOWN_GAPS.md #6), so iterates match loosely.
    ("c3", "ball-berry", 1e-8),
    ("c4", "ball-berry", 1e-8),
    ("c3", "medlyn", 1e-6),
    ("c4", "medlyn", 1e-8),
    ("c3", "wue", 2e-5),
    ("c3", "bonan14", 2e-5),
]


@pytest.mark.parametrize("pathway,scm,tol", CASES)
def test_batched_matches_serial(pathway, scm, tol):
    mpp = run_photosynthesis_problem(pathway=pathway, scm=scm)
    ge = mpp.soe.ge
    av = ge.avars

    cfg, p = bp.params_from_auxvars(av)
    ndof = av.ndof
    if av.gstype in (ph.SCM_BBERRY, ph.SCM_MEDLYN):
        x0 = np.full((av.n, ndof), 0.9 * 380.0)
    else:
        x0 = np.full((av.n, ndof), 0.002)
    res, bounded = bp.solve(cfg, p, x0)
    res_x = np.asarray(res.x)
    bounded_np = np.asarray(bounded)

    serial_x = np.asarray(mpp.soe.soln).reshape(av.n, ndof)
    b_serial = av.soln_is_bounded
    np.testing.assert_array_equal(bounded_np, b_serial)

    # compare only bounded dofs (unbounded keep their mutated leftovers)
    mask = bounded_np
    np.testing.assert_allclose(res_x[mask], serial_x[mask],
                               rtol=tol, atol=tol,
                               err_msg=f"{pathway}/{scm} primary unknown")

    out = bp.post_solve(cfg, p, res.x, bounded)
    both_ok = mask.all(axis=1)
    np.testing.assert_allclose(np.asarray(out.gs)[both_ok],
                               av.gs_soln[both_ok], rtol=50 * tol,
                               atol=50 * tol, err_msg="gs_soln")
    np.testing.assert_allclose(np.asarray(out.an)[both_ok],
                               av.an_soln[both_ok], rtol=50 * tol,
                               atol=50 * tol, err_msg="an_soln")


def test_batched_photosynthesis_jits():
    mpp = run_photosynthesis_problem(pathway="c4", scm="medlyn")
    cfg, p = bp.params_from_auxvars(mpp.soe.ge.avars)
    x0 = np.full((mpp.soe.ge.avars.n, 1), 0.9 * 380.0)
    fn = jax.jit(lambda pp, x: bp.solve(cfg, pp, x))
    res, bounded = fn(p, x0)
    assert bool(res.converged.all())
    assert np.isfinite(np.asarray(res.x)).all()
