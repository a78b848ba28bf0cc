"""Coupled 5-MPP ml_model orchestrator: physical sanity, substep coupling,
checkpoint/restore round-trip, BC codec, and per-phase timers.

The reference ships no regression baseline for this path (its
``-bc_file`` forcing dataset is not in the tree), so these tests verify
physical invariants of the coupled solution and exactness of the
checkpoint subsystem instead (SURVEY.md §3.4, §5).
"""
import numpy as np
import pytest

from mpp_tpu.constants import TFRZ
from mpp_tpu.io.petsc_vec import read_vec, write_vec
from mpp_tpu.problems.ml_model import (MLModel, MLBoundaryConditions,
                                       bc_from_vec_row,
                                       compute_vertical_veg_structure,
                                       run_ml_model_problem,
                                       synthetic_diurnal_bc)


def test_veg_structure():
    """Beta-profile plant area: conserves total PAI after redistribution,
    nbot/ntop bracket the vegetated levels (ml_model_utils.F90:59-185)."""
    veg = compute_vertical_veg_structure()
    assert veg.ntop == 43
    assert 2 <= veg.nbot < veg.ntop
    total_pai = veg.dpai[veg.nbot:veg.ntop + 1].sum()
    # the cturb pai constant in mlc_parameters.F90:536 is a rounded
    # literal of this integral
    assert abs(total_pai - 5.051612734794617) < 1e-6
    assert np.all(veg.dpai[veg.nbot:veg.ntop + 1] > 0)
    # cumpai is the running sum of dpai from the top down
    assert abs(veg.cumpai[veg.nbot] - total_pai) < 1e-12


def test_petsc_vec_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    v = rng.standard_normal(137)
    path = str(tmp_path / "x.bin")
    write_vec(path, v)
    assert np.array_equal(read_vec(path), v)


def test_bc_vec_codec(tmp_path):
    """31-column hourly records (ml_model_boundary_conditions.F90:185-281),
    including the pref_prev back-reference to the previous record."""
    rows = np.arange(2 * 31, dtype=np.float64).reshape(2, 31) + 1.0
    path = str(tmp_path / "bc.bin")
    write_vec(path, rows.ravel())
    data = read_vec(path)
    bc1 = bc_from_vec_row(data, 1, None)
    bc2 = bc_from_vec_row(data, 2, bc1)
    assert bc1.iskyb_vis == 1.0 and bc1.tref == 6.0
    assert bc1.pref_prev == bc1.pref
    assert bc2.pref_prev == bc1.pref      # column 8 of record 1
    assert np.array_equal(bc1.h2osoi_vol, rows[0, 21:31])
    with pytest.raises(ValueError):
        bc_from_vec_row(data, 3, bc2)


@pytest.fixture(scope="module")
def day_run(tmp_path_factory):
    d = tmp_path_factory.mktemp("mlmodel")
    model = run_ml_model_problem(beg_step=13, end_step=13, nsubstep=3,
                                 checkpoint_data=True,
                                 checkpoint_dir=str(d))
    return model, d


def test_coupled_daytime_physics(day_run):
    """Midday forcing must produce open stomata, positive photosynthesis,
    transpiration, and leaf temperatures near air temperature."""
    m, _ = day_run
    assert np.all(m.gs_sun > 0.01), "sunlit stomata should be open at noon"
    assert np.all(m.accum["anet_leaf_sun"] > 0.0)
    assert np.all(m.accum["tr_leaf_sun"] > 0.0)
    assert np.all((m.tleaf_sun > TFRZ + 5.0) & (m.tleaf_sun < TFRZ + 45.0))
    assert np.all((m.tair > TFRZ) & (m.tair < TFRZ + 45.0))
    assert np.all((m.qair > 0.0) & (m.qair < 0.05))
    # sunlit leaves absorb more than shaded ones
    assert m.accum["rn_leaf_sun"].mean() > m.accum["rn_leaf_shd"].mean()
    assert m.accum["gs_leaf_sun"].mean() > m.accum["gs_leaf_shd"].mean()
    # boundary-layer conductances positive and finite
    assert np.all((m.gbh > 0) & (m.gbh < 100))
    # wind decays into the canopy
    assert m.wind[-1] > m.wind[m.nbot] > 0.0


def test_phase_timers(day_run):
    """PetscLogEvent analog: every sub-solver phase is timed
    (ml_model_problem.F90:323-336)."""
    m, _ = day_run
    rep = m.timers.report()
    assert set(rep) == {"SWV", "LWV", "LBL", "PHY", "MLC"}
    assert rep["SWV"]["count"] == 1
    assert rep["MLC"]["count"] == 3
    assert all(s["total_s"] > 0 for s in rep.values())


def test_checkpoint_restore_roundtrip(day_run):
    """initialize_from_checkpoint restores the exact canopy + plant state
    (ml_model_problem.F90:233-292)."""
    m, d = day_run
    mlc_ic = str(d / "mlc_checkpoint.013.3.bin")
    psy_ic = str(d / "photosynthesis_checkpoint.013.3.bin")
    m2 = MLModel()
    m2.initialize_from_checkpoint(mlc_ic, psy_ic,
                                  synthetic_diurnal_bc(14, m.bc))
    assert np.array_equal(m2.tleaf_sun, m.tleaf_sun)
    assert np.array_equal(m2.tleaf_shd, m.tleaf_shd)
    assert np.array_equal(m2.tair, m.tair)
    assert np.array_equal(m2.qair, m.qair)
    # the wind column is restored verbatim into int_cond; cturb.wind is
    # then recomputed by the post-load PreSolve (mlc.F90:443) under the
    # NEW step's forcing, so it is a derived quantity, not restored state
    assert np.array_equal(m2.wind, m.wind)
    av, av2 = m.psy.soe.ge.avars, m2.psy.soe.ge.avars
    assert np.array_equal(av2.leaf_psi, av.leaf_psi)
    assert np.array_equal(av2.gleaf_w_soln, av.gleaf_w_soln)
    assert np.array_equal(av2.tleaf_prev, av.tleaf)


def test_resumed_run_continues(day_run):
    """A restored model advances a further step without divergence and
    stays in the physical envelope."""
    m, d = day_run
    m2 = MLModel()
    m2.initialize_from_checkpoint(str(d / "mlc_checkpoint.013.3.bin"),
                                  str(d / "photosynthesis_checkpoint.013.3.bin"),
                                  synthetic_diurnal_bc(14, m.bc))
    m2.run(beg_step=14, end_step=14, nsubstep=2)
    assert np.all((m2.tleaf_sun > TFRZ) & (m2.tleaf_sun < TFRZ + 45.0))
    assert np.all(m2.gs_sun > 0.0)
