"""mppnative C++ runtime layer: parity with the pure-Python paths.

The native layer re-implements the PETSc-provided setup/IO subsystems
(SURVEY.md section 2.0): CSR sparsity discovery (MATPREALLOCATOR analog),
structured-mesh connection generation (mpp_mesh_utils analog), and the
PetscViewer binary Vec codec.  These tests pin the native outputs to the
numpy reference implementations bit-for-bit.
"""
import numpy as np
import pytest

from mpp_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library failed to build")


def _py_csr(n_rows, n_cols, rows, cols):
    keys = rows * n_cols + cols
    uniq, inv = np.unique(keys, return_inverse=True)
    rows_u = (uniq // n_cols).astype(np.int32)
    cols_u = (uniq % n_cols).astype(np.int32)
    indptr = np.zeros(n_rows + 1, np.int32)
    np.add.at(indptr, rows_u + 1, 1)
    return np.cumsum(indptr, dtype=np.int32), cols_u, inv.astype(np.int32)


def test_csr_template_matches_numpy_unique():
    rng = np.random.default_rng(0)
    for n_rows, n_cols, ncoo in [(7, 7, 40), (100, 100, 1000), (3, 5, 1)]:
        rows = rng.integers(0, n_rows, ncoo).astype(np.int64)
        cols = rng.integers(0, n_cols, ncoo).astype(np.int64)
        got = native.csr_template_native(n_rows, n_cols, rows, cols)
        want = _py_csr(n_rows, n_cols, rows, cols)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)


def test_csr_template_rejects_out_of_range():
    with pytest.raises(ValueError):
        native.csr_template_native(4, 4, np.array([5], np.int64),
                                   np.array([0], np.int64))


def test_structured_connections_match_python_generator():
    from mpp_tpu.constants import ConnKind
    from mpp_tpu.dtypes import mesh as m

    ids = m.compute_cell_ids(3, 4, 5)
    for idir, nat_dir in [(ConnKind.IN_X_DIR, 1), (ConnKind.IN_Y_DIR, 2),
                          (ConnKind.IN_Z_DIR, 3)]:
        id_up, id_dn, dup, ddn, area = native.structured_connections_native(
            3, 4, 5, 0.5, 0.25, 2.0, nat_dir)
        # reproduce the reference loop order in pure python
        exp_up, exp_dn = [], []
        off = {1: (1, 0, 0), 2: (0, 1, 0), 3: (0, 0, 1)}[nat_dir]
        for ii in range(3 - off[0]):
            for jj in range(4 - off[1]):
                for kk in range(5 - off[2]):
                    exp_up.append(ids[kk, jj, ii])
                    exp_dn.append(ids[kk + off[2], jj + off[1], ii + off[0]])
        np.testing.assert_array_equal(id_up, exp_up)
        np.testing.assert_array_equal(id_dn, exp_dn)
        dist = {1: 0.5, 2: 0.25, 3: 2.0}[nat_dir]
        face = {1: 0.25 * 2.0, 2: 0.5 * 2.0, 3: 0.5 * 0.25}[nat_dir]
        assert np.all(dup == 0.5 * dist) and np.all(ddn == 0.5 * dist)
        assert np.all(area == face)


def test_petsc_vec_codec_roundtrip(tmp_path):
    p = str(tmp_path / "vec.bin")
    x = np.linspace(-3.0, 7.5, 17)
    assert native.petsc_vec_write_native(p, x)
    y = np.array([1.5, -2.25])
    assert native.petsc_vec_write_native(p, y, append=True)

    data0, off = native.petsc_vec_read_native(p, 0)
    np.testing.assert_array_equal(data0, x)
    data1, _ = native.petsc_vec_read_native(p, off)
    np.testing.assert_array_equal(data1, y)

    # interchangeable with the numpy codec
    from mpp_tpu.io import petsc_vec
    np.testing.assert_array_equal(petsc_vec.read_vec(p), x)
    p2 = str(tmp_path / "vec2.bin")
    petsc_vec.write_vec(p2, x)
    data2, _ = native.petsc_vec_read_native(p2, 0)
    np.testing.assert_array_equal(data2, x)


def test_mesh_generator_uses_native_and_matches():
    """structured_mesh output is identical whether or not native is used."""
    from mpp_tpu.constants import ConnKind
    from mpp_tpu.dtypes import mesh as m

    mesh = m.structured_mesh("t", 1.0, 1.5, 2.0, 3, 4, 5, ConnKind.IN_Z_DIR)
    cs = mesh.intrn_conn_sets[0]
    # compare against the pure-python loop
    ids = m.compute_cell_ids(3, 4, 5)
    exp_up = [ids[kk, jj, ii] for ii in range(3) for jj in range(4)
              for kk in range(4)]
    np.testing.assert_array_equal(np.asarray(cs.id_up), exp_up)
