"""Static-sparsity CSR assembly from connection-set scatter contributions.

Replaces the reference's PETSc ``Mat`` AIJ + ``MATPREALLOCATOR`` two-pass
sparsity discovery (``soe/SystemOfEquationsBaseType.F90:593-613``) with a
trace-time design: the set of (row, col) contribution slots is known
statically from the connection sets, so we

1. collect all COO contribution coordinates once (numpy, setup time),
2. compute the unique CSR sparsity and a slot map coo-entry -> csr-entry,
3. at solve time, assembly is one ``.at[slots].add(values)`` scatter —
   a pure jittable function of the contribution values.

This works for single equations and for coupled block systems (block
offsets simply shift the coordinates — the DMComposite analog).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CSRTemplate:
    """Static CSR sparsity + COO->CSR slot map."""
    n_rows: int
    n_cols: int
    indptr: np.ndarray      # [n_rows+1] int32
    indices: np.ndarray     # [nnz] int32 column indices
    slots: np.ndarray       # [ncoo] int32: csr slot of each contribution

    @property
    def nnz(self) -> int:
        return int(self.indices.shape[0])

    def assemble(self, values: jnp.ndarray) -> jnp.ndarray:
        """Scatter-add COO contribution values into CSR data (jittable)."""
        data = jnp.zeros(self.nnz, dtype=values.dtype)
        return data.at[jnp.asarray(self.slots)].add(values)

    def matvec(self, data: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """CSR SpMV via gather + segment-sum (jittable, works on any backend)."""
        rows = self.row_ids()
        prod = data * x[jnp.asarray(self.indices)]
        return jnp.zeros(self.n_rows, dtype=prod.dtype).at[jnp.asarray(rows)].add(prod)

    def row_ids(self) -> np.ndarray:
        return np.repeat(np.arange(self.n_rows, dtype=np.int32),
                         np.diff(self.indptr))

    def to_dense(self, data: jnp.ndarray) -> jnp.ndarray:
        dense = jnp.zeros((self.n_rows, self.n_cols), dtype=data.dtype)
        rows = self.row_ids()
        return dense.at[jnp.asarray(rows), jnp.asarray(self.indices)].add(data)

    def diag_slots(self) -> np.ndarray:
        """CSR slot of each diagonal entry (requires full diagonal present)."""
        rows = self.row_ids()
        mask = rows == self.indices
        slot = np.full(self.n_rows, -1, np.int64)
        slot[rows[mask]] = np.nonzero(mask)[0]
        if (slot < 0).any():
            raise ValueError("matrix has empty diagonal entries")
        return slot


def csr_template(n_rows: int, n_cols: int, coo_rows, coo_cols) -> CSRTemplate:
    """Build the static CSR sparsity from COO contribution coordinates.

    Uses the mppnative C++ builder when available (same sorted-unique
    contract); falls back to numpy.
    """
    coo_rows = np.asarray(coo_rows, np.int64)
    coo_cols = np.asarray(coo_cols, np.int64)
    try:
        from mpp_tpu import native
        nat = native.csr_template_native(n_rows, n_cols, coo_rows, coo_cols)
    except Exception:
        nat = None
    if nat is not None:
        indptr, indices, slots = nat
        return CSRTemplate(n_rows=n_rows, n_cols=n_cols, indptr=indptr,
                           indices=indices, slots=slots)
    keys = coo_rows * n_cols + coo_cols
    uniq, inv = np.unique(keys, return_inverse=True)
    rows_u = (uniq // n_cols).astype(np.int32)
    cols_u = (uniq % n_cols).astype(np.int32)
    indptr = np.zeros(n_rows + 1, np.int32)
    np.add.at(indptr, rows_u + 1, 1)
    indptr = np.cumsum(indptr, dtype=np.int32)
    return CSRTemplate(n_rows=n_rows, n_cols=n_cols, indptr=indptr,
                       indices=cols_u, slots=inv.astype(np.int32))
