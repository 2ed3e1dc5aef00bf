"""L1' — TPU-native sparse semiring linear algebra.

The GraphBLAS replacement (reference: /root/reference/graph/src/graph/graphblas/).
Sparse matrices are pytrees of static-shaped device arrays; the hot operations
(semiring SpMV / SpMM / masked mxm) are edge-centric jitted XLA programs
(blocked-ELL / packed-gather formulations tuned to the measured v5e
gather/segment-reduce characteristics — see PERF.md).
"""

from falkordb_tpu.sparse.semiring import (  # noqa: F401
    Semiring,
    ANY_PAIR_BOOL,
    LOR_LAND_BOOL,
    PLUS_TIMES_F32,
    PLUS_TIMES_F64,
    MIN_PLUS_F32,
    MAX_TIMES_F32,
    MIN_FIRST_F32,
    PLUS_FIRST_F32,
    PLUS_PAIR_I32,
    MIN_SECOND_I32,
    get_semiring,
)
from falkordb_tpu.sparse.coo import COO  # noqa: F401
from falkordb_tpu.sparse.csr import CSR  # noqa: F401
from falkordb_tpu.sparse.ops import (  # noqa: F401
    mxv,
    vxm,
    spmm,
    masked_vxm,
    masked_mxv,
    ewise_add_host,
    ewise_mult_mask,
    ewise_anti_mask,
    reduce_rows,
    reduce_scalar,
    expand,
    apply as sp_apply,
    select as sp_select,
)
from falkordb_tpu.sparse.delta import DeltaMatrix  # noqa: F401
