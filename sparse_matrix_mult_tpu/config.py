"""Configuration for the TPU-native sparse-multiply framework.

The reference exposes exactly one tuning knob (``imem_size``, a percent-of-
dense memory heuristic, ``/root/reference/src/sparse_sparse_sparse.cpp:69-80``)
plus the ``OMP_NUM_THREADS`` environment variable.  On TPU the analogous knobs
are the precision policy (how we hit the fp64 oracle on f32-native hardware),
tile sizes for the Pallas kernels, and the dense-path size cutoff.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

__all__ = ["Config", "get_config", "set_config", "Precision"]


class Precision:
    """Compute-precision policies for TPU execution.

    * ``FAST``     -- float32 inputs, 6-pass (bf16x6) MXU matmul
      (``precision='highest'``).  Empirically max-rel error ~2e-7 on the
      reference's test matrices: comfortably inside the scipy oracle's
      rtol=1e-5/atol=1e-8 (``/root/reference/tests/test_basic.py:54``).
    * ``SPLIT``    -- double-float (hi/lo) operand split, three f32 matmuls
      recombined in f64.  Removes input-rounding error; accumulation error
      stays ~sqrt(K)*eps_f32.
    * ``STRICT``   -- full float64 (XLA software-emulated on TPU; exact parity
      with scipy, ~10-50x slower).
    * ``AUTO``     -- choose by estimated dot-product length: FAST below
      ``auto_strict_terms`` expected terms, SPLIT above, STRICT never (opt-in).
    """

    FAST = "fast"
    SPLIT = "split"
    STRICT = "strict"
    AUTO = "auto"


@dataclasses.dataclass
class Config:
    # Precision policy used on TPU backends (CPU always computes native f64).
    precision: str = Precision.AUTO
    # Above this many expected accumulation terms per output element, AUTO
    # upgrades FAST -> SPLIT to keep headroom under rtol=1e-5.
    auto_split_terms: int = 1 << 16
    # Dense fast path is used when rows*cols of every involved matrix is at
    # most this many elements (f32 bytes = 4x this).  1 GiB of f32 by default.
    dense_path_limit: int = 1 << 28
    # Below this many output elements, the DENSE-route sparse-output
    # extraction happens on host (download the small dense product, pack
    # with scipy's C code) instead of on device.  Round 5: small sparse
    # outputs mostly bypass the dense route entirely (the binned ESC
    # engine runs 1000^2 d=0.01 in ~0.4 ms device-resident), so this
    # limit only governs the residual dense-panel cases; the device
    # extraction stitch itself measured ~1-2 ms at panel sizes <= 4M
    # elements in round 5 (down from the ~20 ms round-1 floor).
    host_extract_limit: int = 1 << 22
    # At or below this many partial products the scipy-in/scipy-out API
    # computes on the HOST via the native OpenMP Gustavson kernel
    # (utils/native.py spgemm_host): a device dispatch alone costs more
    # wall time than the whole multiply down here (the reference makes the
    # same call about its serial mode vs MKL, README.md:16-17).  Device-
    # native entry points (multiply, spgemm_*) never route to host.
    host_compute_limit: int = 1 << 19
    # Host-vs-device cost model for the scipy-in/scipy-out API (above the
    # hard limit): route to host when
    #   partials / host_rate  <  link_fixed_s + up_bytes / link_up_bytes_per_s
    #                            + down_bytes / link_down_bytes_per_s,
    # with host_rate = host_rate_base * sqrt(reuse) where reuse =
    # partials / output-slots models SPA cache amortization (measured on
    # this 2-core host: ~4e7 partials/s at reuse~1, ~4.8e8 at reuse~100).
    # Defaults model a locally attached accelerator (PCIe-class link);
    # behind slower links the auto-calibration below fixes the link terms.
    # The two directions are modeled separately: the tunneled chip here
    # uploads ~3x faster than it downloads (measured ~95-130 vs ~28-47 MB/s).
    host_rate_base: float = 5e7
    link_fixed_s: float = 2e-3
    link_up_bytes_per_s: float = 8e9
    link_down_bytes_per_s: float = 8e9
    # Host dense->CSR pack rate (elements/s) for the dense-panel download
    # route (native OpenMP kernel, utils/native.py dense_pack).
    host_pack_rate: float = 2.5e7
    # Measure the real dispatch latency + device->host bandwidth once, at
    # the first routing decision, and overwrite the two link_* fields.
    # Costs one trivial dispatch + one ~2 MB fetch (~5 ms on local
    # hardware; ~0.2 s behind a network tunnel, amortized over the
    # process).  Disable for fully deterministic routing.
    auto_calibrate_link: bool = True
    # Target partial products per ESC dispatch.  The chunked large-sparse
    # path sizes its flop-balanced row chunks against this; a single row
    # whose flop count exceeds it still runs in ONE dispatch with a larger
    # (actual-size) capacity, so termination never depends on this value.
    esc_expand_limit: int = 1 << 22
    # Row-binned 2D ESC engine (ops/spgemm_binned.py): per-lane sort width
    # and ELLPACK slice window.  Lanes of 4096 measured fastest on v5e
    # (2D row sort 0.92 ms at 2.6M vs 5.3 ms for the 1D device-wide sort);
    # the engine is preferred whenever its host planner finds a layout
    # within its padding budget, falling back to windowed/classic ESC.
    use_binned_esc: bool = True
    binned_lane_width: int = 4096
    binned_window: int = 8
    # Single-dispatch budget for the binned engine (partial products).
    # Its live set is ~6 buffers of the padded lane volume (<= 3x the
    # expansion, planner-enforced), so 32M partials is ~2.3 GB -- well
    # inside one chip's HBM and 8x the 1D engines' dispatch budget.  The
    # 100k/200k hypersparse configs (1e7 / 2e7 partials) become single
    # binned dispatches instead of chunked-windowed runs (measured v5e:
    # 42 ms vs 0.40 s at 100k).  Scaled by the same imem_size hint as
    # esc_expand_limit.
    binned_expand_limit: int = 1 << 25
    # Pallas BSR kernel block edge (MXU native tile).
    block_size: int = 128
    # Route block-structured operands through the Pallas BSR kernel when the
    # fraction of nonzero (block_size x block_size) blocks in A is at most
    # this cutoff (it skips zero blocks entirely: no load, no FLOPs).
    use_bsr: bool = True
    bsr_occupancy_cutoff: float = 0.25
    # Force the BSR route regardless of backend/size (tests).
    force_pallas_bsr: bool = False
    # Use the Pallas conversion kernels (ops.pallas.convert_kernels) for
    # large CSR<->dense conversions on TPU.  On other backends they run in
    # interpreter mode, so the XLA shift networks stay the default there
    # unless this is forced for testing.
    use_pallas_convert: bool = True
    # Force the Pallas conversion path regardless of backend (tests).
    force_pallas_convert: bool = False
    # Use the Pallas upper-triangular matmul kernel for symmetric products
    # and the triple product's second contraction on TPU (~2x fewer FLOPs).
    use_pallas_triu: bool = True
    # Force the triangular kernel regardless of backend (tests).
    force_pallas_triu: bool = False
    # Allow the triangular kernel's f32 tile products to run as a double-bf16
    # split (3 full-rate MXU passes, ~2.1x faster than 6-pass f32 on v5e).
    # Accuracy model: the dropped lo*lo term bounds the error by
    # ~2^-16 * (|A|@|B|) elementwise -- measured max-rel ~3e-6 on the
    # reference's non-negative test matrices, but for mixed-sign data with
    # heavy cancellation the error RELATIVE TO THE TRUE VALUE is unbounded.
    # It is therefore only engaged when the caller EXPLICITLY requests
    # ``precision='fast'``; AUTO-resolved FAST keeps full 6-pass f32.
    triu_split3: bool = True
    # Round 5: even under explicit FAST, split3 is engaged only when the
    # term-count error model clears the reference oracle's rtol=1e-5 with
    # margin (ops/dense_path.py::_split3_within_oracle) -- sparse-
    # accumulation configs (few terms per output entry) measured 2.5e-5
    # and now silently get 6-pass f32.  Set False to force split3
    # whenever triu_split3 is on (the round-4 behavior).
    triu_split3_gate: bool = True
    # Emit the reference's "Multiplication resulted in a zero matrix." notice
    # (/root/reference/sparse_matrix_mult/matrix_ops.py:370-373).
    zero_result_notice: bool = True
    # Structural-zero contract for SPARSE outputs.  The reference's
    # Gustavson workers keep every TOUCHED entry, including ones whose
    # accumulated value is exactly 0 (/root/reference/src/sparsework.cpp:
    # 73-110); modern scipy (>= 1.14) prunes them in matmul.  Routes here:
    # native-host Gustavson and ESC keep Gustavson structure; the scipy
    # small-problem host branch, dense extraction, and BSR prune.  With
    # keep_structure=True the sparse-output router uses only the
    # Gustavson-structure strategies (native host kernel at every size,
    # ESC, chunked ESC), so nnz patterns match the reference exactly for
    # cancellation-prone inputs -- at a performance cost for dense-ish
    # products.
    keep_structure: bool = False
    # Default mesh axis name for distributed SpGEMM.
    mesh_axis: str = "rows"
    # Per-device dense working-set budget for the distributed layer: when a
    # shard's dense row panel (rows_pad x n x itemsize, A-panel + B-panel +
    # C-panel) would exceed this, spgemm_csr_distributed auto-dispatches to
    # the sparse local contraction (spgemm_csr_distributed_sparse) instead
    # of densifying per shard.  4 GiB default (~1/4 of a v5e chip's HBM).
    dense_shard_budget_bytes: int = 4 << 30
    # Force the pure-jnp fallback everywhere (debugging).
    force_reference_path: bool = False

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


_config = Config()

if os.environ.get("SMM_TPU_PRECISION"):
    _config.precision = os.environ["SMM_TPU_PRECISION"]


def get_config() -> Config:
    return _config


def set_config(cfg: Optional[Config] = None, **kw) -> Config:
    global _config
    if cfg is not None:
        _config = cfg
    if kw:
        _config = _config.replace(**kw)
    return _config
