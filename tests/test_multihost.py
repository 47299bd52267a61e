"""Two-process ``jax.distributed`` test over the loopback DCN.

The reference has no inter-process story at all (SURVEY.md section 5:
"distributed communication backend -- Absent").  This test stands up a real
two-process JAX process group on CPU (each process contributing 2 virtual
devices), ingests row-sharded operands with :func:`shard_csr` -- each process
materializes only its addressable shards -- runs the ring SpGEMM across the
4-device global mesh, and has every process check its local result shards
against the scipy oracle.
"""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
import numpy as np

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

proc_id = int(sys.argv[1])
coordinator = sys.argv[2]

from sparse_matrix_mult_tpu.parallel.mesh import init_distributed

init_distributed(coordinator=coordinator, num_processes=2, process_id=proc_id)
init_distributed(coordinator=coordinator, num_processes=2, process_id=proc_id)  # idempotent
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

import scipy.sparse as sp

import sparse_matrix_mult_tpu.parallel.distributed as dist
from sparse_matrix_mult_tpu.parallel.distributed import (
    shard_csr,
    spgemm_dense_distributed,
)
from sparse_matrix_mult_tpu.parallel.mesh import row_mesh

# Same seeded problem on both processes (what a real loader would shard).
m = k = n = 40
A = sp.random(m, k, density=0.2, format="csr", random_state=1)
B = sp.random(k, n, density=0.2, format="csr", random_state=2)
mesh = row_mesh()
dist.TRACK_MATERIALIZATION = True
dist.MATERIALIZED_SHARDS.clear()
a = shard_csr(A, mesh)
b = shard_csr(B, mesh)

# Each process holds only its 2 of 4 global shards.
assert len(a.indices.addressable_shards) == 2, len(a.indices.addressable_shards)

# Per-process data locality: the placement callbacks materialized ONLY the
# shard blocks backing this process's own devices (2 per operand), never
# the full (S, cap) arrays.
own = sorted({s.index[0].start or 0 for s in a.indices.addressable_shards})
touched = sorted(set(dist.MATERIALIZED_SHARDS))
assert touched == own, (touched, own)
assert len(dist.MATERIALIZED_SHARDS) == 2 * len(own), dist.MATERIALIZED_SHARDS

c = spgemm_dense_distributed(a, b, mesh=mesh)
jax.block_until_ready(c)
ref = (A @ B).toarray()
rows_pad = a.rows_pad
for shard in c.addressable_shards:
    r0 = shard.index[0].start or 0
    local = np.asarray(shard.data)
    np.testing.assert_allclose(
        local, ref[r0 : r0 + local.shape[0]], rtol=1e-10, atol=1e-12
    )

# Sparse local contraction across the 2-process mesh: B blocks ring-rotate
# as packed CSR over the loopback DCN; each process checks its local output
# shards against the oracle (no gather of the global result).
from sparse_matrix_mult_tpu.parallel.distributed import (
    spgemm_csr_distributed_sparse,
)

out = spgemm_csr_distributed_sparse(A, B, mesh=mesh, balance="flops")
jax.block_until_ready((out.indptrs, out.indices, out.values))


def _local(arr):
    return {sh.index[0].start or 0: np.asarray(sh.data)[0] for sh in arr.addressable_shards}


ips, ixs, vvs = _local(out.indptrs), _local(out.indices), _local(out.values)
bounds = out.row_bounds
assert len(ips) == 2  # this process's shards only
for s, ip in ips.items():
    r0, r1 = bounds[s], bounds[s + 1]
    rows_here = r1 - r0
    nnz = int(ip[rows_here]) if rows_here else 0
    local = sp.csr_matrix(
        (vvs[s][:nnz], ixs[s][:nnz], ip[: rows_here + 1]),
        shape=(rows_here, B.shape[1]),
    )
    np.testing.assert_allclose(
        local.toarray(), ref[r0:r1], rtol=1e-10, atol=1e-12
    )
print(f"proc {proc_id} OK", flush=True)
"""


_WORKER_IO = r"""
import os, sys, json
import numpy as np

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

proc_id = int(sys.argv[1])
coordinator = sys.argv[2]
prefix_a = sys.argv[3]
prefix_b = sys.argv[4]
e_step, cap_l, partials_cap = int(sys.argv[5]), int(sys.argv[6]), int(sys.argv[7])

from sparse_matrix_mult_tpu.parallel.mesh import init_distributed

init_distributed(coordinator=coordinator, num_processes=2, process_id=proc_id)
assert jax.process_count() == 2 and len(jax.devices()) == 4

import scipy.sparse as sp

from sparse_matrix_mult_tpu import io as smm_io
from sparse_matrix_mult_tpu.parallel.distributed import (
    spgemm_csr_distributed_sparse,
    triple_product_distributed_sparse,
)
from sparse_matrix_mult_tpu.parallel.mesh import row_mesh

mesh = row_mesh()

# File-ingestion locality: track which shard files THIS process opens.
opened = []
_np_load = np.load
def tracking_load(path, *a, **k):
    opened.append(os.path.basename(str(path)))
    return _np_load(path, *a, **k)
np.load = tracking_load

a = smm_io.load_sharded_operand(prefix_a, mesh=mesh)
b = smm_io.load_sharded_operand(prefix_b, mesh=mesh)
jax.block_until_ready((a.indices, b.indices))

# This process's addressable devices back 2 of the 4 global shards; the
# lazy placement callbacks must have opened ONLY those shard files.
own = sorted({s.index[0].start or 0 for s in a.indices.addressable_shards})
assert len(own) == 2, own
opened_ids = sorted({int(p.split(".shard")[1].split(".")[0]) for p in opened})
assert opened_ids == own, (opened_ids, own)
np.load = _np_load

# Oracle from the full saved operands (test-only global view).
A = smm_io.load_sharded_result(prefix_a)
B = smm_io.load_sharded_result(prefix_b)
ref = A @ B

out = spgemm_csr_distributed_sparse(
    a, b, mesh=mesh,
    expand_step_capacity=e_step, shard_capacity=cap_l,
    partials_capacity=partials_cap,
)
jax.block_until_ready((out.indptrs, out.indices, out.values))
bounds = out.row_bounds
locals_ = {sh.index[0].start or 0: np.asarray(sh.data)[0]
           for sh in out.indptrs.addressable_shards}
ix_l = {sh.index[0].start or 0: np.asarray(sh.data)[0]
        for sh in out.indices.addressable_shards}
vv_l = {sh.index[0].start or 0: np.asarray(sh.data)[0]
        for sh in out.values.addressable_shards}
assert len(locals_) == 2
for s, ip in locals_.items():
    r0, r1 = bounds[s], bounds[s + 1]
    rows_here = r1 - r0
    nnz = int(ip[rows_here]) if rows_here else 0
    local = sp.csr_matrix(
        (vv_l[s][:nnz], ix_l[s][:nnz], ip[: rows_here + 1]),
        shape=(rows_here, B.shape[1]),
    )
    refl = ref[r0:r1]
    assert local.nnz == refl.nnz, (s, local.nnz, refl.nnz)
    d = abs(local - refl)
    assert (d.max() if d.nnz else 0.0) < 1e-8

# Distributed sparse triple product across the same 2-process mesh
# (rectangular H so the dense C panel stays test-sized).
H = A[:1200]
Q = B
tp = triple_product_distributed_sparse(H, Q, mesh=mesh)
jax.block_until_ready(tp)
full = (H @ Q @ H.T).toarray()
import numpy as _np
reft = _np.triu(full)
for shard in tp.addressable_shards:
    r0 = shard.index[0].start or 0
    local = _np.asarray(shard.data)
    _np.testing.assert_allclose(
        local, reft[r0 : r0 + local.shape[0]], rtol=1e-5, atol=1e-8
    )
print(f"proc {proc_id} OK", flush=True)
"""


def test_two_process_file_ingested_sparse_engine(tmp_path):
    """VERDICT r4 item 7: non-toy multi-host path -- save_partitioned with
    flop-balanced bounds at 10k rows, each process lazily ingesting ONLY its
    own shard files, sparse ring + distributed triple product across the
    2-process loopback-DCN mesh, per-process locality asserts intact."""
    import numpy as np
    import scipy.sparse as sp

    from sparse_matrix_mult_tpu import io as smm_io
    from sparse_matrix_mult_tpu.parallel.distributed import _expand_step_capacity
    from sparse_matrix_mult_tpu.types import bucket_capacity
    from sparse_matrix_mult_tpu.utils.testing import hypersparse_random

    m = 10_000
    A = hypersparse_random(m, m, 100_000, seed=81)
    B = hypersparse_random(m, m, 100_000, seed=82)
    prefix_a = str(tmp_path / "opA")
    prefix_b = str(tmp_path / "opB")
    smm_io.save_partitioned(prefix_a, A, 4, b_indptr=B.indptr)  # flop-balanced
    smm_io.save_partitioned(prefix_b, B, 4)  # uniform (contraction dim)

    import json

    with open(prefix_a + ".meta.json") as f:
        bounds = tuple(json.load(f)["bounds"])
    e_max, tot_max = _expand_step_capacity(A, B.indptr, B.shape[0], bounds, 4)
    e_step = bucket_capacity(e_max)
    cap_l = bucket_capacity(tot_max)
    partials_cap = bucket_capacity(tot_max) + e_step

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"

    script = tmp_path / "worker_io.py"
    script.write_text(_WORKER_IO)
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")
    }
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [
                sys.executable, str(script), str(i), coordinator,
                prefix_a, prefix_b, str(e_step), str(cap_l), str(partials_cap),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out, out


def test_two_process_ring_spgemm(tmp_path):
    # Bounded by the subprocess communicate(timeout=150) below.
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")
    }
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), coordinator],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=150)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out, out
