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
