"""Multi-host gate: jax.distributed.initialize across 2 CPU processes,
global mesh, process-local batch feeding, GSPMD-inserted cross-process
collective — the multi-host extension of the reference's single-node DP
(train_networks, src/network.c:1091) that sync_nets never had.

Runs two real OS processes against a localhost coordinator; each
contributes 2 virtual CPU devices -> a 4-device global mesh.
"""

import socket
import subprocess
import sys

WORKER = r"""
import os, sys
port, pid = sys.argv[1], int(sys.argv[2])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=2"
    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    " --xla_cpu_collective_call_terminate_timeout_seconds=600")
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp
from yolo_tensorflow_tpu.parallel import mesh as M

M.init_distributed(f"localhost:{port}", 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()
assert len(jax.local_devices()) == 2
mesh = M.make_mesh()          # (4, 1): data=4 across both processes

def step(w, x):
    y = x @ w                  # rows sharded over 'data'
    g = jnp.mean(y)            # global mean -> GSPMD inserts the psum
    return w - 0.1 * g, g

f = jax.jit(step,
            in_shardings=(M.replicated(mesh), M.batch_sharding(mesh)),
            out_shardings=(M.replicated(mesh), None))
w = jnp.ones((8, 8), jnp.float32)
# each process feeds its LOCAL rows of the global (4, 8) batch:
# process 0 -> value 1.0 rows, process 1 -> value 2.0 rows
local = np.full((2, 8), pid + 1.0, np.float32)
# shard_batch's multi-host path assembles the global array from local rows
images_local = np.zeros((2, 4, 4, 3), np.float32)
imgs, x = M.shard_batch(mesh, images_local, local)
assert imgs.shape == (4, 4, 4, 3)      # global batch across processes
assert x.shape == (4, 8)
w2, g = f(w, x)
# y rows: 8*1, 8*1, 8*2, 8*2 -> global mean 12; a process seeing only its
# local rows would get 8 or 16 — the value proves the cross-host psum ran
assert abs(float(g) - 12.0) < 1e-5, float(g)
w2np = np.asarray(jax.device_get(w2.addressable_shards[0].data))
assert np.allclose(w2np, 1.0 - 1.2), w2np

# runner.py's resume path broadcasts process 0's restored (state, step) so
# hosts without a shared ckpt dir cannot desync; prove the pytree
# broadcast carries process 0's values to everyone
from jax.experimental import multihost_utils
mine = ({"a": np.full((3,), pid, np.float32)}, np.int64(1000 * (pid + 1)))
theirs, step = multihost_utils.broadcast_one_to_all(mine)
assert int(step) == 1000, int(step)
assert np.allclose(np.asarray(theirs["a"]), 0.0), theirs
sys.stdout.write(f"MULTIHOST_OK {pid}\n")
sys.stdout.flush()
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_mesh(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    # stderr is captured SEPARATELY: gloo logs raw writes to fd 2, and with
    # a merged pipe those can interleave mid-token with Python's stdout
    # buffer flushes (observed: "MULTIHOST_OK[Gloo] Rank 0 ...\n 0")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(port), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd="/root/repo") for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=300)
            outs.append((out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}\n{err}"
        assert f"MULTIHOST_OK {pid}" in out, f"{out}\n{err}"
