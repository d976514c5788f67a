"""Multi-process (multi-host analog) DP training test (SURVEY.md §5.8).

Executes the previously-unverified ``jax.distributed.initialize`` branch of
``parallel/multihost.py`` on a REAL 2-process JAX cluster: two subprocesses,
each owning 4 virtual CPU devices, form one 8-device mesh via the JAX
coordination service; cross-process collectives run over Gloo. The DP
stage-2 train step (jit + NamedSharding) executes with each process feeding
only its addressable batch rows (``local_batch_slice``), exactly the
multi-host data-sharding contract the module documents. Real DCN hardware
remains unavailable in this environment; what this test pins down is that
the initialize branch, the per-process feeding, and the cross-process
gradient reduction execute and agree.
"""

import pytest
import re
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = """
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_COORDINATOR_ADDRESS"] = "localhost:" + port
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(pid)
sys.path.insert(0, {repo!r})

import jax
jax.config.update("jax_platforms", "cpu")
from music_synthesis_tpu.parallel import multihost
multihost.initialize()

import dataclasses
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from music_synthesis_tpu.config import TINY
from music_synthesis_tpu.parallel.dp import make_dp_stage2_step
from music_synthesis_tpu.parallel.mesh import replicate_state
from music_synthesis_tpu.train import stage2

assert jax.process_count() == 2, jax.process_count()
devs = jax.devices()
assert len(devs) == 8, len(devs)
mesh = Mesh(np.array(devs), ("data",))
cfg = dataclasses.replace(
    TINY, train=dataclasses.replace(
        TINY.train, batch_size=8, segment_length=2048, mesh_shape=(8,)))
state = replicate_state(
    stage2.make_train_state(cfg, jax.random.PRNGKey(0)), mesh)
step = make_dp_stage2_step(cfg, mesh)

B, L = 8, 2048
sl = multihost.local_batch_slice(B)
rng = np.random.default_rng(0)  # both procs derive the same global batch
wav_global = 0.5 * np.tanh(rng.normal(size=(B, L))).astype(np.float32)
sh = NamedSharding(mesh, P("data"))
wav = jax.make_array_from_process_local_data(sh, wav_global[sl], (B, L))
for _ in range(2):
    state, metrics = step(state, wav)
d = float(jax.device_get(
    jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(
        metrics["d_loss"]).addressable_shards[0].data))
assert np.isfinite(d)
print("MULTIHOST_DP_OK pid=%d d_loss=%.6f" % (pid, d), flush=True)
jax.distributed.shutdown()
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_step(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=str(REPO)))
    port = str(_free_port())
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
    losses = []
    for out in outs:
        m = re.search(r"MULTIHOST_DP_OK pid=\d d_loss=([0-9.eE+-]+)", out)
        assert m, out[-3000:]
        losses.append(float(m.group(1)))
    # Replicated metrics must agree bitwise across processes.
    assert losses[0] == losses[1], losses