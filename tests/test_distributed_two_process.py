"""Two-process jax.distributed rehearsal on CPU (VERDICT round-1 item 7).

Spawns two real processes with a local coordinator, shards a work list by
process, psums per-host metrics, and asserts the reduced totals equal the
single-process result — the multi-host path that had only ever run with
process_count == 1.
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.process_index() == pid

from sola_tpu.parallel.distributed import all_sum, shard_for_host

items = list(range(23))
mine = shard_for_host(items)
# per-host metrics: count + sum over this host's share
local = {"n": float(len(mine)), "total": float(sum(mine))}
reduced = all_sum(local)
assert reduced["n"] == float(len(items)), reduced
assert reduced["total"] == float(sum(items)), reduced
print(f"proc {pid}: ok n={reduced['n']} total={reduced['total']}")
"""


def test_two_process_allsum_and_sharding(tmp_path):
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # no forced device count in the children

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [
        subprocess.Popen([sys.executable, str(script), str(pid), "2", port],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-2000:]}"
        assert "ok n=23.0 total=253.0" in out, out
