"""Multi-controller (2-process x 4-device) CPU pod test.

Launches two OS processes that jointly form an 8-device mesh via
jax.distributed (the package's parallel.mesh.init_distributed /
make_pod_mesh path) and run the psum-reduced mixed DH+sign+verify pipeline
on a globally-sharded batch. This is the multi-host bring-up the reference
deliberately lacks (reference README.md:19-21); SURVEY.md §2/§4 make it a
first-class requirement here."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_pod_mixed_pipeline():
    port = _free_port()
    nproc, dpp = 2, 4
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # the axon TPU plugin injects itself via a sitecustomize on PYTHONPATH
    # (and re-exports JAX_PLATFORMS=axon) before worker code runs; strip it
    # so the workers are honest CPU-only controllers
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(nproc), str(port),
             str(dpp)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    joined = "\n---\n".join(outs)
    for kw in ("UNIMPLEMENTED", "does not support", "unsupported"):
        if any(p.returncode != 0 for p in procs) and kw in joined:
            pytest.skip("multi-process CPU collectives unsupported here: "
                        + joined[-500:])
    assert all(p.returncode == 0 for p in procs), joined
    # B = 4 * nproc * dpp = 32 lanes, 2 protocol ops per lane
    assert all("MP_OK ok=64 ops=64 procs=2 devs=8" in o for o in outs), joined
