"""Multi-host path: spawn a real 2-process jax.distributed CPU cluster
(4 virtual devices each; global dp=2 x sp=4 mesh with cross-host
collectives) and run the sharded align step end-to-end."""
import os
import socket
import subprocess
import sys


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_cluster():
    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "multihost_dryrun.py")
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]
    assert "64/64 local reads accepted" in outs[0]
    assert "64/64 local reads accepted" in outs[1]
