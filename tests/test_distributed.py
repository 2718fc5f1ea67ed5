"""Real two-process jax.distributed smoke test.

parallel.distributed.init_multihost is exercised as an actual
multi-process runtime here — two spawned CPU processes, each with two
virtual devices, form one 4-device global mesh and run the sharded
link; the result must equal the single-process run bit-exactly (the
global-index PRNG keying invariant crossing a PROCESS boundary, not
just a device boundary).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.environ["SDR_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from jax.experimental import multihost_utils
from sdr_tpu.parallel import init_multihost, make_link_mesh, make_sharded_simulate_fn
from sdr_tpu.core.config import (ChannelConfig, ChannelModel, LinkConfig,
                                 Modulation, OFDMConfig)

pid = int(sys.argv[1]); port = sys.argv[2]
info = init_multihost(f"127.0.0.1:{port}", 2, pid)
assert info["process_count"] == 2, info
assert info["global_devices"] == 4, info

cfg = LinkConfig(
    modulation=Modulation.QPSK, ofdm=OFDMConfig(64, 16),
    channel=ChannelConfig(model=ChannelModel.AWGN, ebno_db=6.0),
    n_symbols=4, n_channels=4,
)
mesh = make_link_mesh(1, 4)  # spans both processes' devices
errors, counted = make_sharded_simulate_fn(cfg, mesh)(jax.random.PRNGKey(0))
g = multihost_utils.process_allgather(errors, tiled=True)
if pid == 0:
    print("ERRORS=" + ",".join(str(int(x)) for x in np.asarray(g)), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_matches_single_process(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    env = {
        **os.environ,
        "SDR_REPO": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    }
    # The workers set their own JAX env before importing jax.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err}"
    line = next(
        ln for ln in outs[0][1].splitlines() if ln.startswith("ERRORS=")
    )
    dist_errors = np.array([int(x) for x in line[len("ERRORS="):].split(",")])

    # Single-process reference on this process's virtual mesh.
    import jax

    from sdr_tpu.core.config import (
        ChannelConfig,
        ChannelModel,
        LinkConfig,
        Modulation,
        OFDMConfig,
    )
    from sdr_tpu.link.pipeline import simulate

    cfg = LinkConfig(
        modulation=Modulation.QPSK,
        ofdm=OFDMConfig(64, 16),
        channel=ChannelConfig(model=ChannelModel.AWGN, ebno_db=6.0),
        n_symbols=4,
        n_channels=4,
    )
    ref = simulate(cfg, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(dist_errors, np.asarray(ref.bit_errors))
