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

# Stream SP with the time axis SPANNING the process boundary: the
# multipath halo ppermute and the psum BER reduction become genuine
# cross-process collectives (the "2-host boundary collectives" of
# BASELINE config 5, executed for real at CPU scale).
from sdr_tpu.core.config import Equalizer
from sdr_tpu.parallel import make_sharded_stream_fn

mp_cfg = LinkConfig(
    modulation=Modulation.QAM16, ofdm=OFDMConfig(64, 16),
    channel=ChannelConfig(
        model=ChannelModel.MULTIPATH, ebno_db=12.0, pdp=(1.0, 0.6, 0.3)
    ),
    equalizer=Equalizer.MMSE, n_symbols=8, n_channels=2,
)
smesh = make_link_mesh(2, 2)  # time axis = one row per PROCESS
se, sc = make_sharded_stream_fn(mp_cfg, smesh, n_blocks=4)(jax.random.PRNGKey(7))
sg = multihost_utils.process_allgather(se, tiled=True)
if pid == 0:
    print("STREAM_ERRORS=" + ",".join(str(int(x)) for x in np.asarray(sg)), flush=True)
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
    sline = next(
        ln for ln in outs[0][1].splitlines() if ln.startswith("STREAM_ERRORS=")
    )
    stream_errors = np.array(
        [int(x) for x in sline[len("STREAM_ERRORS="):].split(",")]
    )

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

    # Cross-process halo ppermute + psum: the multipath stream sharded
    # with the TIME axis spanning both processes must equal the
    # single-process oracle bit-exactly.
    from sdr_tpu.core.config import Equalizer
    from sdr_tpu.link.stream import stream_simulate

    mp_cfg = LinkConfig(
        modulation=Modulation.QAM16,
        ofdm=OFDMConfig(64, 16),
        channel=ChannelConfig(
            model=ChannelModel.MULTIPATH, ebno_db=12.0, pdp=(1.0, 0.6, 0.3)
        ),
        equalizer=Equalizer.MMSE,
        n_symbols=8,
        n_channels=2,
    )
    se_ref, _ = stream_simulate(mp_cfg, jax.random.PRNGKey(7), n_blocks=4)
    np.testing.assert_array_equal(stream_errors, np.asarray(se_ref))
