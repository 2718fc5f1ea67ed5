"""Pipeline parallelism: staged link on the virtual CPU mesh.

Invariant: the 2-stage pipelined fast link equals the unsharded
fast_simulate bit-exactly for every (channel-shard, microbatch)
layout and channel model the fast path supports.
"""

import numpy as np
import pytest
import jax

from sdr_tpu.core.config import (
    ChannelConfig,
    ChannelModel,
    Equalizer,
    LinkConfig,
    Modulation,
    OFDMConfig,
)
from sdr_tpu.link.fast import fast_simulate
from sdr_tpu.parallel import make_link_mesh
from sdr_tpu.parallel.pp import make_pipelined_fast_fn


def _cfg(model=ChannelModel.AWGN, n_channels=16, **kw):
    ch = dict(model=model, ebno_db=10.0)
    if model == ChannelModel.MULTIPATH:
        ch["pdp"] = (1.0, 0.5, 0.25)
    if model == ChannelModel.RAYLEIGH_TIME:
        ch["doppler_norm"] = 0.02
    return LinkConfig(
        modulation=Modulation.QAM16,
        ofdm=OFDMConfig(64, 16),
        channel=ChannelConfig(**ch),
        equalizer=Equalizer.MMSE,
        n_symbols=8,
        n_channels=n_channels,
        **kw,
    )


@pytest.mark.parametrize("cdev,n_micro", [(1, 2), (1, 4), (4, 2), (2, 4)])
def test_pipelined_bit_exact_awgn(cdev, n_micro):
    mesh = make_link_mesh(2, cdev, devices=jax.devices()[: 2 * cdev])
    cfg = _cfg(n_channels=16)
    key = jax.random.PRNGKey(3)
    ref_err, ref_cnt = fast_simulate(cfg, key)
    got_err, got_cnt = make_pipelined_fast_fn(cfg, mesh, n_micro=n_micro)(key)
    np.testing.assert_array_equal(np.asarray(got_err), np.asarray(ref_err))
    np.testing.assert_array_equal(np.asarray(got_cnt), np.asarray(ref_cnt))


@pytest.mark.parametrize(
    "model",
    [
        ChannelModel.RAYLEIGH_FLAT,
        ChannelModel.MULTIPATH,
        ChannelModel.RAYLEIGH_TIME,
    ],
)
def test_pipelined_bit_exact_fading(model):
    mesh = make_link_mesh(2, 2, devices=jax.devices()[:4])
    cfg = _cfg(model=model, n_channels=8)
    key = jax.random.PRNGKey(4)
    ref_err, _ = fast_simulate(cfg, key)
    got_err, _ = make_pipelined_fast_fn(cfg, mesh, n_micro=2)(key)
    np.testing.assert_array_equal(np.asarray(got_err), np.asarray(ref_err))


def test_pipelined_validation():
    mesh = make_link_mesh(4, 2, devices=jax.devices())
    with pytest.raises(ValueError, match="stage"):
        make_pipelined_fast_fn(_cfg(), mesh)
    mesh2 = make_link_mesh(2, 4, devices=jax.devices())
    with pytest.raises(ValueError, match="divisible"):
        make_pipelined_fast_fn(_cfg(n_channels=16), mesh2, n_micro=3)
    with pytest.raises(NotImplementedError):
        make_pipelined_fast_fn(
            _cfg(n_channels=16, pilot_spacing=4), mesh2, n_micro=2
        )
