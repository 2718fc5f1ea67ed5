"""BER gate for the channels-last pipelined demod kernel (round 4).

Methodology (docs/PERF.md "BER-gated" discipline): the throughput
configuration may only ship if its hard-decision error counts on a REAL
modulated link move negligibly vs the bit-exact reference path
(bf16x3 MXU + f32 samples, rows layout). Anything beyond ~1% at the
benched operating points would spend the 0.1 dB BER budget
(BASELINE.json north star) on kernel precision instead of physics.

Construction: X ~ 16-QAM grid, per-tone Rayleigh H, AWGN in the
frequency domain; the time-domain RX plane is ifft(H·X + N) + CP so the
unscaled-forward-FFT receive convention recovers H·X + N exactly.
Counts compared decision-for-decision on identical data:

  ref   : demod_count_chain  (rows layout, bf16x3, f32 samples)
  cl/x3 : demod_count_cl     (channels-last, bf16x3, f32 samples)
  cl/sp : demod_count_cl     (channels-last, single-pass default, bf16
                              samples — the bench configuration)

Usage: python scripts/gate_cl.py [ebno_db ...]   (default: 8 14)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sdr_tpu.core.config import Modulation

N_FFT = 256
CP = 64
SYM_LEN = N_FFT + CP
BATCH = int(os.environ.get("SDR_GATE_BATCH", "512"))
N_SYMS = int(os.environ.get("SDR_GATE_SYMS", "64"))
MOD = Modulation.QAM16


def _make_data(ebno_db: float):
    """Jitted synth → (re_rows, im_rows, hr, hi, idx, nv). All f32."""
    from sdr_tpu.ops.channel import ebno_db_to_noise_var
    from sdr_tpu.ops.modulation import _tables

    nv = float(ebno_db_to_noise_var(ebno_db, MOD.bits_per_symbol))
    table, _, _, _ = _tables(MOD)
    tab_r = jnp.asarray(np.real(table).astype(np.float32))
    tab_i = jnp.asarray(np.imag(table).astype(np.float32))

    @jax.jit
    def gen(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        idx = jax.random.randint(
            k1, (BATCH, N_SYMS, N_FFT), 0, 1 << MOD.bits_per_symbol
        )
        x = jax.lax.complex(tab_r[idx], tab_i[idx])
        h = jax.lax.complex(
            jax.random.normal(k2, (BATCH, 1, N_FFT)) * np.float32(np.sqrt(0.5)),
            jax.random.normal(k3, (BATCH, 1, N_FFT)) * np.float32(np.sqrt(0.5)),
        )
        n = jax.lax.complex(
            jax.random.normal(k4, (BATCH, N_SYMS, N_FFT)),
            jax.random.normal(jax.random.fold_in(k4, 1), (BATCH, N_SYMS, N_FFT)),
        ) * np.float32(np.sqrt(nv / 2.0))
        y = h * x + n
        t = jnp.fft.ifft(y, axis=-1)  # unscaled-forward convention inverse
        t = jnp.concatenate([t[..., N_FFT - CP:], t], axis=-1)
        return (
            jnp.real(t).astype(jnp.float32),
            jnp.imag(t).astype(jnp.float32),
            jnp.real(h)[:, 0, :],
            jnp.imag(h)[:, 0, :],
            idx.astype(jnp.int32),
        )

    return gen, nv


def main():
    ebnos = [float(a) for a in sys.argv[1:]] or [8.0, 14.0]
    from sdr_tpu.kernels import _matmul
    from sdr_tpu.kernels.demod_cl_pallas import demod_count_cl
    from sdr_tpu.ops.demod import demod_count_chain

    total_bits = BATCH * N_SYMS * N_FFT * MOD.bits_per_symbol
    for ebno in ebnos:
        gen, nv = _make_data(ebno)
        re, im, hr, hi, idx = gen(jax.random.PRNGKey(42))
        # rows layout views for the reference path
        hr3 = hr[:, None, :]
        hi3 = hi[:, None, :]

        os.environ["SDR_TPU_MXU_PRECISION"] = "bf16x3"

        @jax.jit
        def ref_fn(re, im, hr3, hi3, idx):
            return jnp.sum(
                demod_count_chain(re, im, hr3, hi3, idx, CP, MOD, nv,
                                  backend="pallas")
            )

        ref = int(ref_fn(re, im, hr3, hi3, idx))

        # channels-last views of the SAME data
        re_t = re.reshape(BATCH, N_SYMS * SYM_LEN).T
        im_t = im.reshape(BATCH, N_SYMS * SYM_LEN).T
        hr_t = hr.T
        hi_t = hi.T
        idx_t = idx.transpose(1, 2, 0).reshape(N_SYMS * N_FFT, BATCH)

        results = {"ref(rows,bf16x3,f32)": ref}
        for label, mode, bf16_in in (
            ("cl,bf16x3,f32", "bf16x3", False),
            ("cl,single-pass,bf16", "default", True),
        ):
            os.environ["SDR_TPU_MXU_PRECISION"] = mode
            a = (re_t.astype(jnp.bfloat16), im_t.astype(jnp.bfloat16)) if bf16_in else (re_t, im_t)

            @jax.jit
            def cl_fn(rt, it, hrt, hit, idxt):
                return jnp.sum(
                    demod_count_cl(rt, it, hrt, hit, idxt, CP, MOD, nv)
                )

            got = int(cl_fn(a[0], a[1], hr_t, hi_t, idx_t))
            results[label] = got

        ber_ref = ref / total_bits
        line = f"EbN0={ebno:g} dB  ref_errors={ref} (BER={ber_ref:.3e})"
        for k, v in results.items():
            if k.startswith("ref"):
                continue
            delta = (v - ref) / max(ref, 1) * 100.0
            line += f"  |  {k}: {v} ({delta:+.3f}%)"
        print(line, flush=True)


if __name__ == "__main__":
    main()
