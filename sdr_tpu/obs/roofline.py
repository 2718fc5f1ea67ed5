"""Roofline accounting for the demod chain.

The north star requires "FFT & LLR kernels at HBM/FLOP roofline"
(BASELINE.json); the reference has no performance reporting of any kind
(SURVEY.md §6). This module computes the analytic traffic/FLOP model of
the receive chain and turns a measured throughput into a fraction of
speed-of-light, so bench output is judged against physics instead of
vibes.

Chip profiles carry BOTH the datasheet numbers and a measured-on-this-
chip sustainable bandwidth (the axon-tunneled v5e sustains ~430 GB/s on
a chained large-buffer copy; datasheet is 819 GB/s).
"""

from __future__ import annotations

import dataclasses

from sdr_tpu.core.config import Modulation


@dataclasses.dataclass(frozen=True)
class ChipProfile:
    name: str
    hbm_gbps: float          # datasheet HBM bandwidth
    hbm_gbps_measured: float  # sustained, measured via chained copy
    f32_matmul_tflops: float  # effective f32-accurate matmul rate
    bf16_matmul_tflops: float = 0.0  # single-pass bf16 peak

    @classmethod
    def v5e(cls) -> "ChipProfile":
        # v5e: 819 GB/s HBM, 197 TFLOP/s bf16 peak; f32-ish matmul via
        # multi-pass bf16 lands near a third of peak.
        return cls("tpu-v5e", 819.0, 430.0, 65.0, 197.0)


@dataclasses.dataclass
class RooflineReport:
    bytes_per_sample: float
    flops_per_sample: float
    bound: str                    # "memory" | "compute"
    sol_samples_per_s: float      # speed-of-light on measured bandwidth
    sol_samples_per_s_datasheet: float
    achieved_samples_per_s: float | None = None

    @property
    def efficiency(self) -> float | None:
        if self.achieved_samples_per_s is None:
            return None
        return self.achieved_samples_per_s / self.sol_samples_per_s


def demod_roofline(
    n_fft: int,
    cp_len: int,
    mod: Modulation,
    chip: ChipProfile | None = None,
    fused: bool = True,
    write_llrs: bool = False,
    measured_samples_per_s: float | None = None,
    input_bytes_per_component: int = 4,
    single_pass_bf16: bool = False,
) -> RooflineReport:
    """Roofline for CP-strip → FFT → equalize → LLR, per input sample.

    ``fused``: the Pallas single-kernel path (HBM traffic = planar
    input read + optional LLR write; everything else VMEM). Non-fused
    models the XLA composition (FFT input/output materialized).
    A "sample" is one complex time sample entering the chain (CP
    included) — the bench's accounting.

    ``input_bytes_per_component``: 4 for float32 planes, 2 for the
    bfloat16 sample planes of the round-3 headline mode
    (SDR_BENCH_INPUT_DTYPE=bf16) — halves the memory speed-of-light's
    denominator.
    """
    chip = chip or ChipProfile.v5e()
    sym = n_fft + cp_len
    bps = mod.bits_per_symbol

    # planar re+im per complex sample
    in_bytes = sym * 2 * input_bytes_per_component
    llr_bytes = n_fft * bps * 4
    if fused:
        b = in_bytes + (llr_bytes if write_llrs else 0)
    else:
        # XLA path: input read + FFT in/out materialization + equalize/
        # LLR read (+ LLR write).
        b = in_bytes + 3 * n_fft * 8 + (llr_bytes if write_llrs else 0)
    bytes_per_sample = b / sym

    # DFT as complex matmul: 8·N² real FLOPs per symbol (the fused MXU
    # path); at n_fft >= 1024 the fused path is the FOUR-STEP kernel
    # (kernels/fourstep_pallas.py): an N2-wide matmul stage (8·N·N2)
    # plus a VPU radix-2 stage over the N1 chunks (~5·N·log2(N1)).
    # XLA's FFT is ~5·N·log2(N) but runs on scalar/vector units.
    if fused:
        n2 = None
        if n_fft >= 1024:
            from sdr_tpu.kernels.fourstep_pallas import _pick_n2

            n2 = _pick_n2(n_fft, cp_len)
        if n2 is not None:
            n1 = n_fft // n2
            f = 8.0 * n_fft * n2 + 5.0 * n_fft * max(n1.bit_length() - 1, 1)
        else:
            f = 8.0 * n_fft * n_fft
    else:
        f = 5.0 * n_fft * (n_fft.bit_length() - 1)
    # equalize + LLR: ~O(levels) elementwise per subcarrier; minor.
    f += n_fft * (10 + 4 * mod.levels_per_axis)
    flops_per_sample = f / sym

    # Single-pass bf16 (SDR_TPU_MXU_PRECISION=default, BER-gated per
    # modulation — docs/PERF.md round 3) runs at the bf16 peak; the
    # multi-pass f32-accurate modes at the derated f32 rate.
    mxu_tflops = (
        chip.bf16_matmul_tflops
        if (single_pass_bf16 and chip.bf16_matmul_tflops)
        else chip.f32_matmul_tflops
    )
    t_mem = bytes_per_sample / (chip.hbm_gbps_measured * 1e9)
    t_cmp = flops_per_sample / (mxu_tflops * 1e12)
    bound = "memory" if t_mem >= t_cmp else "compute"
    sol = 1.0 / max(t_mem, t_cmp)
    t_mem_ds = bytes_per_sample / (chip.hbm_gbps * 1e9)
    sol_ds = 1.0 / max(t_mem_ds, t_cmp)

    return RooflineReport(
        bytes_per_sample=bytes_per_sample,
        flops_per_sample=flops_per_sample,
        bound=bound,
        sol_samples_per_s=sol,
        sol_samples_per_s_datasheet=sol_ds,
        achieved_samples_per_s=measured_samples_per_s,
    )
