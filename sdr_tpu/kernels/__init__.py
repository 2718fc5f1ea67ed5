from sdr_tpu.kernels.fft_matmul import matmul_fft  # noqa: F401
