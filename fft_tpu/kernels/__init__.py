"""TPU compute kernels: MXU matmul-FFT and Pallas fused spectral mixing."""
