"""Device kernels: first-order closed form, source matmul, sweeps, small-µ."""
