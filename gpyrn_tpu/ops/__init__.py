from gpyrn_tpu.ops import kernels, means, linalg  # noqa: F401
