from gpyrn_tpu.inference import meanfield  # noqa: F401
