from gpyrn_tpu.models import gprn  # noqa: F401
