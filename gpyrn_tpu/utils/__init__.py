from gpyrn_tpu.utils import astro  # noqa: F401
