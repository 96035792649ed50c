from gpyrn_tpu.utils import astro  # noqa: F401
from gpyrn_tpu.utils import profiling  # noqa: F401
# plots imports matplotlib lazily inside functions; import the
# module on demand: from gpyrn_tpu.utils import plots
