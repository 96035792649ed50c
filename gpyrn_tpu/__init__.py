"""gpyrn_tpu — TPU-native Gaussian Process Regression Networks.

A ground-up JAX/XLA re-design of the capabilities of ``gpyrn``
(iastro-pt/gpyrn): GPRN mean-field variational inference with the whole
coordinate-ascent ELBO fit fused into a single jitted device computation,
autodiff hyperparameter gradients, batched/vmapped prediction and MCMC,
Bayesian evidence estimators, and mesh sharding for multi-chip scaling.

Public surface mirrors the reference (gpyrn/__init__.py):

>>> from gpyrn_tpu import inference, covfunc, meanfunc
"""

__version__ = "0.3.0"

from gpyrn_tpu import config  # noqa: F401  (enables x64 by default)

from gpyrn_tpu.ops import kernels as covfunc   # noqa: E402
from gpyrn_tpu.ops import means as meanfunc    # noqa: E402
from gpyrn_tpu.inference import meanfield      # noqa: E402
from gpyrn_tpu.inference import evidence       # noqa: E402
from gpyrn_tpu.inference import nonparametric  # noqa: E402
from gpyrn_tpu.inference import priors         # noqa: E402
from gpyrn_tpu.inference.meanfield import inference  # noqa: E402
from gpyrn_tpu import datasets                 # noqa: E402
from gpyrn_tpu import serving                  # noqa: E402

# convenience re-exports, matching the reference __init__
from gpyrn_tpu.ops.means import Constant, Linear              # noqa: E402
from gpyrn_tpu.ops.kernels import (SquaredExponential,        # noqa: E402
                                   QuasiPeriodic)
from gpyrn_tpu.models.gp import GP                            # noqa: E402

__all__ = [
    "inference", "covfunc", "meanfunc", "meanfield", "evidence",
    "nonparametric", "priors", "datasets", "serving", "GP",
    "Constant", "Linear", "SquaredExponential", "QuasiPeriodic",
]
