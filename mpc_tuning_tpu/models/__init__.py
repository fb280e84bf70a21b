"""L1 — plant & model representation.

Continuous transfer-function matrices with io-delays, exact ZOH
discretization (including fractional delays), discrete state-space
realizations, `lax.scan` trajectory rollout, nonlinear ODE models and
fixed-step integrators, and the benchmark plant definitions.
"""

from mpc_tuning_tpu.models.poly import (  # noqa: F401
    polyconv,
    polyfromroots,
    polytrim,
    row_common_den,
)
from mpc_tuning_tpu.models.lti import (  # noqa: F401
    TransferFunction,
    DiscreteSS,
    c2d_channel,
    tfm,
    tf,
)
from mpc_tuning_tpu.models.simulate import dlsim, dlsim_jax  # noqa: F401
