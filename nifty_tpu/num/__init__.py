from .lanczos import (
    lanczos_tridiag,
    stochastic_logdet_from_lanczos,
    stochastic_lq_logdet,
)
from .unique import amend_unique, unique
