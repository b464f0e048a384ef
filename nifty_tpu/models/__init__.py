from .correlated_field import (
    CorrelatedFieldMaker,
    SimpleCorrelatedField,
    make_grid,
    matern_amplitude,
    non_parametric_amplitude,
)
from .correlated_field import adjust_variances
from .dynamics import (
    dynamic_lightcone_operator,
    dynamic_operator,
    light_cone_kernel,
)
from .gauss_markov import (
    GaussMarkovProcess,
    IntegratedWienerProcess,
    OrnsteinUhlenbeckProcess,
    WienerProcess,
)
