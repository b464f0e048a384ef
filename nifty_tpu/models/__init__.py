from .correlated_field import (
    CorrelatedFieldMaker,
    SimpleCorrelatedField,
    make_grid,
    matern_amplitude,
    non_parametric_amplitude,
)
from .gauss_markov import (
    GaussMarkovProcess,
    IntegratedWienerProcess,
    OrnsteinUhlenbeckProcess,
    WienerProcess,
)
