"""TPU-native Bayesian field inference.

A from-scratch framework with the capabilities of NIFTy 8 / NIFTy.re
(structured GP priors with non-parametric harmonic-domain power spectra,
MGVI/geoVI variational inference with implicit-metric CG sampling, HMC/NUTS
cross-checks), designed mesh-native for TPU pod slices: fully traceable
solvers, sample- and field-axis sharding, psum reductions over ICI.
"""

from . import config
from . import domains, num
from .domains import (
    DOFSpace,
    DomainTuple,
    Domain,
    GLSpace,
    HPSpace,
    LMSpace,
    PowerSpace,
    RGSpace,
    UnstructuredDomain,
)
from .field import (
    Field,
    create_power_operator,
    dof_distributor,
    from_random,
    full,
    makeField,
    power_analyze,
)
from .ops.sht import SphericalHarmonicTransform, SphericalHarmonicTransformOnTheFly
from .custom_map import lmap, smap
from .config_driver import OptimizeKLConfig
from .evidence_lower_bound import estimate_evidence_lower_bound
from .extra import check_likelihood, check_linear_model, check_model
from .instrumentation import CountingModel, exec_time
from .evi import (
    Samples,
    draw_linear_residual,
    draw_residual,
    nonlinearly_update_residual,
)
from .likelihood import (
    Likelihood,
    LikelihoodPartial,
    LikelihoodSum,
    LikelihoodWithModel,
)
from .likelihood_impl import (
    Bernoulli,
    Categorical,
    Gaussian,
    InverseGamma,
    Poissonian,
    StudentT,
    VariableCovarianceGaussian,
    VariableCovarianceStudentT,
)
from .hmc import generate_hmc_acc_rej, generate_nuts_tree
from .hmc_oo import Chain, HMCChain, NUTSChain
from .logger import logger
from .minisanity import minisanity, reduced_residual_stats
from .misc import hvp, interpolate
from .pytree_string import PyTreeString, hide_strings, unhide_strings
from .model import Initializer, LazyModel, Model, WrappedCall, wrap, wrap_left
from .models import (
    CorrelatedFieldMaker,
    adjust_variances,
    dynamic_lightcone_operator,
    dynamic_operator,
    GaussMarkovProcess,
    IntegratedWienerProcess,
    OrnsteinUhlenbeckProcess,
    SimpleCorrelatedField,
    WienerProcess,
    matern_amplitude,
    non_parametric_amplitude,
)
from .optimize_kl import OptimizeVI, OptimizeVIState, optimize_kl
from .plot import Plot
from .prior import (
    GammaPrior,
    InvGammaPrior,
    LogInvGammaPrior,
    LaplacePrior,
    LogNormalPrior,
    NormalPrior,
    UniformPrior,
)
from .refine import (
    CoordinateChart,
    HEALPixChart,
    RefinementField,
    RefinementHPField,
)
from .responses import (
    HarmonicSKI,
    SamplingCartesianGridLOS,
    StructuredKernelInterpolation,
    ToeplitzSKI,
    interpolation_matrix,
    matmul_bttb,
    matmul_toeplitz,
)
from .probing import (
    StatCalculator,
    approximation2endo,
    operator_spectrum,
    probe_diagonal,
    probe_trace,
)
from .sample_io import (
    load_samples,
    read_fits,
    save_samples,
    save_checkpoint_orbax,
    load_checkpoint_orbax,
    save_samples_to_fits,
    save_samples_to_hdf5,
    write_fits,
)
from .solvers import newton_cg, static_cg
from .solvers.lbfgs import lbfgs
from .solvers.vlbfgs import vlbfgs
from .solvers.descent import nonlinear_cg, steepest_descent
from .solvers.trust_ncg import trust_ncg
from .sugar import calculate_position, density_estimator
from .variational import FullCovarianceVI, MeanFieldVI
from .wiener_filter import (
    draw_posterior_sample,
    wiener_filter,
    wiener_filter_curvature,
)
from .solvers.cg import cg
from .solvers.newton_cg import OptimizeResults, minimize
from .solvers.scipy_bridge import minimize_scipy
from .stats import (
    interpolator,
    invgamma_prior,
    laplace_prior,
    lognormal_prior,
    lognormal_moments,
    normal_prior,
    uniform_prior,
)
from .tree import (
    ShapeWithDtype,
    Vector,
    dot,
    get_map,
    mean,
    mean_and_std,
    norm,
    random_like,
    stack,
    unite,
    unstack,
    vdot,
    zeros_like,
)

__version__ = "0.1.0"
