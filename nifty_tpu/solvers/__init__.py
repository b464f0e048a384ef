from . import cg
from .cg import CGResults, cg as cg_solve, static_cg
from .newton_cg import OptimizeResults, _newton_cg, minimize, newton_cg
from .lbfgs import _lbfgs, lbfgs
from .trust_ncg import _trust_ncg, cg_steihaug_subproblem, trust_ncg
from .descent import _nonlinear_cg, _steepest_descent, nonlinear_cg, steepest_descent
from .vlbfgs import _vlbfgs, vlbfgs
from .scipy_bridge import minimize_scipy
