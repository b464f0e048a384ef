from .los import SamplingCartesianGridLOS
from .ski import StructuredKernelInterpolation, interpolation_matrix, matmul_toeplitz
